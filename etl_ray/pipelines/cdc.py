"""The flagship CDC replay pipeline (SURVEY.md §3.1).

Replay processes the WAL in **windows of epochs**. Per epoch (its own
streaming Ray Data execution):

    read_parquet(wal/epoch=K)                  # S2 bounded WAL tail
      → map_batches(prepare_events)            # M4 parse + M9 audit +
                                               # M7 sha256 + pid routing
      → groupby("pid").map_groups(merge)       # A1/A3/A4 merge stage
                                               #   (tasks or actor pool)
      → take_all() manifest entries (≤ P tiny rows)

The epochs of a window execute CONCURRENTLY (driver threads — epochs
are independent until commit: disjoint lsn ranges, separate delta
files), which hides each execution's fixed cost (~2s: planning, sort
sampling, task ramp-up — it dominated wall time when epochs ran
serially) and keeps the cluster saturated. Commits then run strictly
sequentially in epoch order with monotonic fencing (S3 phase-2), so
crash/resume granularity is one window: whatever prefix committed
before a crash is skipped on resume, the rest recomputes (delta-file
writes are deterministic + idempotent). The window size bounds
in-flight state at 10^10-event scale.

The driver holds only: the window loop, the running unified schema, and
the commits. Merge state (per-partition lsn high-watermarks) is
broadcast via ray.put and persisted in manifests (BASELINE.json:6,14).
"""

from __future__ import annotations

import os
import time

import pyarrow.dataset as pads

import ray
import ray.data

from etl_ray.sources import wal as wal_mod
from etl_ray.state import lineage as lineage_mod
from etl_ray.state import manifest as mf
from etl_ray.state import schema as schema_mod
from etl_ray.state.merge import (BUCKET_SPAN, MergeApplier,
                                 make_fragment_writer, make_merge_fn,
                                 payload_schema, prepare_events)

# epochs per streaming execution; bounds in-flight shuffle state (tune to
# cluster memory at scale — each window holds ~window × epoch_bytes in
# the object store through the groupby)
DEFAULT_WINDOW = 8

# Fraction of a node's CPU slots RESERVED (never running ingest tasks)
# on the fused read→prep→write hot path: ⌈cpus/8⌉ slots stay free at
# every level (32→28, 16→14, 8→7, 4→3 concurrent tasks) for the raylet,
# the kernel page-fault path, and — on shared hypervisors — for the
# host to keep guest spinlock holders running. Measured on the bench VM
# in a contended window: 32 concurrent zstd-decode processes spent
# 39-84 s of SYSTEM time (page-fault lock contention; walls 4× the
# 24-process run) while ≤27-wide ran at per-process speed, and the full
# replay @32 measured 68 s full-width vs 27 s with one slot in eight
# reserved, same window. Standard capacity practice (Spark/YARN reserve
# per-node cores the same way), applied to the one fault-heavy path.
# ETL_RAY_CDC_TASK_CPUS overrides the derived per-task request
# (1.0 = full width); read at call time so programmatic os.environ
# changes after import take effect, malformed values fall back to the
# derived reservation (ADVICE r4).


def _task_cpus() -> float:
    """Per-task CPU request implementing the slot reservation above."""
    env = os.environ.get("ETL_RAY_CDC_TASK_CPUS")
    if env is not None:
        try:
            return float(env)
        except ValueError:
            pass  # malformed override: use the derived reservation
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 — uninitialised session
        cpus = 8
    reserve = max(1, cpus // 8)
    if cpus - reserve < 1:  # 1-CPU session: nothing to reserve
        return 1.0
    # tiny epsilon below the exact ratio so floor(cpus/task_cpus) is
    # never one short of the target width through float rounding
    return max(1.0, cpus / (cpus - reserve) - 0.002)


def epoch_schema(wal_dir: str, epoch: int):
    """Incoming payload schema for an epoch, read from Parquet footers."""
    return payload_schema(pads.dataset(f"{wal_dir}/epoch={epoch}").schema)


# manifest-entry merging lives in state.manifest (shared with LakeSink)
_merge_entry_rows = mf.merge_entry_rows


def apply_window(wal_dir: str, lake_dir: str, epochs: list[int],
                 num_partitions: int, concurrency=None,
                 mode: str = "direct") -> list[dict]:
    """Apply a window of epochs; commit each in ascending order.

    Each epoch is its own Ray Data execution (read → prep → per-pid
    shuffle → merge), but the window's executions run CONCURRENTLY from
    driver threads: epochs are independent until commit (disjoint lsn
    ranges, independent delta files), so overlapping them hides each
    execution's fixed cost and keeps the cluster saturated, while the
    commit loop below stays strictly sequential per epoch (monotonic
    fencing). A window-unified schema keeps all delta files of the
    window mutually compatible.
    """
    epochs = [k for k in epochs if k > mf.last_wal_epoch(lake_dir)]
    if not epochs:
        return []
    mode = mf.lake_mode(lake_dir) or mode  # a resumed lake keeps its mode
    current = mf.current_schema(lake_dir)
    unified = current
    for k in epochs:
        unified = schema_mod.unify(unified, epoch_schema(wal_dir, k))
    schema_b64 = schema_mod.to_b64(unified)
    hwm_ref = ray.put(mf.high_watermarks(lake_dir))

    num_buckets = max(1, num_partitions // BUCKET_SPAN)

    if mode == "direct":
        # scale path: ONE streaming execution for the whole window —
        # read every epoch dir (unified schema), stateless prep, partial
        # reduce + bucket-partitioned fragment writes
        # (merge.make_fragment_writer handles multi-epoch batches), no
        # pre-merge shuffle and no per-epoch execution fixed cost. The
        # per-epoch commit loop below is unchanged: entry rows carry
        # their epoch.
        # identical num_cpus on read + both maps keeps the three stages
        # FUSED into one operator (differing resource requests block
        # fusion and would push ~30 GB of decoded batches through the
        # object store between stages)
        task_cpus = _task_cpus()
        ds = wal_mod.read_epochs(wal_dir, epochs, blocks_per_cpu=2.0,
                                 ray_remote_args={"num_cpus": task_cpus})
        ds = ds.map_batches(prepare_events(num_partitions),
                            batch_format="pyarrow", num_cpus=task_cpus)
        ds = ds.map_batches(
            make_fragment_writer(lake_dir, schema_b64, hwm_ref,
                                 num_partitions, num_buckets),
            batch_format="pyarrow", num_cpus=task_cpus)
        rows = ds.take_all()  # ≤ (epochs × buckets × tasks) tiny rows
        results = {k: [r for r in rows if r["epoch"] == k] for k in epochs}
    else:
        def _build_epoch(k: int):
            """Lazy per-epoch pipeline — built on the MAIN thread
            (read_parquet does lazy imports whose failure handling is
            not thread-safe in ray 2.49); only execution (take_all)
            runs in the pool."""
            ds = wal_mod.read_epoch(wal_dir, k, blocks_per_cpu=0.5)
            ds = ds.map_batches(prepare_events(num_partitions),
                                batch_format="pyarrow")
            if concurrency is None:
                # warm-worker tasks (no per-epoch actor-pool spin-up)
                return ds.groupby("pid").map_groups(
                    make_merge_fn(lake_dir, k, schema_b64, hwm_ref),
                    batch_format="pyarrow",
                )
            return ds.groupby("pid").map_groups(
                MergeApplier,
                fn_constructor_args=(lake_dir, k, schema_b64, hwm_ref),
                batch_format="pyarrow",
                concurrency=concurrency,
                num_cpus=1,
            )

        plans = {k: _build_epoch(k) for k in epochs}
        if len(epochs) == 1:
            results = {k: plan.take_all() for k, plan in plans.items()}
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(epochs)) as pool:
                futs = {k: pool.submit(plan.take_all)  # ≤ P tiny rows each
                        for k, plan in plans.items()}
                results = {k: f.result() for k, f in futs.items()}

    summaries = []
    for k in epochs:  # phase-2: strictly ascending per-epoch commits
        if mode == "direct":
            by_bucket: dict[int, list[dict]] = {}
            for r in results[k]:
                by_bucket.setdefault(int(r["pid"]), []).append(r)
            partitions = {b: _merge_entry_rows(rs)
                          for b, rs in by_bucket.items()}
        else:
            partitions = {int(r["pid"]): {c: v for c, v in r.items()
                                          if c not in ("pid", "epoch")}
                          for r in results[k]}
        mf.commit_epoch(lake_dir, k, unified, partitions, num_partitions,
                        mode=mode,
                        num_buckets=num_buckets if mode == "direct" else None)
        summaries.append({
            "epoch": k,
            "n_events": sum(e["n_events"] for e in partitions.values()),
            "n_rows": sum(e["n_rows"] for e in partitions.values()),
            "n_quarantined": sum(e["n_quarantined"]
                                 for e in partitions.values()),
        })
    return summaries


def apply_epoch(wal_dir: str, lake_dir: str, epoch: int, num_partitions: int,
                concurrency=None, mode: str = "direct") -> dict:
    """Apply one WAL epoch to the lake; returns the epoch's lineage summary."""
    if epoch <= mf.last_wal_epoch(lake_dir):
        # already committed — replaying it is a no-op (exactly-once)
        return {"epoch": epoch, "n_events": 0, "n_rows": 0, "n_quarantined": 0,
                "skipped": True}
    return apply_window(wal_dir, lake_dir, [epoch], num_partitions,
                        concurrency, mode=mode)[0]


# live fragments per bucket before the replay loop schedules a
# compaction (direct mode): bounds a long-running lake's read
# amplification. Sized so steady-state reads merge O(threshold) files
# while compaction (a full resolve+rewrite) stays rare relative to
# epoch ingest — tune DOWN for read-heavy lakes.
AUTO_COMPACT_FRAGMENTS = 512


def replay(wal_dir: str, lake_dir: str, n_epochs: int, num_partitions: int = 32,
           concurrency=None, stop_after: int | None = None,
           window: int = DEFAULT_WINDOW, mode: str = "direct",
           auto_compact: int | None = AUTO_COMPACT_FRAGMENTS) -> dict:
    """Replay the WAL into the lake, resuming from the committed checkpoint.

    ``stop_after=k`` simulates a crash after k epochs (for resume tests).
    ``auto_compact`` schedules a compaction whenever any partition key's
    live data-file count exceeds it (None disables). Returns a summary
    with events/sec over the epochs actually applied.
    """
    os.makedirs(lake_dir, exist_ok=True)
    last_man = mf.last_manifest(lake_dir)
    if last_man is not None:
        # a resumed replay must keep the original partitioning: partition
        # ownership (pid routing + high-watermarks) is defined by P
        num_partitions = last_man["num_partitions"]
    start = mf.last_wal_epoch(lake_dir) + 1
    end = n_epochs if stop_after is None else min(n_epochs, start + stop_after)
    t0 = time.perf_counter()
    total_events = 0
    n_compactions = 0
    applied = []
    for w0 in range(start, end, window):
        tw = time.perf_counter()
        ss = apply_window(wal_dir, lake_dir, list(range(w0, min(w0 + window, end))),
                          num_partitions, concurrency, mode=mode)
        dw = round(time.perf_counter() - tw, 3)
        for s in ss:
            s["window_wall_s"] = dw
            total_events += s["n_events"]
            applied.append(s)
        if auto_compact:
            counts = mf.live_file_counts(lake_dir)
            over = [k for k, v in counts.items() if v > auto_compact]
            if over:
                from etl_ray.state.lake import compact

                # PARTIAL compaction: only the over-threshold keys (plus
                # their shared-file closure) get rewritten — compaction
                # write amplification tracks the hot keys, not the lake
                compact(lake_dir, buckets=over)
                n_compactions += 1
    wall = time.perf_counter() - t0
    lineage_mod.write_lineage(lake_dir)
    out = {
        "epochs_applied": len(applied),
        "first_epoch": start,
        "n_events": total_events,
        "wall_s": wall,
        "events_per_s": total_events / wall if wall > 0 else 0.0,
        "n_compactions": n_compactions,
        "summaries": applied,
    }
    _write_run_metrics(lake_dir, out)
    return out


def _write_run_metrics(lake_dir: str, summary: dict) -> None:
    """Persist one metrics record per replay run under
    ``lake_dir/_metrics/`` (BASELINE.json:6 metrics surface) — the
    run-history an operator dashboards: epochs applied, event counts,
    wall, throughput, compactions, per-epoch summaries."""
    import json

    d = os.path.join(lake_dir, "_metrics")
    os.makedirs(d, exist_ok=True)
    seq = len([n for n in os.listdir(d) if n.startswith("run-")])
    tmp = os.path.join(d, f".run-{seq}.tmp")
    with open(tmp, "w") as f:
        json.dump(summary, f)
    os.replace(tmp, os.path.join(d, f"run-{seq}.json"))
