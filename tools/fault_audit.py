"""Fault-volume audit for the fused CDC ingest (round-4 verdict #1).

Measures fresh-page fault volume per event: sums minflt+majflt deltas
across every live Ray process (raylet + workers, matched via /proc
cmdline) around a full bench-WAL replay. The guest kernel's parallel
fault path is the measured @32 collapse mechanism on this host, so
faults/event is the engine-side metric to drive down — wall time alone
can't show an improvement in a healthy window where faults are cheap.

Usage:
    python tools/fault_audit.py [--cpus 32] [--decay-ms N] [--retain]
                                [--epochs 4] [--label NAME]

--decay-ms N  sets ETL_RAY_JEMALLOC_DECAY_MS=N (Arrow jemalloc
              dirty-page retention in every worker, etl_ray.util)
--retain      sets RAY_GRAFT_MALLOC_RETAIN=1 (glibc heap retention)
Both are exported BEFORE ray.init so workers inherit them.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ray_procs() -> dict[int, tuple[int, int]]:
    """{pid: (minflt, majflt)} for this session's Ray-related processes."""
    me = os.getpid()
    out: dict[int, tuple[int, int]] = {}
    for name in os.listdir("/proc"):
        if not name.isdigit():
            continue
        pid = int(name)
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\x00", b" ").decode(errors="replace")
            if pid != me and "ray" not in cmd:
                continue
            with open(f"/proc/{pid}/stat") as f:
                st = f.read()
        except OSError:
            continue  # raced with process exit
        post = st.rsplit(")", 1)[1].split()
        # post[0] is field 3 (state); minflt is field 10, majflt field 12
        out[pid] = (int(post[7]), int(post[9]))
    return out


def _fault_delta(before: dict, after: dict) -> tuple[int, int]:
    minf = sum(mn - before.get(pid, (0, 0))[0] for pid, (mn, _) in after.items())
    majf = sum(mj - before.get(pid, (0, 0))[1] for pid, (_, mj) in after.items())
    return minf, majf


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--decay-ms", type=int, default=None)
    ap.add_argument("--retain", action="store_true")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--label", default="")
    ap.add_argument("--stage", default="full",
                    choices=("read", "prep", "full"),
                    help="read: decode only; prep: decode+prepare_events; "
                         "full: the real replay (default)")
    ap.add_argument("--wal-dir", default=None,
                    help="override bench.WAL_DIR (A/B older WAL layouts "
                         "in the same host window)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="replay N times in one session; pass 0 carries "
                         "the workers' one-time heap first-touch, later "
                         "passes are steady-state")
    args = ap.parse_args()

    if args.decay_ms is not None:
        os.environ["ETL_RAY_JEMALLOC_DECAY_MS"] = str(args.decay_ms)
    if args.retain:
        os.environ["RAY_GRAFT_MALLOC_RETAIN"] = "1"

    import bench

    os.environ["RAY_GRAFT_CPUS"] = str(args.cpus)
    bench._init_ray(args.cpus)
    import ray

    from etl_ray.pipelines.cdc import replay

    # warm workers + pre-import the ingest modules (bench child pattern)
    def _warm(b):
        import etl_ray.state.merge  # noqa: F401
        import etl_ray.state.schema  # noqa: F401
        return b

    ray.data.range(args.cpus * 4, override_num_blocks=args.cpus * 4) \
        .map_batches(_warm, batch_format="pyarrow").count()

    wal = bench._ensure_wal(args.wal_dir or bench.WAL_DIR)
    for root, _, names in os.walk(wal):
        for name in names:
            with open(os.path.join(root, name), "rb") as f:
                while f.read(1 << 24):
                    pass

    lake = "/tmp/etl_ray_fault_audit/lake"
    shutil.rmtree(lake, ignore_errors=True)
    os.sync()
    epochs = args.epochs or bench.CDC_EPOCHS

    # --repeat N: replay N times in the SAME session, one report line
    # each — pass 0 includes every worker's one-time heap first-touch
    # (proportional to workers × peak heap, not to data volume); later
    # passes show the steady-state faults/event a long-running ingest
    # sustains.
    for rep in range(max(1, args.repeat)):
        if rep:
            shutil.rmtree(lake, ignore_errors=True)
            os.sync()
        before = _ray_procs()
        t0 = time.perf_counter()
        if args.stage == "full":
            s = replay(wal, lake, epochs,
                       num_partitions=bench.CDC_PARTITIONS)
        else:
            # stage-attribution mode: same fused read (same blocks /
            # task cpus), truncated after the requested stage
            from etl_ray.pipelines.cdc import _task_cpus
            from etl_ray.sources import wal as wal_mod
            from etl_ray.state.merge import prepare_events

            task_cpus = _task_cpus()
            ds = wal_mod.read_epochs(
                wal, list(range(epochs)), blocks_per_cpu=2.0,
                ray_remote_args={"num_cpus": task_cpus})
            if args.stage == "prep":
                ds = ds.map_batches(prepare_events(bench.CDC_PARTITIONS),
                                    batch_format="pyarrow",
                                    num_cpus=task_cpus)
            import pyarrow as pa

            def _sink(b: pa.Table) -> pa.Table:
                return pa.table({"n": pa.array([len(b)], pa.int64())})

            n = ds.map_batches(_sink, batch_format="pyarrow",
                               num_cpus=task_cpus).sum("n")
            s = {"n_events": int(n)}
        wall = time.perf_counter() - t0
        after = _ray_procs()
        minf, majf = _fault_delta(before, after)

        n_ev = s["n_events"]
        print(json.dumps({
            "label": args.label,
            "pass": rep,
            "num_cpus": args.cpus,
            "decay_ms": args.decay_ms,
            "retain": bool(args.retain),
            "n_events": n_ev,
            "wall_s": round(wall, 3),
            "events_per_s": round(n_ev / wall, 1) if wall else 0,
            "minflt": minf,
            "majflt": majf,
            "faults_per_event": round((minf + majf) / max(1, n_ev), 3),
            "fault_gb": round((minf + majf) * 4096 / 1e9, 3),
        }))
    shutil.rmtree(lake, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
