"""The flagship CDC replay pipeline (SURVEY.md §3.1).

Per epoch (micro-batch):

    read_parquet(wal/epoch=K)                      # S2 bounded WAL tail
      → map_batches(prepare_events)                # M4 parse + M9 audit +
                                                   # M7 sha256 + pid routing
      → groupby("pid").map_groups(MergeApplier,    # A1/A3/A4 stateful stage
                                  concurrency=N)   #   (actor pool)
      → take_all() manifest entries (≤ P tiny rows)
      → manifest.commit_epoch(...)                 # S3 phase-2, atomic

The driver holds only: the epoch loop, the running unified schema, and
the commit. Resume = skip committed epochs + broadcast per-partition lsn
high-watermarks into the appliers (replay from any checkpoint
reconverges — BASELINE.json:6,14).
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
from etl_ray.state.merge import MergeApplier, payload_schema, prepare_events


def epoch_schema(wal_dir: str, epoch: int):
    """Incoming payload schema for an epoch, read from Parquet footers."""
    return payload_schema(pads.dataset(f"{wal_dir}/epoch={epoch}").schema)


def apply_epoch(wal_dir: str, lake_dir: str, epoch: int, num_partitions: int,
                concurrency=None) -> dict:
    """Apply one WAL epoch to the lake; returns the epoch's lineage summary."""
    if epoch <= mf.last_committed(lake_dir):
        # already committed — replaying it is a no-op (exactly-once)
        return {"epoch": epoch, "n_events": 0, "n_rows": 0, "n_quarantined": 0,
                "skipped": True}
    current = mf.current_schema(lake_dir)
    unified = schema_mod.unify(current, epoch_schema(wal_dir, epoch))
    hwm_ref = ray.put(mf.high_watermarks(lake_dir))

    ds = wal_mod.read_epoch(wal_dir, epoch)
    ds = ds.map_batches(prepare_events(num_partitions), batch_format="pyarrow")
    entries = ds.groupby("pid").map_groups(
        MergeApplier,
        fn_constructor_args=(lake_dir, epoch, schema_mod.to_b64(unified), hwm_ref),
        batch_format="pyarrow",
        concurrency=concurrency or (1, max(2, (os.cpu_count() or 8) // 2)),
        num_cpus=1,
    )
    rows = entries.take_all()  # ≤ num_partitions tiny rows
    partitions = {int(r["pid"]): {k: v for k, v in r.items() if k != "pid"}
                  for r in rows}
    mf.commit_epoch(lake_dir, epoch, unified, partitions, num_partitions)
    return {
        "epoch": epoch,
        "n_events": sum(e["n_events"] for e in partitions.values()),
        "n_rows": sum(e["n_rows"] for e in partitions.values()),
        "n_quarantined": sum(e["n_quarantined"] for e in partitions.values()),
    }


def replay(wal_dir: str, lake_dir: str, n_epochs: int, num_partitions: int = 32,
           concurrency=None, stop_after: int | None = None) -> dict:
    """Replay the WAL into the lake, resuming from the committed checkpoint.

    ``stop_after=k`` simulates a crash after k epochs (for resume tests).
    Returns a summary with events/sec over the epochs actually applied.
    """
    os.makedirs(lake_dir, exist_ok=True)
    last = mf.last_committed(lake_dir)
    if last >= 0:
        # a resumed replay must keep the original partitioning: partition
        # ownership (pid routing + high-watermarks) is defined by P
        num_partitions = mf.read_manifest(lake_dir, last)["num_partitions"]
    start = last + 1
    end = n_epochs if stop_after is None else min(n_epochs, start + stop_after)
    t0 = time.perf_counter()
    total_events = 0
    applied = []
    for k in range(start, end):
        s = apply_epoch(wal_dir, lake_dir, k, num_partitions, concurrency)
        total_events += s["n_events"]
        applied.append(s)
    wall = time.perf_counter() - t0
    lineage_mod.write_lineage(lake_dir)
    return {
        "epochs_applied": len(applied),
        "first_epoch": start,
        "n_events": total_events,
        "wall_s": wall,
        "events_per_s": total_events / wall if wall > 0 else 0.0,
        "summaries": applied,
    }
