"""Merge-on-read lake scan + compaction (SURVEY.md §2.1 S4).

The lake's committed state is the set of delta files listed in committed
manifests. A scan resolves last-writer-wins per key across all deltas:
group rows by (unsalted) key-hash partition and keep, per (repo, path),
the row with the max lsn, dropping delete tombstones.

Partitioning note (documented assumption): the resolve groupby uses a
recomputed ``upid = hash64(repo,path) % P`` — *unsalted*, so a key whose
epoch writes were salted across partitions still lands in exactly one
resolve group. The shuffle moves each delta file's rows once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from etl_ray.state import manifest as mf
from etl_ray.state import schema as schema_mod
from etl_ray.state.merge import KEY_COLS
from etl_ray.util import add_pid_column, key_concat


def _resolve_group(group: pa.Table) -> pa.Table:
    """Within one key-hash partition: per-key max-lsn row, tombstones out."""
    lsn = group["lsn"].to_numpy()
    keys = pd.Series(key_concat(group, KEY_COLS).to_pandas())
    order = np.argsort(-lsn, kind="stable")
    keep = ~keys.iloc[order].duplicated().to_numpy()
    latest = group.take(pa.array(order[keep]))
    live = latest.filter(pc.not_equal(latest["op"], "D"))
    return live.drop_columns(["upid", "lsn", "op"])


def read_lake(lake_dir: str, num_partitions: int | None = None,
              keep_sha: bool = True,
              columns: list[str] | None = None) -> "ray.data.Dataset":
    """Scan the converged current state of the lake (merge-on-read).

    ``columns`` prunes the payload at the Parquet read — only the
    requested columns plus the merge metadata (key, lsn, op, sha) leave
    storage, so a 2-column scan of a wide lake doesn't ship `content`.
    """
    files = mf.committed_files(lake_dir)
    schema = mf.current_schema(lake_dir)
    if not files or schema is None:
        return ray.data.from_arrow(
            pa.Table.from_pylist([], schema=schema or pa.schema([])))
    last = mf.read_manifest(lake_dir, mf.last_committed(lake_dir))
    P = num_partitions or last["num_partitions"]

    if columns is not None:
        schema = pa.schema([f for f in schema
                            if f.name in set(columns) | set(KEY_COLS)])
    full = pa.schema(list(schema) + [pa.field("lsn", pa.int64()),
                                     pa.field("op", pa.string()),
                                     pa.field("content_sha256", pa.string())])

    def _conform(t: pa.Table) -> pa.Table:
        t = schema_mod.conform(t, full)
        return add_pid_column(t, KEY_COLS, P, pid_col="upid")

    read_cols = None if columns is None else list(
        dict.fromkeys([*KEY_COLS, *columns, "lsn", "op", "content_sha256"]))
    ds = ray.data.read_parquet(files, columns=read_cols)
    ds = ds.map_batches(_conform, batch_format="pyarrow")
    out = ds.groupby("upid").map_groups(_resolve_group, batch_format="pyarrow")
    if not keep_sha:
        out = out.drop_columns(["content_sha256"])
    return out


def compact(lake_dir: str) -> int:
    """Rewrite the lake to one resolved base delta per partition.

    Appends a synthetic epoch whose manifest carries ``base: true`` —
    readers then ignore all earlier epochs (mf.committed_files). Returns
    the number of live rows in the compacted base.
    """
    last = mf.last_committed(lake_dir)
    if last < 0:
        return 0
    schema = mf.current_schema(lake_dir)
    man = mf.read_manifest(lake_dir, last)
    P = man["num_partitions"]
    resolved = read_lake(lake_dir)

    import os

    from etl_ray.state.merge import MergeApplier  # reuse the delta writer
    import ray as _ray

    epoch = last + 1

    def _write_base(group: pa.Table) -> pa.Table:
        # re-attach merge metadata: compacted rows all carry their own lsn?
        # lsn/op were dropped by read_lake; a base file needs a per-row lsn
        # for future LWW — use 0 so any later event wins, with op="I".
        g = group
        g = g.append_column("lsn", pa.nulls(len(g), pa.int64()).fill_null(0))
        g = g.append_column("op", pa.array(["I"] * len(g), pa.string()))
        g = g.append_column("epoch", pa.array([epoch] * len(g), pa.int32()))
        g = g.append_column("audit_ok", pa.array([True] * len(g)))
        applier = MergeApplier(lake_dir, epoch, schema_mod.to_b64(schema), None)
        return applier(g)

    prep = resolved.map_batches(
        lambda t: add_pid_column(t, KEY_COLS, P), batch_format="pyarrow")
    entries = prep.groupby("pid").map_groups(_write_base, batch_format="pyarrow")
    rows = entries.take_all()
    partitions = {int(r["pid"]): {k: r[k] for k in r if k != "pid"} for r in rows}
    n_live = sum(e["n_rows"] for e in partitions.values())
    # carry forward high-watermarks so resume-after-compact still fences
    hwm = mf.high_watermarks(lake_dir)
    for p, e in partitions.items():
        e["hwm"] = max(e["hwm"], hwm.get(p, -1))
    doc_partitions = partitions
    _commit_base(lake_dir, epoch, schema, doc_partitions, P)
    return int(n_live)


def _commit_base(lake_dir, epoch, schema, partitions, P):
    import json
    import os
    import tempfile

    doc = {
        "epoch": epoch,
        "num_partitions": P,
        "base": True,
        "schema_b64": schema_mod.to_b64(schema),
        "partitions": {str(p): e for p, e in sorted(partitions.items())},
    }
    d = os.path.join(lake_dir, mf.MANIFEST_DIR)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, mf.manifest_path(lake_dir, epoch))
