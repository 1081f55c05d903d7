"""CDC merge stage: event prep (audit/hash/partition) + LWW merge applier.

The merge applier is the stateful actor-pool stage of the pipeline
(BASELINE.json:6 "stateful actor-pool stages apply them via
hash-partitioned last-writer-wins merge-on-read upserts"): it runs as a
callable class inside ``groupby("pid").map_groups(MergeApplier, ...,
concurrency=N)`` so each hash partition's events for the epoch arrive as
one Arrow group. Phase-1 of the two-phase commit happens here (delta
file written to a temp name, ``os.replace``d to its deterministic final
path so task retries are idempotent); phase-2 (manifest commit) is the
driver's, in ``etl_ray.state.manifest.commit_epoch``.

Cross-epoch state (per-partition lsn high-watermarks = the idempotency /
dedup index, A3) is persisted in the manifests and broadcast to the pool
via ``ray.put`` at epoch start, so actors are disposable — a retried or
rescheduled actor reconstructs identical output.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from etl_ray.state import manifest as mf
from etl_ray.state import schema as schema_mod
from etl_ray.util import add_pid_column, hash64_str, key_concat, sha256_hex_array

KEY_COLS = ["repo", "path"]
META_COLS = ["lsn", "epoch", "op"]
VALID_OPS = ("I", "U", "D")
# events per key per batch beyond which the key is salted across partitions
SALT_THRESHOLD = 4096
SALT_FACTOR = 8


def payload_schema(wal_schema: pa.Schema) -> pa.Schema:
    """The lake-facing schema: WAL schema minus (lsn, epoch, op) metadata."""
    fields = [f for f in wal_schema if f.name not in META_COLS]
    return pa.schema(fields)


def prepare_events(num_partitions: int):
    """Stateless map_batches stage: audit + content sha256 + partition id.

    Audit (M9, the eemeter-style "audit" step): op ∈ {I,U,D}, key non-null,
    content present unless delete. Bad rows are flagged, not dropped —
    the merge applier quarantines and counts them per partition.

    Salting: a key with > SALT_THRESHOLD events in one batch is split
    across SALT_FACTOR partitions by ``lsn % SALT_FACTOR`` (hot-repo skew
    bound, BASELINE.json:6). Correct under merge-on-read because the read
    path resolves max-lsn per *key* across all partitions.
    """

    def _prep(t: pa.Table) -> pa.Table:
        is_del = pc.equal(t["op"], "D")
        ok = pc.and_(
            pc.is_in(t["op"], value_set=pa.array(VALID_OPS)),
            pc.and_(pc.is_valid(t["repo"]), pc.is_valid(t["path"])),
        )
        ok = pc.and_(ok, pc.or_(is_del, pc.is_valid(t["content"])))
        reason = pc.if_else(ok, pa.nulls(len(t), pa.string()),
                            pa.array(["audit_failed"] * len(t)))
        t = t.append_column("audit_ok", ok)
        t = t.append_column("audit_reason", reason)
        t = t.append_column("content_sha256", sha256_hex_array(t["content"]))
        t = add_pid_column(t, KEY_COLS, num_partitions)
        # hot-key salting (per-batch detection; stateless and shuffle-free)
        keys = key_concat(t, KEY_COLS)
        pd_keys = pd.Series(keys.to_pandas())
        counts = pd_keys.map(pd_keys.value_counts())
        hot = (counts > SALT_THRESHOLD).to_numpy()
        if hot.any():
            pid = t["pid"].to_numpy().copy()
            salt = (t["lsn"].to_numpy() % SALT_FACTOR).astype(np.uint64)
            h = hash64_str(keys)
            pid[hot] = ((h[hot] + salt[hot]) % np.uint64(num_partitions)).astype(np.int32)
            t = t.set_column(t.schema.get_field_index("pid"), "pid",
                             pa.array(pid, pa.int32()))
        return t

    return _prep


class MergeApplier:
    """Per-partition LWW upsert applier (A1/A3/A4) — one group == one pid.

    Writes the partition's epoch delta file (phase 1) and returns a
    one-row manifest-entry table. Reduction inside the epoch keeps, per
    key, only the max-lsn event (upsert after-image or delete
    tombstone); cross-epoch resolution is merge-on-read at scan time.
    """

    def __init__(self, lake_dir: str, epoch: int, schema_b64: str, hwm_ref):
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.schema = schema_mod.from_b64(schema_b64)
        self.hwm = ray.get(hwm_ref) if hwm_ref is not None else {}

    def __call__(self, group: pa.Table) -> pa.Table:
        pid = int(group["pid"][0].as_py())
        # windowed replay groups by (epoch, pid): the group's epoch wins
        # over the constructor's (which then just tags the window)
        epoch = (int(group["epoch"][0].as_py())
                 if "epoch" in group.column_names else self.epoch)
        n_in = len(group)

        # A3 idempotency: drop events at or below the committed high-watermark
        hwm_prev = self.hwm.get(pid, -1)
        if hwm_prev >= 0:
            group = group.filter(pc.greater(group["lsn"], pa.scalar(hwm_prev)))

        # quarantine audit failures (M9): count + side-file, keep good rows
        bad = group.filter(pc.equal(group["audit_ok"], False))
        n_quarantined = len(bad)
        if n_quarantined:
            qpath = os.path.join(self.lake_dir, "_quarantine",
                                 f"pid={pid}", f"epoch={epoch}.parquet")
            os.makedirs(os.path.dirname(qpath), exist_ok=True)
            _atomic_write(bad, qpath)
        group = group.filter(pc.equal(group["audit_ok"], True))

        n_events = len(group)
        if n_events:
            lsn = group["lsn"].to_numpy()
            lsn_min, lsn_max = int(lsn.min()), int(lsn.max())
            # LWW reduce: keep the max-lsn event per (repo, path) — vectorized:
            # sort by lsn desc, keep first occurrence of each key.
            keys = pd.Series(key_concat(group, KEY_COLS).to_pandas())
            order = np.argsort(-lsn, kind="stable")
            keep_mask = ~keys.iloc[order].duplicated().to_numpy()
            reduced = group.take(pa.array(order[keep_mask]))
        else:
            lsn_min, lsn_max = -1, -1
            reduced = group

        n_upserts = int(pc.sum(pc.cast(pc.not_equal(reduced["op"], "D"),
                                       pa.int64())).as_py() or 0)
        n_deletes = len(reduced) - n_upserts

        # conform payload to the epoch's unified schema; keep merge metadata
        payload = schema_mod.conform(
            reduced.drop_columns([c for c in reduced.column_names
                                  if c not in self.schema.names]),
            self.schema)
        delta = payload
        for c in ("lsn", "op", "content_sha256"):
            if c not in delta.column_names:
                delta = delta.append_column(c, reduced[c])
        delta = delta.sort_by("lsn")  # deterministic bytes for idempotent retries

        checksum = 0
        shas = delta["content_sha256"].to_pylist()
        for s in shas:
            if s is not None:
                checksum ^= int(s[:16], 16)

        path = mf.data_file(self.lake_dir, pid, epoch)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        _atomic_write(delta, path)

        rel = os.path.relpath(path, self.lake_dir)
        return pa.table({
            "epoch": pa.array([epoch], pa.int32()),
            "pid": pa.array([pid], pa.int32()),
            "file": pa.array([rel], pa.string()),
            "lsn_min": pa.array([lsn_min], pa.int64()),
            "lsn_max": pa.array([lsn_max], pa.int64()),
            "n_events": pa.array([n_events], pa.int64()),
            "n_upserts": pa.array([n_upserts], pa.int64()),
            "n_deletes": pa.array([n_deletes], pa.int64()),
            "n_rows": pa.array([len(delta)], pa.int64()),
            "n_quarantined": pa.array([n_quarantined], pa.int64()),
            "checksum": pa.array([f"{checksum:016x}"], pa.string()),
            "hwm": pa.array([max(lsn_max, hwm_prev)], pa.int64()),
        })


def make_fragment_writer(lake_dir: str, schema_b64: str, hwm_ref,
                         num_partitions: int, num_buckets: int):
    """Direct-write ingest stage (map_batches over prepared events).

    The scale path for the merge: instead of an in-memory all-to-all
    (groupby pid) before writing one delta per partition, each task
    partially LWW-reduces its batch and writes its rows straight into
    key-bucket-partitioned fragment files
    (``data/bucket=<b>/epoch=<k>-<digest>.parquet``). The
    repartition-by-key is thus performed by the partitioned file layout
    (Hive/Hudi merge-on-read style); the per-key max-lsn resolution
    that the shuffle used to finalize is exactly what the merge-on-read
    scan (state.lake.read_lake) and compaction already do across
    epochs. Measured on the bench WAL the sort-shuffle was the one
    stage that got SLOWER with more CPUs (raylet/object-store IPC
    bound); this path keeps ingest embarrassingly parallel.

    Idempotency: fragment names are content-addressed (digest over
    epoch, bucket, row count, lsn range, checksum), so a retried task
    rewrites byte-identical files under the same names; orphan
    fragments from a crashed run are never listed in a committed
    manifest and stay invisible to readers.

    Returns one manifest-entry row per (epoch, bucket) per batch; the
    driver merges rows per bucket before the phase-2 commit.
    """
    schema = schema_mod.from_b64(schema_b64)

    def _write(batch: pa.Table) -> pa.Table:
        hwm = ray.get(hwm_ref) if hwm_ref is not None else {}
        empty = pa.table({
            "epoch": pa.array([], pa.int32()),
            "pid": pa.array([], pa.int32()),
            "files": pa.array([], pa.list_(pa.string())),
            "lsn_min": pa.array([], pa.int64()),
            "lsn_max": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_upserts": pa.array([], pa.int64()),
            "n_deletes": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
            "n_quarantined": pa.array([], pa.int64()),
            "checksum": pa.array([], pa.string()),
            "hwm": pa.array([], pa.int64()),
        })
        if len(batch) == 0:
            return empty
        epoch = int(batch["epoch"][0].as_py())
        bucket = (batch["pid"].to_numpy().astype(np.int64)
                  * num_buckets // num_partitions)
        batch = batch.append_column("bucket", pa.array(bucket, pa.int32()))

        # A3 idempotency: vectorized per-bucket high-watermark filter
        hwm_arr = np.full(num_buckets, -1, dtype=np.int64)
        for b, v in hwm.items():
            if 0 <= int(b) < num_buckets:
                hwm_arr[int(b)] = v
        keep = batch["lsn"].to_numpy() > hwm_arr[bucket]
        batch = batch.filter(pa.array(keep))
        if len(batch) == 0:
            return empty

        # quarantine audit failures (M9): content-addressed side file
        bad = batch.filter(pc.equal(batch["audit_ok"], False))
        n_bad_by_bucket: dict[int, int] = {}
        if len(bad):
            for b, c in zip(*np.unique(bad["bucket"].to_numpy(),
                                       return_counts=True)):
                n_bad_by_bucket[int(b)] = int(c)
            digest = _entry_digest(epoch, -1, len(bad),
                                   int(bad["lsn"].to_numpy().min()),
                                   int(bad["lsn"].to_numpy().max()), 0)
            qdir = os.path.join(lake_dir, "_quarantine")
            qpath = os.path.join(qdir, f"epoch={epoch}-{digest}.parquet")
            os.makedirs(qdir, exist_ok=True)
            _atomic_write(bad, qpath)
        batch = batch.filter(pc.equal(batch["audit_ok"], True))
        if len(batch) == 0:
            # quarantine-only batch: still report the counts (dropping
            # them here silently under-counted lineage)
            rows = [{
                "epoch": epoch, "pid": b, "files": [],
                "lsn_min": -1, "lsn_max": -1, "n_events": 0,
                "n_upserts": 0, "n_deletes": 0, "n_rows": 0,
                "n_quarantined": c, "checksum": "0" * 16, "hwm": -1,
            } for b, c in n_bad_by_bucket.items()]
            return pa.Table.from_pylist(rows, schema=empty.schema)

        # partial LWW reduce per key within the task's batch; cross-task
        # and cross-epoch duplicates resolve at merge-on-read (max lsn)
        lsn = batch["lsn"].to_numpy()
        keys = pd.Series(key_concat(batch, KEY_COLS).to_pandas())
        order = np.argsort(-lsn, kind="stable")
        keep_mask = ~keys.iloc[order].duplicated().to_numpy()
        reduced = batch.take(pa.array(order[keep_mask]))

        payload = schema_mod.conform(
            reduced.drop_columns([c for c in reduced.column_names
                                  if c not in schema.names]), schema)
        for c in ("lsn", "op", "content_sha256", "bucket"):
            payload = payload.append_column(c, reduced[c])
        # bucket-contiguous, lsn-sorted → deterministic fragment bytes
        payload = payload.sort_by([("bucket", "ascending"),
                                   ("lsn", "ascending")])

        bkt = payload["bucket"].to_numpy()
        bounds = (np.flatnonzero(np.diff(bkt)) + 1).tolist()
        rows = []
        for s, e in zip([0] + bounds, bounds + [len(payload)]):
            part = payload.slice(s, e - s)
            b = int(bkt[s])
            part_lsn = part["lsn"].to_numpy()
            checksum = 0
            for sh in part["content_sha256"].to_pylist():
                if sh is not None:
                    checksum ^= int(sh[:16], 16)
            lsn_min, lsn_max = int(part_lsn.min()), int(part_lsn.max())
            digest = _entry_digest(epoch, b, len(part), lsn_min, lsn_max,
                                   checksum)
            rel = os.path.join(mf.DATA_DIR, f"bucket={b}",
                               f"epoch={epoch}-{digest}.parquet")
            path = os.path.join(lake_dir, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            _atomic_write(part.drop_columns(["bucket"]), path)
            ops = part["op"].to_numpy(zero_copy_only=False)
            n_del = int((ops == "D").sum())
            rows.append({
                "epoch": epoch, "pid": b, "files": [rel],
                "lsn_min": lsn_min, "lsn_max": lsn_max,
                "n_events": 0,  # filled from pre-reduce counts next
                "n_upserts": len(part) - n_del, "n_deletes": n_del,
                "n_rows": len(part),
                "n_quarantined": n_bad_by_bucket.get(b, 0),
                "checksum": f"{checksum:016x}", "hwm": lsn_max,
            })
        # pre-reduce per-bucket event counts (lineage invariant: sums to
        # the WAL event count regardless of task blocking)
        ev_b, ev_c = np.unique(batch["bucket"].to_numpy(), return_counts=True)
        ev_map = {int(b): int(c) for b, c in zip(ev_b, ev_c)}
        for r in rows:
            r["n_events"] = ev_map.get(r["pid"], 0)
        # buckets that had only-quarantined events still need an entry
        for b, c in n_bad_by_bucket.items():
            if not any(r["pid"] == b for r in rows):
                rows.append({
                    "epoch": epoch, "pid": b, "files": [],
                    "lsn_min": -1, "lsn_max": -1,
                    "n_events": ev_map.get(b, 0), "n_upserts": 0,
                    "n_deletes": 0, "n_rows": 0, "n_quarantined": c,
                    "checksum": "0" * 16, "hwm": -1,
                })
        return pa.Table.from_pylist(rows, schema=empty.schema)

    return _write


def _entry_digest(epoch: int, bucket: int, n: int, lsn_min: int,
                  lsn_max: int, checksum: int) -> str:
    import hashlib

    return hashlib.sha1(
        f"{epoch}:{bucket}:{n}:{lsn_min}:{lsn_max}:{checksum}".encode()
    ).hexdigest()[:12]


def make_merge_fn(lake_dir: str, epoch: int, schema_b64: str, hwm_ref):
    """Task-mode wrapper: the merge stage as a plain ``map_groups`` fn.

    Semantically identical to the actor-pool mode (state — the lsn
    high-watermark index and unified schema — is broadcast via ray.put
    and shared zero-copy either way), but runs as stateless tasks on
    warm workers: for short epochs the per-epoch actor-pool spin-up
    (concurrency × epochs actor starts) otherwise dominates wall time.
    Construction cost per task is one schema parse + one (plasma-cached)
    ray.get. Use the actor pool (``concurrency=N``) when the applier
    carries genuinely heavy per-actor state.
    """

    def _apply(group: pa.Table) -> pa.Table:
        return MergeApplier(lake_dir, epoch, schema_b64, hwm_ref)(group)

    return _apply


def _atomic_write(table: pa.Table, path: str) -> None:
    """Write parquet via temp file + os.replace — idempotent under retry.

    The temp name embeds the pid to avoid cross-task collisions; the
    final rename is atomic. If the final file already exists it is left
    untouched: delta content is a deterministic function of the epoch's
    events + the committed high-watermarks, so an existing file from a
    retried / resumed / stale writer already holds the correct bytes —
    never overwriting is the data-level half of the epoch fence.
    """
    if os.path.exists(path):
        return
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp, compression="zstd")
    os.replace(tmp, path)
