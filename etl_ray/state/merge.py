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
from etl_ray.util import (add_pid_column, key_hash64, lww_keep_indices,
                          sha256_hex_with_prefix, take_runs)

KEY_COLS = ["repo", "path"]
META_COLS = ["lsn", "epoch", "op"]
VALID_OPS = ("I", "U", "D")
# hot-key salting thresholds. A key is salted when its per-batch event
# count exceeds max(SALT_MIN, SALT_REL × batch_rows / num_partitions):
# RELATIVE to partition balance, not absolute — an absolute-only
# threshold misses a hot key diluted across many read blocks (each
# batch sees only batch_rows/blocks of it) while every one of those
# slices still routes to the same partition. SALT_MIN keeps genuinely
# small keys unsalted (salting costs read-side resolve work).
SALT_MIN = 256
SALT_REL = 4
SALT_THRESHOLD = 4096  # legacy absolute cap — still salts above this
SALT_FACTOR = 8
# direct mode: pids per fragment bucket (bounds fragment-file count:
# each map task writes ≤ num_partitions / BUCKET_SPAN files per batch)
BUCKET_SPAN = 8
# minimum rows per fragment FILE: a task packs contiguous buckets into
# one file until it holds at least this many rows (manifest entries
# stay per-bucket, sharing the file). Bounds files/task at
# ~batch_rows/MIN_FRAG_ROWS independent of bucket count — without this
# a 256-node cluster (16k tasks × 2k buckets) would write millions of
# sub-MB fragments per epoch.
MIN_FRAG_ROWS = 8192


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
        reason = pc.if_else(ok, pa.scalar(None, pa.string()),
                            pa.scalar("audit_failed"))
        t = t.append_column("audit_ok", ok)
        t = t.append_column("audit_reason", reason)
        # content_sha256 is computed POST-reduce in the merge stage: only
        # rows that survive the partial LWW reduce are written, so
        # hashing here would waste ~40% of the sha work and (sorted
        # mode) ship 64 hex chars/row through the shuffle.
        # key hash computed ONCE; pid, salting and the downstream LWW
        # reduce all reuse it (the string keys are only re-touched to
        # verify hash-adjacent equality). Buffer-level row hash — no
        # concatenated key string, no per-row Python objects.
        kh = key_hash64(t, KEY_COLS)
        t = t.append_column("_kh", pa.array(kh, pa.uint64()))
        pid = (kh % np.uint64(num_partitions)).astype(np.int32)
        # hot-key salting (per-batch detection on the hash — stateless,
        # shuffle-free; a hash collision only merges two keys' counts,
        # harmless for a skew heuristic). Threshold is RELATIVE to the
        # batch's fair per-partition share (see SALT_MIN/SALT_REL note).
        _, inv, cnt = np.unique(kh, return_inverse=True, return_counts=True)
        thr = min(SALT_THRESHOLD,
                  max(SALT_MIN, SALT_REL * len(t) // num_partitions))
        hot = cnt[inv] > thr
        if hot.any():
            salt = (t["lsn"].to_numpy() % SALT_FACTOR).astype(np.uint64)
            pid = pid.copy()
            pid[hot] = ((kh[hot] + salt[hot])
                        % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("pid", pa.array(pid, pa.int32()))

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
            # LWW reduce: keep the max-lsn event per (repo, path) —
            # hash-keyed with exact adjacent verification; extra rows
            # from pathological hash collisions resolve at merge-on-read
            if "_kh" in group.column_names:
                keep, _ = lww_keep_indices(group["_kh"].to_numpy(), lsn,
                                           group.select(KEY_COLS))
            else:  # compaction path feeds pre-resolved rows without _kh
                kh = key_hash64(group, KEY_COLS)
                keep, _ = lww_keep_indices(kh, lsn, group.select(KEY_COLS))
            # single take: dedup + deterministic lsn order for
            # idempotent retries
            fin = keep[np.argsort(lsn[keep], kind="stable")]
            reduced = take_runs(group, fin)
        else:
            lsn_min, lsn_max = -1, -1
            reduced = group

        n_upserts = int(pc.sum(pc.cast(pc.not_equal(reduced["op"], "D"),
                                       pa.int64())).as_py() or 0)
        n_deletes = len(reduced) - n_upserts

        # conform payload to the epoch's unified schema; keep merge
        # metadata. content_sha256 is computed here, post-reduce, on the
        # rows actually written (see prepare_events).
        delta = schema_mod.conform(
            reduced.drop_columns([c for c in reduced.column_names
                                  if c not in self.schema.names]),
            self.schema)
        for c in ("lsn", "op"):
            if c not in delta.column_names and c in reduced.column_names:
                delta = delta.append_column(c, reduced[c])
        sha, shp = sha256_hex_with_prefix(reduced["content"])
        delta = delta.append_column("content_sha256", sha)
        checksum = int(np.bitwise_xor.reduce(shp.astype(np.uint64))) \
            if len(shp) else 0

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


# per-WORKER memo of deserialized high-watermark index arrays, keyed by
# (object ref, bucket count): one ray.get + one O(buckets) build per
# worker per epoch window instead of per batch (the views.py _memo
# pattern). Bounded — concurrent windows keep at most a few refs live.
_HWM_MEMO: dict[tuple[str, int], np.ndarray] = {}


def _hwm_index(hwm_ref, num_buckets: int) -> np.ndarray:
    if hwm_ref is None:
        return np.full(num_buckets, -1, dtype=np.int64)
    key = (hwm_ref.hex(), num_buckets)
    arr = _HWM_MEMO.get(key)
    if arr is None:
        hwm = ray.get(hwm_ref)
        arr = np.full(num_buckets, -1, dtype=np.int64)
        for b, v in hwm.items():
            if 0 <= int(b) < num_buckets:
                arr[int(b)] = v
        if len(_HWM_MEMO) > 8:
            _HWM_MEMO.clear()
        _HWM_MEMO[key] = arr
    return arr


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

    _ENTRY_SCHEMA = pa.schema([
        ("epoch", pa.int32()), ("pid", pa.int32()),
        ("files", pa.list_(pa.string())),
        ("lsn_min", pa.int64()), ("lsn_max", pa.int64()),
        ("n_events", pa.int64()), ("n_upserts", pa.int64()),
        ("n_deletes", pa.int64()), ("n_rows", pa.int64()),
        ("n_quarantined", pa.int64()), ("checksum", pa.string()),
        ("hwm", pa.int64()),
    ])

    def _write(batch: pa.Table) -> pa.Table:
        empty = pa.Table.from_pylist([], schema=_ENTRY_SCHEMA)
        if len(batch) == 0:
            return empty
        lsn = batch["lsn"].to_numpy()
        epochs = batch["epoch"].to_numpy().astype(np.int64)
        bucket = (batch["pid"].to_numpy().astype(np.int64)
                  * num_buckets // num_partitions)

        # A3 idempotency: vectorized per-bucket high-watermark filter
        # (index deserialized + built once per worker per window)
        hwm_arr = _hwm_index(hwm_ref, num_buckets)
        live = lsn > hwm_arr[bucket]
        audit_ok = batch["audit_ok"].to_numpy(zero_copy_only=False)
        audit_ok = audit_ok.astype(bool)
        good = live & audit_ok

        # quarantine audit failures (M9): content-addressed side files,
        # one per epoch present in the batch
        eb_key = epochs * num_buckets + bucket  # combined group id
        n_bad: dict[tuple[int, int], int] = {}
        bad_idx = np.flatnonzero(live & ~audit_ok)
        if len(bad_idx):
            for eb, c in zip(*np.unique(eb_key[bad_idx], return_counts=True)):
                n_bad[(int(eb) // num_buckets, int(eb) % num_buckets)] = int(c)
            for k in np.unique(epochs[bad_idx]):
                sub_i = bad_idx[epochs[bad_idx] == k]
                digest = _entry_digest(int(k), -1, len(sub_i),
                                       int(lsn[sub_i].min()),
                                       int(lsn[sub_i].max()), 0)
                qdir = os.path.join(lake_dir, "_quarantine")
                qpath = os.path.join(qdir, f"epoch={int(k)}-{digest}.parquet")
                os.makedirs(qdir, exist_ok=True)
                _atomic_write(take_runs(batch, sub_i), qpath)

        gi = np.flatnonzero(good)
        rows: list[dict] = []
        if len(gi):
            # partial LWW reduce per (epoch, key) within the task's batch
            # — exact, hash-keyed (util.lww_keep_indices); cross-task and
            # cross-epoch duplicates resolve at merge-on-read (max lsn).
            # Scoped per epoch so every epoch's delta stays complete for
            # crash-consistent per-epoch commits.
            kh = batch["_kh"].to_numpy()
            keep_g, _ = lww_keep_indices(
                kh[gi], lsn[gi],
                take_runs(batch.select(KEY_COLS), gi),
                extra=epochs[gi])
            keep = gi[keep_g]
            # one gather: dedup + (epoch, bucket, lsn) file order
            # together. take_runs, not Table.take: the read stage hands
            # multi-chunk blocks and take's internal combine_chunks was
            # the engine's largest fresh-page fault source.
            fin = keep[np.lexsort((lsn[keep], bucket[keep], epochs[keep]))]
            reduced = take_runs(batch, fin)
            sha, shp = sha256_hex_with_prefix(reduced["content"])
            payload = schema_mod.conform(
                reduced.drop_columns([c for c in reduced.column_names
                                      if c not in schema.names]), schema)
            for c in ("lsn", "op"):
                payload = payload.append_column(c, reduced[c])
            payload = payload.append_column("content_sha256", sha)

            eb_f = eb_key[fin]
            bounds = (np.flatnonzero(np.diff(eb_f)) + 1).tolist()
            # delete mask via an Arrow kernel — to_numpy on a string
            # column would materialize one Python str per row
            dmask = pc.equal(reduced["op"], "D") \
                .to_numpy(zero_copy_only=False).astype(bool)
            lsn_f = lsn[fin]
            # per-(epoch, bucket) slices → RANGE-FRAGMENT files: pack
            # consecutive bucket slices of one epoch into a file until
            # it holds ≥ MIN_FRAG_ROWS, so files/task is bounded by
            # batch_rows/MIN_FRAG_ROWS regardless of bucket count.
            # Manifest entries stay per-bucket (sharing the file) —
            # selective-bucket reads prune on manifest entries, not
            # directory names (Delta/Hudi-style file-stats pruning).
            slices = [(s, e, int(eb_f[s]) // num_buckets,
                       int(eb_f[s]) % num_buckets)
                      for s, e in zip([0] + bounds,
                                      bounds + [len(payload)])]
            gi_start = 0
            while gi_start < len(slices):
                gi_end = gi_start
                k = slices[gi_start][2]
                # grow the group within one epoch (commit granularity)
                while (gi_end + 1 < len(slices)
                       and slices[gi_end + 1][2] == k
                       and slices[gi_end][1] - slices[gi_start][0]
                       < MIN_FRAG_ROWS):
                    gi_end += 1
                gs, ge = slices[gi_start][0], slices[gi_end][1]
                b_lo, b_hi = slices[gi_start][3], slices[gi_end][3]
                gchk = int(np.bitwise_xor.reduce(
                    shp[gs:ge].astype(np.uint64)))
                digest = _entry_digest(k, b_lo, ge - gs, int(lsn_f[gs]),
                                       int(lsn_f[ge - 1]), gchk)
                rel = os.path.join(
                    mf.DATA_DIR, f"bucket={b_lo}",
                    f"epoch={k}-b{b_lo}-{b_hi}-{digest}.parquet")
                path = os.path.join(lake_dir, rel)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                _atomic_write(payload.slice(gs, ge - gs), path)
                for s, e, k_s, b in slices[gi_start:gi_end + 1]:
                    checksum = int(np.bitwise_xor.reduce(
                        shp[s:e].astype(np.uint64)))
                    n_del = int(dmask[s:e].sum())
                    rows.append({
                        "epoch": k_s, "pid": b, "files": [rel],
                        "lsn_min": int(lsn_f[s]),
                        "lsn_max": int(lsn_f[e - 1]),
                        "n_events": 0,  # filled from pre-reduce counts
                        "n_upserts": (e - s) - n_del, "n_deletes": n_del,
                        "n_rows": e - s,
                        "n_quarantined": n_bad.pop((k_s, b), 0),
                        "checksum": f"{checksum:016x}",
                        "hwm": int(lsn_f[e - 1]),
                    })
                gi_start = gi_end + 1
            # pre-reduce per-(epoch, bucket) event counts (lineage
            # invariant: sums to the WAL event count regardless of
            # task blocking)
            ev_eb, ev_c = np.unique(eb_key[gi], return_counts=True)
            ev_map = {(int(x) // num_buckets, int(x) % num_buckets): int(c)
                      for x, c in zip(ev_eb, ev_c)}
            for r in rows:
                r["n_events"] = ev_map.get((r["epoch"], r["pid"]), 0)
        # (epoch, bucket)s that had only-quarantined events still need an
        # entry (dropping them silently under-counts lineage)
        for (k, b), c in n_bad.items():
            rows.append({
                "epoch": k, "pid": b, "files": [],
                "lsn_min": -1, "lsn_max": -1, "n_events": 0,
                "n_upserts": 0, "n_deletes": 0, "n_rows": 0,
                "n_quarantined": c, "checksum": "0" * 16, "hwm": -1,
            })
        return pa.Table.from_pylist(rows, schema=_ENTRY_SCHEMA)

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
    # zstd level 3 (not pyarrow's default 1): measured on real delta
    # fragments it is ~20% smaller, encodes at the same speed, and
    # decodes 2× FASTER (fewer bytes to inflate) — a strict win, and
    # written bytes are the binding budget both at 100 TB and when a
    # shared disk is throttled (round-4 finding: the kernel's
    # per-device dirty threshold tracks writeback bandwidth, so write
    # stalls surface INSIDE the fused task)
    pq.write_table(table, tmp, compression="zstd", compression_level=3)
    os.replace(tmp, path)
