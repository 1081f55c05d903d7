"""Per-epoch transaction manifest log — the exactly-once commit point.

Layout (BASELINE.json:6 "per-partition transaction manifests plus
monotonic epoch fencing"; design after the Delta Lake transaction log,
PAPERS.md):

    lake_dir/
      data/pid=<p>/epoch=<k>.parquet    delta files (written first, phase 1)
      _manifests/epoch=<n>.json         commit records (phase 2, atomic)

A manifest records, per partition: the delta file(s), lsn offset range,
row/upsert/delete counts, a checksum (xor of row content-sha256
prefixes) and the partition's new lsn high-watermark — the lineage
record mandated by BASELINE.json:6. The commit is a single
``os.replace`` of a temp file → atomic on POSIX.

Manifest SEQUENCE (the ``epoch=<n>`` in the filename) is decoupled from
the WAL epoch a manifest commits: WAL commits and compaction BASE
manifests share one monotonic log, and every doc carries ``epoch`` (the
WAL epoch it covers — a base carries the last WAL epoch forward) plus
``mode`` (ingest keying: "sorted" pid-keyed / "direct" bucket-keyed)
and, for direct mode, ``num_buckets``. Resume therefore reads
``last_wal_epoch``, never the raw sequence.

Fencing rules:
  * WAL epochs commit in strictly increasing order (monotonic fence);
  * committing an epoch <= the last committed one is a no-op (idempotent
    replay) — never a rewrite;
  * a data file for an uncommitted epoch is invisible to readers (they
    only read files listed in committed manifests), so a crash between
    phase 1 and phase 2 leaves no partial state.
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa

from etl_ray.state import schema as schema_mod
from etl_ray.util import KEY_HASH_VERSION

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"


class EpochFencingError(RuntimeError):
    pass


def _mdir(lake_dir: str) -> str:
    return os.path.join(lake_dir, MANIFEST_DIR)


def manifest_path(lake_dir: str, epoch: int) -> str:
    return os.path.join(_mdir(lake_dir), f"epoch={epoch}.json")


def data_file(lake_dir: str, pid: int, epoch: int) -> str:
    return os.path.join(lake_dir, DATA_DIR, f"pid={pid}", f"epoch={epoch}.parquet")


def committed_epochs(lake_dir: str) -> list[int]:
    d = _mdir(lake_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("epoch=") and name.endswith(".json"):
            out.append(int(name[len("epoch="):-len(".json")]))
    return sorted(out)


def last_committed(lake_dir: str) -> int:
    """Last committed manifest SEQUENCE number (not the WAL epoch)."""
    eps = committed_epochs(lake_dir)
    return eps[-1] if eps else -1


def read_manifest(lake_dir: str, seq: int) -> dict:
    with open(manifest_path(lake_dir, seq)) as f:
        return json.load(f)


def last_manifest(lake_dir: str) -> dict | None:
    last = last_committed(lake_dir)
    return None if last < 0 else read_manifest(lake_dir, last)


def last_wal_epoch(lake_dir: str) -> int:
    """The last WAL epoch applied to the lake (bases carry it forward).
    This — not the manifest sequence — is the replay resume point."""
    man = last_manifest(lake_dir)
    return -1 if man is None else man.get("epoch", -1)


def lake_mode(lake_dir: str) -> str | None:
    """Ingest keying of the lake: "direct" (bucket-keyed fragments) or
    "sorted" (pid-keyed deltas). Reads the recorded ``mode`` field,
    walking back past manifests that predate it or committed an empty
    epoch; falls back to inspecting a partition entry's file key shape.
    A resumed replay must keep the original mode or the broadcast hwm
    index would be misinterpreted."""
    for seq in reversed(committed_epochs(lake_dir)):
        man = read_manifest(lake_dir, seq)
        if man.get("mode"):
            return man["mode"]
        for entry in man["partitions"].values():
            return "direct" if "files" in entry else "sorted"
    return None


def current_schema(lake_dir: str) -> pa.Schema | None:
    """The unified schema as of the last committed epoch."""
    man = last_manifest(lake_dir)
    return None if man is None else schema_mod.from_b64(man["schema_b64"])


def manifest_as_of(lake_dir: str, epoch: int) -> dict | None:
    """The newest committed manifest covering WAL epochs ≤ ``epoch``
    (time-travel anchor: its schema and partitioning are the lake's
    state as of that epoch)."""
    out = None
    for seq in committed_epochs(lake_dir):
        m = read_manifest(lake_dir, seq)
        if m.get("epoch", -1) <= epoch:
            out = m
    return out


def high_watermarks(lake_dir: str) -> dict[int, int]:
    """partition-key → max committed lsn across all committed manifests
    (A3 dedup index). Keys are pids in sorted mode, buckets in direct
    mode — consistent across bases because compaction preserves the
    lake's keying."""
    hwm: dict[int, int] = {}
    for ep in committed_epochs(lake_dir):
        for pid_s, entry in read_manifest(lake_dir, ep)["partitions"].items():
            pid = int(pid_s)
            hwm[pid] = max(hwm.get(pid, -1), entry["hwm"])
    return hwm


def live_file_counts(lake_dir: str) -> dict[int, int]:
    """partition-key → number of distinct data files a reader must
    merge — the read-amplification signal that schedules compaction."""
    return {k: len(dict.fromkeys(fs)) for k, fs in
            visible_entry_files(lake_dir).items() if fs}


def merge_entry_rows(rows: list[dict]) -> dict:
    """Combine several fragment-writer entry rows for one (epoch, key)
    into a single manifest partition entry (files concat, lsn range
    union, count sums, checksum xor)."""
    out = {
        "files": [f for r in rows for f in r["files"]],
        "lsn_min": min((r["lsn_min"] for r in rows if r["lsn_min"] >= 0),
                       default=-1),
        "lsn_max": max(r["lsn_max"] for r in rows),
        "n_events": sum(r["n_events"] for r in rows),
        "n_upserts": sum(r["n_upserts"] for r in rows),
        "n_deletes": sum(r["n_deletes"] for r in rows),
        "n_rows": sum(r["n_rows"] for r in rows),
        "n_quarantined": sum(r["n_quarantined"] for r in rows),
        "hwm": max(r["hwm"] for r in rows),
    }
    checksum = 0
    for r in rows:
        checksum ^= int(r["checksum"], 16)
    out["checksum"] = f"{checksum:016x}"
    return out


def _write_doc(lake_dir: str, seq: int, doc: dict) -> None:
    os.makedirs(_mdir(lake_dir), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=_mdir(lake_dir), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(doc, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, manifest_path(lake_dir, seq))  # atomic commit point


def commit_epoch(lake_dir: str, epoch: int, schema: pa.Schema,
                 partitions: dict[int, dict], num_partitions: int,
                 mode: str = "sorted", num_buckets: int | None = None) -> bool:
    """Phase-2 commit of one WAL epoch. Returns True if committed,
    False if it already was.

    Raises EpochFencingError on out-of-order commits (epoch gaps or a
    stale writer racing ahead of the log).
    """
    last_wal = last_wal_epoch(lake_dir)
    if epoch <= last_wal:
        return False  # idempotent replay of an already-committed epoch
    if epoch != last_wal + 1:
        raise EpochFencingError(
            f"cannot commit epoch {epoch}: last committed is {last_wal} "
            "(epochs are fenced to commit monotonically, no gaps)")
    check_key_hash(lake_dir)
    doc = {
        "epoch": epoch,
        "num_partitions": num_partitions,
        "mode": mode,
        "key_hash_version": KEY_HASH_VERSION,
        "schema_b64": schema_mod.to_b64(schema),
        "partitions": {str(p): e for p, e in sorted(partitions.items())},
    }
    if num_buckets is not None:
        doc["num_buckets"] = num_buckets
    _write_doc(lake_dir, last_committed(lake_dir) + 1, doc)
    return True


def check_key_hash(lake_dir: str) -> None:
    """Partition routing (pid/bucket per key) is persisted in the
    manifest log; mixing manifests written under different key-hash
    functions silently misroutes keys, so refuse loudly. Enforced on
    BOTH sides: commits (commit_epoch / commit_base) and every read
    path that consumes persisted routing — lookup's candidate-bucket
    probe, export's salt-span pruning, partial compaction's target
    closure, and the change feed (defensively; its resolve recomputes
    hashes and is version-independent, but a version-mixed lake is
    already corrupt-adjacent and should fail fast everywhere)."""
    man = last_manifest(lake_dir)
    if man is None:
        return
    ver = man.get("key_hash_version", 1)
    if ver != KEY_HASH_VERSION:
        raise RuntimeError(
            f"lake at {lake_dir} was written with key_hash_version={ver}; "
            f"this build routes keys with version {KEY_HASH_VERSION} — "
            "fully compact/rewrite the lake before extending it")


def commit_base(lake_dir: str, schema: pa.Schema, partitions: dict[int, dict],
                num_partitions: int, mode: str,
                num_buckets: int | None = None,
                partial: bool = False) -> int:
    """Commit a compaction BASE manifest. A full base replaces all
    earlier manifests for readers; a PARTIAL base replaces only the
    visible files of the keys it covers (bucket-subset compaction).
    Carries the last WAL epoch (and the lake's keying mode) forward so
    resume and fencing are unaffected. Returns its sequence."""
    check_key_hash(lake_dir)
    seq = last_committed(lake_dir) + 1
    doc = {
        "epoch": last_wal_epoch(lake_dir),
        "num_partitions": num_partitions,
        "mode": mode,
        "base": True,
        "key_hash_version": KEY_HASH_VERSION,
        "schema_b64": schema_mod.to_b64(schema),
        "partitions": {str(p): e for p, e in sorted(partitions.items())},
    }
    if partial:
        doc["partial"] = True
    if num_buckets is not None:
        doc["num_buckets"] = num_buckets
    _write_doc(lake_dir, seq, doc)
    return seq


def _entry_files(lake_dir: str, entry: dict) -> list[str]:
    if entry["n_rows"] <= 0:
        return []
    # sorted mode: one "file"; direct mode: "files" fragments
    return [os.path.join(lake_dir, rel)
            for rel in entry.get("files") or [entry["file"]]]


def visible_entry_files(lake_dir: str,
                        as_of_epoch: int | None = None
                        ) -> dict[int, list[str]]:
    """Per partition-key lists of data files a reader must merge.

    Replays the manifest log: a FULL base (``base: true``) resets every
    key's visible set to the base's own files; a PARTIAL base
    (``base`` + ``partial: true``, written by bucket-subset compaction)
    resets only the keys it covers; ordinary epoch manifests append.
    ``as_of_epoch`` time-travels by ignoring manifests past that WAL
    epoch (vacuum limits how far back this reaches — pre-base deltas it
    deleted are gone, the Delta/Iceberg VACUUM trade-off).
    """
    manifests = [read_manifest(lake_dir, ep)
                 for ep in committed_epochs(lake_dir)]
    if as_of_epoch is not None:
        manifests = [m for m in manifests
                     if m.get("epoch", -1) <= as_of_epoch]
    by_key: dict[int, list[str]] = {}
    for m in manifests:
        if m.get("base"):
            if m.get("partial"):
                for k_s in m["partitions"]:
                    by_key[int(k_s)] = []
            else:
                by_key = {}
        for k_s, entry in m["partitions"].items():
            by_key.setdefault(int(k_s), []).extend(
                _entry_files(lake_dir, entry))
    return by_key


def committed_files(lake_dir: str,
                    as_of_epoch: int | None = None) -> list[str]:
    """All delta files visible to readers (see visible_entry_files).
    Range fragments are shared by several bucket entries — deduped,
    order-preserving."""
    files = []
    for fs in visible_entry_files(lake_dir, as_of_epoch).values():
        files.extend(fs)
    return list(dict.fromkeys(files))


def change_files(lake_dir: str, from_epoch: int,
                 to_epoch: int) -> list[str]:
    """Delta files carrying the WAL epochs in (from_epoch, to_epoch] —
    the CDC change-feed file set. Base manifests are rewrites, not
    changes, and are skipped."""
    files = []
    for seq in committed_epochs(lake_dir):
        m = read_manifest(lake_dir, seq)
        if m.get("base"):
            continue
        if from_epoch < m.get("epoch", -1) <= to_epoch:
            for entry in m["partitions"].values():
                files.extend(_entry_files(lake_dir, entry))
    files = list(dict.fromkeys(files))
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"change feed for WAL epochs ({from_epoch}, {to_epoch}] needs "
            f"{len(missing)} delta file(s) already reclaimed by vacuum "
            f"after compaction (e.g. {os.path.relpath(missing[0], lake_dir)})"
            " — this history range is no longer reproducible (the "
            "time-travel/VACUUM trade-off documented on read_lake)")
    return files
