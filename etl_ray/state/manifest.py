"""Per-epoch transaction manifest log — the exactly-once commit point.

Layout (BASELINE.json:6 "per-partition transaction manifests plus
monotonic epoch fencing"; design after the Delta Lake transaction log,
PAPERS.md):

    lake_dir/
      data/pid=<p>/epoch=<k>.parquet    delta files (written first, phase 1)
      _manifests/epoch=<k>.json         commit records (phase 2, atomic)

A manifest records, per partition: the delta file, lsn offset range,
row/upsert/delete counts, a checksum (xor of row content-sha256
prefixes) and the partition's new lsn high-watermark — the lineage
record mandated by BASELINE.json:6. The commit is a single
``os.replace`` of a temp file → atomic on POSIX.

Fencing rules:
  * epochs commit in strictly increasing order (monotonic epoch fence);
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
    eps = committed_epochs(lake_dir)
    return eps[-1] if eps else -1


def read_manifest(lake_dir: str, epoch: int) -> dict:
    with open(manifest_path(lake_dir, epoch)) as f:
        return json.load(f)


def current_schema(lake_dir: str) -> pa.Schema | None:
    """The unified schema as of the last committed epoch."""
    last = last_committed(lake_dir)
    if last < 0:
        return None
    return schema_mod.from_b64(read_manifest(lake_dir, last)["schema_b64"])


def high_watermarks(lake_dir: str) -> dict[int, int]:
    """pid → max committed lsn across all committed epochs (A3 dedup index)."""
    hwm: dict[int, int] = {}
    for ep in committed_epochs(lake_dir):
        for pid_s, entry in read_manifest(lake_dir, ep)["partitions"].items():
            pid = int(pid_s)
            hwm[pid] = max(hwm.get(pid, -1), entry["hwm"])
    return hwm


def commit_epoch(lake_dir: str, epoch: int, schema: pa.Schema,
                 partitions: dict[int, dict], num_partitions: int) -> bool:
    """Phase-2 commit. Returns True if committed, False if already was.

    Raises EpochFencingError on out-of-order commits (epoch gaps or a
    stale writer racing ahead of the log).
    """
    last = last_committed(lake_dir)
    if epoch <= last:
        return False  # idempotent replay of an already-committed epoch
    if epoch != last + 1:
        raise EpochFencingError(
            f"cannot commit epoch {epoch}: last committed is {last} "
            "(epochs are fenced to commit monotonically, no gaps)")
    os.makedirs(_mdir(lake_dir), exist_ok=True)
    doc = {
        "epoch": epoch,
        "num_partitions": num_partitions,
        "schema_b64": schema_mod.to_b64(schema),
        "partitions": {str(p): e for p, e in sorted(partitions.items())},
    }
    fd, tmp = tempfile.mkstemp(dir=_mdir(lake_dir), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(doc, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, manifest_path(lake_dir, epoch))  # atomic commit point
    return True


def committed_files(lake_dir: str) -> list[str]:
    """All delta files visible to readers (listed in committed manifests).

    A manifest with ``base: true`` (written by compaction) replaces all
    earlier epochs — readers start from the most recent base.
    """
    epochs = committed_epochs(lake_dir)
    manifests = [read_manifest(lake_dir, ep) for ep in epochs]
    start = 0
    for i, m in enumerate(manifests):
        if m.get("base"):
            start = i
    files = []
    for m in manifests[start:]:
        for entry in m["partitions"].values():
            if entry["n_rows"] > 0:
                # sorted mode: one "file"; direct mode: "files" fragments
                for rel in entry.get("files") or [entry["file"]]:
                    files.append(os.path.join(lake_dir, rel))
    return files
