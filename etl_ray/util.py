"""Shared vectorized helpers: hashing, partition-id routing, table utils.

These run inside ``map_batches`` hot paths, so everything here is either a
pyarrow.compute kernel, a numpy/pandas vectorized call, or (for sha256,
which has no vectorized kernel anywhere in the stack) a tight Python loop
over an Arrow column that is explicitly the per-row invariant hash
mandated by BASELINE.json:2 ("100% sha256 row-equality").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Separator that cannot appear in repo/path values (they are printable).
_KEY_SEP = "\x00"


def sha256_hex_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """sha256 hex digest per string element (nulls propagate).

    sha256 has no vectorized kernel in pyarrow/numpy; this is a Python
    loop by necessity, kept as the *only* per-row loop in the engine and
    used solely for the content-hash invariant + content-addressed dedup.
    """
    out: list[str | None] = []
    digest = hashlib.sha256
    for s in col.to_pylist():
        out.append(None if s is None else digest(s.encode("utf-8")).hexdigest())
    return pa.array(out, type=pa.string())


def hash64_str(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string column.

    Uses pandas' siphash (C-vectorized, fixed default key, independent of
    PYTHONHASHSEED) so partition routing is stable across processes and
    across resume — required for manifest-recorded partition ownership.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = np.asarray(col.to_pandas(), dtype=object)
    # categorize=False is required for value-determinism: pandas 2.2's
    # categorize fast path hashes the *dictionary* representation and
    # yields different digests for the same value in different arrays.
    return pd.util.hash_array(arr, categorize=False)


def key_concat(tbl: pa.Table, cols: list[str]) -> pa.Array:
    """NUL-joined concatenation of key columns (vectorized)."""
    arrays = [pc.cast(tbl[c], pa.string()) for c in cols]
    if len(arrays) == 1:
        return arrays[0].combine_chunks() if isinstance(arrays[0], pa.ChunkedArray) else arrays[0]
    return pc.binary_join_element_wise(*arrays, _KEY_SEP)


def add_pid_column(tbl: pa.Table, key_cols: list[str], num_partitions: int,
                   pid_col: str = "pid") -> pa.Table:
    """Append a stable hash-partition id column ``pid = h64(key) % P``."""
    keys = key_concat(tbl, key_cols)
    pid = (hash64_str(keys) % np.uint64(num_partitions)).astype(np.int32)
    return tbl.append_column(pid_col, pa.array(pid, type=pa.int32()))


def ensure_table(batch) -> pa.Table:
    """Coerce a map_batches input to pyarrow.Table (defensive)."""
    if isinstance(batch, pa.Table):
        return batch
    return pa.Table.from_pydict(batch)
