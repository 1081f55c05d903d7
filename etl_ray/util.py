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
    """sha256 hex digest per string element (nulls propagate)."""
    return sha256_hex_with_prefix(col)[0]


def sha256_hex_with_prefix(
        col: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, np.ndarray]:
    """(hex digests, uint64 first-8-byte prefixes) per string element.

    sha256 has no vectorized kernel in pyarrow/numpy; this is a Python
    loop by necessity, kept as the *only* per-row loop in the engine and
    used solely for the content-hash invariant + content-addressed
    dedup. It hashes memoryview slices of the Arrow UTF-8 data buffer
    directly — no per-row Python string materialization or re-encode —
    and returns the integer prefix alongside so manifest checksums
    never re-parse hex strings.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    out: list[str | None] = [None] * n
    pre = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return pa.array(out, type=pa.string()), pre
    validity, offs_buf, data = arr.buffers()
    offs = np.frombuffer(offs_buf, dtype=np.int32, count=n + 1,
                         offset=arr.offset * 4)
    mv = memoryview(data)
    if validity is not None and arr.null_count:
        bits = np.unpackbits(
            np.frombuffer(validity, np.uint8), bitorder="little")
        valid = bits[arr.offset:arr.offset + n].astype(bool)
    else:
        valid = np.ones(n, dtype=bool)
    digest = hashlib.sha256
    from_bytes = int.from_bytes
    for i in np.flatnonzero(valid):
        d = digest(mv[offs[i]:offs[i + 1]]).digest()
        out[i] = d.hex()
        pre[i] = from_bytes(d[:8], "big")
    return pa.array(out, type=pa.string()), pre


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


def lww_keep_indices(kh: np.ndarray, lsn: np.ndarray, keys: pa.Array,
                     extra: np.ndarray | None = None
                     ) -> tuple[np.ndarray, bool]:
    """Exact vectorized last-writer-wins keep-set.

    Returns (ascending indices of the max-lsn row per key, mixed_run
    flag). Rows are grouped by the 64-bit key hash ``kh`` (plus the
    optional ``extra`` int grouping, e.g. epoch) and sorted lsn-desc;
    a row is a duplicate only if BOTH its hash-run neighbour's hash AND
    its actual key string match — so a hash collision can never drop a
    distinct key. The pathological interleave (two different keys
    sharing one hash, alternating within the run) under-dedups — extra
    rows are kept, never lost; callers needing exactly-one-row-per-key
    re-run the string-keyed path when ``mixed_run`` is True.
    """
    if extra is None:
        order = np.lexsort((-lsn, kh))
    else:
        order = np.lexsort((-lsn, kh, extra))
    kh_s = kh[order]
    eq = kh_s[1:] == kh_s[:-1]
    if extra is not None:
        ex_s = extra[order]
        eq &= ex_s[1:] == ex_s[:-1]
    eq = np.concatenate([[False], eq])
    if not eq.any():
        return np.sort(order), False
    ks = (keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
          else keys).take(pa.array(order))
    eq_key = np.concatenate([[False], pc.equal(
        ks.slice(1), ks.slice(0, len(ks) - 1)).to_numpy(zero_copy_only=False)])
    dup = eq & eq_key
    mixed = bool((eq & ~eq_key).any())
    return np.sort(order[~dup]), mixed


