"""Shared vectorized helpers: hashing, partition-id routing, table utils.

These run inside ``map_batches`` hot paths, so everything here is either a
pyarrow.compute kernel, a numpy/pandas vectorized call, or (for sha256,
which has no vectorized kernel anywhere in the stack) a tight Python loop
over an Arrow column that is explicitly the per-row invariant hash
mandated by BASELINE.json:2 ("100% sha256 row-equality").
"""

from __future__ import annotations

import binascii
import hashlib
import os

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

# Arrow-pool page-retention tuning. Fresh-page faults are the resource
# this host's guest kernel collapses under at full width (BASELINE.md
# parallel-fault axis) — the multi-tenant-cluster analogue of
# kernel-side memory contention — so the engine keeps batch buffers
# MAPPED between batches instead of re-faulting them.
#
# Two layers, both bounded by each worker's PEAK heap (retention frees
# later / never, it never grows peak):
#
# 1. ETL_RAY_JEMALLOC_DECAY_MS (default 10000, "0" disables): Arrow-
#    jemalloc dirty-page decay. Covers ALLOCATIONS < the jemalloc
#    oversize threshold only — measured (alloc micro + substep audit,
#    round 5): huge-class buffers (the ~100 MB+ string columns a 64k-row
#    gather produces) are purged IMMEDIATELY on free regardless of
#    decay, re-faulting their full size every batch (take_runs alone:
#    0.46 f/ev).
# 2. ETL_RAY_ARROW_POOL=system-retain (default; "jemalloc" restores the
#    old pool): switch the Arrow pool to glibc malloc and, via
#    mallopt, disable heap trim (M_TRIM_THRESHOLD → max) and raise the
#    mmap threshold to 1 GiB so huge column buffers are served from the
#    retained heap instead of fresh mmaps. Measured: repeated 131 MB
#    take() → 0 faults/iter (vs 131 MB/iter under jemalloc, mimalloc,
#    or untuned glibc); full-replay fault volume drops accordingly
#    (tools/fault_audit.py, BASELINE.md round 5). Applied at import so
#    every Ray worker that loads the engine gets it.
_decay_ms = os.environ.get("ETL_RAY_JEMALLOC_DECAY_MS", "10000")
if _decay_ms and _decay_ms != "0":
    try:
        pa.jemalloc_set_decay_ms(int(_decay_ms))
    except (ValueError, NotImplementedError, OSError):
        pass

_pool = os.environ.get("ETL_RAY_ARROW_POOL", "system-retain")
if _pool == "system-retain":
    try:
        import ctypes
        import ctypes.util

        _libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6",
                            use_errno=True)
        # glibc mallopt params: M_TRIM_THRESHOLD=-1, M_MMAP_THRESHOLD=-3,
        # M_ARENA_MAX=-8
        _libc.mallopt(-1, 2**31 - 1)   # never trim the heap top
        _libc.mallopt(-3, 1 << 30)     # mmap only above 1 GiB
        _arena_max = os.environ.get("ETL_RAY_MALLOC_ARENA_MAX")
        if _arena_max and _arena_max.isdigit() and int(_arena_max) > 0:
            # fewer arenas → Arrow's decode threads reuse each other's
            # freed buffers instead of faulting fresh ones per arena
            _libc.mallopt(-8, int(_arena_max))
        pa.set_memory_pool(pa.system_memory_pool())
    except (OSError, AttributeError, ValueError):
        pass  # non-glibc platform: keep the default (jemalloc) pool

# Version tag for the key-hash function (recorded in lake manifests:
# partition routing is persisted, so a lake written under one hash
# version must never be read/extended under another).
#   v1: pandas siphash over per-row Python string objects (round 1-2)
#   v2: polars row hash over Arrow buffers (no per-row Python string
#       materialization — the v1 path built tens of millions of
#       transient PyObjects per bench replay and dominated DRAM traffic)
KEY_HASH_VERSION = 2


def sha256_hex_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """sha256 hex digest per string element (nulls propagate)."""
    return sha256_hex_with_prefix(col)[0]


def as_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """ChunkedArray → contiguous Array WITHOUT the silent full copy that
    ``combine_chunks()`` performs even for a single chunk (measured:
    ~0.5 fresh-page faults/row on 2 KB strings — it invisibly doubled
    the ingest stage's fault volume, the resource this host's guest
    kernel collapses under). Zero-copy for the 0/1-chunk cases every
    map_batches hot path actually sees."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 1:
            return col.chunk(0)
        if col.num_chunks == 0:
            return pa.array([], type=col.type)
        return col.combine_chunks()
    return col


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
    n = len(col)
    if n == 0:
        return pa.array([], type=pa.string()), np.zeros(0, dtype=np.uint64)
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    # Output layout is built VECTORIZED around the per-row digest loop:
    # raw digests land in ONE preallocated bytearray (32 B/row), hex
    # encoding is ONE binascii.hexlify over it, and the Arrow column is
    # assembled zero-copy via StringArray.from_buffers with uniform
    # 64-byte offsets. Input chunks are walked IN PLACE — no
    # combine_chunks (a full data copy even for one chunk). The previous
    # shape (combine + one Python str + hex() per row into a list, then
    # pa.array) allocated ~10× more and measurably dominated the ingest
    # stage's fresh-page fault volume — the per-event fault budget this
    # host's guest kernel collapses under (BASELINE.md round-4
    # parallel-fault axis).
    raw = bytearray(32 * n)
    digest = hashlib.sha256
    valid_all: np.ndarray | None = None
    base = 0
    for arr in chunks:
        m = len(arr)
        if m == 0:
            continue
        validity, offs_buf, data = arr.buffers()
        odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        offs = np.frombuffer(offs_buf, dtype=odt, count=m + 1,
                             offset=arr.offset * odt().itemsize)
        if validity is not None and arr.null_count:
            bits = np.unpackbits(
                np.frombuffer(validity, np.uint8), bitorder="little")
            valid = bits[arr.offset:arr.offset + m].astype(bool)
            if valid_all is None:
                valid_all = np.ones(n, dtype=bool)
            valid_all[base:base + m] = valid
            idx = np.flatnonzero(valid)
        else:
            idx = range(m)
        # data can be None for all-empty-string chunks; the offsets then
        # address zero-length slices of an empty view (sha256(b"") is
        # still a real digest)
        mv = memoryview(data) if data is not None else memoryview(b"")
        for i in idx:
            o = (base + i) << 5
            raw[o:o + 32] = digest(mv[offs[i]:offs[i + 1]]).digest()
        base += m
    pre = np.frombuffer(raw, dtype=">u8").reshape(n, 4)[:, 0] \
        .astype(np.uint64)  # big-endian first-8-bytes, null slots 0
    hexdata = binascii.hexlify(raw)  # lowercase, 64 chars per row
    out_offs = np.arange(0, 64 * (n + 1), 64, dtype=np.int32)
    if valid_all is not None:
        vbuf = pa.py_buffer(np.packbits(valid_all, bitorder="little"))
        null_count = int(n - valid_all.sum())
    else:
        vbuf, null_count = None, 0
    out = pa.Array.from_buffers(
        pa.utf8(), n,
        [vbuf, pa.py_buffer(out_offs), pa.py_buffer(hexdata)],
        null_count=null_count)
    return out, pre


def take_runs(t: pa.Table, indices: np.ndarray) -> pa.Table:
    """Row gather WITHOUT the full-table chunk concatenation that
    ``pa.Table.take`` performs on multi-chunk input (measured on the
    ingest: take on an 11-chunk 2 KB/row batch faulted ~3.2× the output
    bytes — the single largest fresh-page fault source in the engine).

    Splits ``indices`` into maximal runs that stay inside one chunk,
    takes each run from its chunk alone, and reassembles zero-copy with
    ``Table.from_batches`` — total allocation is exactly the output
    rows. Falls back to plain ``take`` for single-chunk tables and for
    pathologically interleaved index orders where per-run overhead
    would dominate (ingest gathers are lsn-run-ordered, so runs ≈
    chunks × output groups in practice)."""
    idx = np.asarray(indices, dtype=np.int64)
    if len(idx) == 0:
        return t.schema.empty_table()
    # zero-length batches would alias a cumsum boundary and misroute
    # searchsorted hits into an empty batch
    batches = [b for b in t.to_batches() if len(b)]
    if len(batches) <= 1:
        return t.take(pa.array(idx))
    starts = np.zeros(len(batches) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in batches], out=starts[1:])
    cid = np.searchsorted(starts, idx, side="right") - 1
    cuts = np.flatnonzero(np.diff(cid)) + 1
    if len(cuts) + 1 > max(256, len(idx) // 16):
        return t.take(pa.array(idx))  # interleaved: one concat is cheaper
    pieces = []
    for s, e in zip(np.concatenate(([0], cuts)),
                    np.concatenate((cuts, [len(idx)]))):
        c = int(cid[s])
        pieces.append(batches[c].take(pa.array(idx[s:e] - starts[c])))
    return pa.Table.from_batches(pieces, schema=t.schema)


def hash64_str(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of one column.

    Runs at Arrow-buffer level (polars' native row hash, fixed seed) —
    no per-row Python object materialization. Stable across processes
    and across resume for a fixed polars version (verified by test);
    any value change must bump KEY_HASH_VERSION because partition
    routing is persisted in lake manifests.
    """
    col = as_array(col)
    return pl.from_arrow(col).hash(seed=0).to_numpy().astype(np.uint64)


def key_hash64(tbl: pa.Table, cols: list[str]) -> np.ndarray:
    """Deterministic 64-bit hash of a multi-column key, buffer-level.

    Hashes the columns TOGETHER (polars ``hash_rows``) — no
    intermediate concatenated string column is ever built, which
    halves the string-allocation traffic of the ingest hot path.
    """
    return (pl.from_arrow(tbl.select(cols)).hash_rows(seed=0)
            .to_numpy().astype(np.uint64))


def rolling_poly(flat: np.ndarray, lengths: np.ndarray, width: int,
                 base: np.uint64) -> tuple[np.ndarray, np.ndarray]:
    """Polynomial hash of every ``width``-window within each segment of
    a flattened uint64 stream — the shared kernel behind shingling
    (dedup) and winnowing fingerprints (textops), with NO per-segment
    Python loop (VERDICT r2 #7).

    ``flat`` is the concatenation of per-row token hashes; ``lengths``
    the per-row token counts. A segment of n >= width tokens yields its
    n-width+1 sliding windows, each hashed sum(h_j * base^(width-1-j))
    (uint64 wraparound, exactly the arithmetic of the per-doc loops
    this replaces); a shorter segment yields ONE value, the polynomial
    over its full length. Returns (values, counts) with values
    segment-major in window order and counts[i] the window count of
    segment i (always >= 1 for non-empty lengths).

    Vectorization: one global sliding_window_view over the whole
    stream, then a gather of the per-segment window start positions
    built with repeat/cumsum offset arithmetic; sub-width segments are
    grouped by length (< width distinct lengths) and batched.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    n_seg = len(lengths)
    weights = base ** np.arange(width - 1, -1, -1, dtype=np.uint64)
    offs = np.concatenate([[0], np.cumsum(lengths)])
    counts = np.maximum(lengths - width + 1, 1)
    out_offs = np.concatenate([[0], np.cumsum(counts)])
    out = np.zeros(int(out_offs[-1]), dtype=np.uint64)
    if n_seg == 0:
        return out, counts
    big = lengths >= width
    if big.any():
        win = np.lib.stride_tricks.sliding_window_view(flat, width)
        allv = (win * weights).sum(axis=1, dtype=np.uint64)
        cb = counts[big]
        within = (np.arange(int(cb.sum()), dtype=np.int64)
                  - np.repeat(np.concatenate([[0], np.cumsum(cb)])[:-1], cb))
        src = np.repeat(offs[:-1][big], cb) + within
        dst = np.repeat(out_offs[:-1][big], cb) + within
        out[dst] = allv[src]
    small = ~big
    if small.any():
        for ln in np.unique(lengths[small]):  # < width iterations
            m = small & (lengths == ln)
            if ln == 0:
                continue  # empty token list: fingerprint 0
            idx = offs[:-1][m][:, None] + np.arange(ln)
            out[out_offs[:-1][m]] = (
                flat[idx] * weights[-ln:]).sum(axis=1, dtype=np.uint64)
    return out, counts


def segment_unique(values: np.ndarray,
                   counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment sorted-unique of a segment-major uint64 stream,
    fully vectorized (lexsort + adjacent-dedupe) — equivalent to
    np.unique per segment without the per-segment loop."""
    seg = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    order = np.lexsort((values, seg))
    sv, ss = values[order], seg[order]
    keep = np.ones(len(sv), dtype=bool)
    if len(sv) > 1:
        keep[1:] = (sv[1:] != sv[:-1]) | (ss[1:] != ss[:-1])
    return sv[keep], np.bincount(
        ss[keep], minlength=len(counts)).astype(np.int64)


def embedding_matrix(col: pa.ChunkedArray | pa.Array,
                     dtype=np.float64) -> np.ndarray:
    """(rows, dim) matrix from a ``list<float>`` column, zero-copy.

    Arrow list arrays store one flat values buffer plus offsets;
    ``flatten()`` exposes the logical values (slice-safe) and
    ``to_numpy`` views the buffer without copying. The only copy is the
    final float32→float64 widen the math needs. The ``to_pylist()``
    path this replaces materialized O(rows × dim) Python floats per
    block (VERDICT r2 "What's wrong" #2).

    Embedding columns are non-null and uniform-length by construction;
    raises on either violation rather than mis-reshaping.
    """
    arr = as_array(col)
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if arr.null_count:
        raise ValueError("embedding column has nulls")
    lens = pc.list_value_length(arr).to_numpy()
    dim = int(lens[0])
    if not (lens == dim).all():
        raise ValueError("ragged embedding column")
    vals = arr.flatten().to_numpy(zero_copy_only=True)
    M = vals.reshape(n, dim)
    return M if M.dtype == dtype else M.astype(dtype)


def add_pid_column(tbl: pa.Table, key_cols: list[str], num_partitions: int,
                   pid_col: str = "pid") -> pa.Table:
    """Append a stable hash-partition id column ``pid = h64(key) % P``."""
    pid = (key_hash64(tbl, key_cols)
           % np.uint64(num_partitions)).astype(np.int32)
    return tbl.append_column(pid_col, pa.array(pid, type=pa.int32()))


def lww_keep_indices(kh: np.ndarray, lsn: np.ndarray,
                     keys: pa.Table | pa.Array,
                     extra: np.ndarray | None = None
                     ) -> tuple[np.ndarray, bool]:
    """Exact vectorized last-writer-wins keep-set.

    Returns (ascending indices of the max-lsn row per key, mixed_run
    flag). Rows are grouped by the 64-bit key hash ``kh`` (plus the
    optional ``extra`` int grouping, e.g. epoch) and sorted lsn-desc;
    a row is a duplicate only if BOTH its hash-run neighbour's hash AND
    its actual key match — so a hash collision can never drop a
    distinct key. ``keys`` is the key columns as a Table (compared
    per-column on hash-adjacent rows only — no concatenated key string
    is ever built) or a single Array. The pathological interleave (two
    different keys sharing one hash, alternating within the run)
    under-dedups — extra rows are kept, never lost; callers needing
    exactly-one-row-per-key re-run the string-keyed path when
    ``mixed_run`` is True.
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
    cols = (keys.columns if isinstance(keys, pa.Table) else [keys])
    ord_arr = pa.array(order)
    eq_key: np.ndarray | None = None
    for c in cols:
        cs = as_array(c).take(ord_arr)
        e = pc.fill_null(pc.equal(cs.slice(1), cs.slice(0, len(cs) - 1)),
                         False).to_numpy(zero_copy_only=False)
        eq_key = e if eq_key is None else (eq_key & e)
    eq_key = np.concatenate([[False], eq_key])
    dup = eq & eq_key
    mixed = bool((eq & ~eq_key).any())
    return np.sort(order[~dup]), mixed


