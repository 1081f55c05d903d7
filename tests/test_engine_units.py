"""Unit tests for engine internals: hot-key salting, audit/quarantine
routing, the Step/Pipeline extension surface, and partition-id
determinism."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_ray.state.merge import SALT_THRESHOLD, prepare_events


def _wal_table(rows):
    cols = {
        "lsn": pa.int64(), "epoch": pa.int32(), "op": pa.string(),
        "repo": pa.string(), "path": pa.string(), "commit": pa.string(),
        "lang": pa.string(), "content": pa.string(), "size": pa.int64(),
    }
    return pa.table({c: pa.array([r.get(c) for r in rows], t)
                     for c, t in cols.items()})


def _ev(lsn, op="I", repo="org0/repo0", path="src/a.py", content="x = 1"):
    return {"lsn": lsn, "epoch": 0, "op": op, "repo": repo, "path": path,
            "commit": f"c{lsn}", "lang": "py", "content": content,
            "size": 5}


def test_hot_key_salting_spreads_partitions():
    """A key with > SALT_THRESHOLD events in one batch is salted across
    several partitions; cold keys stay on exactly one."""
    hot = [_ev(i) for i in range(SALT_THRESHOLD + 100)]
    cold = [_ev(10_000_000 + i, path=f"src/cold_{i % 3}.py") for i in range(30)]
    t = prepare_events(64)(_wal_table(hot + cold))
    pid = t["pid"].to_numpy()
    is_hot = np.array([p == "src/a.py" for p in t["path"].to_pylist()])
    assert len(np.unique(pid[is_hot])) > 1        # hot key split
    for i in range(3):
        m = np.array([p == f"src/cold_{i}.py" for p in t["path"].to_pylist()])
        assert len(np.unique(pid[m])) == 1        # cold keys unsalted


def test_prepare_events_audit_flags():
    rows = [
        _ev(1),                                    # good insert
        _ev(2, op="X"),                            # bad op
        _ev(3, repo=None),                         # null key
        {**_ev(4), "content": None},               # insert without content
        {**_ev(5, op="D"), "content": None,
         "commit": None, "lang": None, "size": None},  # delete: ok w/o content
    ]
    t = prepare_events(8)(_wal_table(rows))
    assert t["audit_ok"].to_pylist() == [True, False, False, False, True]
    reasons = t["audit_reason"].to_pylist()
    assert reasons[0] is None and reasons[1] == "audit_failed"


def test_expr_helpers_match_duckdb_scalars():
    """Direct DuckDB-equivalence sweep over the expr helpers no
    registered query exercises (power/exp/coalesce/starts_with/
    contains/list ops/floor/epoch_seconds)."""
    import duckdb

    from etl_ray.functions import expr

    con = duckdb.connect()
    s = pa.array(["alpha", "Beta", None, "gamma ray"])
    nums = pa.array([1.5, -2.25, 0.0, 9.0])
    lists = pa.array([[1, 2, 3], [], [5], [7, 8]],
                     pa.list_(pa.int64()))
    ts = pa.array([1_700_000_000_000_000, 0, 86_400_000_000, None],
                  pa.timestamp("us"))

    def sql1(e, **kw):
        return con.execute(f"SELECT {e}", kw or None).fetchone()[0]

    assert expr.power(nums, 2).to_pylist() == \
        [sql1(f"pow({v!r}, 2)") for v in nums.to_pylist()]
    assert expr.exp(pa.array([0.0, 1.0])).to_pylist() == \
        [sql1("exp(0.0)"), sql1("exp(1.0)")]
    assert expr.floor(nums).to_pylist() == \
        [sql1(f"floor({v!r})") for v in nums.to_pylist()]
    assert expr.coalesce(s, pa.array(["x"] * 4)).to_pylist() == \
        ["alpha", "Beta", "x", "gamma ray"]
    assert expr.starts_with(s, "al").to_pylist() == \
        [True, False, None, False]
    assert expr.contains(s, "a ").to_pylist() == [False, False, None, True]
    assert expr.list_len(lists).to_pylist() == [3, 0, 1, 2]
    assert expr.list_get(lists, 0).to_pylist() == [1, None, 5, 7]
    assert expr.list_flatten(lists).to_pylist() == [1, 2, 3, 5, 7, 8]
    assert expr.split_ws(pa.array(["a  b c", "x"])).to_pylist() == \
        [["a", "b", "c"], ["x"]]
    # epoch seconds matches DuckDB epoch() on a concrete timestamp
    got = expr.epoch_seconds(ts).to_pylist()
    assert got[0] == 1_700_000_000 and got[1] == 0 and got[2] == 86_400
    assert got[3] is None
    assert expr.substr(pa.array(["abcdef"]), 2, 3).to_pylist() == \
        [sql1("substr('abcdef', 2, 3)")]


def test_orc_datasource_streams_stripes(tmp_path, ray_session):
    """The custom ORC datasource must stream one block per stripe and
    round-trip values exactly."""
    from pyarrow import orc

    from etl_ray.sources.orc import read_orc

    t = pa.table({"x": pa.array(range(10_000), pa.int64()),
                  "s": pa.array([f"v{i}" for i in range(10_000)])})
    path = str(tmp_path / "multi.orc")
    orc.write_table(t, path, stripe_size=16 * 1024)  # force many stripes
    assert orc.ORCFile(path).nstripes > 1
    ds = read_orc(path)
    back = ds.to_pandas().sort_values("x").reset_index(drop=True)
    assert list(back.x) == list(range(10_000))
    assert back.s.iloc[123] == "v123"
    # block count reflects stripe streaming, not whole-file reads
    assert ds.materialize().num_blocks() > 1


def test_quarantine_routing_and_lineage(tmp_path, ray_session):
    """Bad events are quarantined (counted, side-filed), good events land
    in the lake — across both ingest modes."""
    from etl_ray.pipelines.cdc import replay
    from etl_ray.state.lake import read_lake
    from etl_ray.state.lineage import lineage_table

    rows = ([_ev(i, path=f"src/f{i}.py") for i in range(20)]
            + [_ev(100 + i, op="X", path=f"src/bad{i}.py") for i in range(5)])
    for mode in ("direct", "sorted"):
        wal = str(tmp_path / mode / "wal")
        os.makedirs(f"{wal}/epoch=0")
        pq.write_table(_wal_table(rows), f"{wal}/epoch=0/part-0.parquet")
        lake = str(tmp_path / mode / "lake")
        replay(wal, lake, 1, num_partitions=8, mode=mode)
        assert read_lake(lake).count() == 20
        lin = lineage_table(lake).to_pandas()
        assert lin["n_quarantined"].sum() == 5
        qdir = os.path.join(lake, "_quarantine")
        assert any(f.endswith(".parquet")
                   for _, _, fs in os.walk(qdir) for f in fs)


def test_step_pipeline_compose(ray_session):
    import pyarrow.compute as pc

    import ray.data
    from etl_ray.pipelines.steps import (FilterStep, MapBatchesStep,
                                         Pipeline, SelectStep)

    ds = ray.data.range(100).map_batches(
        lambda t: pa.table({"x": t["id"]}), batch_format="pyarrow")
    pipe = Pipeline([
        MapBatchesStep("double", lambda t: t.append_column(
            "y", pc.multiply(t["x"], 2))),
        FilterStep("big", lambda t: pc.greater(t["y"], 100)),
        SelectStep(["y"]),
    ])
    out = pipe(ds).take_all()
    assert sorted(r["y"] for r in out) == list(range(102, 200, 2))
    with pytest.raises(TypeError):
        Pipeline([lambda ds: ds])  # bare callables are not Steps


def test_pid_routing_stable_across_processes():
    """hash64_str / key_hash64 must be process-stable (manifest-recorded
    partition ownership depends on them). Golden constants pin the
    polars row-hash values: if a library upgrade changes them,
    KEY_HASH_VERSION must be bumped (manifest.py fences mixed lakes)."""
    from etl_ray.util import hash64_str, key_hash64

    arr = pa.array(["org0/repo0\x00src/a.py", "b", "c"])
    h = hash64_str(arr)
    assert h.dtype == np.uint64
    assert list(h) == [8268208477124168340, 1337274829852096493,
                       10257678464519005255]
    t = pa.table({"repo": pa.array(["org0/repo0", "org1/r", "x"]),
                  "path": pa.array(["src/a.py", "lib/b.rs", "y"])})
    assert list(key_hash64(t, ["repo", "path"])) == [
        16257734406611662070, 12533470933925625283, 11312593743846405611]


def test_embedding_matrix_zero_copy_equivalence():
    """embedding_matrix must equal the to_pylist path it replaced, on
    plain, chunked, and SLICED list arrays (slice offsets are the
    classic raw-.values bug), and refuse ragged/null columns."""
    from etl_ray.util import embedding_matrix

    rows = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0],
            [7.0, 8.0, 9.0], [0.5, -1.5, 2.5]]
    arr = pa.array(rows, type=pa.list_(pa.float32()))
    expect = np.array(rows, dtype=np.float64).astype(np.float32)
    got = embedding_matrix(arr)
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, expect.astype(np.float64))

    sliced = arr.slice(1, 2)
    np.testing.assert_array_equal(
        embedding_matrix(sliced),
        expect[1:3].astype(np.float64))

    chunked = pa.chunked_array([arr.slice(0, 2), arr.slice(2, 2)])
    np.testing.assert_array_equal(
        embedding_matrix(chunked), expect.astype(np.float64))

    assert embedding_matrix(pa.array([], pa.list_(pa.float32()))).size == 0

    with pytest.raises(ValueError):
        embedding_matrix(pa.array([[1.0], [1.0, 2.0]],
                                  type=pa.list_(pa.float32())))
    with pytest.raises(ValueError):
        embedding_matrix(pa.array([[1.0, 2.0], None],
                                  type=pa.list_(pa.float32())))


def test_rolling_poly_matches_naive_reference():
    """rolling_poly/segment_unique must reproduce the per-doc loops
    they replaced (same uint64 wraparound arithmetic), across window
    edge cases: n<k, n==k, n>k, and many segments."""
    from etl_ray.util import rolling_poly, segment_unique

    rng = np.random.RandomState(7)
    base = np.uint64(1099511628211)
    for width in (3, 4):
        weights = base ** np.arange(width - 1, -1, -1, dtype=np.uint64)
        lengths = rng.randint(1, 12, size=200)
        flat = rng.randint(0, 2**63, size=int(lengths.sum()),
                           dtype=np.uint64)
        # naive reference (the pre-r3 per-doc loop)
        ref_vals, ref_counts = [], []
        pos = 0
        for n in lengths:
            h = flat[pos:pos + n]
            pos += n
            if n < width:
                acc = np.uint64(0)
                for v in h:
                    acc = acc * base + v
                ref_vals.append(np.array([acc], dtype=np.uint64))
            else:
                win = np.lib.stride_tricks.sliding_window_view(h, width)
                ref_vals.append((win * weights).sum(
                    axis=1, dtype=np.uint64))
            ref_counts.append(len(ref_vals[-1]))
        got_vals, got_counts = rolling_poly(flat, lengths, width, base)
        np.testing.assert_array_equal(got_counts, ref_counts)
        np.testing.assert_array_equal(got_vals, np.concatenate(ref_vals))

        # segment_unique == np.unique per segment
        gu_vals, gu_counts = segment_unique(got_vals, got_counts)
        exp = [np.unique(v) for v in ref_vals]
        np.testing.assert_array_equal(gu_counts, [len(e) for e in exp])
        np.testing.assert_array_equal(gu_vals, np.concatenate(exp))

    # degenerate: no segments at all
    v, c = rolling_poly(np.empty(0, np.uint64), np.empty(0, np.int64),
                        3, base)
    assert len(v) == 0 and len(c) == 0


def test_task_cpus_reservation_widths(monkeypatch):
    """cdc._task_cpus reserves ceil(cpus/8) slots at every level: the
    effective task width floor(cpus / task_cpus) must be exactly
    cpus - max(1, cpus//8) (32→28, 16→14, 8→7, 4→3), with no float
    rounding losing an extra slot."""
    import math

    import ray as ray_mod

    from etl_ray.pipelines import cdc

    monkeypatch.delenv("ETL_RAY_CDC_TASK_CPUS", raising=False)
    for cpus, want_width in ((1, 1), (2, 1), (3, 2), (4, 3), (8, 7),
                             (16, 14), (32, 28), (64, 56), (256, 224)):
        monkeypatch.setattr(ray_mod, "cluster_resources",
                            lambda c=cpus: {"CPU": float(c)})
        tc = cdc._task_cpus()
        assert tc >= 1.0
        assert math.floor(cpus / tc) == want_width, (cpus, tc)
    # env override wins (read at call time) and allows full width
    monkeypatch.setenv("ETL_RAY_CDC_TASK_CPUS", "1.0")
    assert cdc._task_cpus() == 1.0
    # malformed override falls back to the derived reservation
    monkeypatch.setenv("ETL_RAY_CDC_TASK_CPUS", "fast")
    monkeypatch.setattr(ray_mod, "cluster_resources",
                        lambda: {"CPU": 32.0})
    assert math.floor(32 / cdc._task_cpus()) == 28


def test_take_runs_matches_table_take_across_layouts():
    """util.take_runs == Table.take for every chunk layout / index order
    (it exists to avoid take's full-chunk concatenation, measured at
    3.2× the output bytes in fresh-page faults on the ingest)."""
    from etl_ray.util import take_runs

    rng = np.random.default_rng(11)
    t = pa.table({"a": pa.array(np.arange(200)),
                  "s": pa.array([f"v{i}" * (i % 5) for i in range(200)]),
                  "f": pa.array(rng.normal(size=200))})
    layouts = [
        t,                                                   # single chunk
        pa.concat_tables([t.slice(0, 50), t.slice(50, 150)]),
        pa.concat_tables([t.slice(0, 7), t.slice(7, 0),      # empty chunk
                          t.slice(7, 100), t.slice(107, 93)]),
    ]
    idxs = [np.array([], dtype=np.int64), np.arange(200),
            np.arange(0, 200, 7), rng.permutation(200),
            np.array([199, 0, 50, 49]), np.repeat([13, 60], 3)]
    for tm in layouts:
        for idx in idxs:
            exp = tm.take(pa.array(idx.astype(np.int64))).to_pylist()
            assert take_runs(tm, idx).to_pylist() == exp


def test_sha256_hex_chunked_nulls_and_empties():
    """Chunk-aware vectorized sha: identical digests/prefixes to
    hashlib over any chunk layout, incl. nulls, empty strings,
    all-empty chunks, slices, and large_string."""
    import hashlib

    from etl_ray.util import sha256_hex_with_prefix

    vals = ["hello", None, "", "x" * 3000, "world", None, "y"]
    exp = [hashlib.sha256(v.encode()).hexdigest() if v is not None
           else None for v in vals]
    exp_pre = [int.from_bytes(bytes.fromhex(e[:16]), "big") if e else 0
               for e in exp]
    variants = [
        pa.array(vals),
        pa.chunked_array([pa.array(vals[:2]), pa.array(vals[2:5]),
                          pa.array(vals[5:]), pa.array([], pa.string())]),
        pa.array(vals, pa.large_string()),
    ]
    for col in variants:
        sha, pre = sha256_hex_with_prefix(col)
        assert sha.to_pylist() == exp
        assert pre.tolist() == exp_pre
    sl = pa.array(vals).slice(1, 5)
    sha, pre = sha256_hex_with_prefix(sl)
    assert sha.to_pylist() == exp[1:6]
    sha, _ = sha256_hex_with_prefix(pa.chunked_array([pa.array(["", ""])]))
    assert sha.to_pylist() == [hashlib.sha256(b"").hexdigest()] * 2
    sha, pre = sha256_hex_with_prefix(pa.array([], pa.string()))
    assert len(sha) == 0 and len(pre) == 0
