"""Advanced / composite operators: as-of join, windowed analytics,
statistical aggregates, set ops, sampling, staging sink round-trip.

These cover the SURVEY §2 rows that compose several primitives — each
documents its partitioning assumption where it has one.
"""

from __future__ import annotations

import hashlib
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count, Max, Min, Std

from etl_ray.pipelines._qutil import fixed_point, join_partitions, read
from etl_ray.pipelines.queries import register

# ------------------------------------------------------------- as-of join


@register(
    "asof_join",
    """WITH rates AS (
           SELECT DISTINCT date_trunc('hour', ts) AS rts,
                  CAST(epoch(date_trunc('hour', ts)) % 97 AS BIGINT) AS rate
           FROM events WHERE hour(ts) % 3 = 0
       )
       SELECT e.event_id, r.rate
       FROM events e ASOF JOIN rates r ON e.ts >= r.rts""",
)
def asof_join(sf_dir: str):
    """As-of (backward) join of the event stream against a sparse,
    time-ordered rate table.

    Partitioning assumption: the small side (rates) is broadcast sorted
    (ray.put once); each batch resolves its as-of match with one
    np.searchsorted — no shuffle. The rates table is DERIVED
    DISTRIBUTED (per-block distinct hour marks → tiny driver distinct
    over ≤ blocks × span-hours rows — never a driver read of the fact
    table's full ts column). A large-large as-of join buckets both
    sides by time range instead: see asof_join_partitioned.
    """
    ds = read(sf_dir, "events", ["event_id", "ts"])

    def _marks(t: pa.Table) -> pa.Table:
        hours = pc.unique(pc.floor_temporal(t["ts"], unit="hour")
                          .combine_chunks())
        hod = pc.hour(hours)
        keep = hours.filter(pc.equal(pc.subtract(hod, pc.multiply(
            pc.divide(hod, 3), 3)), 0))  # hour(ts) % 3 == 0
        return pa.table({"rts_us": keep.cast(pa.int64())})

    mark_rows = ds.map_batches(_marks, batch_format="pyarrow").take_all()
    marks_us = np.unique(np.array([r["rts_us"] for r in mark_rows],
                                  np.int64))
    rate = (marks_us // 10**6) % 97  # epoch-seconds % 97
    ref = ray.put((marks_us, rate))

    def _probe(t: pa.Table) -> pa.Table:
        marks_us, rates = ray.get(ref)
        ts = t["ts"].cast(pa.int64()).to_numpy()
        idx = np.searchsorted(marks_us, ts, side="right") - 1
        ok = idx >= 0  # events before the first mark have no match (inner)
        return pa.table({
            "event_id": t["event_id"].take(pa.array(np.flatnonzero(ok))),
            "rate": pa.array(rates[idx[ok]], pa.int64()),
        })

    return ds.map_batches(_probe, batch_format="pyarrow")


def asof_join_partitioned(sf_dir: str, n_buckets: int = 8):
    """LARGE-LARGE as-of join: the bucketed variant the broadcast
    `asof_join` docstring promises (unregistered; equality with the
    broadcast/oracle result is pinned in tests).

    Both sides are bucketed by fixed event-time ranges; each bucket
    additionally receives the CARRY-IN mark (the latest rate at or
    before its start — per-bucket maxima are a tiny groupby, the
    forward-fill over B bucket boundaries is driver-side on B rows), so
    every bucket resolves its as-of matches locally with one
    `merge_asof` per group. Shuffle key = the time bucket; neither side
    is broadcast or materialized whole.
    """
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min

    ev = read(sf_dir, "events", ["event_id", "ts"])
    b = ev.aggregate(_Min("ts", alias_name="lo"), _Max("ts", alias_name="hi"))
    lo = pd.Timestamp(b["lo"]).value
    hi = pd.Timestamp(b["hi"]).value
    edges = np.array([lo + (hi - lo + 1) * i // n_buckets
                      for i in range(n_buckets + 1)], dtype=np.int64)

    unit_mult = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}

    def _ns(col) -> np.ndarray:
        unit = col.type.unit
        return col.cast(pa.int64()).to_numpy() * unit_mult[unit]

    # the "rates" side, derived exactly like the registered asof_join
    # (hour marks where hour % 3 == 0) but kept DISTRIBUTED
    def _marks(t: pa.Table) -> pa.Table:
        hours = pc.floor_temporal(t["ts"], unit="hour")
        hours = pc.unique(hours.combine_chunks())
        hod = pc.hour(hours)
        keep = hours.filter(pc.equal(
            pc.subtract(hod, pc.multiply(pc.divide(hod, 3), 3)), 0))
        ns = _ns(keep)
        return pa.table({"rts_ns": pa.array(np.unique(ns)),
                         "rate": pa.array((np.unique(ns) // 10**9) % 97)})

    rates = (ev.map_batches(_marks, batch_format="pyarrow")
             .groupby("rts_ns").aggregate(_Max("rate", alias_name="rate")))

    # carry-in per bucket: latest mark at-or-before each bucket start —
    # per-bucket maxima (tiny) + driver-side forward fill over B rows
    def _bucket_of(ns: np.ndarray) -> np.ndarray:
        return np.clip(np.searchsorted(edges, ns, side="right") - 1,
                       0, n_buckets - 1)

    rb = rates.map_batches(
        lambda t: t.append_column(
            "bucket", pa.array(_bucket_of(t["rts_ns"].to_numpy()),
                               pa.int64())),
        batch_format="pyarrow")
    maxima = rb.groupby("bucket").aggregate(
        _Max("rts_ns", alias_name="rts_ns")).to_pandas()
    mark_max = dict(zip(maxima.bucket, maxima.rts_ns))
    carry_rows = []
    last = None
    for bkt in range(n_buckets):
        if last is not None:
            carry_rows.append({"kind": "r", "bucket": bkt, "ts_ns": last,
                               "event_id": -1, "rate": (last // 10**9) % 97})
        if bkt in mark_max:
            last = int(mark_max[bkt])
    carry = ray.data.from_arrow(pa.Table.from_pylist(
        carry_rows, schema=pa.schema([
            ("kind", pa.string()), ("bucket", pa.int64()),
            ("ts_ns", pa.int64()), ("event_id", pa.int64()),
            ("rate", pa.int64())]))) if carry_rows else None

    def _tag_rates(t: pa.Table) -> pa.Table:
        return pa.table({
            "kind": pa.array(["r"] * len(t)),
            "bucket": t["bucket"].cast(pa.int64()),
            "ts_ns": t["rts_ns"],
            "event_id": pa.array(np.full(len(t), -1, np.int64)),
            "rate": t["rate"].cast(pa.int64()),
        })

    def _tag_events(t: pa.Table) -> pa.Table:
        ns = _ns(t["ts"].combine_chunks())
        return pa.table({
            "kind": pa.array(["e"] * len(t)),
            "bucket": pa.array(_bucket_of(ns)),
            "ts_ns": pa.array(ns),
            "event_id": t["event_id"].cast(pa.int64()),
            "rate": pa.array(np.full(len(t), -1, np.int64)),
        })

    both = rb.map_batches(_tag_rates, batch_format="pyarrow").union(
        ev.map_batches(_tag_events, batch_format="pyarrow"))
    if carry is not None:
        both = both.union(carry)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        r = g[g.kind == "r"].sort_values("ts_ns")
        e = g[g.kind == "e"].sort_values("ts_ns")
        if len(e) == 0:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "rate": pd.Series([], dtype="int64")})
        m = pd.merge_asof(e[["ts_ns", "event_id"]], r[["ts_ns", "rate"]],
                          on="ts_ns", direction="backward")
        m = m.dropna(subset=["rate"])  # inner semantics: pre-first-mark out
        return pd.DataFrame({"event_id": m.event_id.astype("int64"),
                             "rate": m.rate.astype("int64")})

    return both.groupby("bucket").map_groups(_merge, batch_format="pandas")


# --------------------------------------------------------- window analytics


@register(
    "window_running_sum",
    """SELECT event_id,
              CAST(ROUND(SUM(value) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) * 100)
                  AS BIGINT) AS run_c
       FROM events""",
)
def window_running_sum(sf_dir: str):
    """Per-key running sum (SQL window function) = groupby(key) +
    in-group ordered cumsum. The shuffle key is the window partition
    key; in-group order is (ts, event_id) — total, so the cumulative
    doubles are bit-identical to the oracle's."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _cum(g: pd.DataFrame) -> pd.DataFrame:
        from etl_ray.pipelines._qutil import half_away_int64

        g = g.sort_values(["ts", "event_id"])
        run = g["value"].cumsum()
        # sign-aware half-away-from-zero = SQL ROUND (floor(x+0.5) would
        # round negative halves the wrong way)
        return pd.DataFrame({
            "event_id": g["event_id"],
            "run_c": half_away_int64(run.to_numpy() * 100),
        })

    return ds.groupby("user_id").map_groups(_cum, batch_format="pandas")


@register(
    "agg_stats",
    """SELECT l_returnflag,
              CAST(ROUND(STDDEV_SAMP(l_quantity) * 10000) AS BIGINT) AS std_e4,
              MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
              COUNT(*) AS n
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_stats(sf_dir: str):
    """G2 statistical aggregates (sample stddev, ddof=1 both sides)."""
    ds = read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    out = ds.groupby("l_returnflag").aggregate(
        Std("l_quantity", ddof=1, alias_name="std_e4"),
        Min("l_quantity", alias_name="min_qty"),
        Max("l_quantity", alias_name="max_qty"),
        Count(alias_name="n"),
    )
    return out.map_batches(lambda t: fixed_point(t, "std_e4", 10000),
                           batch_format="pyarrow")


# ------------------------------------------------------------------ set ops


def _sided(ds, col: str, side: int):
    """Project to (key:int64, side) — per-block distinct pre-reduce so
    the shuffle moves one row per distinct (key, side) per block."""
    def _f(t: pa.Table) -> pa.Table:
        k = pc.unique(pc.cast(t[col], pa.int64()).combine_chunks())
        return pa.table({"key": k,
                         "side": pa.array(np.full(len(k), side, np.int64))})
    return ds.map_batches(_f, batch_format="pyarrow")


@register(
    "set_ops",
    """SELECT 'intersect' AS tag, nationkey AS key FROM (
           SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
           INTERSECT
           SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
       UNION ALL
       SELECT 'except' AS tag, key FROM (
           SELECT CAST(c_custkey AS BIGINT) AS key FROM customer
           EXCEPT
           SELECT CAST(o_custkey AS BIGINT) AS key FROM orders
           WHERE o_totalprice > 300000)""",
)
def set_ops(sf_dir: str):
    """U2 intersect + except in one tagged result — as ONE shuffle each,
    no join: tag every side's distinct keys with a side id, union, and
    groupby(key) keeping min/max side. intersect = key seen on both
    sides (min=0, max=1); except = key seen only on the left (max=0).

    Deliberately join-free: a distinct+semi/anti-join formulation feeds
    a groupby output into ray's hash-shuffle join, and when the distinct
    key count is smaller than the partition fan-out the empty left
    partitions trip an Arrow FieldRef error in the join finalize
    (`ArrowInvalid: No match or multiple matches for key field
    reference` — the round-1 intersect_keys failure at num_cpus=32).
    The union+groupby shape is also the better 100-TB plan: one
    all-to-all on pre-reduced (key, side) pairs instead of two.
    """
    from ray.data.aggregate import Max, Min

    def _one(a, b, tag: str, keep_max: int):
        agg = a.union(b).groupby("key").aggregate(
            Min("side", alias_name="smin"), Max("side", alias_name="smax"))

        def _f(t: pa.Table) -> pa.Table:
            m = pc.and_(pc.equal(t["smin"], 0), pc.equal(t["smax"], keep_max))
            k = t.filter(m)["key"]
            return pa.table({
                "tag": pa.array([tag] * len(k), pa.string()),
                "key": k,
            })

        return agg.map_batches(_f, batch_format="pyarrow")

    inter = _one(
        _sided(read(sf_dir, "customer", ["c_nationkey"]), "c_nationkey", 0),
        _sided(read(sf_dir, "supplier", ["s_nationkey"]), "s_nationkey", 1),
        "intersect", keep_max=1)
    big = read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 300000)),
        batch_format="pyarrow")
    exc = _one(
        _sided(read(sf_dir, "customer", ["c_custkey"]), "c_custkey", 0),
        _sided(big, "o_custkey", 1),
        "except", keep_max=0)
    return inter.union(exc)


# ------------------------------------------------------ sampling / staging


def sample_seeded(sf_dir: str):
    """O4 seeded sampling — deterministic for a fixed input + seed.
    Unregistered since round 3 (its registry slot went to cdc_changes —
    the driver caps recorded rows at 50); determinism is pinned by
    tests/test_queries.py::test_sample_seeded_deterministic."""
    ds = read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.random_sample(0.1, seed=42)


@register(
    "staging_roundtrip",
    "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang",
)
def staging_roundtrip(sf_dir: str):
    """S5 + S1: write lang-partitioned staging Parquet (the resumable
    layout — one directory per partition value), read it back, and
    aggregate. The oracle checks the round-trip lost nothing."""
    out = "/tmp/etl_ray_q/staging-" + hashlib.sha1(
        sf_dir.encode()).hexdigest()[:10]
    shutil.rmtree(out, ignore_errors=True)
    ds = read(sf_dir, "documents", ["doc_id", "lang"])
    ds.write_parquet(out, partition_cols=["lang"])
    back = ray.data.read_parquet(out)
    return back.groupby("lang").aggregate(Count(alias_name="n"))


@register(
    "file_roundtrip",
    """SELECT 'csv' AS fmt, event_type, COUNT(*) AS n
       FROM events GROUP BY event_type
       UNION ALL
       SELECT 'json' AS fmt, event_type, COUNT(*) AS n
       FROM events GROUP BY event_type
       UNION ALL
       SELECT 'orc' AS fmt, event_type, COUNT(*) AS n
       FROM events GROUP BY event_type""",
)
def file_roundtrip(sf_dir: str):
    """S6 aux readers: parquet → CSV, JSONL and ORC staging →
    read_csv / read_json / the custom ORC datasource
    (etl_ray.sources.orc — ray ships no read_orc; ours streams per
    stripe) → aggregate, tagged per format. The oracle checks every
    round-trip lost nothing."""
    from etl_ray.sources.orc import read_orc, write_orc

    h = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    ds = read(sf_dir, "events", ["event_id", "event_type"])
    outs = {}
    for fmt in ("csv", "json", "orc"):
        out = f"/tmp/etl_ray_q/{fmt}-{h}"
        shutil.rmtree(out, ignore_errors=True)
        outs[fmt] = out
    ds.write_csv(outs["csv"])
    ds.write_json(outs["json"])
    write_orc(ds, outs["orc"])

    def _tag(fmt: str):
        def _f(t: pa.Table) -> pa.Table:
            return t.append_column("fmt", pa.array([fmt] * len(t), pa.string()))
        return _f

    parts = []
    for fmt, reader in (("csv", ray.data.read_csv),
                        ("json", ray.data.read_json),
                        ("orc", read_orc)):
        agg = (reader(outs[fmt]).groupby("event_type")
               .aggregate(Count(alias_name="n"))
               .map_batches(_tag(fmt), batch_format="pyarrow"))
        parts.append(agg)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _hist_quantile(vals, cnts, q: float) -> float:
    """Exact continuous quantile from a (value, count) histogram —
    DuckDB quantile_cont semantics: position (n-1)·q, linear
    interpolation between the two straddling order statistics."""
    n = int(cnts.sum())
    pos = (n - 1) * q
    lo, hi = int(np.floor(pos)), int(np.ceil(pos))
    cum = np.cumsum(cnts)
    v_lo = vals[np.searchsorted(cum, lo, side="right")]
    v_hi = vals[np.searchsorted(cum, hi, side="right")]
    return float(v_lo + (pos - lo) * (v_hi - v_lo))


@register(
    "agg_quantile",
    """SELECT l_returnflag,
              CAST(ROUND(quantile_cont(l_quantity, 0.25) * 10000) AS BIGINT)
                  AS p25_e4,
              CAST(ROUND(quantile_cont(l_quantity, 0.50) * 10000) AS BIGINT)
                  AS p50_e4,
              CAST(ROUND(quantile_cont(l_quantity, 0.75) * 10000) AS BIGINT)
                  AS p75_e4
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_quantile(sf_dir: str):
    """G2 grouped quantiles, the 100-TB-safe way: values are
    bounded-cardinality, so each block pre-aggregates a (key, value,
    count) histogram, the shuffle moves histograms (not raw rows), and
    the exact interpolated quantile is computed from the tiny merged
    histogram. For unbounded-cardinality values this becomes a t-digest
    merge with the same pipeline shape."""
    from ray.data.aggregate import Sum

    from etl_ray.pipelines._qutil import fixed_point_scalar

    ds = read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def _partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_quantity"]).aggregate(
            [("l_quantity", "count")])
        return pa.table({"l_returnflag": g["l_returnflag"],
                         "l_quantity": g["l_quantity"],
                         "n": pc.cast(g["l_quantity_count"], pa.int64())})

    hist = (ds.map_batches(_partial, batch_format="pyarrow")
            .groupby(["l_returnflag", "l_quantity"])
            .aggregate(Sum("n", alias_name="n")))
    df = hist.to_pandas()  # tiny: flags × distinct quantity values
    rows = []
    for flag, g in df.groupby("l_returnflag"):
        g = g.sort_values("l_quantity")
        vals = g["l_quantity"].to_numpy(dtype=np.float64)
        cnts = g["n"].to_numpy(dtype=np.int64)
        row = {"l_returnflag": flag}
        for q, name in ((0.25, "p25_e4"), (0.50, "p50_e4"), (0.75, "p75_e4")):
            row[name] = fixed_point_scalar(_hist_quantile(vals, cnts, q), 10000)
        rows.append(row)
    return pa.Table.from_pylist(rows)
