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
    np.searchsorted — no shuffle. A large-large as-of join would
    bucket both sides by key and merge_asof per bucket instead.
    """
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    hours = pc.floor_temporal(ev["ts"], unit="hour")
    hours = pc.unique(hours.combine_chunks())
    hod = pc.hour(hours)
    marks = hours.filter(pc.equal(pc.subtract(hod, pc.multiply(
        pc.divide(hod, 3), 3)), 0))  # hour(ts) % 3 == 0
    rts = np.sort(marks.to_numpy())
    rate = (rts.astype("datetime64[s]").astype(np.int64)) % 97
    ref = ray.put((rts.astype("datetime64[us]").astype(np.int64), rate))

    ds = read(sf_dir, "events", ["event_id", "ts"])

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
        g = g.sort_values(["ts", "event_id"])
        run = g["value"].cumsum()
        return pd.DataFrame({
            "event_id": g["event_id"],
            "run_c": np.floor(run * 100 + 0.5).astype(np.int64),
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


def _nk64(col: str):
    def _f(t: pa.Table) -> pa.Table:
        return pa.table({"nationkey": pc.cast(t[col], pa.int64())})
    return _f


@register(
    "intersect_keys",
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
       INTERSECT SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier""",
)
def intersect_keys(sf_dir: str):
    """U2 intersect = distinct + semi join (keys cast to int64: the
    groupby widens its key output, and pyarrow joins refuse mixed-width
    keys)."""
    cust = read(sf_dir, "customer", ["c_nationkey"]).map_batches(
        _nk64("c_nationkey"), batch_format="pyarrow")
    supp = read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        _nk64("s_nationkey"), batch_format="pyarrow")
    dc = cust.groupby("nationkey").aggregate(Count(alias_name="_c")) \
             .drop_columns(["_c"])
    return dc.join(supp, join_type="left_semi",
                   num_partitions=join_partitions(), on=("nationkey",))


@register(
    "except_keys",
    """SELECT CAST(c_custkey AS BIGINT) AS key FROM customer
       EXCEPT SELECT CAST(o_custkey AS BIGINT) AS key FROM orders
       WHERE o_totalprice > 300000""",
)
def except_keys(sf_dir: str):
    """U2 except = distinct + anti join (customers with no big-ticket
    order — non-empty at every test sf)."""
    cust = read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: pa.table({"key": pc.cast(t["c_custkey"], pa.int64())}),
        batch_format="pyarrow")
    big = read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table({"key": pc.cast(
            t.filter(pc.greater(t["o_totalprice"], 300000))["o_custkey"],
            pa.int64())}),
        batch_format="pyarrow")
    dc = cust.groupby("key").aggregate(Count(alias_name="_c")) \
             .drop_columns(["_c"])
    return dc.join(big, join_type="left_anti",
                   num_partitions=join_partitions(), on=("key",))


# ------------------------------------------------------ sampling / staging


@register("sample_seeded")
def sample_seeded(sf_dir: str):
    """O4 seeded sampling — deterministic for a fixed input + seed
    (rows-only oracle records the stable row count)."""
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
    "csv_roundtrip",
    "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
)
def csv_roundtrip(sf_dir: str):
    """S6 aux readers: parquet → CSV staging → read_csv → aggregate."""
    out = "/tmp/etl_ray_q/csv-" + hashlib.sha1(
        sf_dir.encode()).hexdigest()[:10]
    shutil.rmtree(out, ignore_errors=True)
    ds = read(sf_dir, "events", ["event_id", "event_type"])
    ds.write_csv(out)
    back = ray.data.read_csv(out)
    return back.groupby("event_type").aggregate(Count(alias_name="n"))
