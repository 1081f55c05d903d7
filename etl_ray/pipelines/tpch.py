"""TPC-H-shaped composite pipelines — multi-join + aggregate + top-k
compositions that exercise operator chaining depth (the conformance
queries elsewhere test operators mostly in isolation)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Sum

from etl_ray.pipelines._qutil import (fixed_point, fixed_point_scalar,
                                      join_partitions, read)
from etl_ray.pipelines.queries import register


@register(
    "q6_forecast_revenue",
    """SELECT CAST(ROUND(SUM(l_extendedprice * l_discount) * 100) AS BIGINT)
              AS revenue_c,
              COUNT(*) AS n
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)
def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: tight filter + global aggregate. The read prunes
    to 4 columns; the filter is one vectorized kernel per batch."""
    ds = read(sf_dir, "lineitem",
              ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def _f(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"],
                                 pa.scalar("1996-01-01T00:00:00")
                                 .cast(pa.timestamp("us"))),
                pc.less(t["l_shipdate"],
                        pa.scalar("1997-01-01T00:00:00")
                        .cast(pa.timestamp("us")))),
            pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], 0.05),
                        pc.less_equal(t["l_discount"], 0.07)),
                pc.less(t["l_quantity"], 24)))
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"], t["l_discount"])
        return pa.table({"revenue_c": rev})

    out = ds.map_batches(_f, batch_format="pyarrow").aggregate(
        Sum("revenue_c", alias_name="revenue_c"), Count(alias_name="n"))
    return pa.table({
        "revenue_c": pa.array([fixed_point_scalar(out["revenue_c"], 100)],
                              pa.int64()),
        "n": pa.array([out["n"]], pa.int64()),
    })


BROADCAST_SEMI_MAX = 4_000_000  # build-side keys; ~32 MB int64 broadcast


@register(
    "q3_shipping_priority",
    """SELECT l_orderkey,
              CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100)
                   AS BIGINT) AS revenue_c,
              o_orderdate
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-06-01'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue_c DESC, l_orderkey LIMIT 10""",
)
def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: filtered 3-way join → grouped revenue → top-k.

    The customer side is filtered before the join (predicate pushdown).
    The customer semi-join is a BROADCAST `pc.is_in` probe when the
    filtered build side is small (one `ray.put` of the key array, no
    shuffle — ~⅕ of customers qualify, so this removes one of the two
    all-to-all joins); above the cutoff it falls back to the
    hash-shuffle `left_semi` join for genuine large-large cases.
    Top-k = sort + limit with a deterministic orderkey tie-break
    matching the oracle.
    """
    import ray

    cust = read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
                   .select(["c_custkey"]),
        batch_format="pyarrow")
    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"],
                                   pa.scalar("1998-06-01T00:00:00")
                                   .cast(pa.timestamp("us")))),
        batch_format="pyarrow")
    li = read(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount"])

    cust_mat = cust.materialize()  # bounded: a filtered dimension table
    if cust_mat.count() <= BROADCAST_SEMI_MAX:
        keys = pa.concat_tables(
            ray.get(cust_mat.to_arrow_refs()))["c_custkey"].combine_chunks()
        kref = ray.put(keys)

        def _semi(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["o_custkey"],
                                     value_set=ray.get(kref)))

        j1 = orders.map_batches(_semi, batch_format="pyarrow")
    else:
        j1 = orders.join(cust_mat, join_type="left_semi",
                         num_partitions=join_partitions(),
                         on=("o_custkey",), right_on=("c_custkey",))
    j2 = li.join(j1, join_type="inner", num_partitions=join_partitions(),
                 on=("l_orderkey",), right_on=("o_orderkey",))

    # o_orderdate crosses the group shuffle as INT64 (cast back after):
    # ray's hash-shuffle aggregator round-trips timestamp keys through
    # numpy datetime64, logging per-task precision warnings
    def _rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1, t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "o_orderdate": pc.cast(t["o_orderdate"], pa.int64()),
                         "rev": rev})

    def _fin(t: pa.Table) -> pa.Table:
        t = fixed_point(t, "revenue_c", 100)
        return t.set_column(
            t.schema.get_field_index("o_orderdate"), "o_orderdate",
            pc.cast(t["o_orderdate"], pa.timestamp("us")))

    grouped = (j2.map_batches(_rev, batch_format="pyarrow")
               .groupby(["l_orderkey", "o_orderdate"])
               .aggregate(Sum("rev", alias_name="revenue_c")))
    grouped = grouped.map_batches(_fin, batch_format="pyarrow")
    return grouped.sort(["revenue_c", "l_orderkey"],
                        descending=[True, False]).limit(10)


@register(
    "q10_returned_items",
    """SELECT c_custkey, c_name,
              CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100)
                   AS BIGINT) AS revenue_c
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
       WHERE l_returnflag = 'R'
       GROUP BY c_custkey, c_name
       ORDER BY revenue_c DESC, c_custkey LIMIT 20""",
)
def q10_returned_items(sf_dir: str):
    """TPC-H Q10 shape: lost-revenue rollup over returned items."""
    cust = read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = read(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount",
               "l_returnflag"]).map_batches(
        lambda t: t.filter(pc.equal(t["l_returnflag"], "R")),
        batch_format="pyarrow")

    j1 = li.join(orders, join_type="inner",
                 num_partitions=join_partitions(),
                 on=("l_orderkey",), right_on=("o_orderkey",))
    j2 = j1.join(cust, join_type="inner",
                 num_partitions=join_partitions(),
                 on=("o_custkey",), right_on=("c_custkey",))

    def _rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1, t["l_discount"]))
        return pa.table({"c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                         "c_name": t["c_name"], "rev": rev})

    grouped = (j2.map_batches(_rev, batch_format="pyarrow")
               .groupby(["c_custkey", "c_name"])
               .aggregate(Sum("rev", alias_name="revenue_c")))
    grouped = grouped.map_batches(lambda t: fixed_point(t, "revenue_c", 100),
                                  batch_format="pyarrow")
    return grouped.sort(["revenue_c", "c_custkey"],
                        descending=[True, False]).limit(20)
