"""Relational operator conformance queries (SURVEY.md §2.2, §2.4–2.7).

Each query is the Ray-Data-first expression of one operator family —
vectorized Arrow batches, shuffles only where the operator semantically
requires one (groupby/join/sort/distinct), broadcast for small sides —
and is paired with the DuckDB SQL the driver checks it against.

Floating-point policy: any column produced by an *aggregation* (whose
value depends on summation order) is ROUNDed identically on both sides;
purely per-row arithmetic (×, −, abs) is IEEE-deterministic and left
exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from etl_ray.functions import expr
from etl_ray.pipelines._qutil import (fixed_point, fixed_point_scalar,
                                      join_partitions, one_row_table, read)
from etl_ray.pipelines.queries import register

# ------------------------------------------------------------ filter / project


@register(
    "filter_rows",
    """SELECT l_orderkey, l_partkey, l_quantity
       FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""",
)
def filter_rows(sf_dir: str):
    """M2: vectorized batch-level predicate (not ds.filter(row_fn))."""
    ds = read(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_quantity", "l_returnflag"])

    def _f(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.greater(t["l_quantity"], 45),
                       pc.equal(t["l_returnflag"], "R"))
        return t.filter(mask).drop_columns(["l_returnflag"])

    return ds.map_batches(_f, batch_format="pyarrow")


@register(
    "project_rename",
    "SELECT o_orderkey AS okey, o_orderstatus AS status FROM orders",
)
def project_rename(sf_dir: str):
    """M1: column select + rename."""
    ds = read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    return ds.rename_columns({"o_orderkey": "okey", "o_orderstatus": "status"})


@register(
    "with_column_case",
    """SELECT l_orderkey, l_linenumber,
              l_extendedprice * (1 - l_discount) AS revenue,
              CASE WHEN l_extendedprice * (1 - l_discount) > 60000 THEN 'big'
                   WHEN l_extendedprice * (1 - l_discount) > 20000 THEN 'mid'
                   ELSE 'small' END AS bucket
       FROM lineitem""",
)
def with_column_case(sf_dir: str):
    """M3: computed projection + multi-branch CASE WHEN in one pass
    (per-row arithmetic — exact, no rounding; the CASE compares the
    identical IEEE double on both sides)."""
    ds = read(sf_dir, "lineitem",
              ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])

    def _f(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1, t["l_discount"]))
        bucket = expr.if_else(
            pc.greater(rev, 60000), "big",
            expr.if_else(pc.greater(rev, 20000), "mid", "small"))
        return (t.select(["l_orderkey", "l_linenumber"])
                .append_column("revenue", rev)
                .append_column("bucket", bucket))

    return ds.map_batches(_f, batch_format="pyarrow")


# ------------------------------------------------------------------ aggregates


@register(
    "agg_global",
    """SELECT COUNT(*) AS n, SUM(l_quantity) AS sum_qty,
              CAST(ROUND(AVG(l_discount) * 1000000) AS BIGINT) AS avg_disc_e6,
              MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
       FROM lineitem""",
)
def agg_global(sf_dir: str):
    """G1: global aggregates — per-block partials combined by Ray Data.

    sum_qty stays double (quantities are integral, so the sum is exact);
    avg_disc is emitted fixed-point e6 (see _qutil.fixed_point).
    """
    ds = read(sf_dir, "lineitem", ["l_quantity", "l_discount", "l_shipdate"])
    row = ds.aggregate(
        Count(alias_name="n"),
        Sum("l_quantity", alias_name="sum_qty"),
        Mean("l_discount", alias_name="avg_disc_e6"),
        Min("l_shipdate", alias_name="min_ship"),
        Max("l_shipdate", alias_name="max_ship"),
    )
    row["avg_disc_e6"] = fixed_point_scalar(row["avg_disc_e6"], 1_000_000)
    return one_row_table(row)


@register(
    "agg_group_q1",
    """SELECT l_returnflag, l_linestatus,
              SUM(l_quantity) AS sum_qty,
              CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_base_price_c,
              CAST(ROUND(SUM(l_extendedprice * (1 - l_discount))) AS BIGINT)
                  AS sum_disc_price_r,
              CAST(ROUND(AVG(l_quantity) * 10000) AS BIGINT) AS avg_qty_e4,
              COUNT(*) AS count_order
       FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)
def agg_group_q1(sf_dir: str):
    """G2: TPC-H Q1-shaped grouped aggregate with MAP-SIDE PARTIALS.

    Ray's groupby shuffle is sort-based over every input row; with ~6
    groups that is pure waste, so each block pre-aggregates to ≤6 rows
    of (sums, count) and the distributed groupby only merges
    6 × n_blocks partial rows — the canonical combiner shape for 100-TB
    grouped aggregates. The average is derived from (sum, count) after
    the merge (l_quantity is integral, so the sum — and hence the
    quotient — is exact in double on both engines).
    """
    ds = read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity",
               "l_extendedprice", "l_discount"])

    def _partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(1, t["l_discount"]))
        t = t.append_column("disc_price", disc)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("l_quantity", "sum"), ("l_extendedprice", "sum"),
            ("disc_price", "sum"), ("l_quantity", "count")])
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "sum_qty": g["l_quantity_sum"],
            "sum_base_price_c": g["l_extendedprice_sum"],
            "sum_disc_price_r": g["disc_price_sum"],
            "count_order": pc.cast(g["l_quantity_count"], pa.int64()),
        })

    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price_c", alias_name="sum_base_price_c"),
            Sum("sum_disc_price_r", alias_name="sum_disc_price_r"),
            Sum("count_order", alias_name="count_order"),
        )
    )

    def _fp(t: pa.Table) -> pa.Table:
        avg = pc.divide(t["sum_qty"], pc.cast(t["count_order"], pa.float64()))
        t = t.append_column("avg_qty_e4", avg)
        t = fixed_point(t, "sum_base_price_c", 100)
        t = fixed_point(t, "sum_disc_price_r", 1)
        return fixed_point(t, "avg_qty_e4", 10000)

    return out.map_batches(_fp, batch_format="pyarrow")


@register(
    "group_having",
    """SELECT o_custkey, COUNT(*) AS n FROM orders
       GROUP BY o_custkey HAVING COUNT(*) >= 3""",
)
def group_having(sf_dir: str):
    ds = read(sf_dir, "orders", ["o_custkey"])
    out = ds.groupby("o_custkey").aggregate(Count(alias_name="n"))
    return out.map_batches(lambda t: t.filter(pc.greater_equal(t["n"], 3)),
                           batch_format="pyarrow")


@register(
    "count_distinct",
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
       FROM lineitem GROUP BY l_returnflag""",
)
def count_distinct(sf_dir: str):
    """G5 exact count-distinct: per-block distinct pre-reduce, then a
    distinct-pair shuffle, then count per group.

    Both distributed stages shuffle on the same leading key; the
    map-side distinct means the first shuffle moves one row per
    distinct pair per block instead of one per input row.
    """
    ds = read(sf_dir, "lineitem", ["l_returnflag", "l_partkey"])
    local = ds.map_batches(
        lambda t: t.group_by(["l_returnflag", "l_partkey"]).aggregate([]),
        batch_format="pyarrow")
    pairs = local.groupby(["l_returnflag", "l_partkey"]).aggregate(
        Count(alias_name="_c"))
    return (pairs.drop_columns(["_c"])
            .groupby("l_returnflag").aggregate(Count(alias_name="n_parts")))


# ----------------------------------------------------------------------- joins


@register(
    "join_inner",
    """SELECT o_orderkey, c_name, o_totalprice
       FROM orders JOIN customer ON o_custkey = c_custkey""",
)
def join_inner(sf_dir: str):
    """J1: hash equi-join, both sides distributed."""
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = read(sf_dir, "customer", ["c_custkey", "c_name"])
    j = orders.join(cust, join_type="inner", num_partitions=join_partitions(),
                    on=("o_custkey",), right_on=("c_custkey",))
    return j.select_columns(["o_orderkey", "c_name", "o_totalprice"])


@register(
    "join_left_count",
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey, c_name""",
)
def join_left_count(sf_dir: str):
    """J1 left outer + grouped count of the nullable side."""
    cust = read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j = cust.join(orders, join_type="left_outer", num_partitions=join_partitions(),
                  on=("c_custkey",), right_on=("o_custkey",))
    return j.groupby(["c_custkey", "c_name"]).aggregate(
        Count("o_orderkey", ignore_nulls=True, alias_name="n_orders"))


@register(
    "join_semi_anti",
    """SELECT 'semi' AS tag, o_orderkey, o_custkey FROM orders
       WHERE EXISTS (SELECT 1 FROM customer
                     WHERE c_custkey = o_custkey AND c_acctbal > 5000)
       UNION ALL
       SELECT 'anti' AS tag, o_orderkey, o_custkey FROM orders
       WHERE NOT EXISTS (SELECT 1 FROM customer
                         WHERE c_custkey = o_custkey AND c_acctbal > 5000)""",
)
def join_semi_anti(sf_dir: str):
    """J2 semi + anti join in one tagged result: orders whose customer
    IS / IS NOT in the high-balance set. Both joins share the filtered
    right side; the tag column disambiguates the union for the oracle."""
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    rich = read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], 5000)).select(["c_custkey"]),
        batch_format="pyarrow")

    def _tag(tag: str):
        def _f(t: pa.Table) -> pa.Table:
            return t.append_column("tag", pa.array([tag] * len(t), pa.string()))
        return _f

    semi = orders.join(rich, join_type="left_semi",
                       num_partitions=join_partitions(),
                       on=("o_custkey",), right_on=("c_custkey",)) \
                 .map_batches(_tag("semi"), batch_format="pyarrow")
    anti = orders.join(rich, join_type="left_anti",
                       num_partitions=join_partitions(),
                       on=("o_custkey",), right_on=("c_custkey",)) \
                 .map_batches(_tag("anti"), batch_format="pyarrow")
    return semi.union(anti)


def broadcast_lookup(sf_dir: str):
    """J3: small dimension broadcast via ray.put — no shuffle join.

    nation (25 rows) is put in the object store once; every map task
    reads the same copy and resolves keys with a vectorized
    pc.index_in + take (no per-row Python probe). The only shuffle is
    the final tiny groupby on n_name. (Unregistered — the driver gate
    covers J3 through join_star_region, which uses the same probe.)
    """
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    ref = ray.put((nation["n_nationkey"].combine_chunks(),
                   nation["n_name"].combine_chunks()))

    cust = read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def _probe(t: pa.Table) -> pa.Table:
        keys, names = ray.get(ref)
        idx = pc.index_in(t["c_nationkey"], value_set=keys)
        return (t.append_column("n_name", pc.take(names, idx))
                .drop_columns(["c_nationkey"]))

    out = (cust.map_batches(_probe, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Count(alias_name="n_customers"),
                      Sum("c_acctbal", alias_name="total_bal_c")))
    return out.map_batches(lambda t: fixed_point(t, "total_bal_c", 100),
                           batch_format="pyarrow")


@register(
    "join_star_region",
    """SELECT r_name, COUNT(*) AS n_orders,
              CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS revenue_c
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name""",
)
def join_star_region(sf_dir: str):
    """Star-schema rollup: one distributed join + broadcast dims.

    customer↔orders is the only large-large join; nation→region is
    pre-joined driver-side (30 rows) and broadcast as a single lookup.
    """
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    # pre-join the two dims driver-side (30 rows) → one broadcast lookup
    rname_of = {r["r_regionkey"]: r["r_name"] for r in region.to_pylist()}
    nk = nation["n_nationkey"].combine_chunks()
    rnames = pa.array([rname_of[rk] for rk in
                       nation["n_regionkey"].to_pylist()], pa.string())
    ref = ray.put((nk, rnames))

    orders = read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = orders.join(cust, join_type="inner", num_partitions=join_partitions(),
                    on=("o_custkey",), right_on=("c_custkey",))

    def _probe(t: pa.Table) -> pa.Table:
        keys, names = ray.get(ref)
        idx = pc.index_in(t["c_nationkey"], value_set=keys)
        return (t.select(["o_totalprice"])
                .append_column("r_name", pc.take(names, idx)))

    out = (j.map_batches(_probe, batch_format="pyarrow")
           .groupby("r_name")
           .aggregate(Count(alias_name="n_orders"),
                      Sum("o_totalprice", alias_name="revenue_c")))
    return out.map_batches(lambda t: fixed_point(t, "revenue_c", 100),
                           batch_format="pyarrow")


# -------------------------------------------------- sort / distinct / set ops


def pivot_qty_by_status(sf_dir: str):
    """PIVOT: one row per l_returnflag, one column per l_linestatus
    value, cells = sum(l_quantity) — conditional-sum partials per block
    (the scale shape: the shuffle moves one tiny partial row per group
    per block), then a grouped merge. Unregistered; DuckDB-equivalence
    pinned in tests. The inverse is :func:`unpivot_qty`."""
    from ray.data.aggregate import Sum as _Sum

    ds = read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity"])

    def _partial(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"]
        out = pa.table({
            "l_returnflag": t["l_returnflag"],
            "qty_F": pc.if_else(pc.equal(t["l_linestatus"], "F"), qty, 0.0),
            "qty_O": pc.if_else(pc.equal(t["l_linestatus"], "O"), qty, 0.0),
        })
        g = out.group_by("l_returnflag").aggregate(
            [("qty_F", "sum"), ("qty_O", "sum")])
        return g.rename_columns(["l_returnflag", "qty_F", "qty_O"])

    return (ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("l_returnflag")
            .aggregate(_Sum("qty_F", alias_name="qty_F"),
                       _Sum("qty_O", alias_name="qty_O")))


def unpivot_qty(ds) -> "ray.data.Dataset":
    """UNPIVOT/melt: the inverse of :func:`pivot_qty_by_status` —
    (l_returnflag, qty_F, qty_O) rows become
    (l_returnflag, l_linestatus, qty) pairs, vectorized per batch."""
    def _melt(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "l_returnflag": pa.concat_arrays(
                [t["l_returnflag"].combine_chunks()] * 2),
            "l_linestatus": pa.array(["F"] * n + ["O"] * n, pa.string()),
            "qty": pa.concat_arrays([t["qty_F"].combine_chunks(),
                                     t["qty_O"].combine_chunks()]),
        })

    return ds.map_batches(_melt, batch_format="pyarrow")


def grouped_topk(sf_dir: str, n: int = 3):
    """Per-group top-n — the ROW_NUMBER() OVER (PARTITION BY key ORDER
    BY val DESC) <= n window class (unregistered; DuckDB-equivalence
    pinned in tests).

    Scale shape: per-block PARTIAL top-n per group first — safe because
    any row outside its block's per-group top-n cannot be in the global
    per-group top-n — so the shuffle moves ≤ n rows per (group, block);
    then a groupby(key) final top-n. Ties broken on o_orderkey asc to
    match the SQL oracle deterministically.
    """
    ds = read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def _partial(t: pa.Table) -> pa.Table:
        # Arrow-native grouped head: one block sort putting each
        # group's rows contiguous in oracle tie order, then a numpy
        # run-length rank < n mask — no pandas, no per-group loop.
        if len(t) == 0:
            return t
        idx = pc.sort_indices(t, sort_keys=[
            ("o_custkey", "ascending"), ("o_totalprice", "descending"),
            ("o_orderkey", "ascending")])
        t = t.take(idx).combine_chunks()
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, cust[1:] != cust[:-1]])
        rank = np.arange(len(cust)) - np.repeat(
            starts, np.diff(np.r_[starts, len(cust)]))
        return t.filter(pa.array(rank < n))

    def _final(g) -> "pa.Table":
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True])
        return g.head(n)

    return (ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("o_custkey").map_groups(_final, batch_format="pandas"))


@register(
    "sort_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC LIMIT 10""",
)
def sort_topk(sf_dir: str):
    """O1/O2: distributed sort + limit (per-block top-k then merge)."""
    ds = read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort("o_totalprice", descending=True).limit(10)


def distinct_one(sf_dir: str):
    """G4 single-column distinct via Dataset.unique (unregistered — the
    driver gate covers G4 through distinct_multi)."""
    ds = read(sf_dir, "customer", ["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(vals, pa.string())})


@register(
    "distinct_multi",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_multi(sf_dir: str):
    """G4 multi-column distinct: per-block distinct, then grouped distinct."""
    ds = read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    local = ds.map_batches(
        lambda t: t.group_by(["l_returnflag", "l_linestatus"]).aggregate([]),
        batch_format="pyarrow")
    out = local.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Count(alias_name="_c"))
    return out.drop_columns(["_c"])


@register(
    "union_all",
    """SELECT c_nationkey AS nationkey FROM customer
       UNION ALL SELECT s_nationkey AS nationkey FROM supplier""",
)
def union_all(sf_dir: str):
    a = read(sf_dir, "customer", ["c_nationkey"]).rename_columns(
        {"c_nationkey": "nationkey"})
    b = read(sf_dir, "supplier", ["s_nationkey"]).rename_columns(
        {"s_nationkey": "nationkey"})
    return a.union(b)
