"""Stream-shaped operators over the bounded events log: sessionization
and mergeable sketches (SURVEY.md §2.9 + guide patterns).

Ray Data has no watermarks; event-time logic runs as groupby(key) +
ordered in-group logic (sessionize) or as per-block mergeable state
(HLL sketch: one small sketch per block, merged in a tiny final stage —
the canonical way to avoid shuffling raw values for approximate
aggregates at 100 TB).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data.aggregate import Count

from etl_ray.pipelines._qutil import read
from etl_ray.pipelines.queries import register

SESSION_GAP_MIN = 30


@register(
    "sessionize",
    f"""WITH d AS (
           SELECT user_id,
                  CASE WHEN LAG(ts) OVER w IS NULL
                            OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       )
       SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions
       FROM d GROUP BY user_id""",
)
def sessionize(sf_dir: str):
    """Gap-based session windows: a session break is a >30-min silence.

    Shuffle key = user_id (the session partition key); in-group order is
    (ts, event_id). Incremental/streaming variant would keep the last
    ts per user in an actor — bounded replay makes the groupby exact.
    """
    ds = read(sf_dir, "events", ["user_id", "ts", "event_id"])
    gap = np.timedelta64(SESSION_GAP_MIN * 60, "s")

    def _sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        prev = g["ts"].shift(1)
        new_s = prev.isna() | ((g["ts"] - prev) > gap)
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_sessions": [np.int64(new_s.sum())]})

    return ds.groupby("user_id").map_groups(_sess, batch_format="pandas")


# ------------------------------------------------------------- HLL sketch

HLL_P = 12  # 4096 registers → ~1.6% standard error


def _hll_registers(values: np.ndarray) -> np.ndarray:
    """Vectorized HyperLogLog register fold of 64-bit hashes."""
    idx = (values >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = values << np.uint64(HLL_P)
    # rank = leading zeros of the remaining 64-P bits, + 1
    rank = np.full(len(values), 64 - HLL_P + 1, dtype=np.uint8)
    nz = rest != 0
    # log2 via float conversion is exact for the leading-bit position
    lead = np.zeros(len(values), dtype=np.uint8)
    lead[nz] = (63 - np.floor(np.log2(rest[nz].astype(np.float64)))).astype(np.uint8)
    rank[nz] = np.minimum(lead[nz] + 1, 64 - HLL_P + 1)
    regs = np.zeros(1 << HLL_P, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range fix
    return float(est)


@register("sketch_hll_partkeys")
def sketch_hll_partkeys(sf_dir: str):
    """Approximate count-distinct of l_partkey via HyperLogLog.

    One 4 KiB sketch per block (map_batches), merged with an elementwise
    max on the driver — nothing but sketches crosses the wire, vs the
    exact two-phase groupby in `count_distinct`. Rows-only oracle; the
    accuracy bound (±5%) is asserted in tests/test_queries.py.
    """
    ds = read(sf_dir, "lineitem", ["l_partkey"])

    def _sketch(t: pa.Table) -> pa.Table:
        vals = pd.util.hash_array(t["l_partkey"].to_numpy(), categorize=False)
        regs = _hll_registers(vals)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    sketches = ds.map_batches(_sketch, batch_format="pyarrow")
    merged = np.zeros(1 << HLL_P, dtype=np.uint8)
    for b in sketches.iter_batches(batch_format="pyarrow"):
        for s in b["regs"].to_pylist():
            merged = np.maximum(merged, np.frombuffer(s, dtype=np.uint8))
    return pa.table({"approx_n_parts": pa.array(
        [int(round(hll_estimate(merged)))], pa.int64())})


@register(
    "topk_frequent_tokens",
    """SELECT token, CAST(cnt AS BIGINT) AS n FROM (
           SELECT token, COUNT(*) AS cnt, ROW_NUMBER() OVER (
               ORDER BY COUNT(*) DESC, token) AS rk
           FROM (SELECT unnest(string_split(text, ' ')) AS token
                 FROM documents)
           GROUP BY token
       ) WHERE rk <= 15""",
)
def topk_frequent_tokens(sf_dir: str):
    """Heavy hitters: partial per-block counts → grouped sum → top-k.
    Deterministic tie-break on the token value (matches the oracle's
    ORDER BY cnt DESC, token)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["text"])

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        counts = pa.table({"token": toks}).group_by("token").aggregate(
            [("token", "count")])
        return pa.table({"token": counts["token"],
                         "n": pc.cast(counts["token_count"], pa.int64())})

    def _block_topk(t: pa.Table) -> pa.Table:
        # per-block partial top-k is SAFE here: counts are final after
        # the grouped sum, so the global top-15 is in some block's
        # top-15. Only ≤15 rows per block reach the driver (the full
        # distinct-token table is billions of rows at web scale).
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                            ("token", "ascending")])
        return t.take(idx[:15])

    total = (ds.map_batches(_partial, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("n", alias_name="n"))
             .map_batches(_block_topk, batch_format="pyarrow"))
    df = total.to_pandas()  # ≤ 15 × n_blocks rows
    df = df.sort_values(["n", "token"], ascending=[False, True]).head(15)
    return pa.Table.from_pandas(df.reset_index(drop=True))
