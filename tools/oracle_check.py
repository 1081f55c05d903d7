"""Local stand-in for the driver's queries()-vs-DuckDB correctness gate.

Runs each queries() entry at sf0.01 and compares row count, column
names, and an order-insensitive value hash against oracle_sql() in
DuckDB — the same comparison shape as CORRECTNESS_r{N}.json. Entries
without oracle SQL get a rows-only report.

Usage:  python tools/oracle_check.py [name ...]   (default: all)
        ORACLE_SF=/root/testdata/sf0.1 python tools/oracle_check.py
        (the sf0.1 sweep catches value-representation bugs — e.g.
        round(x,n) double divergence — that the sf0.01 gate can miss)
"""

from __future__ import annotations

import hashlib
import os as _os
import sys
import time

import pandas as pd

SF_DIR = _os.environ.get("ORACLE_SF", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive hash: sort columns by name, rows by repr, hash."""
    df = df.reindex(sorted(df.columns), axis=1)
    lines = sorted(
        "\x1f".join(repr(v) for v in row) for row in df.itertuples(index=False)
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def main() -> int:
    import duckdb

    import ray

    import os

    if not ray.is_initialized():
        # default 32 mirrors the driver gate — the round-1 intersect_keys
        # bug only fired at 16 join partitions, invisible at num_cpus=8
        ray.init(address="local",
                 num_cpus=int(os.environ.get("ORACLE_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    n_fail = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            got = to_pandas(qs[name](SF_DIR))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows, cols={sorted(got.columns)}"
                  f" ({dt:.1f}s) [no oracle]")
            continue
        want = con.execute(oracles[name]).df()
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        if ok_hash:
            print(f"PASS  {name}: {len(got)} rows ({dt:.1f}s)")
        else:
            n_fail += 1
            print(f"FAIL  {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols}"
                  f" hash_ok={ok_hash}")
            if ok_rows and ok_cols:
                merged = got.reindex(sorted(got.columns), axis=1)
                wanted = want.reindex(sorted(want.columns), axis=1)
                print("  got :", merged.head(3).to_dict("records"))
                print("  want:", wanted.head(3).to_dict("records"))
    print(f"== {len(names) - n_fail}/{len(names)} ok ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
