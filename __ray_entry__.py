"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in etl_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import shutil
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship CDC replay at smoke scale (SURVEY.md §3.1).

    Synthesises the mandated corpus shape (repo, path, commit, lang,
    content — BASELINE.json:15) deterministically, generates an
    epoch-partitioned WAL with schema-evolution epochs, replays it
    through the hash-partitioned LWW merge + two-phase manifest sink,
    and returns the converged lake table as a Dataset.
    """
    from etl_ray.pipelines.cdc import replay
    from etl_ray.sources.corpus import corpus_from_documents
    from etl_ray.sources.wal import generate_wal
    from etl_ray.state.lake import read_lake

    base = "/tmp/etl_ray_entry"
    shutil.rmtree(base, ignore_errors=True)
    # corpus = the driver's sf0.001 documents table mapped onto the
    # mandated (repo, path, commit, lang, content) shape
    corpus = corpus_from_documents("/root/testdata/sf0.001")
    generate_wal(corpus, f"{base}/wal", n_epochs=4, n_repos=8)
    replay(f"{base}/wal", f"{base}/lake", 4, num_partitions=8)
    return read_lake(f"{base}/lake")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from etl_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible ``queries()`` entry."""
    from etl_ray.pipelines.queries import ORACLE

    return dict(ORACLE)
