"""Shared helpers for the operator-conformance query layer.

Every query reads the driver tables with explicit column pruning
(`read_parquet(columns=...)`) so only the needed columns leave storage
— at 100 TB a full-width read for a 2-column transform is the first
thing that breaks (SURVEY.md §"prune at the read").
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def _tune_data_context() -> None:
    """Engine-level Ray Data tuning, applied once per process.

    ``Dataset.join`` spawns one HashShuffleAggregator actor per
    partition, each reserving a full CPU by default; on a small session
    (4-CPU pytest fixture, 8-CPU scaling run) those reservations starve
    concurrent actor-pool stages and execution stalls for
    ``min_hash_shuffle_aggregator_wait_time_in_s`` (300 s default).
    Fractional reservations + a short wait keep joins schedulable
    alongside map actors at any session size.
    """
    try:
        ctx = ray.data.DataContext.get_current()
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.5
        ctx.min_hash_shuffle_aggregator_wait_time_in_s = 30
    except Exception:  # noqa: BLE001 — never block import on tuning
        pass


_tune_data_context()

# Hash-join partition cap for the conformance queries. At sf0.01 this
# is plenty; a cluster run sizes it to ~2×cores with 64–128 MiB blocks.
JOIN_PARTITIONS = 16


def join_partitions(cap: int = JOIN_PARTITIONS) -> int:
    """Join fan-out sized to the session's CPUs.

    Each hash-shuffle join spins up `num_partitions` aggregator actors;
    more partitions than cores just multiplies actor-startup latency
    (and can starve a small test session outright).
    """
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 — uninitialised session
        n = 8
    return max(2, min(cap, n))


def read(sf_dir: str, table: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Column-pruned parquet read with a METADATA-FREE schema.

    The testdata parquet files embed a `pandas` metadata dict, which
    makes their Arrow schemas UNHASHABLE (pa.Schema.__hash__ hashes the
    metadata dict) — every schema unify in read/shuffle workers then
    logs `Failed to hash the schemas (for deduplication)` and skips its
    dedup fast path. Passing the footer schema stripped of metadata
    keeps every downstream block schema clean and hashable; the footer
    read is one driver-side open per query."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:  # schema must match the projected batches
        sch = pa.schema([sch.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=sch)


def one_row_table(row: dict, schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a global-aggregate result dict as a 1-row Arrow table."""
    return pa.Table.from_pylist([row], schema=schema)


def fixed_point(t: pa.Table, col: str, scale: int) -> pa.Table:
    """Replace a double column with round(x*scale) as int64.

    Aggregated doubles differ from the DuckDB oracle in the last ulp
    (summation order), so emitting them raw or decimal-rounded is
    hash-fragile. Fixed-point integers are bit-stable: the matching SQL
    is ``CAST(ROUND(x * scale) AS BIGINT)``.
    """
    import pyarrow.compute as pc

    v = pc.round(pc.multiply(t[col], float(scale)), ndigits=0,
                 round_mode="half_towards_infinity")
    return t.set_column(t.schema.get_field_index(col), col,
                        pc.cast(v, pa.int64()))


def fixed_point_scalar(x: float, scale: int = 1) -> int:
    """Driver-side scalar twin of :func:`fixed_point`.

    Sign-aware half-away-from-zero (SQL ROUND semantics) — Python's
    ``round()`` is banker's rounding and numpy's ``floor(x+0.5)`` is
    half-up, both of which diverge from DuckDB on exact .5 values.
    """
    import math

    return int(math.copysign(math.floor(abs(x) * scale + 0.5), x))


def half_away_int64(x):
    """Vectorized sign-aware half-away-from-zero → np.int64 array."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
