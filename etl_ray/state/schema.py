"""Schema evolution: Arrow schema unification (add-column / type-widen).

BASELINE.json:6,14 — per micro-batch, the incoming epoch's schema is
unified with the lake's running schema; columns may be added and integer
types widened (int32→int64 etc). Narrowing or incompatible changes are
errors. The authoritative current schema is persisted in the manifest
log (Delta-Lake-style metadata, PAPERS.md), so readers never scan all
file footers.
"""

from __future__ import annotations

import base64

import pyarrow as pa


class SchemaEvolutionError(ValueError):
    pass


def unify(current: pa.Schema | None, incoming: pa.Schema) -> pa.Schema:
    """Widen ``current`` to cover ``incoming`` (add-column / type-widen)."""
    if current is None:
        return incoming
    try:
        unified = pa.unify_schemas([current, incoming], promote_options="permissive")
    except (pa.lib.ArrowException, TypeError) as e:
        # pyarrow raises ArrowTypeError (a TypeError subclass, NOT an
        # ArrowInvalid) for unmergeable field types
        raise SchemaEvolutionError(f"incompatible schema change: {e}") from e
    # forbid silent column drops (unify never drops, but guard anyway)
    names = set(unified.names)
    missing = [n for n in current.names if n not in names]
    if missing:
        raise SchemaEvolutionError(f"schema narrowing not allowed: lost {missing}")
    return unified


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast a batch up to the unified schema; missing columns → null."""
    cols = []
    for field in schema:
        if field.name in table.column_names:
            col = table[field.name]
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(len(table), field.type))
    return pa.Table.from_arrays(cols, schema=schema)


def to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def from_b64(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))
