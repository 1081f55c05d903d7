"""User-extension surface (SURVEY.md §2.10): composable pipeline steps.

An eemeter-style toolkit exposes its pipeline as composable task
classes; the Ray-Data-native equivalent is a ``Step`` protocol over
``Dataset -> Dataset`` plus a ``Pipeline`` that chains them lazily (the
streaming executor still sees one fused DAG — composition adds no
materialization points).

    pipe = Pipeline([
        MapBatchesStep("sha", add_sha_fn),
        FilterStep("ok", lambda t: pc.equal(t["audit_ok"], True)),
    ])
    out = pipe(ds)
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, Protocol, runtime_checkable

import pyarrow as pa


@runtime_checkable
class Step(Protocol):
    """One named pipeline stage: Dataset in, Dataset out, lazy."""

    name: str

    def apply(self, ds: Any) -> Any: ...


class MapBatchesStep:
    """Wrap a vectorized Arrow batch function (or callable class for an
    actor-pool stage) as a Step."""

    def __init__(self, name: str, fn: Callable | type, **map_kwargs: Any):
        self.name = name
        self.fn = fn
        self.map_kwargs = {"batch_format": "pyarrow", **map_kwargs}

    def apply(self, ds):
        return ds.map_batches(self.fn, **self.map_kwargs)


class FilterStep:
    """Vectorized predicate: fn(table) -> boolean mask."""

    def __init__(self, name: str, mask_fn: Callable[[pa.Table], Any]):
        self.name = name
        self.mask_fn = mask_fn

    def apply(self, ds):
        fn = self.mask_fn
        return ds.map_batches(lambda t: t.filter(fn(t)),
                              batch_format="pyarrow")


class SelectStep:
    def __init__(self, columns: list[str], name: str = "select"):
        self.name = name
        self.columns = columns

    def apply(self, ds):
        return ds.select_columns(self.columns)


class Pipeline:
    """Ordered chain of Steps; itself a Step (composable)."""

    def __init__(self, steps: list[Step], name: str = "pipeline"):
        for s in steps:
            if not isinstance(s, Step):
                raise TypeError(f"not a Step: {s!r}")
        self.steps = list(steps)
        self.name = name

    def apply(self, ds):
        for s in self.steps:
            ds = s.apply(ds)
        return ds

    __call__ = apply

    def then(self, step: Step) -> "Pipeline":
        return Pipeline([*self.steps, step], name=self.name)
