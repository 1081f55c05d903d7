"""etl_ray — a Ray-Data-native CDC / incremental-ingest + data-processing engine.

Built from scratch against the capability set in SURVEY.md (the reference
repo ``jgoldsmith-gpt/etl`` is characterised there; `/root/reference` is
empty in this sandbox — see SURVEY.md §0 — so the binding spec is
BASELINE.json's north rule / north star plus the driver harness).

Architecture (Ray-Data-first):

- Every logical table is a ``ray.data.Dataset`` whose blocks are
  ``pyarrow.Table`` (``batch_format="pyarrow"`` end-to-end, zero-copy from
  the object store).
- Stateless transforms are vectorized ``map_batches`` over
  ``pyarrow.compute`` kernels; stateful stages (the CDC merge applier)
  are callable classes run as actor pools.
- Wide steps use ``groupby`` / ``sort`` / ``join``; partial aggregation
  happens inside ``map_batches`` before any shuffle; small sides are
  broadcast via ``ray.put``.
- The CDC sink is a two-phase, manifest-committed Parquet lake with
  monotonic epoch fencing (Delta-Lake-style transaction log, see
  PAPERS.md: Delta Lake, VLDB 2020), so replay from any checkpoint
  reconverges to the identical final table.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — the
driver, ``bench.py`` and the pytest session fixture own the Ray session.
"""

__version__ = "0.2.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import etl_ray` free of ray.data
    import cost until a surface is touched)."""
    from importlib import import_module

    api = {
        "replay": ("etl_ray.pipelines.cdc", "replay"),
        "read_lake": ("etl_ray.state.lake", "read_lake"),
        "compact": ("etl_ray.state.lake", "compact"),
        "vacuum": ("etl_ray.state.lake", "vacuum"),
        "changes_between": ("etl_ray.state.lake", "changes_between"),
        "lookup": ("etl_ray.state.lake", "lookup"),
        "audit_lake": ("etl_ray.state.lake", "audit_lake"),
        "LakeSink": ("etl_ray.state.datasink", "LakeSink"),
        "generate_wal": ("etl_ray.sources.wal", "generate_wal"),
        "generate_corpus": ("etl_ray.sources.corpus", "generate_corpus"),
        "Pipeline": ("etl_ray.pipelines.steps", "Pipeline"),
        "QUERIES": ("etl_ray.pipelines.queries", "QUERIES"),
        "ORACLE": ("etl_ray.pipelines.queries", "ORACLE"),
    }
    if name in api:
        mod, attr = api[name]
        return getattr(import_module(mod), attr)
    raise AttributeError(f"module 'etl_ray' has no attribute {name!r}")
