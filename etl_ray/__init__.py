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

__version__ = "0.1.0"
