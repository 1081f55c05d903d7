"""CDC pipelines exposed through the conformance-query registry.

These are the flagship (non-SQL-expressible) pipelines — the driver
records a rows-only check; determinism of the row count is guaranteed by
the seeded WAL generator + the replay-determinism tests.
"""

from __future__ import annotations

import hashlib
import shutil

from etl_ray.pipelines.queries import register


def _workdir(sf_dir: str, tag: str) -> str:
    h = hashlib.sha1(f"{sf_dir}:{tag}".encode()).hexdigest()[:10]
    return f"/tmp/etl_ray_q/{tag}-{h}"


@register("cdc_replay")
def cdc_replay(sf_dir: str):
    """Full WAL replay → converged lake state (SURVEY.md §3.1).

    Sized by sf_dir only through a fixed smoke-scale corpus (the WAL is
    synthesized — TESTDATA's tables don't carry change events).
    """
    from etl_ray.pipelines.cdc import replay
    from etl_ray.sources.corpus import generate_corpus
    from etl_ray.sources.wal import generate_wal
    from etl_ray.state.lake import read_lake

    base = _workdir(sf_dir, "replay")
    shutil.rmtree(base, ignore_errors=True)
    n_keys, n_repos, n_epochs = 400, 16, 4
    corpus = generate_corpus(n_keys, n_repos=n_repos)
    generate_wal(corpus, f"{base}/wal", n_epochs=n_epochs, n_repos=n_repos)
    replay(f"{base}/wal", f"{base}/lake", n_epochs, num_partitions=8)
    return read_lake(f"{base}/lake")


@register("cdc_resume")
def cdc_resume(sf_dir: str):
    """Kill-at-epoch-k + resume-from-checkpoint replay; returns the
    reconverged lake (identical to cdc_replay's by the determinism
    invariant)."""
    from etl_ray.pipelines.cdc import replay
    from etl_ray.sources.corpus import generate_corpus
    from etl_ray.sources.wal import generate_wal
    from etl_ray.state.lake import read_lake

    base = _workdir(sf_dir, "resume")
    shutil.rmtree(base, ignore_errors=True)
    n_keys, n_repos, n_epochs = 400, 16, 4
    corpus = generate_corpus(n_keys, n_repos=n_repos)
    generate_wal(corpus, f"{base}/wal", n_epochs=n_epochs, n_repos=n_repos)
    replay(f"{base}/wal", f"{base}/lake", n_epochs, num_partitions=8,
           stop_after=2)  # simulated crash
    replay(f"{base}/wal", f"{base}/lake", n_epochs, num_partitions=8)
    return read_lake(f"{base}/lake")


@register("cdc_compact")
def cdc_compact(sf_dir: str):
    """Replay then compact the lake to one resolved base per partition
    (S4); returns the compacted current state — identical row set to
    cdc_replay's by the compaction-preserves-state invariant."""
    from etl_ray.pipelines.cdc import replay
    from etl_ray.sources.corpus import generate_corpus
    from etl_ray.sources.wal import generate_wal
    from etl_ray.state.lake import compact, read_lake

    base = _workdir(sf_dir, "compact")
    shutil.rmtree(base, ignore_errors=True)
    n_keys, n_repos, n_epochs = 400, 16, 4
    corpus = generate_corpus(n_keys, n_repos=n_repos)
    generate_wal(corpus, f"{base}/wal", n_epochs=n_epochs, n_repos=n_repos)
    replay(f"{base}/wal", f"{base}/lake", n_epochs, num_partitions=8)
    compact(f"{base}/lake")
    return read_lake(f"{base}/lake")


@register("cdc_lineage")
def cdc_lineage(sf_dir: str):
    """Per-partition lineage records (offset ranges, counts, checksums)
    for a completed replay — BASELINE.json:6 metrics surface."""
    from etl_ray.pipelines.cdc import replay
    from etl_ray.sources.corpus import generate_corpus
    from etl_ray.sources.wal import generate_wal
    from etl_ray.state.lineage import lineage_table

    base = _workdir(sf_dir, "lineage")
    shutil.rmtree(base, ignore_errors=True)
    n_keys, n_repos, n_epochs = 400, 16, 4
    corpus = generate_corpus(n_keys, n_repos=n_repos)
    generate_wal(corpus, f"{base}/wal", n_epochs=n_epochs, n_repos=n_repos)
    replay(f"{base}/wal", f"{base}/lake", n_epochs, num_partitions=8)
    return lineage_table(f"{base}/lake")
