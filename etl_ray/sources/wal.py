"""Synthetic WAL (change-event log) generator + reader (FIXTURES.md §2).

Event schema (epoch-partitioned Parquet, ``wal_dir/epoch=K/``):

    lsn:int64  epoch:int32  op:string(I|U|D)  repo path commit lang
    content:string  size:int32|int64  [stars:int64 from epoch >= E/2]

Semantics (BASELINE.json:6): events keyed by ``(repo, path)`` in commit
order. ``lsn`` is the ordering authority — strictly increasing per key,
globally unique; block/file order is never relied on.

Generation is deterministic (seed) and distributed: per corpus key, a
lifecycle ``I → Geometric(p=0.5) updates (× Zipf(1.3) hot-repo
multiplier) → D w.p. 0.15`` is produced inside ``map_batches``; each
event draws a uniform priority ``u`` (sorted per key so commit order
holds) and the global interleave is ``lsn = f(u)`` — monotone in u, so
epochs are simply ``epoch = floor(u * E)``: equal-ish-sized contiguous
lsn ranges with no global sort or sequential pass.

Schema evolution (BASELINE.json:6,14 "add-column/type-widen"): epochs
``>= E//2`` add ``stars:int64`` and widen ``size:int32 → int64``.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from etl_ray.sources.corpus import SEED, make_commit, make_content

DELETE_P = 0.15
ZIPF_A = 1.3
WAL_COLS = ["lsn", "epoch", "op", "repo", "path", "commit", "lang", "content", "size"]


def _priority_to_lsn(u: float, tiebreak: int) -> int:
    # monotone in u; 2048-way tiebreak keeps lsns unique even if two keys
    # draw floats that truncate to the same 52-bit integer.
    return (int(u * (1 << 52)) << 11) | (tiebreak & 0x7FF)


def _events_for_key(seed: int, repo: str, path: str, lang: str,
                    repo_idx: int, n_repos: int, n_epochs: int,
                    hot_updates: int, update_p: float = 0.5) -> list[dict]:
    rng = random.Random(f"{seed}:wal:{repo}:{path}")
    # geometric(update_p) update count + Zipf-weighted hot-repo extras;
    # update_p tunes churn: 0.5 → ~1 update/key (insert-heavy), 0.85 →
    # ~5.7 (update-heavy, the realistic CDC regime where LWW reduction
    # actually compacts)
    n_upd = 0
    while rng.random() < update_p:
        n_upd += 1
    zipf_w = (repo_idx + 1) ** -ZIPF_A  # rank-based Zipf popularity
    n_upd += int(hot_updates * zipf_w)
    deleted = rng.random() < DELETE_P

    n_events = 1 + n_upd + (1 if deleted else 0)
    prios = sorted(rng.random() for _ in range(n_events))
    tb = rng.randrange(1 << 11)
    out = []
    for k in range(n_events):
        version = k + 1
        is_delete = deleted and k == n_events - 1
        u = prios[k]
        epoch = min(n_epochs - 1, int(u * n_epochs))
        ev = {
            "lsn": _priority_to_lsn(u, tb),
            "epoch": epoch,
            "op": "D" if is_delete else ("I" if k == 0 else "U"),
            "repo": repo,
            "path": path,
        }
        if is_delete:
            ev.update(commit=None, lang=None, content=None, size=None, stars=None)
        else:
            content = make_content(seed, repo, path, version)
            ev.update(
                commit=make_commit(seed, repo, path, version),
                lang=lang,
                content=content,
                size=len(content),
                stars=len(content) * 7 % 1000,  # deterministic toy metadata
            )
        out.append(ev)
    return out


def _repo_index(repo: str, n_repos: int) -> int:
    """Zipf popularity rank of a repo: trailing digits when the synthetic
    naming provides them, else a stable content hash (driver-derived
    corpora name repos arbitrarily)."""
    tail = repo.rsplit("repo", 1)[-1]
    if tail.isdigit():
        return int(tail)
    import hashlib as _hl

    return int(_hl.sha1(repo.encode()).hexdigest()[:8], 16) % max(1, n_repos)


def generate_wal(corpus: "ray.data.Dataset", wal_dir: str, n_epochs: int,
                 n_repos: int, seed: int = SEED, hot_updates: int = 8,
                 update_p: float = 0.5) -> dict:
    """Materialize an epoch-partitioned WAL under ``wal_dir``.

    Writes ``wal_dir/epoch=K/part-*.parquet`` per epoch with the
    epoch-appropriate schema (size:int32, no stars before E//2;
    size:int64 + stars:int64 after). Returns ``{"n_events": int,
    "n_epochs": int}``.
    """
    evolve_from = n_epochs // 2

    def _gen(batch: pa.Table) -> pa.Table:
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        langs = batch["lang"].to_pylist()
        rows: list[dict] = []
        for repo, path, lang in zip(repos, paths, langs):
            repo_idx = _repo_index(repo, n_repos)
            rows.extend(_events_for_key(seed, repo, path, lang, repo_idx,
                                        n_repos, n_epochs, hot_updates,
                                        update_p))
        cols = ["lsn", "epoch", "op", "repo", "path", "commit", "lang",
                "content", "size", "stars"]
        return pa.table(
            {c: pa.array([r[c] for r in rows],
                         type={"lsn": pa.int64(), "epoch": pa.int32(),
                               "size": pa.int64(), "stars": pa.int64()}.get(c, pa.string()))
             for c in cols})

    events = corpus.map_batches(_gen, batch_format="pyarrow").materialize()
    n_events = events.count()

    for k in range(n_epochs):
        ep = events.filter(expr=f"epoch == {k}")
        if k < evolve_from:
            # pre-evolution schema: no stars column, size is int32
            ep = ep.map_batches(
                lambda t: t.drop_columns(["stars"]).set_column(
                    t.schema.get_field_index("size"), "size",
                    t["size"].cast(pa.int32())),
                batch_format="pyarrow")
        ep.write_parquet(f"{wal_dir}/epoch={k}")
    return {"n_events": n_events, "n_epochs": n_epochs}


def read_epoch(wal_dir: str, epoch: int,
               blocks_per_cpu: float = 2.0) -> "ray.data.Dataset":
    """Read one epoch of the WAL as a Dataset (files carry the epoch col).

    The block count is forced explicitly: an epoch often lands in one or
    two Parquet files, and downstream parallelism follows *input
    blocks* — with the default inference a whole epoch could run as a
    single task. Direct-mode ingest (no shuffle) wants ~2 blocks/CPU
    for smooth load balance; the sorted-merge path passes a smaller
    factor because the sort-shuffle's object-IPC load grows with block
    count and the single-node raylet saturates before the CPUs do.
    """
    import ray as _ray

    try:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 — uninitialised session
        cpus = 8
    n_blocks = max(8, int(cpus * blocks_per_cpu))
    return ray.data.read_parquet(f"{wal_dir}/epoch={epoch}",
                                 override_num_blocks=n_blocks)


def reference_replay(wal_dir: str, n_epochs: int) -> dict[tuple[str, str], dict]:
    """Single-process reference LWW interpreter (SURVEY.md §5.3).

    Deliberately trivial — the in-repo stand-in for the unavailable
    reference replay: read every epoch with pyarrow, sort by lsn, apply
    dict upserts. Returns {key: row} of live rows.
    """
    tables = []
    for k in range(n_epochs):
        t = pq.read_table(f"{wal_dir}/epoch={k}")
        if "stars" not in t.column_names:
            t = t.append_column("stars", pa.nulls(len(t), pa.int64()))
        t = t.set_column(t.schema.get_field_index("size"), "size",
                         t["size"].cast(pa.int64()))
        tables.append(t.select(["lsn", "op", "repo", "path", "commit",
                                "lang", "content", "size", "stars"]))
    all_ev = pa.concat_tables(tables)
    order = np.argsort(all_ev["lsn"].to_numpy(), kind="stable")
    rows = all_ev.to_pylist()
    state: dict[tuple[str, str], dict] = {}
    for i in order:
        r = rows[i]
        key = (r["repo"], r["path"])
        if r["op"] == "D":
            state.pop(key, None)
        else:
            state[key] = r
    return state
