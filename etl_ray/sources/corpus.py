"""Deterministic source-code corpus generator (FIXTURES.md §1).

Produces the input-table shape mandated by BASELINE.json:15:
``(repo: string, path: string, commit: string, lang: string,
content: string)``. Everything is a pure function of
``(seed, repo, path, version)`` so the WAL generator and the
single-process reference interpreter can recompute identical
after-images independently, and distributed generation is
embarrassingly parallel (``ray.data.range -> map_batches``).
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa

import ray.data

SEED = 42
N_ORGS = 7
LANGS = ["py", "rs", "go", "js", "java", "c", "md"]
LANG_WEIGHTS = [0.30, 0.10, 0.10, 0.20, 0.10, 0.10, 0.10]
_EXT = {"py": "py", "rs": "rs", "go": "go", "js": "js", "java": "java", "c": "c", "md": "md"}
_VOCAB = (
    "def return import class self for while if else elif try except "
    "fn let mut pub struct impl match use mod func var const type "
    "interface package void static final public private int float "
    "string bool map list vec println printf error nil null true false"
).split()
_DIRS = ["core", "util", "io", "net", "api", "db", "cli", "test", "lib", "pkg"]


def repo_name(repo_idx: int) -> str:
    return f"org{repo_idx % N_ORGS}/repo{repo_idx}"


def _row_rng(seed: int, repo: str, path: str, version: int) -> random.Random:
    return random.Random(f"{seed}:{repo}:{path}:{version}")


def make_path(seed: int, repo: str, file_idx: int) -> tuple[str, str]:
    """Deterministic (path, lang) for the file_idx-th file of a repo."""
    rng = random.Random(f"{seed}:path:{repo}:{file_idx}")
    lang = rng.choices(LANGS, weights=LANG_WEIGHTS, k=1)[0]
    depth = rng.randint(1, 3)
    dirs = "/".join(rng.choice(_DIRS) for _ in range(depth))
    name = f"{rng.choice(_VOCAB)}_{file_idx}"
    return f"src/{dirs}/{name}.{_EXT[lang]}", lang


_MEAN_TOKEN = sum(len(w) + 1 for w in _VOCAB) / len(_VOCAB)


def make_content(seed: int, repo: str, path: str, version: int) -> str:
    """Deterministic token soup, ~64–4096 chars.

    One bulk ``rng.choices`` call instead of a per-word loop — content
    generation is the WAL generator's hot path at bench scale.
    """
    rng = _row_rng(seed, repo, path, version)
    target = rng.randint(64, 4096)
    k = max(1, round(target / _MEAN_TOKEN))
    return " ".join(rng.choices(_VOCAB, k=k))


def make_commit(seed: int, repo: str, path: str, version: int) -> str:
    return hashlib.sha1(f"{seed}:{repo}:{path}:{version}".encode()).hexdigest()


def corpus_row(seed: int, repo_idx: int, file_idx: int, version: int = 1) -> dict:
    repo = repo_name(repo_idx)
    path, lang = make_path(seed, repo, file_idx)
    return {
        "repo": repo,
        "path": path,
        "commit": make_commit(seed, repo, path, version),
        "lang": lang,
        "content": make_content(seed, repo, path, version),
    }


def corpus_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """Driver-table corpus: map the sf* ``documents`` table onto the
    mandated corpus shape (repo, path, commit, lang, content) —
    BASELINE.json:15 — so the flagship replay runs over driver data.

    repo = the document's source, path = doc/<id>.txt, commit = sha1 of
    the content (deterministic), content = text.
    """
    import hashlib as _hl

    import pyarrow as _pa

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang", "source"])

    def _map(t: _pa.Table) -> _pa.Table:
        texts = t["text"].to_pylist()
        return _pa.table({
            "repo": t["source"],
            "path": _pa.array([f"doc/{i}.txt" for i in t["doc_id"].to_pylist()],
                              _pa.string()),
            "commit": _pa.array(
                [_hl.sha1(s.encode()).hexdigest() for s in texts],
                _pa.string()),
            "lang": t["lang"],
            "content": t["text"],
        })

    return ds.map_batches(_map, batch_format="pyarrow")


def generate_corpus(n_rows: int, n_repos: int | None = None, seed: int = SEED,
                    parallelism: int = -1) -> "ray.data.Dataset":
    """Distributed corpus generation: one row per (repo, path) key.

    Row j belongs to repo ``j * n_repos // n_rows`` (even split) with a
    per-repo file counter, so the mapping is a pure function of j.
    """
    if n_repos is None:
        n_repos = max(1, n_rows // 20)

    def _make(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("repo", "path", "commit", "lang", "content")}
        for j in batch["id"].to_pylist():
            repo_idx = j * n_repos // n_rows
            first_j = -(-repo_idx * n_rows // n_repos)  # ceil division inverse
            file_idx = j - first_j
            r = corpus_row(seed, repo_idx, file_idx)
            for k, v in r.items():
                rows[k].append(v)
        return pa.table(rows)

    ds = ray.data.range(n_rows, override_num_blocks=None if parallelism == -1 else parallelism)
    return ds.map_batches(_make, batch_format="pyarrow")
