"""Benchmark CLI (SURVEY.md §3.3, §6).

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) under one local Ray session with
``num_cpus=$RAY_GRAFT_CPUS`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N}

``--scaling``: runs the CDC-replay headline job twice in FRESH child
processes (num_cpus=8 then num_cpus=32) on the same synthesized WAL and
reports events/s at both parallelism levels plus scaling efficiency —
the sandbox proxy for the N→4N-node cluster criterion in
BASELINE.json:2 (no real cluster is available here).

Owns its Ray session (scripts do; library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# WAL sizing for the CDC headline job (same input for both scaling runs)
CDC_KEYS, CDC_REPOS, CDC_EPOCHS, CDC_PARTITIONS = 20_000, 200, 6, 64

BENCH_QUERIES = [
    "agg_group_q1",       # groupby shuffle over lineitem 600k
    "join_inner",         # distributed hash join orders×customer
    "join_star_region",   # join + broadcast dims + rollup
    "window_hourly",      # event-time window aggregate
    "count_distinct",     # two-stage distinct aggregate
    "dedup_exact",        # content-hash dedup
    "dedup_minhash",      # shingle→minhash→LSH→verify
    "token_histogram",    # explode + partial-agg shuffle
    "ann_topk",           # brute-force cosine top-k
    "hash_sha256",        # per-row invariant hash
]


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def _consume(res) -> int:
    """Fully execute a query result; return its row count."""
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return len(res)
    if hasattr(res, "count"):
        return res.count()
    return len(res)


def run_queries() -> dict:
    _init_ray(NUM_CPUS)
    from etl_ray.pipelines.queries import QUERIES

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        _consume(QUERIES[name](SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    # CDC replay headline: events/s on a synthesized WAL
    wal = _ensure_wal("/tmp/etl_ray_bench/wal")
    lake = "/tmp/etl_ray_bench/lake"
    shutil.rmtree(lake, ignore_errors=True)
    from etl_ray.pipelines.cdc import replay

    s = replay(wal, lake, CDC_EPOCHS, num_partitions=CDC_PARTITIONS)
    timings["cdc_replay"] = round(s["wall_s"], 3)
    total = round(sum(timings.values()), 3)
    return {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "num_cpus": NUM_CPUS,
        "cdc_events_per_s": round(s["events_per_s"], 1),
        "cdc_n_events": s["n_events"],
    }


def _sf_from_dir(d: str):
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return base


def _ensure_wal(wal_dir: str) -> str:
    """Generate the bench WAL once; reuse across runs (deterministic)."""
    done = os.path.join(wal_dir, "_DONE")
    if os.path.exists(done):
        return wal_dir
    shutil.rmtree(wal_dir, ignore_errors=True)
    from etl_ray.sources.corpus import generate_corpus
    from etl_ray.sources.wal import generate_wal

    corpus = generate_corpus(CDC_KEYS, n_repos=CDC_REPOS)
    generate_wal(corpus, wal_dir, n_epochs=CDC_EPOCHS, n_repos=CDC_REPOS)
    with open(done, "w") as f:
        f.write("ok")
    return wal_dir


def run_cdc_child(num_cpus: int) -> None:
    """Child-process entry: replay the shared WAL at one parallelism."""
    _init_ray(num_cpus)
    wal = _ensure_wal("/tmp/etl_ray_bench/wal")
    lake = f"/tmp/etl_ray_bench/lake_c{num_cpus}"
    shutil.rmtree(lake, ignore_errors=True)
    from etl_ray.pipelines.cdc import replay

    s = replay(wal, lake, CDC_EPOCHS, num_partitions=CDC_PARTITIONS,
               concurrency=max(2, num_cpus // 2))
    print(json.dumps({"num_cpus": num_cpus, "n_events": s["n_events"],
                      "wall_s": round(s["wall_s"], 3),
                      "events_per_s": round(s["events_per_s"], 1)}))


def run_scaling() -> dict:
    """Same job, fresh ray sessions at 8 and 32 CPUs (driver protocol)."""
    # generate the WAL once up front (in its own session, then shut down)
    _init_ray(NUM_CPUS)
    _ensure_wal("/tmp/etl_ray_bench/wal")
    import ray

    ray.shutdown()

    results = {}
    for n in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cdc-child", str(n)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[n] = json.loads(line)
    t8, t32 = results[8]["events_per_s"], results[32]["events_per_s"]
    eff = (t32 / t8) / 4 if t8 > 0 else 0.0
    return {
        "metric": "cdc_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {"events_per_s@8": t8, "events_per_s@32": t32,
                    "wall_s@8": results[8]["wall_s"],
                    "wall_s@32": results[32]["wall_s"]},
        "sf": _sf_from_dir(SF_DIR),
        "num_cpus": 32,
        "n_events": results[32]["n_events"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cdc-child", type=int, default=None,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()
    import ray

    if args.cdc_child is not None:
        run_cdc_child(args.cdc_child)
    elif args.scaling:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_queries()))
    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
