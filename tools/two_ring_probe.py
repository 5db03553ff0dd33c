"""Query-tier node-scaling probe: two resource-isolated Ray sessions.

The replica-ring probe (BASELINE.md round 3) measured adding rings
INSIDE one Ray session.  This probe simulates two cluster NODES: two
independent Ray instances (fresh processes, ``num_cpus=N`` each), each
holding a FULL searcher ring over the same on-disk index, serving the
same query batch concurrently.  A real cluster adds exactly such a
unit per node (own object store, own actor pool, own DRAM bandwidth
share), so ``aggregate q/s / single-ring q/s`` is the per-added-node
scaling measurement — bounded above by 2× and below by the host's
measured DRAM-contention envelope when both rings share one socket.

Usage:
  python tools/two_ring_probe.py            # orchestrates both runs
  python tools/two_ring_probe.py --worker   # one ring (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

IDX = os.environ.get("GRAFT_IDX", "/dev/shm/graft_bench/bench_idx_32")
NCPU = int(os.environ.get("GRAFT_RING_CPUS", "16"))
N_QUERIES = int(os.environ.get("GRAFT_RING_QUERIES", "1600"))


def worker() -> None:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_queries
    from web_based_search_engine_ray.pipelines.search import ShardedSearcher

    queries = make_queries(N_QUERIES)
    searcher = ShardedSearcher(IDX, num_cpus_per_shard=0.25, replicas=1)
    searcher.batch_search(queries, k=10)  # warm: decode + actor spin-up
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        searcher.batch_search(queries, k=10)
        best = min(best, time.perf_counter() - t0)
    searcher.shutdown()
    ray.shutdown()
    print(json.dumps({"qps": N_QUERIES / best, "sec": best}))


def run(n_procs: int) -> list[dict]:
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for _ in range(n_procs)
    ]
    out = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        out.append(json.loads(stdout.strip().splitlines()[-1]))
    return out


def main() -> None:
    one = run(1)[0]
    two = run(2)
    agg = sum(r["qps"] for r in two)
    print(json.dumps({
        "metric": "two-ring aggregate q/s vs one ring (isolated sessions)",
        "cpus_per_ring": NCPU,
        "n_queries": N_QUERIES,
        "one_ring_qps": round(one["qps"], 1),
        "two_ring_qps_each": [round(r["qps"], 1) for r in two],
        "two_ring_aggregate_qps": round(agg, 1),
        "scaling_x": round(agg / one["qps"], 3),
    }))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        main()
