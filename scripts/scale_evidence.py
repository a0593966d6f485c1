#!/usr/bin/env python
"""Scale-evidence runners (round-3 verdict items 2 & 4) — each owns its
Ray session, so run them standalone (never inside another Ray job):

  python scripts/scale_evidence.py capped    [--store-gb 4] [--replicate 160]
      flagship on the scaling corpus with the object store capped far
      below the shuffle working set: proves the streaming executor
      SPILLS instead of OOMing (at 100 TB plasma never fits the
      shuffle).  Prints wall / peak RSS / spilled MB.

  python scripts/scale_evidence.py multinode [--nodes 4] [--replicate 40]
      flagship on a simulated multi-node cluster (ray.cluster_utils.
      Cluster: N raylets + N plasma stores on this host), so the three
      tier shuffles move blocks BETWEEN object stores — the closest this
      sandbox gets to cross-node transfer.  No code path special-cases
      single-node: the pipeline is identical, only ray.init differs.

Results are recorded in BASELINE.md; pytest smokes at tiny scale live in
tests/test_scale_evidence.py (marked 'scale').
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_capped(args) -> dict:
    import ray

    import bench

    ray.init(
        address="local",
        num_cpus=args.cpus,
        object_store_memory=int(args.store_gb * (1 << 30)),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    flag = bench.run_flagship(args.sf_dir, args.replicate, args.heavy)
    out = {
        "mode": "capped-object-store",
        "object_store_gb": args.store_gb,
        "num_cpus": args.cpus,
        "replicate": args.replicate,
        "heavy": args.heavy,
        "wall_s": round(flag["wall_s"], 3),
        "n_pages": flag["n_pages"],
        "pages_per_s": round(flag["pages_per_s"], 1),
        "peak_rss_mb": flag["peak_rss_mb"],
        "spilled_mb": bench._spill_stats_mb(),
        "tiers": flag["tiers"],
    }
    ray.shutdown()
    return out


def run_multinode(args) -> dict:
    # simulated fixed-size cluster: N raylets, N plasma stores, one host.
    # Ray Data schedules read/extract/shuffle tasks across all nodes and
    # blocks transfer between object stores over the loopback transport.
    os.environ.setdefault("RAY_DEDUP_LOGS", "1")
    import ray
    from ray.cluster_utils import Cluster

    import bench

    store = int(args.store_gb * (1 << 30))
    cluster = Cluster(
        initialize_head=True,
        head_node_args={
            "num_cpus": args.cpus // args.nodes,
            "object_store_memory": store,
            "include_dashboard": False,
        },
    )
    for _ in range(args.nodes - 1):
        cluster.add_node(num_cpus=args.cpus // args.nodes,
                         object_store_memory=store)
    cluster.wait_for_nodes()
    ray.init(address=cluster.address, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    n_alive = len([n for n in ray.nodes() if n["Alive"]])
    flag = bench.run_flagship(args.sf_dir, args.replicate, args.heavy)
    out = {
        "mode": "simulated-multinode",
        "n_nodes": n_alive,
        "cpus_per_node": args.cpus // args.nodes,
        "object_store_gb_per_node": args.store_gb,
        "replicate": args.replicate,
        "heavy": args.heavy,
        "wall_s": round(flag["wall_s"], 3),
        "n_pages": flag["n_pages"],
        "pages_per_s": round(flag["pages_per_s"], 1),
        "peak_rss_mb": flag["peak_rss_mb"],
        "tiers": flag["tiers"],
    }
    ray.shutdown()
    cluster.shutdown()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["capped", "multinode"])
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--nodes", type=int, default=4)
    ap.add_argument("--store-gb", type=float, default=None)
    ap.add_argument("--replicate", type=int, default=None)
    ap.add_argument("--heavy", type=int, default=None)
    args = ap.parse_args()
    if args.mode == "capped":
        # defaults: the 8 GB scaling corpus with a 4 GB store
        args.store_gb = args.store_gb or 4.0
        args.replicate = args.replicate or 160
        args.heavy = args.heavy or 40
        print(json.dumps(run_capped(args)))
    else:
        # defaults: the per-round 200k-page corpus, 2 GB store per node
        args.store_gb = args.store_gb or 2.0
        args.replicate = args.replicate or 40
        args.heavy = args.heavy or 1
        print(json.dumps(run_multinode(args)))


if __name__ == "__main__":
    main()
