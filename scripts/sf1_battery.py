#!/usr/bin/env python
"""sf1 (10x) battery timing run (round-3 verdict item 1 evidence).

Runs EVERY queries() entry engine-side over the sf1 corpus in one fresh
Ray session (same protocol as bench.run_queries: force execution, drop
block refs + gc between queries), writes SF1_DETAIL.json, and prints a
sub-linearity report against the sf0.1 per-query timings in
BENCH_DETAIL.json: at 10x input a query slower than 10x its sf0.1 time
is super-linear and gets flagged.

Usage: python scripts/sf1_battery.py [/tmp/graft_sf1]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import bench

    t0 = time.monotonic()
    queries, cold_builds = bench.run_queries(sf_dir)
    total = time.monotonic() - t0

    try:
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
            sf01 = json.load(fh).get("queries", {})
    except (FileNotFoundError, json.JSONDecodeError):
        sf01 = {}

    superlinear = []
    for name, secs in queries.items():
        old = sf01.get(name)
        # floor keeps fixed-latency noise out: a 0.4 s query at sf0.1 that
        # takes 5 s at sf1 is 12.5x "slower" but still trivially cheap
        if old and old > 0 and secs > 10 * old and secs - 10 * old > 2.0:
            superlinear.append({"query": name, "sf01_s": old,
                                "sf1_s": secs,
                                "ratio_vs_10x": round(secs / (10 * old), 2)})
    superlinear.sort(key=lambda r: -r["ratio_vs_10x"])

    out = {
        "sf": sf_dir,
        "num_cpus": 32,
        "n_queries": len(queries),
        "total_s": round(total, 1),
        "cold_builds": cold_builds,
        "superlinear_vs_10x_sf01": superlinear,
        "queries": {k: queries[k] for k in sorted(queries)},
    }
    with open(os.path.join(REPO, "SF1_DETAIL.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    ray.shutdown()


if __name__ == "__main__":
    main()
