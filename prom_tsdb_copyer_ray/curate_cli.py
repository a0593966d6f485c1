"""CLI for the corpus-curation flagship (pipelines/curate.run_curate).

    python -m prom_tsdb_copyer_ray.curate_cli DOCS.parquet OUT/ \
        [--min-tokens 30] [--num-shards 16] [--no-resume] [--num-cpus N]

Normalizes, quality-filters and exact-dedups a documents table into
shard-partitioned parquet with a resume manifest (crash -> rerun skips
committed shards).  Prints the manifest summary as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="curate")
    p.add_argument("source", help="documents parquet (doc_id, lang, source, text)")
    p.add_argument("target", help="output dir (docs/shard=*/ + manifest)")
    p.add_argument("--min-tokens", type=int, default=30)
    p.add_argument("--distinct-mult", type=int, default=3)
    p.add_argument("--num-shards", type=int, default=16)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")

    from .pipelines.curate import run_curate

    manifest = run_curate(
        args.source, args.target,
        num_shards=args.num_shards,
        min_tokens=args.min_tokens,
        distinct_mult=args.distinct_mult,
        resume=not args.no_resume,
    )
    print(json.dumps({
        "status": manifest.get("status"),
        "shards": len(manifest.get("shards", {})),
    }, sort_keys=True))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
