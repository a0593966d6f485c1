"""Run any registered query from the operator battery and save its result.

    python -m prom_tsdb_copyer_ray.query_cli NAME SF_DIR OUT \
        [--format parquet|jsonl|csv] [--num-cpus N] [--list]

``NAME`` is a key of :data:`pipelines.queries.QUERIES` (``--list`` prints
them all); ``SF_DIR`` a directory of the standard parquet tables; ``OUT``
a file (single-partition formats) or directory (parquet).  The query runs
as the same streaming Dataset plan the driver executes — results are
written with ``write_parquet``/``write_json``/``write_csv``, never
materialized on the driver (small driver-final queries that already
return an in-memory Arrow table are written directly).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="query")
    p.add_argument("name", nargs="?", help="query name (see --list)")
    p.add_argument("sf_dir", nargs="?", help="input tables directory")
    p.add_argument("out", nargs="?", help="output path (dir for parquet)")
    p.add_argument("--format", choices=["parquet", "jsonl", "csv"],
                   default="parquet")
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--list", action="store_true",
                   help="print registered query names and exit")
    p.add_argument("--explain", action="store_true",
                   help="print the Dataset plan instead of writing output "
                        "(driver-final queries execute and report rows)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .pipelines.queries import QUERIES

    if args.list:
        for name in sorted(QUERIES):
            print(name)
        return 0
    if not (args.name and args.sf_dir and (args.out or args.explain)):
        print("usage: query NAME SF_DIR OUT (or --list / --explain)",
              file=sys.stderr)
        return 2
    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; see --list", file=sys.stderr)
        return 2

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")

    import pandas as pd
    import pyarrow as pa

    res = QUERIES[args.name](args.sf_dir)
    if args.explain:
        if isinstance(res, (pa.Table, pd.DataFrame)):
            print(f"driver-final result: {len(res)} rows "
                  f"(no lazy plan; census/scan happens inside the query)")
        else:
            print(res)  # lazy Dataset repr = the logical plan
        if owns_ray:
            ray.shutdown()
        return 0
    if isinstance(res, (pa.Table, pd.DataFrame)):
        # driver-final result: already bounded, write directly
        import ray.data
        res = ray.data.from_arrow(
            res if isinstance(res, pa.Table) else pa.Table.from_pandas(res))
    n = res.count()
    if args.format == "parquet":
        res.write_parquet(args.out)
    elif args.format == "jsonl":
        res.repartition(1).write_json(args.out)
    else:
        res.repartition(1).write_csv(args.out)
    print(f'{{"query": "{args.name}", "rows": {n}, '
          f'"format": "{args.format}", "out": "{args.out}"}}')
    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
