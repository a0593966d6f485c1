"""Tier-output file compaction — the reference's merge-then-delete verb at
the file level (``compact.go:18-45``: merge slice blocks into one block,
``os.RemoveAll`` the inputs), reworked for day-partitioned Parquet.

Each committed ``window_day=`` (or ``window_group=``) leaf directory holds
one part file per Ray block that wrote it; many small parts tax every later
scan (file-open cost, tiny row groups, no skipping).  ``compact_tier``
rewrites each leaf with more than ``min_files`` parts into a single sorted
file, one Ray task per leaf (embarrassingly parallel — the reference's
compactor is strictly sequential, its documented scaling ceiling).

Crash safety is a directory-swap dance (rename is atomic per step):

    1. write ``<leaf>.compact/part-0.parquet``      (tmp dir, new data)
    2. ``rename(<leaf>, <leaf>.old)``               (leaf disappears)
    3. ``rename(<leaf>.compact, <leaf>)``           (leaf reappears, compacted)
    4. ``rmtree(<leaf>.old)``

A crash between 2 and 3 leaves ``.old`` + ``.compact`` and no leaf;
``_repair`` (run before compacting, and safe to run any time) restores the
original leaf and drops the tmp dir, so data is never lost or duplicated.
Manifests are untouched — compaction only reshapes files inside partitions
the manifest already marks complete, so resume/skip semantics are unchanged.
"""

from __future__ import annotations

import os
import shutil

COMPACT_SUFFIX = ".compact"
OLD_SUFFIX = ".old"


def _leaf_dirs(tier_dir: str) -> list[str]:
    """All data leaf dirs: window_day=*/ and window_day=*/window_group=*/."""
    leaves = []
    if not os.path.isdir(tier_dir):
        return leaves
    for day in sorted(os.listdir(tier_dir)):
        if not day.startswith("window_day="):
            continue
        ddir = os.path.join(tier_dir, day)
        groups = [g for g in sorted(os.listdir(ddir))
                  if g.startswith("window_group=")]
        if groups:
            leaves.extend(os.path.join(ddir, g) for g in groups)
        else:
            leaves.append(ddir)
    return leaves


def _repair(tier_dir: str) -> int:
    """Recover interrupted swaps: restore ``<leaf>.old`` when the leaf is
    missing, then drop stray tmp dirs.  Returns number of repairs."""
    n = 0
    for root, dirs, _ in list(os.walk(tier_dir)):
        for d in list(dirs):
            path = os.path.join(root, d)
            if d.endswith(OLD_SUFFIX):
                leaf = path[: -len(OLD_SUFFIX)]
                if not os.path.isdir(leaf):
                    os.rename(path, leaf)  # crash between steps 2 and 3
                else:
                    shutil.rmtree(path)    # crash during step 4
                n += 1
            elif d.endswith(COMPACT_SUFFIX):
                shutil.rmtree(path)        # crash before step 2: tmp only
                n += 1
    return n


def _compact_leaf_sync(leaf: str, sort_cols: list[str] | None) -> dict:
    """Merge one leaf's part files into a single sorted file (in-task)."""
    import pyarrow.parquet as pq

    parts = [f for f in sorted(os.listdir(leaf)) if f.endswith(".parquet")]
    table = pq.read_table(leaf)
    if sort_cols:
        cols = [c for c in sort_cols if c in table.column_names]
        if cols:
            table = table.sort_by([(c, "ascending") for c in cols])
    tmp = leaf + COMPACT_SUFFIX
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
    old = leaf + OLD_SUFFIX
    shutil.rmtree(old, ignore_errors=True)
    os.rename(leaf, old)
    os.rename(tmp, leaf)
    shutil.rmtree(old)
    return {"leaf": leaf, "files_in": len(parts), "rows": table.num_rows}


def compact_tier(out_dir: str, tier: str, min_files: int = 2,
                 sort_cols: list[str] | None = None,
                 parallel: bool = True) -> dict:
    """Compact every leaf partition of ``{out_dir}/tiers/{tier}`` holding
    more than ``min_files`` part files.  Idempotent (a compacted leaf has
    one file and is skipped); safe after crashes (repairs first).  Returns
    ``{leaves_seen, leaves_compacted, files_before, repairs}``."""
    import ray

    tier_dir = os.path.join(out_dir, "tiers", tier)
    repairs = _repair(tier_dir)
    if sort_cols is None:
        sort_cols = ["series_key", "window_start"]
    todo = []
    files_before = 0
    leaves = _leaf_dirs(tier_dir)
    for leaf in leaves:
        parts = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
        files_before += len(parts)
        if len(parts) >= min_files:
            todo.append(leaf)

    if parallel and todo:
        fn = ray.remote(num_cpus=1)(_compact_leaf_sync)
        results = ray.get([fn.remote(leaf, sort_cols) for leaf in todo])
    else:
        results = [_compact_leaf_sync(leaf, sort_cols) for leaf in todo]
    return {
        "leaves_seen": len(leaves),
        "leaves_compacted": len(results),
        "files_before": files_before,
        "files_after": files_before - sum(r["files_in"] - 1 for r in results),
        "repairs": repairs,
    }
