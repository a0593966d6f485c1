"""Per-partition lineage manifests + resumable tier writes.

The reference has *no* checkpointing — a failed slice is logged and silently
dropped (``copyer.go:185-191``), and a re-run recopies everything.  The
north_rule requires better: partition-level checkpoints with lineage.

Layout (one directory per tier, hive-partitioned by day)::

    {out}/tiers/{tier}/window_day=<ms>/part-*.parquet
    {out}/manifests/{tier}.json        # committed AFTER the data, atomically

Commit protocol (write-then-manifest):

1. rollup the tier Dataset, filtered to days NOT already in the manifest;
2. delete any partial day dirs for the days about to be (re)written;
3. ``write_parquet(partition_cols=["window_day"])`` (streaming, partitioned);
4. enumerate written day dirs, then atomically (tmp + ``os.replace``) merge
   the day list + row counts + wall time into the manifest.

A crash before step 4 leaves unmanifested day dirs which step 2 cleans up on
the next run; a crash after step 4 is a completed tier.  Resume therefore
skips every manifested day and recomputes only the missing ones (the
re-filter pushes down to the rollup input).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

from ..windows import MS_1D


def tier_dir(out_dir: str, tier: str) -> str:
    return os.path.join(out_dir, "tiers", tier)


def manifest_path(out_dir: str, tier: str) -> str:
    return os.path.join(out_dir, "manifests", f"{tier}.json")


def load_manifest(out_dir: str, tier: str) -> dict:
    path = manifest_path(out_dir, tier)
    if not os.path.exists(path):
        return {"tier": tier, "days": {}, "status": "empty"}
    with open(path) as f:
        return json.load(f)


def _atomic_write_json(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def completed_days(out_dir: str, tier: str) -> set[int]:
    return {int(d) for d in load_manifest(out_dir, tier)["days"]}


def clean_uncommitted_days(out_dir: str, tier: str) -> list[int]:
    """Delete day dirs present on disk but absent from the manifest
    (partial output of a crashed run).  Returns the removed day keys."""
    tdir = tier_dir(out_dir, tier)
    if not os.path.isdir(tdir):
        return []
    done = completed_days(out_dir, tier)
    removed = []
    for name in os.listdir(tdir):
        if not name.startswith("window_day="):
            continue
        day = int(name.split("=", 1)[1])
        if day not in done:
            shutil.rmtree(os.path.join(tdir, name))
            removed.append(day)
    return removed


def write_tier(ds, out_dir: str, tier: str) -> dict:
    """Resumable partitioned tier write; returns the updated manifest.

    ``ds`` must carry the CHUNK_SCHEMA columns; a ``window_day`` partition
    column is derived from ``window_start``.  Days already in the manifest
    are skipped (their rows are filtered out *before* the write).
    """
    import pyarrow.compute as pc

    t0 = time.monotonic()
    done = completed_days(out_dir, tier)
    clean_uncommitted_days(out_dir, tier)

    def add_day(batch: pa.Table) -> pa.Table:
        import numpy as np

        # floor division (numpy //), NOT pc.divide's truncation-toward-zero:
        # identical day keys to windows.window_start_np even for pre-1970
        # window starts, so the manifest skip-filter and the rollup's day
        # grouping can never diverge
        ws = batch["window_start"].to_numpy().astype(np.int64, copy=False)
        day = pa.array((ws // MS_1D) * MS_1D, pa.int64())
        batch = batch.append_column("window_day", day)
        if done:
            batch = batch.filter(
                pc.invert(pc.is_in(batch["window_day"], value_set=pa.array(sorted(done))))
            )
        return batch

    tdir = tier_dir(out_dir, tier)
    os.makedirs(tdir, exist_ok=True)
    # rollup stages group by (_gw, _shard) — time-major — so their output
    # blocks are already time-clustered and the hive write makes a handful of
    # contiguous files per day rather than one tiny file per (block, day)
    ds.map_batches(add_day, batch_format="pyarrow").write_parquet(
        tdir, partition_cols=["window_day"]
    )

    manifest = load_manifest(out_dir, tier)
    wall_s = time.monotonic() - t0
    for name in sorted(os.listdir(tdir)):
        if not name.startswith("window_day="):
            continue
        day = name.split("=", 1)[1]
        if day in manifest["days"]:
            continue
        ddir = os.path.join(tdir, name)
        files = [f for f in os.listdir(ddir) if f.endswith(".parquet")]
        n_rows = sum(pq.read_metadata(os.path.join(ddir, f)).num_rows for f in files)
        manifest["days"][day] = {
            "n_rows": n_rows,
            "n_files": len(files),
            "wall_s": round(wall_s, 3),
        }
    manifest["status"] = "complete"
    manifest["tier"] = tier
    _atomic_write_json(manifest_path(out_dir, tier), manifest)
    return manifest


def read_tier(out_dir: str, tier: str):
    """Ray Dataset over a written tier (committed days only)."""
    import ray.data

    ds = ray.data.read_parquet(tier_dir(out_dir, tier))
    # drop the hive partition column; downstream recomputes it from
    # window_start (it reads back as string, which would pollute schemas)
    return ds.map_batches(
        lambda b: b.drop_columns("window_day") if "window_day" in b.column_names else b,
        batch_format="pyarrow",
    )


def manifest_summary(out_dir: str) -> dict:
    """The ``--show-metrics`` analogue (operator O18): per-tier totals."""
    out = {}
    mdir = os.path.join(out_dir, "manifests")
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        m = json.load(open(os.path.join(mdir, name)))
        out[m["tier"]] = {
            "status": m["status"],
            "n_days": len(m["days"]),
            "n_rows": sum(d["n_rows"] for d in m["days"].values()),
            "n_files": sum(d["n_files"] for d in m["days"].values()),
        }
    return out
