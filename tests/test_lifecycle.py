"""End-to-end ingest lifecycle: initial run -> incremental day append ->
late-data re-statement -> file compaction -> verify -> pure skip.

Each maintenance verb is unit-tested elsewhere; this chains them the way a
production tier store actually runs, guarding the cross-feature
interactions (invalidation after compaction, resume after everything)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

from prom_tsdb_copyer_ray.pipelines.compact import compact_tier
from prom_tsdb_copyer_ray.pipelines.verify import verify_tier_chunks
from prom_tsdb_copyer_ray.sources.pages import generate_pages
from prom_tsdb_copyer_ray.state.manifest import (
    load_manifest,
    manifest_path,
    read_tier,
)

DAY = 86_400_000


def _tiers_equal(out_a: str, out_b: str):
    for tier in ("5m", "1h", "1d"):
        a = read_tier(out_a, tier).to_pandas()
        b = read_tier(out_b, tier).to_pandas()
        key = ["series_key", "window_start"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert len(a) == len(b), tier
        assert a["n_samples"].tolist() == b["n_samples"].tolist(), tier
        assert a["val_bytes"].tolist() == b["val_bytes"].tolist(), tier


def test_ingest_lifecycle(ray_session, tmp_path):
    import ray.data

    from prom_tsdb_copyer_ray.pipelines.copy import run_copy

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")

    # day 1-2 pages; day-3 pages arrive later; late day-1 rows arrive last
    all_pages = generate_pages(1800, seed=42, span_ms=3 * DAY)
    ts = all_pages["warc_ts"].to_pandas().astype("int64") // 10**6  # -> ms
    base = int(ts.min())
    day_of = ((ts - base) // DAY).to_numpy()
    f1 = str(src / "f1.parquet")  # days 1-2
    f2 = str(src / "f2.parquet")  # day 3 (the incremental append)
    f3 = str(src / "f3.parquet")  # day 1 again (late data)
    import numpy as np
    import pyarrow as pa

    mask12 = pa.array((day_of < 2) & (np.arange(len(day_of)) % 5 != 0))
    mask3 = pa.array(day_of >= 2)
    mask_late = pa.array((day_of < 2) & (np.arange(len(day_of)) % 5 == 0))
    pq.write_table(all_pages.filter(mask12), f1)

    def go(files):
        return run_copy(
            lambda: ray.data.read_parquet(files), out,
            concurrency=(1, 2), input_files=files,
        )

    # 1) initial ingest
    go([f1])
    assert load_manifest(out, "5m")["status"] == "complete"

    # 2) incremental append: a NEW day arrives as a new file
    pq.write_table(all_pages.filter(mask3), f2)
    go([f1, f2])
    m = load_manifest(out, "1d")
    assert len(m["days"]) >= 3

    # 3) file compaction (the reference's merge-then-delete verb)
    stats = compact_tier(out, "5m")
    assert stats["leaves_seen"] > 0

    # 4) late data for day 1 lands AFTER compaction
    pq.write_table(all_pages.filter(mask_late), f3)
    go([f1, f2, f3])

    # equals a from-scratch run over everything
    ref = str(tmp_path / "ref")
    run_copy(lambda: ray.data.read_parquet([f1, f2, f3]), ref, concurrency=(1, 2))
    _tiers_equal(out, ref)

    # 5) decode audit: every chunk in every tier round-trips
    for tier in ("5m", "1h", "1d"):
        audit = verify_tier_chunks(read_tier(out, tier))
        assert audit["bad_rows"] == 0 and audit["rows"] > 0

    # 6) steady state: unchanged inputs are a byte-stable pure skip
    before = {t: json.load(open(manifest_path(out, t))) for t in ("5m", "1h", "1d")}
    go([f1, f2, f3])
    after = {t: json.load(open(manifest_path(out, t))) for t in ("5m", "1h", "1d")}
    assert before == after
