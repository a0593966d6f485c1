"""Source-format tests: JSONL pages round-trip into the same pipeline."""

from __future__ import annotations

import pandas as pd

from prom_tsdb_copyer_ray.sources.formats import read_pages_jsonl, write_pages_jsonl
from prom_tsdb_copyer_ray.sources.pages import generate_pages

from oracle import oracle_samples, oracle_tier_raw


def test_jsonl_pages_roundtrip_pipeline(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.copy import build_tiers

    pages = generate_pages(500, seed=42)
    path = str(tmp_path / "pages.jsonl")
    write_pages_jsonl(pages, path)

    ds = read_pages_jsonl(path)
    got = build_tiers(ds, tiers=("5m",))["5m"].to_pandas()

    want = oracle_tier_raw(oracle_samples(pages), "5m")
    got = got.sort_values(["series_key", "window_start"]).reset_index(drop=True)
    want = want.sort_values(["series_key", "window_start"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got["agg_sum"], want["agg_sum"].astype(float), check_names=False
    )
    assert (got["series_key"].values == want["series_key"].values).all()
