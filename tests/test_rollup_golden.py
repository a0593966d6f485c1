"""Golden end-to-end test: Ray tier pipeline vs the pure-pandas oracle (F5).

Mirrors the reference's empirical old-vs-new verification (README.md:76-107)
as pytest: every rolled-up aggregate and every decoded chunk point must match
the independent single-process implementation exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from prom_tsdb_copyer_ray.codec import decode_chunk
from prom_tsdb_copyer_ray.functions.matchers import Matcher
from prom_tsdb_copyer_ray.sources.pages import generate_pages

from oracle import oracle_samples, oracle_tier_raw, oracle_tiers

N_PAGES = 3000
AGG_COLS = [
    "__name__", "domain", "lang", "min_ts", "max_ts", "n_samples",
    "agg_count", "agg_sum", "agg_min", "agg_max", "agg_first", "agg_last",
]


@pytest.fixture(scope="module")
def pages():
    return generate_pages(N_PAGES, seed=42)


@pytest.fixture(scope="module")
def ray_tiers(ray_session, pages):
    import ray.data

    from prom_tsdb_copyer_ray.pipelines.copy import build_tiers

    tiers = build_tiers(ray.data.from_arrow(pages), concurrency=(1, 2))
    return {t: d.to_pandas() for t, d in tiers.items()}


def _compare_tier(got: pd.DataFrame, want: pd.DataFrame):
    got = got.sort_values(["series_key", "window_start"], kind="mergesort").reset_index(drop=True)
    want = want.sort_values(["series_key", "window_start"], kind="mergesort").reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["series_key", "window_start"] + AGG_COLS],
        want[["series_key", "window_start"] + AGG_COLS].astype(
            {c: got[c].dtype for c in AGG_COLS if c in got}
        ),
        check_exact=True,
    )
    # decoded chunk points must match the oracle's point lists exactly
    for i in range(len(got)):
        n = got.loc[i, "n_samples"]
        ts, vals = decode_chunk(got.loc[i, "ts_bytes"], got.loc[i, "val_bytes"], n)
        ots, ovals = want.loc[i, "points"]
        np.testing.assert_array_equal(ts, ots, err_msg=f"ts row {i}")
        np.testing.assert_array_equal(vals, np.asarray(ovals, dtype=np.float64), err_msg=f"vals row {i}")


@pytest.mark.parametrize("tier", ["5m", "1h", "1d"])
def test_tier_matches_oracle(ray_tiers, pages, tier):
    _compare_tier(ray_tiers[tier], oracle_tiers(pages)[tier])


def test_sample_conservation(ray_tiers, pages):
    # every non-duplicate sample is counted exactly once in every tier
    expected = len(oracle_samples(pages).drop_duplicates(subset=["series_key", "ts"]))
    for tier in ("5m", "1h", "1d"):
        assert ray_tiers[tier]["agg_count"].sum() == expected


def test_filtered_pipeline_matches_oracle(ray_session, pages):
    import ray.data

    from prom_tsdb_copyer_ray.pipelines.copy import build_tiers

    matchers = [Matcher("=", "__name__", "crawl_rate"), Matcher("=~", "lang", "en|zh")]
    got = build_tiers(
        ray.data.from_arrow(pages), matchers=matchers, tiers=("5m",),
        concurrency=(1, 2),
    )["5m"].to_pandas()

    s = oracle_samples(pages)
    s = s[(s["__name__"] == "crawl_rate") & s["lang"].isin(["en", "zh"])]
    _compare_tier(got, oracle_tier_raw(s, "5m"))


def test_relabel_merges_series(ray_session, pages):
    import ray.data

    from prom_tsdb_copyer_ray.pipelines.copy import build_tiers

    got = build_tiers(
        ray.data.from_arrow(pages), relabels={"domain": "all"}, tiers=("5m",),
        concurrency=(1, 2),
    )["5m"].to_pandas()

    s = oracle_samples(pages)
    s = s.assign(domain="all")
    s["series_key"] = "__name__=" + s["__name__"] + ",domain=all,lang=" + s["lang"]
    # relabel can merge distinct urls into the same (series, ts) sample slot;
    # the engine dedups keep-first just like overlapping-block compaction
    _compare_tier(got, oracle_tier_raw(s, "5m"))
    assert set(got["domain"]) == {"all"}


def test_multi_to_one_union_matches_oracle(ray_session, pages):
    """Multi-to-one copy (reference: merging overlapping source blocks into
    one output, doCompact over slice blocks): two overlapping pages slices
    unioned -> tiers must equal the single-source result (overlap deduped
    exactly like compaction dedups identical overlapping samples)."""
    import ray.data

    from prom_tsdb_copyer_ray.pipelines.copy import build_tiers

    n = pages.num_rows
    a = pages.slice(0, int(n * 0.7))
    b = pages.slice(int(n * 0.5))  # overlaps [0.5n, 0.7n) with a
    union = ray.data.from_arrow(a).union(ray.data.from_arrow(b))
    got = build_tiers(union, tiers=("5m",))["5m"].to_pandas()
    _compare_tier(got, oracle_tiers(pages)["5m"])


def test_group_window_knob_and_skew(ray_session):
    """The group window (-S memory knob, reference slice duration) and a
    heavily skewed domain distribution must not change results: rollup with
    1h groups over hot-domain pages equals the oracle exactly."""
    import ray.data

    from prom_tsdb_copyer_ray.pipelines.copy import build_tiers

    skewed = generate_pages(2000, seed=9, hot_mass=0.4, n_domains=20)
    got = build_tiers(
        ray.data.from_arrow(skewed), tiers=("5m",), group_window_ms=3_600_000
    )["5m"].to_pandas()
    _compare_tier(got, oracle_tiers(skewed)["5m"])


def test_golden_other_seed(ray_session):
    """Same pipeline, different corpus seed/size — guards against the golden
    test overfitting one dataset shape."""
    import ray.data

    from prom_tsdb_copyer_ray.pipelines.copy import build_tiers

    pages2 = generate_pages(800, seed=123, span_ms=2 * 86_400_000, dup_frac=0.05)
    tiers = build_tiers(ray.data.from_arrow(pages2))
    want = oracle_tiers(pages2)
    for t in ("5m", "1h", "1d"):
        _compare_tier(tiers[t].to_pandas(), want[t])
