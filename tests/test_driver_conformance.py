"""Local mirror of the driver's correctness gate: run every queries() entry
at sf0.001 and compare with the DuckDB oracle_sql() (row count + sorted
values), plus rows-only sanity for the non-SQL ops."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__

    return __ray_entry__


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _compare(name, got: pd.DataFrame, want: pd.DataFrame):
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, obj=name)


def test_entry_smoke(entry_mod):
    res = entry_mod.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert "series_key" in df.columns


def _sql_checked_names(entry_mod):
    return sorted(entry_mod.oracle_sql())


def test_oracle_keys_subset(entry_mod):
    qs = entry_mod.queries()
    for name in entry_mod.oracle_sql():
        assert name in qs


def test_mirror_covers_every_oracle(entry_mod):
    """Guard: every oracle_sql() key must appear in the static parametrize
    list below — a new query missing here would silently skip its local
    conformance check."""
    import ast, inspect, pathlib

    src = pathlib.Path(__file__).read_text()
    tree = ast.parse(src)
    names: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            names.add(node.value)
    missing = sorted(set(entry_mod.oracle_sql()) - names)
    assert not missing, f"queries missing from the conformance mirror: {missing}"


@pytest.mark.parametrize(
    "name",
    [
        "rollup_5m", "rollup_1h", "rollup_1d", "range_discovery",
        "filter_matchers", "relabel_merge", "time_filter", "dedup_first",
        "gapfill_5m", "window_align", "retention", "pricing_summary",
        "top_sources", "distinct_pairs", "sample_mod10", "docs_stats",
        "token_count", "token_bpe", "quality", "exact_dedup", "dedup_rows", "ann_topk", "cosine_pairs_exact",
        "union_merge", "sliding_1h", "asof_join", "range_join", "hist_5m",
        "pages_rollup_5m", "pages_rollup_1h",
        "topk_events", "sessions", "value_quantiles", "dup_clusters",
        "term_df", "orders_per_nation", "cust_no_orders", "distinct_users",
        "topk_windowed", "top_user", "increase_5m", "dup_grams", "redact_pii", "shuffle_order", "lang_quartile_filter", "hist_p90",
        "pivot_events", "trend_slope", "cube_docs", "percent_rank", "twa_5m",
        "bloom_semi", "zscore", "ntile", "merge_intervals", "heavy_users",
        "lag_value", "cohort_retention", "except_users", "unpivot_events",
        "profile_docs", "funnel", "corr_hour", "string_agg", "knn_join", "rolling_median", "cooccurrence", "full_join", "robust_stats", "edit_distance_pairs", "transitions", "impute_median", "watermark_window", "unigram_logprob", "weekly_active", "global_quantiles", "cluster_keep_best", "share_of_type", "cdc_merge", "char_entropy", "audience_overlap",
        "mad_outliers", "first_last", "dense_rank", "winsorized",
        "scd2_intervals", "dataset_split", "ohlc_1h", "peak_hour",
        "bm25", "resets", "triangles",
        "srs_sample", "oov_rate", "cluster_sizes", "media_resize", "pca_top",
        "asof_tolerance", "gap_stats", "bpe_merges", "slo_burn",
        "max_drawdown", "cume_dist", "monthly_rollup", "k_anonymity",
        "dup_spans", "minhash_index_pairs", "zorder_sample",
        "centroid_topk", "chunk_docs", "curate_summary", "decontaminate",
        "event_rank", "mix_sources", "normalize_text", "pack_sequences",
        "props_extract", "repetition", "running_total", "stratified_sample",
        "tfidf_topk",
        # fixture-join oracles (tests/fixtures/gen_oracle_fixtures.py)
        "fingerprint", "simhash", "lang_id", "minhash_pairs",
        "ngram_jaccard_pairs", "embedding_neardup", "ivf_topk",
        "ivf_index_topk", "media_features", "approx_users", "approx_quantiles",
        "compression_ratio", "frame_features", "pagerank",
        "kmeans",
        "pages_verify",
        # session-7 wave
        "anomaly_3sigma", "skyline", "value_histogram", "pmi_pairs",
        "quality_deciles", "user_entropy", "term_drift", "keyword_search",
        "bpe_encode", "approx_overlap",
        "rate_5m", "delta_5m", "cusum_max", "psi_buckets", "rrf_fusion",
        "hopping_15m", "weighted_sample", "fuzzy_decontaminate",
        "audio_loudness", "fair_share_sample", "phrase_search",
        "quarantine", "schema_evolution", "tpch_q3", "tpch_q5",
        "tpch_q18", "tpch_q10", "ewma_decay", "rand_projection",
        "benford_digits", "gini_concentration", "bigram_logprob",
        "bloom_lookup",
        "count_meta", "funnel_latency",
        "window_share", "hourly_growth", "skew_report", "cos_histogram",
        "pq_codes", "lang_top_terms", "session_quantiles",
        "irate", "interpolate_5m", "absent_series", "tpch_q14",
        "canonical_url", "tpch_q12", "lttb_downsample", "locf_5m",
        "label_ops", "holt_winters", "skew_join", "hist_fraction",
        "xrate_5m", "max_xrate_1h",
        "changes", "predict_linear", "autocorr_lag1", "stddev_1h",
        "seasonal_residual", "weighted_median", "ks_statistic",
        "chi2_independence", "basket_lift", "isotonic_hourly",
        "mannwhitney_u", "tpch_q6", "debounce_events", "max_concurrency",
        "anova_hod", "cohens_d", "media_pure_grid", "audio_pure_rms",
        "entropy_rate", "longest_streak",
        # session-10 TPC-H completion wave (pipelines/relational.py)
        "tpch_q2", "tpch_q4", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q11",
        "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q19", "tpch_q21",
        "tpch_q22",
        # session-10 statistics wave (pipelines/stats2.py)
        "spearman_corr", "kendall_tau", "theil_sen", "changepoint",
        "runs_test",
        # session-10 extras (pipelines/extras.py)
        "video_pure_frames", "khop_reach", "l_diversity", "quantile_cont",
        "mode_value",
        # session-11 wave: moment/census statistics + TPC-H Q20
        "welch_t", "skew_kurtosis", "mean_family", "cross_corr", "tpch_q20",
        "cramers_v", "mutual_information", "jackknife_se",
        "kaplan_meier", "linreg_2f", "t_closeness", "adamic_adar",
        "readability", "ndcg_at_k", "sax_words", "media_equalize",
        "attribution", "fano_factor",
        # session-12 statistics wave (pipelines/stats3.py)
        "mann_kendall", "turning_points", "allan_variance",
        "diurnal_amplitude", "permutation_entropy", "ljung_box",
        "zipf_slope", "hapax_rate", "jsd_types", "theil_index",
        "gumbel_daily_max", "hurst_aggvar", "odds_ratio",
        "bhattacharyya", "kendall_w", "transfer_entropy",
        "hill_tail", "cronbach_alpha", "sign_test",
        "wilcoxon_signed", "spectral_flatness", "dau_jaccard",
        "cohen_kappa", "friedman_test", "renyi2_entropy",
        "seasonal_strength", "acf_halflife", "kmer_richness",
        "pacf2", "stochastic_dominance", "moods_median",
        "kruskal_wallis", "brown_forsythe", "grubbs",
        "heaps_law", "term_burstiness", "rfm_segments",
        "mcnemar", "cochran_q", "matthews_corr",
        "log_rank", "cramer_von_mises", "partial_corr",
        "kuiper", "pettitt", "f_test",
        "cliffs_delta", "page_trend", "jonckheere",
        "mantel_haenszel", "ansari_bradley", "cohens_h",
        "ordinal_assoc", "icc",
        # round-3 wave: guaranteed-recall simhash pairs
        "simhash_pairs",
        # round-3 statistics wave (pipelines/stats4.py)
        "yule_k", "simpson_lexical", "good_turing", "sichel_s",
        "herdan_c", "guiraud_r", "honore_h", "durbin_watson",
        "moran_lag1", "cox_stuart", "kpss_level", "ks_uniform_hod",
        "cochran_armitage", "tpch_q13",
        # round-3 wave 2
        "anderson_darling", "hodges_lehmann", "jarque_bera",
        "heavy_hitters",
        # round-3 wave 3
        "ccnet_buckets", "ge2_index",
        # round-3 wave 4
        "g_test", "pielou_j", "dixon_q",
        # round-3 wave 5
        "theil_u", "bowker",
        # round-3 wave 6
        "chao1", "lang_vocab_overlap", "whittaker_beta",
        # round-3 wave 7
        "hill_numbers", "mcintosh_d", "margalef",
        # round-3 wave 8
        "ace_richness", "lexical_gini", "runs_updown", "bartels_rvn",
        # round-3 wave 9
        "seasonal_mk",
        # round-3 wave 10 (pipelines/stats5.py)
        "geary_c", "dispersion_indices", "hoover_index",
        "variance_homogeneity",
        # round-3 wave 11
        "chatterjee_xi", "cusum_squares", "records_count",
        "buishand_range",
        # round-3 wave 12
        "emd_cents", "energy_distance",
        # round-3 wave 13
        "quade_test", "levene_mean", "bartlett",
        # round-3 wave 14
        "gk_lambda", "agreement_coefs", "lins_ccc",
        # round-3 wave 15
        "ks_two_sample", "kuiper_two_sample", "cvm_two_sample",
        "cucconi",
        # round-3 wave 16
        "cramers_v_dow", "gk_tau", "yule_coefs",
        # round-3 wave 17
        "fleiss_kappa", "kripp_alpha", "weighted_kappa",
        # round-3 wave 18
        "hjorth_params", "sample_entropy", "katz_fd", "mean_crossings",
        # round-3 wave 19
        "gini_mean_diff", "robust_spread", "qn_scale",
        # round-3 wave 20
        "jackknife_richness", "menhinick_dugast", "brillouin_index",
        # round-3 wave 21
        "hoeffding_d", "blomqvist_beta", "dcor",
        # round-3 wave 22
        "snht", "foster_stuart", "rs_hurst",
        # round-3 wave 23
        "mood_squared_ranks", "savage_scores", "fligner_policello",
        # round-3 wave 24
        "ad_ksample", "freeman_tukey", "neyman_chi2",
        # round-3 wave 25
        "lepage", "location_estimates", "trimmed_means",
        # round-3 wave 26
        "benford_first_digit", "weekly_harmonic", "cross_corr_lags",
        # round-3 wave 27
        "word_length_stats", "page_hinkley", "activity_gini",
        # round-3 wave 28
        "mode_stats", "generalized_esd", "tukey_quick",
        # round-3 wave 29
        "two_prop_z", "poisson_dispersion", "coef_variation",
        "rayleigh_test",
        # round-3 wave 30
        "lorenz_points", "user_hhi", "topk_user_share",
        # round-3 wave 31
        "session_stats", "interevent_burstiness", "interevent_memory",
        # round-3 wave 32
        "gap_quantiles", "user_lifetimes", "events_per_user",
        # round-3 wave 33
        "doc_tokens_by_lang", "source_concentration", "lang_entropy",
        # round-3 wave 34
        "mean_excess", "peak_hour_share", "weekend_lift",
        # round-3 wave 35
        "ols_trend", "granger_1lag",
        # round-3 wave 36
        "effect_sizes", "kl_vs_pooled", "longest_run",
        # round-3 wave 37
        "tv_overlap", "chi2_homogeneity", "active_hours_jaccard",
        # round-3 wave 38
        "anova_f", "dow_uniformity", "quantile_skew",
        # round-3 wave 39
        "outlier_counts", "ks_uniform_value",
        # round-3 wave 40
        "half_value_point", "user_gini",
        # round-3 wave 41
        "value_trend", "returning_share", "stickiness",
    ],
)
def test_sql_checked_query(entry_mod, con, name):
    qs = entry_mod.queries()
    sql = entry_mod.oracle_sql()[name]
    got = _to_pandas(qs[name](SF_DIR))
    want = con.execute(sql).df()
    _compare(name, got, want)


@pytest.mark.parametrize(
    "name",
    [
        "pages_tiers_chunks",
    ],
)
def test_rows_only_query(entry_mod, name):
    got = _to_pandas(entry_mod.queries()[name](SF_DIR))
    assert len(got) >= 0
    # deterministic: second run returns identical rows
    if name in ("fingerprint", "simhash", "lang_id"):
        again = _to_pandas(entry_mod.queries()[name](SF_DIR))
        pd.testing.assert_frame_equal(
            _norm(got), _norm(again), check_dtype=False
        )
