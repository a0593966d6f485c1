"""query battery chunk 1 — auto-split from the former pipelines/queries.py monolith (scripts/split_queries.py); statement order and registry contents are bit-identical."""
from __future__ import annotations  # noqa: F401

from .qsubstrate import (  # noqa: F401
    MS_1D,
    MS_1H,
    MS_5M,
    Matcher,
    _COMP,
    _collect_stable,
    _finalize,
    _read,
    _rollup_events,
    _round_sum,
    aligned_windows,
    make_filter_fn,
    make_relabel_fn,
    np,
    pa,
    pc,
    ts_to_ms,
    window_start,
)

def q_rollup_5m(sf_dir: str):
    """O3+O14: 5m window rollup over events (partial+final aggregation)."""
    return _round_sum(_rollup_events(sf_dir, MS_5M))


def q_rollup_1h(sf_dir: str):
    """Continuous aggregate: 1h computed FROM the 5m partials (merge path);
    the oracle computes 1h directly — validating partial+final merge."""
    from ray.data.aggregate import Max, Min, Sum

    t5 = _rollup_events(sf_dir, MS_5M)

    def to_1h(batch: pa.Table) -> pa.Table:
        w = window_start(batch["window_start"], MS_1H)
        return batch.set_column(batch.column_names.index("window_start"), "window_start", w)

    from ..stages.keyed import sharded_grouped_agg

    merged = sharded_grouped_agg(
        t5.map_batches(to_1h, batch_format="pyarrow"),
        ["event_type", "window_start"],
        [("n", "sum"), ("sum_value", "sum"),
         ("min_value", "min"), ("max_value", "max")],
    )
    return _round_sum(merged)


def q_rollup_1d(sf_dir: str):
    """1d computed from 1h partials (two merge hops vs direct SQL)."""
    from ray.data.aggregate import Max, Min, Sum

    t1h = _rollup_events(sf_dir, MS_1H)

    def to_1d(batch: pa.Table) -> pa.Table:
        w = window_start(batch["window_start"], MS_1D)
        return batch.set_column(batch.column_names.index("window_start"), "window_start", w)

    from ..stages.keyed import sharded_grouped_agg

    merged = sharded_grouped_agg(
        t1h.map_batches(to_1d, batch_format="pyarrow"),
        ["event_type", "window_start"],
        [("n", "sum"), ("sum_value", "sum"),
         ("min_value", "min"), ("max_value", "max")],
    )
    return _round_sum(merged)


def q_range_discovery(sf_dir: str):
    """O2: global time-range + row count from Parquet footers ONLY — the
    ``meta.json``-not-samples discovery of ``copyer.go:202-222`` (row-group
    statistics; exact in ms).  Falls back to a scan if stats are absent."""
    from ..sources.parquet import range_from_metadata

    meta = range_from_metadata(f"{sf_dir}/events.parquet", "ts")
    if meta is not None:
        lo, hi, n = meta
        return pa.table(
            {
                "min_ts_ms": pa.array([lo], pa.int64()),
                "max_ts_ms": pa.array([hi], pa.int64()),
                "n": pa.array([n], pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", ["ts"])

    def to_ms(batch: pa.Table) -> pa.Table:
        return pa.table({"ts_ms": ts_to_ms(batch["ts"])})

    from ray.data.aggregate import Count, Max, Min

    res = ds.map_batches(to_ms, batch_format="pyarrow").aggregate(
        Min("ts_ms"), Max("ts_ms"), Count()
    )
    return pa.table(
        {
            "min_ts_ms": pa.array([res["min(ts_ms)"]], pa.int64()),
            "max_ts_ms": pa.array([res["max(ts_ms)"]], pa.int64()),
            "n": pa.array([res["count()"]], pa.int64()),
        }
    )


def q_filter_matchers(sf_dir: str):
    """O4/O5: anchored-regex label matcher filter, then count per type."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["event_type"])
    flt = make_filter_fn([Matcher("=~", "event_type", "click|view")])
    return ds.map_batches(flt, batch_format="pyarrow").groupby("event_type").aggregate(
        Count(alias_name="n")
    )


def q_relabel_merge(sf_dir: str):
    """O7: blind-upsert relabel merges all event_type series into one."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["event_type"])
    rl = make_relabel_fn({"event_type": "all"}, ["event_type"], key_col="series_key")
    return (
        ds.map_batches(rl, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
    )


T0_MS = 1_704_844_800_000  # 2024-01-10T00:00:00Z
T1_MS = 1_705_708_800_000  # 2024-01-20T00:00:00Z


def q_time_filter(sf_dir: str):
    """O6: time-range predicate [T0, T1) PUSHED INTO the Parquet scan
    (file pruning + row-group stats + exact row filter, sources/parquet.py
    — the querier-bounds-the-scan semantics of ``copyer.go:75``)."""
    from ray.data.aggregate import Count, Sum

    from ..sources.parquet import read_pruned

    # inclusive [T0, T1-1] in ms-truncation space == [T0, T1)
    ds = read_pruned(
        f"{sf_dir}/events.parquet",
        ts_col="ts",
        t_from_ms=T0_MS,
        t_to_ms=T1_MS - 1,
        columns=["ts", "event_type", "value"],
    )
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("value", alias_name="sum_value")
    )
    return _round_sum(out)


def q_dedup_first(sf_dir: str):
    """Dedup keep-first (compaction semantics): earliest event per
    (user_id, event_type), ties by min event_id — via an order-preserving
    composite min, fully vectorized partial+final."""
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type", "event_id"])

    def partial(batch: pa.Table) -> pa.Table:
        ms = ts_to_ms(batch["ts"])
        comp = pc.add(pc.multiply(ms, pa.scalar(_COMP, pa.int64())), batch["event_id"])
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "comp": comp,
            }
        )
        return t.group_by(["user_id", "event_type"]).aggregate([("comp", "min")])

    from ..stages.keyed import sharded_grouped_agg

    final = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow").map_batches(
            lambda b: b.rename_columns(["user_id", "event_type", "comp"]),
            batch_format="pyarrow",
        ),
        ["user_id", "event_type"],
        [("comp", "min")],
    )

    def decompose(batch: pa.Table) -> pa.Table:
        comp = batch["comp"]
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "first_ts_ms": pc.divide(comp, pa.scalar(_COMP, pa.int64())),
                "first_event_id": pc.subtract(
                    comp,
                    pc.multiply(
                        pc.divide(comp, pa.scalar(_COMP, pa.int64())),
                        pa.scalar(_COMP, pa.int64()),
                    ),
                ),
            }
        )

    return final.map_batches(decompose, batch_format="pyarrow")


def q_gapfill_5m(sf_dir: str):
    """Gap-fill: zero-filled aligned 5m grid per event_type across the
    global range (north_rule gap-fill as a batch operator).

    Scale shape: a DISTRIBUTED zero-grid Dataset (``ray.data.range`` over
    the window count, crossed with the small type list inside map_batches)
    unioned with the observed counts, then one fine-keyed
    ``groupby(type, window).sum`` — a sort-based vectorized aggregate whose
    parallelism is O(windows x types / block), instead of the round-1
    one-group-per-type ``map_groups`` that materialized the whole global
    grid per group (group count == n_types, the anti-pattern the verdict
    flagged).  Only the two scalar bounds and the distinct type list touch
    the driver.
    """
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    # materialize the collapsed counts once: three consumers below (bounds,
    # type list, union) would otherwise re-execute the rollup three times
    counts = (
        _rollup_events(sf_dir, MS_5M)
        .select_columns(["event_type", "window_start", "n"])
        .materialize()
    )

    bounds = counts.aggregate(Min("window_start"), Max("window_start"))
    w0, w1 = bounds["min(window_start)"], bounds["max(window_start)"]
    types = sorted(
        counts.groupby("event_type")
        .aggregate(Count(alias_name="_c"))
        .to_pandas()["event_type"]
    )
    n_slots = int((w1 - w0) // MS_5M) + 1

    def grid_rows(batch) -> pa.Table:
        ids = batch["id"].to_numpy()
        ws = w0 + ids * MS_5M
        k = len(types)
        return pa.table(
            {
                "event_type": pa.array(np.repeat(np.array(types, dtype=object), len(ws))),
                "window_start": pa.array(np.tile(ws, k), pa.int64()),
                "n": pa.array(np.zeros(len(ws) * k, dtype=np.int64)),
            }
        )

    grid = ray.data.range(n_slots).map_batches(grid_rows, batch_format="pyarrow")
    from ..stages.keyed import sharded_grouped_agg

    return sharded_grouped_agg(
        grid.union(counts), ["event_type", "window_start"], [("n", "sum")]
    )


def q_window_align(sf_dir: str):
    """O3 as a query: aligned clamped 1h windows covering the events range."""
    rd = q_range_discovery(sf_dir)
    f, t = rd["min_ts_ms"][0].as_py(), rd["max_ts_ms"][0].as_py()
    ws = aligned_windows(f, t, MS_1H)
    return pa.table(
        {
            "window_start_ms": pa.array([a for a, _ in ws], pa.int64()),
            "window_end_ms": pa.array([b for _, b in ws], pa.int64()),
        }
    )


RETENTION_KEEP_MS = 2 * MS_1D


def q_retention(sf_dir: str):
    """Retention cut: keep only 5m windows within 2d of the newest window."""
    # materialize once: the Max bound and the filter pass are two consumers,
    # and the collapsed tier is tiny relative to the raw events it summarizes
    counts = _round_sum(_rollup_events(sf_dir, MS_5M)).materialize()
    from ray.data.aggregate import Max

    w1 = counts.aggregate(Max("window_start"))["max(window_start)"]
    cutoff = w1 - RETENTION_KEEP_MS

    def flt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["window_start"], cutoff))

    return counts.map_batches(flt, batch_format="pyarrow")


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-style grouped aggregate over lineitem (general agg surface)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.less_equal(batch["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us")))
        batch = batch.filter(mask)
        disc = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = batch.append_column("disc_price", disc)
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("disc_price", "sum"), ("l_quantity", "count")]
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity_sum", alias_name="sum_qty"),
            Sum("l_extendedprice_sum", alias_name="sum_base_price"),
            Sum("disc_price_sum", alias_name="sum_disc_price"),
            Sum("l_quantity_count", alias_name="n"),
        )
    )
    return _finalize(out, {}, {"sum_base_price": 2, "sum_disc_price": 2})


def q_top_sources(sf_dir: str):
    """Sort/limit: top 10 sources by document count (ties by source asc)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["source"])
    counts = ds.groupby("source").aggregate(Count(alias_name="n"))
    return counts.sort(["n", "source"], descending=[True, False]).limit(10)


def q_distinct_pairs(sf_dir: str):
    """Set op: distinct (source, lang) pairs."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["source", "lang"])
    return ds.groupby(["source", "lang"]).aggregate(Count(alias_name="_n")).select_columns(
        ["source", "lang"]
    )


def q_sample_mod10(sf_dir: str):
    """Deterministic systematic sample: doc_id % 10 == 0."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def flt(batch: pa.Table) -> pa.Table:
        m = pc.equal(
            pc.subtract(
                batch["doc_id"],
                pc.multiply(
                    pc.divide(batch["doc_id"], pa.scalar(10, pa.int64())),
                    pa.scalar(10, pa.int64()),
                ),
            ),
            pa.scalar(0, pa.int64()),
        )
        return batch.filter(m)

    return ds.map_batches(flt, batch_format="pyarrow")


def q_docs_stats(sf_dir: str):
    """Projection + grouped aggregate over documents."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    return ds.groupby(["lang", "source"]).aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
    )


def q_token_count(sf_dir: str):
    """Per-doc whitespace token count (vectorized Arrow regex kernel)."""
    from ..functions.text import token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": token_count(batch["text"])})

    return ds.map_batches(fn, batch_format="pyarrow")


def q_token_bpe(sf_dir: str):
    """BPE-ish (GPT-2 pre-tokenizer regex) token count per doc — vectorized
    RE2 kernel, identical pattern on the DuckDB side."""
    from ..functions.text import bpe_token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"], "n_bpe_tokens": bpe_token_count(batch["text"])}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_quality(sf_dir: str):
    """Quality-scoring raw counts per doc (integer, SQL-mirrorable)."""
    from ..functions.text import quality_counts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return quality_counts(batch).drop_columns("text")

    return ds.map_batches(fn, batch_format="pyarrow")


def q_exact_dedup(sf_dir: str):
    """Exact dedup winners: min doc_id per distinct text."""
    from ..stages.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(ds).select_columns(["doc_id"])


def q_dedup_rows(sf_dir: str):
    """Exact dedup returning FULL surviving rows (winner = min doc_id per
    distinct text): hash-groupby winners + tag-union co-partition fetch —
    no driver-side id set (stages/dedup.exact_dedup_rows)."""
    from ..stages.dedup import exact_dedup_rows

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source", "n_chars"])
    return exact_dedup_rows(ds).select_columns(["doc_id", "lang", "source", "n_chars"])


N_ANN_QUERIES = 5
ANN_K = 10


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k: first 5 vectors as queries, top 10 each."""
    from ..stages.similarity import brute_force_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = (
        ds.map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], N_ANN_QUERIES)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.array(qdf["embedding"].tolist(), dtype=np.float64)
    out = brute_force_topk(ds, queries, k=ANN_K)
    return out.select(["query_idx", "vec_id", "rank"])


# --- rows-only checked operators (non-SQL-expressible) ----------------------

def q_lang_id(sf_dir: str):
    from ..stages.textstats import add_lang_id

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_lang_id(ds, concurrency=(1, 4)).select_columns(["doc_id", "pred_lang"])


def q_fingerprint(sf_dir: str):
    from ..stages.textstats import add_fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_fingerprint(ds).select_columns(["doc_id", "fingerprint"])


def q_simhash(sf_dir: str):
    from ..stages.dedup import SimHashStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(SimHashStage, batch_format="pyarrow", concurrency=(1, 4))


def q_minhash_pairs(sf_dir: str):
    from ..stages.dedup import minhash_lsh_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_pairs(ds, concurrency=(1, 4))


def q_ngram_jaccard_pairs(sf_dir: str):
    from ..stages.dedup import ngram_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(ds, threshold=0.5, concurrency=(1, 4))


def q_embedding_neardup(sf_dir: str):
    from ..stages.dedup import embedding_neardup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_neardup_pairs(ds, threshold=0.45, num_planes=4, num_tables=4)
    return _finalize(out, {}, {"cosine": 6})


def q_ivf_topk(sf_dir: str):
    from ..stages.similarity import ivf_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = (
        ds.map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], N_ANN_QUERIES)), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.array(qdf["embedding"].tolist(), dtype=np.float64)
    return ivf_topk(ds, queries, k=ANN_K).select(["query_idx", "vec_id", "rank"])


COSINE_PAIRS_THRESHOLD = 0.45


def q_cosine_pairs_exact(sf_dir: str):
    """EXACT all-pairs cosine >= threshold over embeddings — the exact
    baseline of embedding_neardup (num_planes=0 => one bucket, blockwise
    O(block x n)-memory scan; at scale use the LSH path, this is the
    small-side ground truth the same way brute_force_topk is for IVF).
    SQL-oracled via DuckDB list_cosine_similarity."""
    from ..stages.dedup import embedding_neardup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_neardup_pairs(
        ds, threshold=COSINE_PAIRS_THRESHOLD, num_planes=0
    )
    return _finalize(out, {}, {"cosine": 6})


def _corpus_tag(sf_dir: str, table: str) -> str:
    """Cache tag for per-corpus /tmp artifacts: dir basename + the source
    file's (size, mtime) fingerprint, so a REGENERATED corpus with the
    same directory name can never hit a stale persisted index."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(path)
    return (f"{os.path.basename(os.path.normpath(sf_dir))}"
            f"_{st.st_size}_{st.st_mtime_ns}")


def q_ivf_index_topk(sf_dir: str):
    """IVF with a PERSISTED cell-partitioned index: build once (cached per
    corpus under /tmp), then search reading ONLY the probed cells' files —
    the read-skip scale path (vs q_ivf_topk's scan-and-mask)."""
    import os

    from ..stages.similarity import build_ivf_index, ivf_search

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = (
        ds.map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], N_ANN_QUERIES)), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.array(qdf["embedding"].tolist(), dtype=np.float64)
    index_dir = f"/tmp/graft_ivf_index_v2_{_corpus_tag(sf_dir, 'embeddings')}"
    if not os.path.exists(os.path.join(index_dir, "centroids.npy")):
        build_ivf_index(ds, index_dir)
    return ivf_search(index_dir, queries, k=ANN_K).select(["query_idx", "vec_id", "rank"])


HIST_LES = [50.0, 100.0, 200.0]  # + implicit +Inf


def q_hist_5m(sf_dir: str):
    """Histogram aggregation: per (event_type, 5m window) cumulative bucket
    counts of `value` (the engine's histogram-sample builder; the histogram
    rollup itself is stages/histograms.py)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        w = window_start(ts_to_ms(batch["ts"]), MS_5M)
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": w,
                "value": batch["value"],
            }
        )
        aggs = []
        for le in HIST_LES:
            t = t.append_column(
                f"le_{int(le)}",
                pc.cast(pc.less_equal(t["value"], le), pa.int64()),
            )
            aggs.append((f"le_{int(le)}", "sum"))
        aggs.append(("value", "count"))
        return t.group_by(["event_type", "window_start"]).aggregate(aggs)

    names = [f"le_{int(le)}" for le in HIST_LES]
    from ..stages.keyed import sharded_grouped_agg

    out = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "window_start"],
        [(f"{n}_sum", "sum") for n in names] + [("value_count", "sum")],
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["event_type", "window_start"] + names + ["le_inf"]
        )

    return out.map_batches(rename, batch_format="pyarrow")


def q_sliding_1h(sf_dir: str):
    """Windowed aggregate beyond tumbling: trailing-1h sliding sum of 5m
    event counts per type (custom operator, stages/windowed.py)."""
    from ..stages.windowed import sliding_window_sum

    counts = _rollup_events(sf_dir, MS_5M).select_columns(
        ["event_type", "window_start", "n"]
    )
    return sliding_window_sum(
        counts, ["event_type"], value_col="n", trail_ms=MS_1H, out_col="sliding_n"
    ).map_batches(
        lambda b: b.set_column(
            b.column_names.index("sliding_n"),
            "sliding_n",
            pc.cast(b["sliding_n"], pa.int64()),
        ),
        batch_format="pyarrow",
    )


def q_asof_join(sf_dir: str):
    """As-of join (custom operator Ray Data lacks): for each click event the
    latest error event of the same user at or before it."""
    from ..stages.windowed import asof_join

    def side(event_type, cols):
        ds = _read(sf_dir, "events", ["ts", "user_id", "event_type", "event_id", "value"])

        def fn(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["event_type"], event_type))
            out = {"user_id": t["user_id"], "ts_ms": ts_to_ms(t["ts"])}
            for c in cols:
                out[c] = t[c]
            return pa.table(out)

        return ds.map_batches(fn, batch_format="pyarrow")

    left = side("click", ["event_id"])
    right = side("error", ["value"])
    joined = asof_join(
        left, right, ["user_id"], left_ts="ts_ms", right_ts="ts_ms",
        right_value_cols=["value"],
    )
    return joined.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts_ms": b["ts_ms"],
                "error_ts_ms": b["_r_ts"],
                "error_value": b["value_right"],
            }
        ),
        batch_format="pyarrow",
    )


ASOF_TOL_MS = 2 * 3600 * 1000


def q_asof_tolerance(sf_dir: str):
    """As-of join with a tolerance window (pandas merge_asof semantics):
    the latest same-user error at or before each click, DROPPED when it
    is older than 2 h — the asof kernel plus a vectorized recency filter
    (no extra exchange)."""
    joined = q_asof_join(sf_dir)

    def tol(batch: pa.Table) -> pa.Table:
        age = pc.subtract(batch["ts_ms"], batch["error_ts_ms"])
        return batch.filter(pc.less_equal(age, pa.scalar(ASOF_TOL_MS, pa.int64())))

    return joined.map_batches(tol, batch_format="pyarrow")


def q_gap_stats(sf_dir: str):
    """Series-coverage diagnostics: per (type, user), the largest silence
    and how many gaps exceed 1 h over the total (ts, event_id) timeline —
    the reference's empty-window semantics (copyer.go:142-145) as a
    reportable signal.  Composition: lag_column -> vectorized gap math ->
    combiner -> sharded max/sum."""
    from ..stages.keyed import lag_column, sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "user_id", "ts", "event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        tsms = ts_to_ms(batch["ts"])
        return pa.table({
            "event_type": batch["event_type"],
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "tsms": tsms,
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "ts2": tsms,  # lag value col must differ from the order cols
        })

    lagged = lag_column(ds.map_batches(prep, batch_format="pyarrow"),
                        ["event_type", "user_id"], ["tsms", "event_id"],
                        "ts2", out_col="prev_ts")

    def partial(batch: pa.Table) -> pa.Table:
        gap = pc.subtract(batch["tsms"], batch["prev_ts"])
        t = pa.table({
            "event_type": batch["event_type"],
            "user_id": batch["user_id"],
            "max_gap_ms": gap,
            "n_gaps_1h": pc.cast(pc.greater(gap, 3_600_000), pa.int64()),
        })
        g = t.group_by(["event_type", "user_id"]).aggregate(
            [("max_gap_ms", "max"), ("n_gaps_1h", "sum")]
        )
        return g.rename_columns(
            ["event_type", "user_id", "max_gap_ms", "n_gaps_1h"]
        )

    return sharded_grouped_agg(
        lagged.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "user_id"],
        [("max_gap_ms", "max"), ("n_gaps_1h", "sum")], num_shards=16,
    )


SESSION_MS = 30 * 60 * 1000


def q_range_join(sf_dir: str):
    """Range (interval) join — custom operator: every click inside a
    30-minute "error session" [error_ts, error_ts + 30m] of the same user
    (stages/windowed.range_join; co-partitioned by (user-hash, time
    bucket), intervals replicated per overlapped bucket)."""
    from ..stages.windowed import range_join

    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type", "event_id"])

    def clicks(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["event_type"], "click"))
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts_ms": ts_to_ms(t["ts"]),
            }
        )

    def sessions(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["event_type"], "error"))
        ms = ts_to_ms(t["ts"])
        return pa.table(
            {
                "user_id": t["user_id"],
                "session_start": ms,
                "session_end": pc.add(ms, pa.scalar(SESSION_MS, pa.int64())),
                "session_id": t["event_id"],
            }
        )

    left = ev.map_batches(clicks, batch_format="pyarrow")
    right = ev.map_batches(sessions, batch_format="pyarrow")
    return range_join(
        left, right, key_col="user_id", left_ts="ts_ms",
        right_start="session_start", right_end="session_end",
        right_id_col="session_id",
    )


def q_union_merge(sf_dir: str):
    """Multi-to-one copy: union of two overlapping source slices, dedup by
    record identity, grouped count — the reference's multi-source merge
    (doCompact over overlapping blocks) as a relational operator."""
    from ray.data.aggregate import Count

    def part(pred_rem):
        ds = _read(sf_dir, "events", ["event_id", "event_type"])

        def flt(batch: pa.Table) -> pa.Table:
            rem = pc.subtract(
                batch["event_id"],
                pc.multiply(
                    pc.divide(batch["event_id"], pa.scalar(3, pa.int64())),
                    pa.scalar(3, pa.int64()),
                ),
            )
            mask = pc.is_in(rem, value_set=pa.array(pred_rem, pa.int64()))
            return batch.filter(mask)

        return ds.map_batches(flt, batch_format="pyarrow")

    u = part([0, 1]).union(part([1, 2]))
    # dedup identical records from the overlap (keep-first): event_id is
    # near-unique, so the distinct pass is a sharded segment kernel, never a
    # per-key Ray aggregate; only the tiny per-type count uses groupby
    from ..stages.keyed import sharded_grouped_agg

    def mark(batch: pa.Table) -> pa.Table:
        return batch.select(["event_type", "event_id"]).append_column(
            "_one", pa.nulls(batch.num_rows, pa.int64()).fill_null(1)
        )

    dedup = sharded_grouped_agg(
        u.map_batches(mark, batch_format="pyarrow"),
        ["event_type", "event_id"],
        [("_one", "min")],
    )
    return dedup.groupby("event_type").aggregate(Count(alias_name="n"))


def q_media_features(sf_dir: str):
    """Multimodal plumbing: synthesize a media table from document bytes
    (deterministic), run the actor-pool feature extractor (stubbed codec)."""
    from ..stages.multimodal import extract_media_features

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        payloads = [t.encode("utf-8") if t else b"" for t in batch["text"].to_pylist()]
        n = len(payloads)
        kinds = ["image" if i % 3 else "video" for i in batch["doc_id"].to_pylist()]
        return pa.table(
            {
                "media_id": ids,
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.nulls(n, pa.string()).fill_null("application/octet-stream"),
                "width": pa.nulls(n, pa.int32()),
                "height": pa.nulls(n, pa.int32()),
                "duration_ms": pa.array([3000] * n, pa.int32()),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow")
    return extract_media_features(media, concurrency=(1, 4))


# --- flagship pages pipeline (SQL-oracled via closed-form derivation) -------

_PAGES_SAMPLES_SQL = """
WITH pages AS (
  SELECT source || '.example.com' AS domain,
         lang,
         1704067200000 + doc_id * 7000 AS ts_ms,
         CAST(61 + strlen('doc' || CAST(doc_id AS VARCHAR))
              + strlen(replace(replace(replace(text, '&', '&amp;'),
                                       '<', '&lt;'), '>', '&gt;')) AS DOUBLE)
           AS page_size
  FROM documents
),
samples AS (
  SELECT 'crawl_rate' AS metric, domain, lang, ts_ms, 1.0 AS value FROM pages
  UNION ALL
  SELECT 'page_size_bytes', domain, lang, ts_ms, page_size FROM pages
)
"""


def _pages_tier_query(sf_dir: str, d_ms: int):
    from ray.data.aggregate import Max, Min, Sum

    from ..sources.pages import read_pages_from_documents
    from ..pipelines.copy import pages_to_samples

    pages = read_pages_from_documents(sf_dir)
    samples = pages_to_samples(pages, concurrency=(1, 4))

    def partial(batch: pa.Table) -> pa.Table:
        w = window_start(batch["ts"], d_ms)
        t = pa.table(
            {
                "metric": batch["__name__"],
                "domain": batch["domain"],
                "lang": batch["lang"],
                "window_start": w,
                "value": batch["value"],
            }
        )
        return t.group_by(["metric", "domain", "lang", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum"), ("value", "min"), ("value", "max")]
        )

    # final over (metric, domain, lang, window): series x windows keys —
    # sharded segment reduceat, not a per-key Ray aggregate.  Exact: the
    # summed values are integer-valued floats (byte counts / 1.0-rates)
    from ..stages.keyed import sharded_grouped_agg

    keys = ["metric", "domain", "lang", "window_start"]
    out = sharded_grouped_agg(
        samples.map_batches(partial, batch_format="pyarrow"),
        keys,
        [("value_count", "sum"), ("value_sum", "sum"),
         ("value_min", "min"), ("value_max", "max")],
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            keys + ["agg_count", "agg_sum", "agg_min", "agg_max"]
        )

    return out.map_batches(rename, batch_format="pyarrow")


def q_pages_rollup_5m(sf_dir: str):
    """Flagship: pages (derived from documents) -> extraction -> 5m rollup.

    The oracle reproduces the closed-form derivation in SQL (html length via
    the escape chain; extraction never runs in SQL because wrap/extract is
    the identity on ``text`` — pytest-verified byte-for-byte)."""
    return _pages_tier_query(sf_dir, MS_5M)


def q_pages_rollup_1h(sf_dir: str):
    return _pages_tier_query(sf_dir, MS_1H)


def q_pages_verify(sf_dir: str):
    """Verify pipeline as an operator: decode-audit every 5m chunk row of the
    flagship tiers (rows-only; bad_rows must be 0)."""
    import ray.data

    from ..pipelines.copy import build_tiers
    from ..pipelines.verify import verify_tier_chunks
    from ..sources.pages import read_pages_from_documents

    t5 = build_tiers(read_pages_from_documents(sf_dir), tiers=("5m",))["5m"]
    rep = verify_tier_chunks(t5)
    return pa.table({"rows": pa.array([rep["rows"]], pa.int64()),
                     "bad_rows": pa.array([rep["bad_rows"]], pa.int64())})


def q_pages_tiers_chunks(sf_dir: str):
    """Full tier output with encoded chunks (rows-only driver check; chunk
    bytes are golden-tested against the oracle decoder in pytest)."""
    import ray.data

    from ..pipelines.copy import build_tiers
    from ..sources.pages import read_pages_from_documents

    pages = read_pages_from_documents(sf_dir)
    tiers = build_tiers(pages, concurrency=(1, 4))
    t = tiers["5m"].union(tiers["1h"], tiers["1d"])
    return t


# ---------------------------------------------------------------------------
# keyed/graph/vocab operators (stages/keyed.py, stages/graph.py)
# ---------------------------------------------------------------------------

TOPK_K = 3
SESSION_GAP_MS = MS_1D


def q_topk_events(sf_dir: str):
    """Top-3 events by value per event_type (stages/keyed.topk_per_group):
    per-batch combiner keeps k rows per (key, batch), shard groupby final."""
    from ..stages.keyed import topk_per_group

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    out = topk_per_group(ds, ["event_type"], "value", TOPK_K, tiebreak_col="event_id")
    return _finalize(out, {}, {"value": 4})


def q_sessions(sf_dir: str):
    """Gap-based sessionization per user (stages/keyed.sessionize): a new
    session starts after a >1 day silence; one aggregate row per session."""
    from ..stages.keyed import sessionize

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": b["user_id"], "ts_ms": ts_to_ms(b["ts"]), "value": b["value"]}
        )

    out = sessionize(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id", "ts_ms", SESSION_GAP_MS, value_col="value",
    )
    return _finalize(out, {}, {"sum_value": 4})


def q_value_quantiles(sf_dir: str):
    """Exact p50/p90/p99 of value per event_type (stages/keyed.group_quantiles),
    DuckDB quantile_disc semantics (sorted[ceil(q*n)-1])."""
    from ..stages.keyed import group_quantiles

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return group_quantiles(ds, ["event_type"], "value", (0.5, 0.9, 0.99))


def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type
    (stages/keyed.count_distinct_per_group)."""
    from ..stages.keyed import count_distinct_per_group

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return count_distinct_per_group(ds, ["event_type"], "user_id", out_col="n_users")


def q_approx_quantiles(sf_dir: str):
    """Approximate per-type value quantiles via the mergeable bottom-k row
    sample (stages/sketch.approx_quantiles_per_group) — the scale path for
    `value_quantiles`, which must shuffle every (key, value) pair to be
    exact.  Deterministic, fixture-oracled."""
    from ..stages.sketch import approx_quantiles_per_group

    ds = _read(sf_dir, "events", ["event_type", "value", "event_id"])
    out = approx_quantiles_per_group(
        ds, ["event_type"], "value", "event_id", (0.5, 0.9, 0.99), k=512
    )
    return _finalize(out, {}, {"p50": 6, "p90": 6, "p99": 6})


def q_topk_windowed(sf_dir: str):
    """Top-2 events by value per (event_type, 1h window) — the windowed
    (streaming-style) variant of topk_events: the window id joins the key,
    so the combiner bounds shuffle rows at k per (key, window, batch)."""
    from ..stages.keyed import topk_per_group

    ds = _read(sf_dir, "events", ["event_id", "event_type", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        w = pc.multiply(pc.divide(ts_to_ms(b["ts"]), MS_1H), pa.scalar(MS_1H, pa.int64()))
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "window_start": w,
                "value": b["value"],
            }
        )

    out = topk_per_group(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "window_start"], "value", 2, tiebreak_col="event_id",
    )
    return _finalize(out, {}, {"value": 4})


def q_top_user(sf_dir: str):
    """Mode: the most frequent user per event_type (stages/keyed.mode_per_group),
    ties to the smallest user_id."""
    from ..stages.keyed import mode_per_group

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return mode_per_group(ds, ["event_type"], "user_id")


def q_approx_users(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT user_id) per event_type
    (stages/sketch.approx_distinct_per_group) — the mergeable-sketch scale
    path for `distinct_users` (~1.6% standard error at p=12).  Fixture-join
    oracle: fully deterministic registers + estimate."""
    from ..stages.sketch import approx_distinct_per_group

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    out = approx_distinct_per_group(ds, ["event_type"], "user_id",
                                    out_col="approx_users")
    return _finalize(out, {}, {"approx_users": 4})


def q_dup_clusters(sf_dir: str):
    """Duplicate-cluster resolution: same-(lang, n_chars) and
    same-(source, n_chars) star edges, then distributed connected
    components (stages/graph.py hash-min label propagation).  Component id
    = min doc_id in the cluster — the doc a dedup pass would keep."""
    from ..stages.graph import connected_components, group_star_edges

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    e1 = group_star_edges(docs, ["lang", "n_chars"])
    e2 = group_star_edges(docs, ["source", "n_chars"])
    return connected_components(e1.union(e2), docs, node_col="doc_id")


def q_term_df(sf_dir: str):
    """Top-100 vocabulary terms by document frequency
    (stages/textstats.term_document_frequency)."""
    from ..stages.textstats import term_document_frequency

    return term_document_frequency(_read(sf_dir, "documents", ["text"]), top_n=100)


def q_orders_per_nation(sf_dir: str):
    """3-table equi-join demonstrating both join regimes (stages/joins.py):
    nation (25 rows) broadcast into customer, the customer->nation lookup
    then broadcast into orders (dim side), grouped per-batch (Arrow partial)
    + tiny final groupby.  Zero shuffles besides the 25-key aggregate."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import broadcast_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust_nation = broadcast_join(
        cust, nation, "c_nationkey", "n_nationkey", right_cols=["n_name"]
    )
    # customer is the small side of orders⋈customer: collect its (custkey,
    # n_name) lookup (2 int/str cols) and broadcast it into the orders scan
    cn = pa.concat_tables(
        cust_nation.select_columns(["c_custkey", "n_name"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, cn, "o_custkey", "c_custkey", right_cols=["n_name"])

    def prep(batch: pa.Table) -> pa.Table:
        # sum in integer cents: order-independent and bit-exact vs the
        # oracle (a 1e8-magnitude float sum differs in the last cent
        # depending on summation order)
        cents = pc.cast(pc.round(pc.multiply(batch["o_totalprice"], 100.0)), pa.int64())
        t = pa.table({"n_name": batch["n_name"], "cents": cents})
        return t.group_by(["n_name"]).aggregate([("cents", "sum"), ("cents", "count")])

    def to_total(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": batch["n_name"],
                "sum_total": pc.divide(pc.cast(batch["sum_total"], pa.float64()), 100.0),
                "n_orders": batch["n_orders"],
            }
        )

    out = (
        joined.map_batches(prep, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("cents_sum", alias_name="sum_total"),
            Sum("cents_count", alias_name="n_orders"),
        )
        .map_batches(to_total, batch_format="pyarrow")
    )
    return _finalize(out, {}, {"sum_total": 2})


def q_cust_no_orders(sf_dir: str):
    """Anti-join (customers with no completed 'F' orders) via the shuffle
    join's tag-union co-partitioning — the large-fact-side regime where a
    broadcast of order keys would not fit."""
    from ..stages.joins import shuffle_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"]).map_batches(
        lambda b: b.filter(pc.equal(b["o_orderstatus"], "F")).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    return shuffle_join(cust, orders, "c_custkey", "o_custkey", how="anti")


# ---------------------------------------------------------------------------
# Corpus-curation battery (stages/curation.py) — training-data preparation
# operators over documents, every one DuckDB value-checked.
# ---------------------------------------------------------------------------

# shared DuckDB tokenizer expression (IDENTICAL to functions.text.token_count
# / curation._flat_tokens): trimmed whitespace split, blank rows -> []
_SQL_TOKS = """
    SELECT doc_id,
           CASE WHEN trim(text, ' ' || chr(9) || chr(13) || chr(10)) = ''
                THEN CAST([] AS VARCHAR[])
                ELSE regexp_split_to_array(
                     trim(text, ' ' || chr(9) || chr(13) || chr(10)),
                     '[ \t\r\n]+') END AS tk
    FROM documents
"""


def q_repetition(sf_dir: str):
    """Gopher-style repetition stats: n_tokens / distinct tokens / top-2gram
    count per doc (stages/curation.repetition_stats_batch; no shuffle)."""
    from ..stages.curation import add_repetition_stats

    return add_repetition_stats(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_decontaminate(sf_dir: str):
    """Benchmark 4-gram decontamination: docs sharing any token 4-gram with
    the deterministic benchmark slice (doc_id % 53 == 0); broadcast-set
    membership, no shuffle join (stages/curation.decontaminate)."""
    from ..stages.curation import decontaminate

    return decontaminate(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_stratified_sample(sf_dir: str):
    """Deterministic 5-per-lang stratified sample by Lehmer rank
    (stages/curation.stratified_sample -> combiner-bounded top-k)."""
    from ..stages.curation import stratified_sample

    return stratified_sample(
        _read(sf_dir, "documents", ["doc_id", "lang"]), ["lang"], k=5
    )


def q_normalize_text(sf_dir: str):
    """Text normalization: NFC + lowercase + blank-run collapse + trim
    (stages/curation.normalize_text_batch; pure Arrow kernels)."""
    from ..stages.curation import add_normalized_text

    return add_normalized_text(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_chunk_docs(sf_dir: str):
    """Fixed-size character chunking (flat-map): 120-char chunks per doc
    (stages/curation.chunk_docs; loop over chunk positions, not rows)."""
    from ..stages.curation import chunk_docs

    return chunk_docs(_read(sf_dir, "documents", ["doc_id", "text"]), 120)


def q_pack_sequences(sf_dir: str):
    """Sequence packing via distributed prefix-sum scan: 256-token budget,
    doc belongs to the sequence where it starts
    (stages/curation.pack_sequences)."""
    from ..stages.curation import pack_sequences

    return pack_sequences(_read(sf_dir, "documents", ["doc_id", "text"]), 256)


def _src_w10(sources: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Mixing weights in tenths for the 'srcN' sources: even N -> 0.8,
    odd N -> 0.3 (mirrored literally by the SQL CASE)."""
    if isinstance(sources, pa.ChunkedArray):
        sources = sources.combine_chunks()
    nums = pc.cast(
        pc.utf8_slice_codeunits(sources, start=3, stop=64), pa.int64()
    ).to_numpy(zero_copy_only=False)
    return np.where(nums % 2 == 0, 8, 3)


def q_mix_sources(sf_dir: str):
    """Weighted source mixing (deterministic Lehmer-rank sampling) ->
    per-source kept count + id checksum (stages/curation.mix_sources)."""
    from ..stages.curation import mix_sources
    from ..stages.keyed import sharded_grouped_agg

    kept = mix_sources(
        _read(sf_dir, "documents", ["doc_id", "source"]), _src_w10
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("source").aggregate(
            [("doc_id", "count"), ("doc_id", "sum")]
        )
        return pa.table({
            "source": g["source"],
            "n_kept": pc.cast(g["doc_id_count"], pa.int64()),
            "sum_doc_id": pc.cast(g["doc_id_sum"], pa.int64()),
        })

    parts = kept.map_batches(partial, batch_format="pyarrow")
    return sharded_grouped_agg(
        parts, ["source"], [("n_kept", "sum"), ("sum_doc_id", "sum")]
    )


def q_props_extract(sf_dir: str):
    """Per-record JSON-ish field parse (props -> int k) + per-type rollup;
    the parser analogue of the reference's per-record map (copyer.go:92-156)
    over a semi-structured column."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        k = pc.cast(
            pc.struct_field(
                pc.extract_regex(
                    pc.cast(batch["props"], pa.string()), r'"k":\s*(?P<k>[0-9]+)'
                ),
                "k",
            ),
            pa.int64(),
        )
        t = pa.table({"event_type": batch["event_type"], "k": k})
        g = t.group_by("event_type").aggregate(
            [("k", "count"), ("k", "sum"), ("k", "min"), ("k", "max")]
        )
        return pa.table({
            "event_type": g["event_type"],
            "n": pc.cast(g["k_count"], pa.int64()),
            "sum_k": pc.cast(g["k_sum"], pa.int64()),
            "min_k": g["k_min"],
            "max_k": g["k_max"],
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return sharded_grouped_agg(
        parts, ["event_type"],
        [("n", "sum"), ("sum_k", "sum"), ("min_k", "min"), ("max_k", "max")],
    )


def q_tfidf_topk(sf_dir: str):
    """Top-3 terms per doc by integer tf-idf score: broadcast-df vocabulary
    + shuffle-free per-batch scoring (stages/textstats.tfidf_topk)."""
    from ..stages.textstats import tfidf_topk

    return tfidf_topk(_read(sf_dir, "documents", ["doc_id", "text"]), k=3)


def q_centroid_topk(sf_dir: str):
    """Top-5 vectors nearest their label centroid — embedding quality /
    representativeness filter (stages/similarity.centroid_topk)."""
    from ..stages.similarity import centroid_topk

    return centroid_topk(
        _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"]), k=5
    )


def q_curate_summary(sf_dir: str):
    """End-to-end curation flagship summary: normalize -> quality filter ->
    exact dedup -> per-lang kept docs + token mass (pipelines/curate.py)."""
    from .curate import curate_summary

    return curate_summary(
        _read(sf_dir, "documents", ["doc_id", "lang", "source", "text"])
    )


def q_event_rank(sf_dir: str):
    """Window function row_number() per event_type ordered by (value, id)
    (stages/keyed.window_rank — one narrow key-shard shuffle)."""
    from ..stages.keyed import window_rank

    return window_rank(
        _read(sf_dir, "events", ["event_type", "value", "event_id"]),
        ["event_type"], ["value", "event_id"],
    )


def q_running_total(sf_dir: str):
    """Window function cumulative sum per event_type over (ts, id) order, in
    integer milli-units for exact cross-engine math
    (stages/keyed.running_sum)."""
    from ..stages.keyed import running_sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def to_milli(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        vm = np.rint(np.round(v, 4) * 10000).astype(np.int64)
        return pa.table({
            "event_type": batch["event_type"],
            "ts": batch["ts"],
            "event_id": batch["event_id"],
            "value_m": pa.array(vm, pa.int64()),
        })

    return running_sum(
        ds.map_batches(to_milli, batch_format="pyarrow"),
        ["event_type"], ["ts", "event_id"], "value_m", out_col="running_m",
    )


def q_increase_5m(sf_dir: str):
    """PromQL-style increase(): per-series adjacent counter deltas with
    reset handling, summed per 5m window (stages/windowed.counter_increase;
    one key-hash-shard shuffle)."""
    from ..stages.windowed import counter_increase

    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "tms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "value": pc.cast(batch["value"], pa.float64()),
        })

    out = counter_increase(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["event_type"], "tms", ["event_id"], "value", MS_5M,
    )
    return _finalize(out, {}, {"increase": 4})


def q_dup_grams(sf_dir: str):
    """Cross-document duplicate token-3-gram stats per doc
    (stages/curation.duplicate_gram_stats; gram-sharded then doc-sharded
    exchanges, no all-pairs)."""
    from ..stages.curation import duplicate_gram_stats

    return duplicate_gram_stats(
        _read(sf_dir, "documents", ["doc_id", "text"]), n=3
    )


_REDACT_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"[0-9]+", "<NUM>"),
]


def q_redact_pii(sf_dir: str):
    """PII redaction over the semi-structured props column: vectorized
    multi-pattern regexp replace + match counting
    (functions/text.redact_regex; shuffle-free map stage)."""
    from ..functions.text import redact_regex

    ds = _read(sf_dir, "events", ["event_id", "props"])

    def fn(batch: pa.Table) -> pa.Table:
        red, n = redact_regex(batch["props"], _REDACT_PATTERNS)
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "red_props": red,
            "n_redactions": n,
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def q_shuffle_order(sf_dir: str):
    """Deterministic global training shuffle: Lehmer rank + distributed
    sort + block-offset scan for exact global positions
    (stages/curation.global_shuffle_order)."""
    from ..stages.curation import global_shuffle_order

    return global_shuffle_order(_read(sf_dir, "documents", ["doc_id"]))


def q_lang_quartile_filter(sf_dir: str):
    """Per-language p25 token-count threshold filter with kept-mass summary
    (stages/curation.quantile_threshold_filter: exact group quantile ->
    driver-broadcast thresholds -> vectorized filter -> bounded-key
    aggregate)."""
    from ..stages.curation import quantile_threshold_filter

    return quantile_threshold_filter(
        _read(sf_dir, "documents", ["doc_id", "lang", "text"]), "lang"
    )


def q_hist_p90(sf_dir: str):
    """promql histogram_quantile(0.9, ...) over the 5m histogram tier:
    linear interpolation inside the located cumulative bucket
    (stages/histograms.histogram_quantile_cols, fully vectorized)."""
    from ..stages.histograms import histogram_quantile_cols

    names = [f"le_{int(le)}" for le in HIST_LES]

    def quant(batch: pa.Table) -> pa.Table:
        out = histogram_quantile_cols(
            batch, 0.9, HIST_LES, names, "le_inf", out_col="q90"
        )
        return pa.table({
            "event_type": out["event_type"],
            "window_start": out["window_start"],
            "q90": pc.round(out["q90"], ndigits=6),
        })

    return q_hist_5m(sf_dir).map_batches(quant, batch_format="pyarrow")


def q_trend_slope(sf_dir: str):
    """Per-(type, user) least-squares trend of value over time — the PromQL
    deriv() analog (stages/keyed.group_linear_trend; exact int64 sufficient
    statistics, per-batch 5-int combiner, one O(keys) exchange).  x = epoch
    hours centered near 0, y = milli-units (the running_total convention)."""
    from ..stages.keyed import group_linear_trend

    ds = _read(sf_dir, "events", ["event_type", "user_id", "ts", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        vm = np.rint(np.round(v, 4) * 10000).astype(np.int64)
        x = pc.subtract(
            pc.divide(ts_to_ms(batch["ts"]), 3600000), 473000
        )
        return pa.table({
            "event_type": batch["event_type"],
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "x": x,
            "y": pa.array(vm, pa.int64()),
        })

    out = group_linear_trend(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["event_type", "user_id"], "x", "y", out_col="slope_m",
    )
    return _finalize(out, {}, {"slope_m": 8})


def q_cube_docs(sf_dir: str):
    """SQL CUBE(lang, source) over documents in one data pass — all four
    grouping sets' totals from one finest-grain per-batch combiner
    (stages/keyed.cube_agg; exchange = O(keys x 4) partial rows)."""
    from ..stages.keyed import cube_agg

    return cube_agg(
        _read(sf_dir, "documents", ["lang", "source", "n_chars"]),
        ["lang", "source"],
        [("n_chars", "count", "n_docs"), ("n_chars", "sum", "sum_chars")],
    )


def q_percent_rank(sf_dir: str):
    """percent_rank() OVER (PARTITION BY event_type ORDER BY value) with
    SQL tie semantics (stages/keyed.percent_rank; one narrow key-shard
    exchange, event_id carried for row identity)."""
    from ..stages.keyed import percent_rank

    return percent_rank(
        _read(sf_dir, "events", ["event_type", "value", "event_id"]),
        ["event_type"], ["value"], carry_cols=["event_id"],
    )


def q_twa_5m(sf_dir: str):
    """Time-weighted average per (event_type, 5m window) with LOCF to the
    window end (stages/windowed.time_weighted_avg; exact int64 milli-unit
    sums, one key-hash-shard exchange)."""
    from ..stages.windowed import time_weighted_avg

    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        vm = np.rint(np.round(v, 4) * 10000).astype(np.int64)
        return pa.table({
            "event_type": batch["event_type"],
            "tms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "vm": pa.array(vm, pa.int64()),
        })

    out = time_weighted_avg(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["event_type"], "tms", ["event_id"], "vm", MS_5M,
    )
    return _finalize(out, {"twa": "twa_m"})


def q_bloom_semi(sf_dir: str):
    """Semi-join events against purchasing users through a distributed
    Bloom prefilter + exact verify (stages/joins.bloom_semi_join; the
    bitmap broadcast is fixed-size regardless of dim cardinality)."""
    from ..stages.joins import bloom_semi_join

    fact = _read(sf_dir, "events", ["event_id", "user_id"])
    dim = _read(sf_dir, "events", ["user_id", "event_type"]).map_batches(
        lambda b: b.filter(
            pc.equal(b["event_type"], "purchase")
        ).select(["user_id"]),
        batch_format="pyarrow",
    )
    out = bloom_semi_join(fact, dim, "user_id", "user_id")

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "user_id": pc.cast(batch["user_id"], pa.int64()),
        })

    return out.map_batches(norm, batch_format="pyarrow")


def q_zscore(sf_dir: str):
    """Per-(type, user) z-score standardization of value — two-pass: exact
    int64 stats -> driver broadcast -> shuffle-free vectorized transform
    (stages/keyed.standardize_per_group)."""
    from ..stages.keyed import standardize_per_group

    ds = _read(sf_dir, "events", ["event_type", "user_id", "event_id", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        vm = np.rint(np.round(v, 4) * 10000).astype(np.int64)
        return pa.table({
            "event_type": batch["event_type"],
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "vm": pa.array(vm, pa.int64()),
        })

    out = standardize_per_group(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["event_type", "user_id"], "vm", carry_cols=["event_id"],
    )
    return _finalize(out, {}, {"z": 6})


def q_ntile(sf_dir: str):
    """ntile(7) OVER (PARTITION BY event_type ORDER BY value, event_id)
    (stages/keyed.ntile; unique order tail for determinism)."""
    from ..stages.keyed import ntile

    return ntile(
        _read(sf_dir, "events", ["event_type", "value", "event_id"]),
        ["event_type"], ["value", "event_id"], 7,
    )


def q_merge_intervals(sf_dir: str):
    """Gaps-and-islands interval coalescing per user (stages/windowed.
    merge_intervals; segmented running max, one key-shard exchange).
    Intervals derived deterministically: [ts, ts + (id%7+1) minutes]."""
    from ..stages.windowed import merge_intervals

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def norm(batch: pa.Table) -> pa.Table:
        s = ts_to_ms(batch["ts"])
        eid = pc.cast(batch["event_id"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        dur = (eid % 7 + 1) * 60000
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "s": s,
            "e": pc.add(s, pa.array(dur, pa.int64())),
        })

    return merge_intervals(
        ds.map_batches(norm, batch_format="pyarrow"), ["user_id"], "s", "e"
    )


def q_heavy_users(sf_dir: str):
    """Exact top-10 users by event count through a Misra-Gries sketch +
    candidate verify (stages/sketch.heavy_hitters_topk; bounded counters
    per batch, exact recount of the guaranteed-superset candidates)."""
    from ..stages.sketch import heavy_hitters_topk

    ds = _read(sf_dir, "events", ["user_id"])
    return heavy_hitters_topk(ds, "user_id", k=10, capacity=64)


def q_lag_value(sf_dir: str):
    """lag(value) OVER (PARTITION BY type, user ORDER BY ts, id), rows
    without a predecessor dropped (stages/keyed.lag_column)."""
    from ..stages.keyed import lag_column

    ds = _read(sf_dir, "events",
               ["event_type", "user_id", "ts", "event_id", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "tms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "value": pc.cast(batch["value"], pa.float64()),
        })

    return lag_column(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["event_type", "user_id"], ["tms", "event_id"], "value",
    )


def q_cohort_retention(sf_dir: str):
    """Cohort retention matrix over events: users bucketed by first-active
    day, distinct-counted per (cohort, day offset)
    (stages/keyed.cohort_retention; one user-sharded exchange of distinct
    (user, day) pairs, bounded final)."""
    from ..stages.keyed import cohort_retention

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "tms": ts_to_ms(batch["ts"]),
        })

    return cohort_retention(
        ds.map_batches(norm, batch_format="pyarrow"), "user_id", "tms"
    )


def q_except_users(sf_dir: str):
    """SQL EXCEPT over (user, day) tuples: click-days with no purchase
    that day (stages/joins.set_op; distinct-tuple combiners + one
    tuple-hash exchange)."""
    from ..stages.joins import set_op

    def side(event_type):
        def fn(batch: pa.Table, et=event_type) -> pa.Table:
            b = batch.filter(pc.equal(batch["event_type"], et))
            return pa.table({
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "day": pc.divide(ts_to_ms(b["ts"]), 86400000),
            })
        return _read(sf_dir, "events",
                     ["user_id", "event_type", "ts"]).map_batches(
            fn, batch_format="pyarrow")

    return set_op(side("click"), side("purchase"), ["user_id", "day"],
                  "except")


def q_unpivot_events(sf_dir: str):
    """Round-trip reshape: pivot_events' wide counts melted back to long
    (user, type, n), zero cells dropped (stages/keyed.unpivot; shuffle-free
    flat map).  Equals the plain long GROUP BY — the oracle."""
    from ..stages.keyed import pivot_counts, unpivot

    wide = pivot_counts(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        ["user_id"], "event_type", _PIVOT_CATS,
    )
    long = unpivot(
        wide, ["user_id"], [f"n_{c}" for c in _PIVOT_CATS],
        var_col="event_type", val_col="n", var_names=_PIVOT_CATS,
    )
    return long.map_batches(
        lambda b: b.filter(pc.greater(b["n"], 0)), batch_format="pyarrow"
    )


def q_funnel(sf_dir: str):
    """Ordered conversion funnel signup -> click -> purchase, each step
    strictly after the previous step's earliest anchor
    (stages/keyed.funnel_counts; distinct-triple combiner + one
    user-sharded exchange)."""
    from ..stages.keyed import funnel_counts

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "event_type": batch["event_type"],
            "tms": ts_to_ms(batch["ts"]),
        })

    return funnel_counts(
        ds.map_batches(norm, batch_format="pyarrow"),
        "user_id", "event_type", "tms", ["signup", "click", "purchase"],
    )


def q_corr_hour(sf_dir: str):
    """Per-event-type Pearson correlation between hour-of-day and value
    (stages/keyed.grouped_corr; exact int64 six-statistic combiner, one
    O(keys) exchange, float-exact vs the SQL formula).  y = centi-units
    (values are 2-decimal exact in the corpus)."""
    from ..stages.keyed import grouped_corr

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        y = np.rint(v * 100).astype(np.int64)
        # epoch_ms >= 0, so integer-divide truncation == floor and the
        # mod-24 below matches DuckDB's `%` on non-negatives
        hour = pc.divide(ts_to_ms(batch["ts"]), 3600000)
        x = pc.subtract(hour, pc.multiply(pc.divide(hour, 24), 24))
        return pa.table({
            "event_type": batch["event_type"],
            "x": x,
            "y": pa.array(y, pa.int64()),
        })

    out = grouped_corr(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["event_type"], "x", "y", out_col="corr_hv",
    )
    return _finalize(out, {}, {"corr_hv": 8})


def q_string_agg(sf_dir: str):
    """Per-user ordered event-type sequence — SQL string_agg(event_type,
    ',' ORDER BY ts, event_type) (stages/keyed.group_concat; one key-shard
    exchange, per-shard Arrow list build + binary_join, no Python per
    key)."""
    from ..stages.keyed import group_concat

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "event_type": batch["event_type"],
            "tms": ts_to_ms(batch["ts"]),
        })

    return group_concat(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["user_id"], "event_type", ["tms"], sep=",", out_col="type_seq",
    )


KNN_K = 3


def q_knn_join(sf_dir: str):
    """k-NN self-join over embeddings: each vector's 3 nearest others by
    cosine (stages/similarity.knn_join; index broadcast once via ray.put,
    query batches stream).  SQL-oracled by the DuckDB cross-join +
    row_number, cosine in the CAST-to-DOUBLE protocol."""
    from ..stages.similarity import knn_join

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return _finalize(knn_join(ds, k=KNN_K), {}, {"cosine": 6})


KMEANS_K = 8
KMEANS_ITERS = 5


def q_kmeans(sf_dir: str):
    """Distributed Lloyd k-means over embeddings, deterministic via exact
    int64 quantized partial sums (stages/similarity.kmeans_fit; centroids
    broadcast per iteration, O(k) partial rows per batch).  Output: one row
    per non-empty cluster (cluster, n_vecs, c0 = first centroid component).
    Fixture-oracled by an independent numpy reference."""
    import pandas as pd

    from ..stages.similarity import kmeans_fit

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    C, counts = kmeans_fit(ds, k=KMEANS_K, iters=KMEANS_ITERS)
    keep = counts > 0
    return pd.DataFrame({
        "cluster": np.arange(KMEANS_K, dtype=np.int64)[keep],
        "n_vecs": counts[keep],
        "c0": np.round(C[keep, 0], 6),
    })


def q_rolling_median(sf_dir: str):
    """Per-user moving median of the last 5 values ordered by (ts, value)
    (stages/windowed.rolling_quantile; one key-shard exchange, window-count
    vectorized nanquantile).  Values pre-scaled to centi-int64 so the
    interpolated median is exact and the SQL quantile_cont window matches
    bit-for-bit."""
    from ..stages.windowed import rolling_quantile

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "tms": ts_to_ms(batch["ts"]),
            "cval": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })

    out = rolling_quantile(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["user_id"], "tms", "cval", window=5, q=0.5, out_col="med5",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("med5"), "med5",
            pc.divide(batch["med5"], 100.0),
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_cooccurrence(sf_dir: str):
    """Event-type co-occurrence (market basket): for every unordered type
    pair, how many users did both (stages/keyed.cooccurrence_pairs;
    per-batch DISTINCT combiner, one user-hash exchange, per-shard triu
    over key segments)."""
    from ..stages.keyed import cooccurrence_pairs

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "event_type": batch["event_type"],
        })

    return cooccurrence_pairs(
        ds.map_batches(norm, batch_format="pyarrow"),
        "user_id", "event_type", out_count="n_users", bounded_final=True,
    )


def q_full_join(sf_dir: str):
    """FULL OUTER shuffle join of per-user signup counts vs purchase
    counts (stages/joins.shuffle_join how='full'; tag-union
    co-partitioning, unmatched sides null-extended)."""
    from ..stages.joins import shuffle_join
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def side(event_type: str, out: str):
        def partial(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["event_type"], event_type))
            t = pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                          "_one": pa.array(np.ones(t.num_rows, np.int64))})
            g = t.group_by(["user_id"]).aggregate([("_one", "sum")])
            return g.rename_columns(["user_id", out])

        return sharded_grouped_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["user_id"], [(out, "sum")], num_shards=16,
        )

    left = side("signup", "n_signup")
    right = side("purchase", "n_purchase").map_batches(
        lambda b: b.rename_columns(["user_id_r", "n_purchase"]),
        batch_format="pyarrow",
    )
    return shuffle_join(left, right, "user_id", "user_id_r",
                        right_cols=["user_id_r", "n_purchase"], how="full")


def q_robust_stats(sf_dir: str):
    """Per-event-type median + MAD of value (stages/keyed.robust_stats;
    one key-shard exchange, both medians computed in the same shard task).
    Centi-int64 pre-scale makes both interpolated medians exact vs DuckDB
    median()/mad()."""
    from ..stages.keyed import robust_stats

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "cval": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })

    out = robust_stats(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["event_type"], "cval", med_col="med_v", mad_col="mad_v",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "med_v": pc.divide(batch["med_v"], 100.0),
            "mad_v": pc.divide(batch["mad_v"], 100.0),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def q_edit_distance_pairs(sf_dir: str):
    """Fuzzy-title near-dup pairs: Levenshtein <= 2 over the 32-char text
    prefix (stages/dedup.edit_distance_pairs; PassJoin pigeonhole banding,
    never all-pairs; in-bucket vectorized DP verify).  Oracle: DuckDB
    levenshtein over the same prefix."""
    from ..stages.dedup import edit_distance_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return edit_distance_pairs(ds, max_dist=2, key_len=32)


def q_transitions(sf_dir: str):
    """Event-type Markov transition counts over each user's totally
    ordered timeline (stages/keyed.transition_counts; one user-hash
    exchange, per-shard shifted compare, O(|types|^2) final)."""
    from ..stages.keyed import transition_counts

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "tms": ts_to_ms(batch["ts"]),
            "event_type": batch["event_type"],
            "event_id": pc.cast(batch["event_id"], pa.int64()),
        })

    return transition_counts(
        ds.map_batches(norm, batch_format="pyarrow"),
        "user_id", ["tms", "event_type", "event_id"], "event_type",
        out_count="n_pairs",
    )


def q_impute_median(sf_dir: str):
    """Group-median imputation: values < 5 nulled, then filled with their
    event type's median of the remaining values
    (stages/keyed.impute_median; one exchange, in-task median + fill,
    centi-int exactness vs the SQL window quantile_cont)."""
    from ..stages.keyed import impute_median

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        cval = np.rint(v * 100).astype(np.float64)
        cval[v < 5] = np.nan
        return pa.table({
            "event_type": batch["event_type"],
            "cval": pa.array(cval, pa.float64()),
        })

    out = impute_median(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["event_type"], "cval", out_col="imputed",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "cval": batch["cval"],
            "imputed": pc.divide(batch["imputed"], 100.0),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def q_watermark_window(sf_dir: str):
    """Streaming tumbling-window counts with a 30-min allowed-lateness
    watermark, replayed deterministically (stages/windowed.
    watermark_window_counts; two-pass global prefix-max scan, per-block
    vectorized).  Arrival order = a deterministic within-16-block
    permutation of event_id so the corpus actually HAS late data (event_id
    is otherwise perfectly time-ordered)."""
    from ..stages.windowed import watermark_window_counts

    ds = _read(sf_dir, "events", ["event_id", "event_type", "ts"])

    def norm(batch: pa.Table) -> pa.Table:
        eid = pc.cast(batch["event_id"], pa.int64())
        blk = pc.multiply(pc.divide(eid, 16), 16)
        within = pc.subtract(eid, blk)
        aid = pc.add(blk, pc.subtract(
            pc.multiply(within, 5),
            pc.multiply(pc.divide(pc.multiply(within, 5), 16), 16),
        ))
        return pa.table({
            "aid": aid,
            "tms": ts_to_ms(batch["ts"]),
            "event_type": batch["event_type"],
        })

    return watermark_window_counts(
        ds.map_batches(norm, batch_format="pyarrow"),
        "aid", "tms", ["event_type"],
        window_ms=300000, lateness_ms=1800000, out_count="n_kept",
    )


def q_compression_ratio(sf_dir: str):
    """Per-doc zlib compression ratio — the Gopher/CCNet repetition signal
    (stages/textstats.add_compression_ratio; shuffle-free, C-level zlib
    pass).  Fixture-oracled (zlib is the spec)."""
    from ..stages.textstats import add_compression_ratio

    return add_compression_ratio(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_unigram_logprob(sf_dir: str):
    """Per-doc mean negative log-prob under the corpus unigram LM — the
    cheap perplexity-style quality score (stages/textstats.
    unigram_logprob; Counter combiner + term-shard vocabulary pass,
    broadcast once, then a shuffle-free vectorized scoring pass)."""
    from ..stages.textstats import unigram_logprob

    return unigram_logprob(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_weekly_active(sf_dir: str):
    """Weekly-active-users for every day present: EXACT trailing-7-day
    COUNT(DISTINCT user) via interval-coverage boundary deltas
    (stages/windowed.sliding_distinct; one user-hash exchange, O(days)
    driver state — never a per-window recount)."""
    from ..stages.windowed import sliding_distinct

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "day": pc.divide(ts_to_ms(batch["ts"]), 86400000),
        })

    return sliding_distinct(
        ds.map_batches(norm, batch_format="pyarrow"),
        "user_id", "day", window=7, out_count="n_active",
    )


def q_global_quantiles(sf_dir: str):
    """EXACT global p50/p90/p99 of value by distributed selection —
    iterative histogram refinement, no sort, no value shuffle
    (stages/sketch.exact_global_quantiles; 2-3 streaming passes, O(buckets)
    driver state).  quantile_disc semantics over centi-int64."""
    import pandas as pd

    from ..stages.sketch import exact_global_quantiles

    ds = _read(sf_dir, "events", ["value"])

    def norm(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"cval": pa.array(np.rint(v * 100).astype(np.int64))})

    qs = (0.5, 0.9, 0.99)
    res = exact_global_quantiles(
        ds.map_batches(norm, batch_format="pyarrow"), "cval", qs
    )
    return pd.DataFrame({
        "q": list(qs),
        "v": [res[q] / 100.0 for q in qs],
    })


def q_frame_features(sf_dir: str):
    """Video frame-sample -> per-frame feature -> mean-pool (stages/
    multimodal.sample_frame_features; in-task row expansion + pool, actor
    pool, stubbed codec).  Fixture-oracled by the independent blake2b
    reference."""
    from ..stages.multimodal import sample_frame_features

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        payloads = [t.encode("utf-8") if t else b"" for t in batch["text"].to_pylist()]
        n = len(payloads)
        kinds = ["image" if i % 3 else "video" for i in batch["doc_id"].to_pylist()]
        return pa.table({
            "media_id": batch["doc_id"],
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "duration_ms": pa.array([3000] * n, pa.int32()),
        })

    return sample_frame_features(
        ds.map_batches(to_media, batch_format="pyarrow"), every_ms=1000
    )


def q_cluster_keep_best(sf_dir: str):
    """The real dedup decision: per duplicate cluster (connected
    components over the dup_clusters edge graph), KEEP the best document —
    longest n_chars, doc_id tiebreak.  Composition: CC labels ->
    co-partitioned join with doc stats -> top-1 per component
    (stages/graph.connected_components + joins.shuffle_join +
    keyed.topk_per_group; combiner bounds the final exchange at one row
    per (component, batch))."""
    from ..stages.graph import connected_components, group_star_edges_multi
    from ..stages.joins import shuffle_join
    from ..stages.keyed import topk_per_group

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    edges = group_star_edges_multi(
        docs, [["lang", "n_chars"], ["source", "n_chars"]])
    cc = connected_components(edges, docs, node_col="doc_id")
    stats = docs.map_batches(
        lambda b: pa.table({"sid": pc.cast(b["doc_id"], pa.int64()),
                            "n_chars": pc.cast(b["n_chars"], pa.int64())}),
        batch_format="pyarrow",
    )
    joined = shuffle_join(cc, stats, "doc_id", "sid",
                          right_cols=["n_chars"], how="inner")
    best = topk_per_group(joined, ["component"], "n_chars", 1,
                          tiebreak_col="doc_id", descending=True)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "component": pc.cast(batch["component"], pa.int64()),
            "keep_doc": pc.cast(batch["doc_id"], pa.int64()),
            "keep_chars": pc.cast(batch["n_chars"], pa.int64()),
        })

    return best.map_batches(finish, batch_format="pyarrow")


def q_pagerank(sf_dir: str):
    """Integer PageRank over the dup edge graph (stages/graph.pagerank_int;
    exact int64 mass routing — bit-identical across partitionings — one
    dst-hash exchange per iteration).  Fixture-oracled by an independent
    sequential reference."""
    from ..stages.graph import group_star_edges_multi, pagerank_int

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    edges = group_star_edges_multi(
        docs, [["lang", "n_chars"], ["source", "n_chars"]])
    return pagerank_int(edges, docs, node_col="doc_id", iters=5)


def q_share_of_type(sf_dir: str):
    """Each user's share of their event type's volume — ratio-to-report
    (stages/keyed.ratio_to_total; exact int group sums broadcast once,
    shuffle-free divide)."""
    from ..stages.keyed import ratio_to_total, sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch["event_type"],
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "n": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        g = t.group_by(["event_type", "user_id"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "user_id", "n"])

    counts = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "user_id"], [("n", "sum")], num_shards=16,
    )
    return ratio_to_total(counts, ["event_type"], "n",
                          carry_cols=["user_id"], out_col="share")


def q_cdc_merge(sf_dir: str):
    """CDC changelog merge: treat events as an ordered upsert/delete stream
    per user (purchase = delete, anything else = upsert of value) and emit
    the final snapshot — last writer by (ts, event_id) wins, deleted keys
    vanish.  Composition: per-batch top-1 combiner + one key-shard exchange
    (stages/keyed.topk_per_group with a packed order key), then a filter —
    the standard log-compaction / SCD-latest shape."""
    from ..stages.keyed import topk_per_group

    ds = _read(sf_dir, "events",
               ["user_id", "event_type", "ts", "event_id", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        eid = pc.cast(batch["event_id"], pa.int64())
        # one sortable recency key: (ts, event_id) packed — event_id is the
        # unique tiebreak, ts dominates (ms * 2^20 leaves room for 1M ids/ms)
        okey = pc.add(
            pc.multiply(ts_to_ms(batch["ts"]), 1 << 20),
            pc.subtract(eid, pc.multiply(pc.divide(eid, 1 << 20), 1 << 20)),
        )
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "_okey": okey,
            "is_delete": pc.cast(
                pc.equal(batch["event_type"], "purchase"), pa.int8()),
            "value": pc.cast(batch["value"], pa.float64()),
        })

    last = topk_per_group(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["user_id"], "_okey", 1, descending=True,
    )

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["is_delete"], 0)
        t = batch.filter(keep)
        return pa.table({
            "user_id": t["user_id"],
            "last_value": t["value"],
        })

    return last.map_batches(finish, batch_format="pyarrow")


def q_char_entropy(sf_dir: str):
    """Per-doc character-distribution Shannon entropy (log2) — the
    CCNet-class gibberish/boilerplate signal (stages/textstats.
    char_entropy; shuffle-free, one UTF-32 decode + np.unique + reduceat
    per batch, no per-doc Python)."""
    from ..stages.textstats import char_entropy

    return char_entropy(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_audience_overlap(sf_dir: str):
    """Audience overlap: Jaccard similarity between every two event
    types' user sets — |A∩B| and |A|,|B| all from ONE pass of the
    co-occurrence kernel (``marginals=True``: per-shard distincts sum
    exactly because users partition across shards).
    jaccard = inter / (nA + nB - inter), exact."""
    import ray

    from ..stages.keyed import cooccurrence_pairs

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "event_type": batch["event_type"],
        })

    nds = ds.map_batches(norm, batch_format="pyarrow")
    combined = cooccurrence_pairs(nds, "user_id", "event_type",
                                  out_count="inter", marginals=True,
                                  bounded_final=True).materialize()
    sizes: dict[str, int] = {}
    for part in combined.filter(
        expr="tag == 'item'"
    ).iter_batches(batch_format="pyarrow"):
        for r in part.to_pylist():
            sizes[r["ta"]] = r["inter"]
    size_ref = ray.put(sizes)
    inter = combined.filter(expr="tag == 'pair'").drop_columns(["tag"])

    def finish(batch: pa.Table) -> pa.Table:
        m = ray.get(size_ref)
        na = np.array([m[t] for t in batch["ta"].to_pylist()], np.int64)
        nb = np.array([m[t] for t in batch["tb"].to_pylist()], np.int64)
        iv = batch["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
        jac = iv.astype(np.float64) / (na + nb - iv).astype(np.float64)
        return pa.table({
            "ta": batch["ta"],
            "tb": batch["tb"],
            "inter": pa.array(iv, pa.int64()),
            "jaccard": pa.array(np.round(jac, 8), pa.float64()),
        })

    return inter.map_batches(finish, batch_format="pyarrow")


_PROFILE_COLS = ["doc_id", "lang", "source", "n_chars", "text"]


def q_profile_docs(sf_dir: str):
    """Per-column data-quality profile of documents: non-null / null /
    exact distinct counts (stages/curation.profile_columns; scalar null
    counts driver-summed, distincts via per-batch combiner + one
    pair-hash exchange)."""
    from ..stages.curation import profile_columns

    return profile_columns(_read(sf_dir, "documents", _PROFILE_COLS),
                           _PROFILE_COLS)


_PIVOT_CATS = ["click", "error", "purchase", "signup", "view"]


def q_pivot_events(sf_dir: str):
    """Long->wide pivot: per-user wide count + value-sum columns, one per
    event type (stages/keyed.pivot_counts; per-batch wide combiner, one
    hash-shard segment-sum exchange of O(users x types) cells)."""
    from ..stages.keyed import pivot_counts

    out = pivot_counts(
        _read(sf_dir, "events", ["user_id", "event_type", "value"]),
        ["user_id"], "event_type", _PIVOT_CATS, value_col="value",
    )
    return _finalize(out, {}, {f"v_{c}": 4 for c in _PIVOT_CATS})


def q_mad_outliers(sf_dir: str):
    """Per-type robust outlier counts: |v - median| > 3*MAD
    (stages/keyed.mad_outliers; robust_stats' one-exchange shape with the
    comparison run in doubled/quadrupled integer units — bit-exact vs the
    SQL median()/mad() rule)."""
    from ..stages.keyed import mad_outliers

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "cval": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })

    return mad_outliers(ds.map_batches(norm, batch_format="pyarrow"),
                        ["event_type"], "cval", k=3)


def q_first_last(sf_dir: str):
    """first_value/last_value of value per (type, user) over the total
    (ts, event_id) order (stages/keyed.group_first_last; 2-rows-per-key
    combiner bounds the exchange — the windowed analogue of the rollup
    tiers' first/last-by-ts aggregate)."""
    from ..stages.keyed import group_first_last

    ds = _read(sf_dir, "events", ["event_type", "user_id", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "ts": pc.cast(batch["ts"], pa.int64()),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "value": batch["value"],
        })

    out = group_first_last(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "user_id"], ["ts", "event_id"], "value",
    )
    return out


def q_dense_rank(sf_dir: str):
    """dense_rank() of each event within its type, ordered by floor(value)
    — ties share a rank, no gaps (stages/keyed.dense_rank; window_rank's
    narrow exchange with event_id carried for row identity)."""
    from ..stages.keyed import dense_rank

    ds = _read(sf_dir, "events", ["event_type", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "vfloor": pa.array(np.floor(v).astype(np.int64), pa.int64()),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
        })

    out = dense_rank(ds.map_batches(prep, batch_format="pyarrow"),
                     ["event_type"], ["vfloor"], carry_cols=["event_id"])
    return out.map_batches(
        lambda b: b.select(["event_type", "event_id", "dr"]),
        batch_format="pyarrow",
    )


def q_winsorized(sf_dir: str):
    """Per-type winsorized mean (values clamped to [p10, p90] before
    averaging — stages/keyed.winsorized_mean; exact centi-int order
    statistics + sum, division sequence mirrored by the oracle)."""
    from ..stages.keyed import winsorized_mean

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "cval": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })

    return winsorized_mean(ds.map_batches(norm, batch_format="pyarrow"),
                           ["event_type"], "cval", q_lo=0.1, q_hi=0.9)


def q_scd2_intervals(sf_dir: str):
    """SCD type-2 dimension build: every event is an upsert of (user ->
    value); emit validity intervals [valid_from, valid_to) with the
    current row open-ended NULL (stages/keyed.lead_intervals; lag_column's
    narrow exchange, lead nulled at key segment ends)."""
    from ..stages.keyed import lead_intervals

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "tsms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "value": batch["value"],
        })

    return lead_intervals(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"], "tsms", "event_id", "value",
    )


def q_dataset_split(sf_dir: str):
    """Deterministic train/val/test split (Lehmer rank of doc_id, 80/10/10)
    with per-(split, lang) doc + char mass — the dataset-versioning step of
    a training pipeline.  Shuffle-free assignment (exact integer math both
    engines run literally, like mix_sources), bounded-key final."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def assign(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        bucket = ((ids * 48271) % 2147483647) % 100
        split = np.where(bucket < 80, "train", np.where(bucket < 90, "val", "test"))
        t = pa.table({
            "split": pa.array(split.astype(object), pa.string()),
            "lang": batch["lang"],
            "n_docs": pa.array(np.ones(len(ids), np.int64)),
            "sum_chars": pc.cast(batch["n_chars"], pa.int64()),
        })
        g = t.group_by(["split", "lang"]).aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")]
        )
        return g.rename_columns(["split", "lang", "n_docs", "sum_chars"])

    return sharded_grouped_agg(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["split", "lang"], [("n_docs", "sum"), ("sum_chars", "sum")],
        num_shards=8,
    )


def q_ohlc_1h(sf_dir: str):
    """Candlestick downsample: open/high/low/close of value per
    (event_type, aligned hour) over the total (ts, event_id) order
    (stages/keyed.ohlc_agg; one-row-per-key-per-batch combiner — the
    M4-style visualization downsample over the tier window grid)."""
    from ..stages.keyed import ohlc_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        tsms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "w": pa.array((tsms // 3_600_000) * 3_600_000, pa.int64()),
            "tsms": pa.array(tsms, pa.int64()),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "value": batch["value"],
        })

    return ohlc_agg(ds.map_batches(prep, batch_format="pyarrow"),
                    ["event_type", "w"], ["tsms", "event_id"], "value")


def q_peak_hour(sf_dir: str):
    """Seasonal profile: each event type's busiest hour of day (UTC),
    ties to the smallest hour — count combiner -> bounded (type, hour)
    segment sum -> k=1 top-k kernel."""
    from ..stages.keyed import sharded_grouped_agg, topk_per_group

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        tsms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": batch["event_type"],
            "hour": pa.array((tsms // 3_600_000) % 24, pa.int64()),
            "n": pa.array(np.ones(len(tsms), np.int64)),
        })
        g = t.group_by(["event_type", "hour"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "hour", "n"])

    counts = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "hour"], [("n", "sum")], num_shards=8,
    )
    out = topk_per_group(counts, ["event_type"], "n", 1, tiebreak_col="hour")
    return out.map_batches(
        lambda b: b.select(["event_type", "hour", "n"]), batch_format="pyarrow"
    )


_BM25_TERMS = ["hash", "join", "window", "stream"]


def q_bm25(sf_dir: str):
    """BM25 relevance of every document against a fixed query-term set
    (stages/textstats.bm25_scores; one-row-per-batch stats combiner ->
    broadcast idf/avgdl constants -> shuffle-free scoring; idf quantized
    to micro units so the only libm call can't drift across engines)."""
    from ..stages.textstats import bm25_scores

    return bm25_scores(_read(sf_dir, "documents", ["doc_id", "text"]),
                       _BM25_TERMS)


def q_resets(sf_dir: str):
    """PromQL resets(): how often each (type, user) counter DECREASED
    along its (ts, event_id) timeline (composition: lag_column ->
    vectorized compare -> count combiner -> sharded sum; reference
    counter semantics as in counter_increase)."""
    from ..stages.keyed import lag_column, sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "user_id", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "tsms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "value": batch["value"],
        })

    lagged = lag_column(ds.map_batches(prep, batch_format="pyarrow"),
                        ["event_type", "user_id"], ["tsms", "event_id"],
                        "value")

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        p = batch["prev"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": batch["event_type"],
            "user_id": batch["user_id"],
            "n_resets": pa.array((v < p).astype(np.int64)),
        })
        g = t.group_by(["event_type", "user_id"]).aggregate([("n_resets", "sum")])
        return g.rename_columns(["event_type", "user_id", "n_resets"])

    return sharded_grouped_agg(
        lagged.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "user_id"], [("n_resets", "sum")], num_shards=16,
    )


def q_triangles(sf_dir: str):
    """Exact triangle count of the dup relation graph (star edges over
    (lang, n_chars//100) and (source, n_chars//100) buckets) —
    stages/graph.triangle_count: min-vertex-oriented wedges, two
    exchanges, structured-dtype membership join.  Oracle: 3-way SQL
    self-join on the identical edge set."""
    import pandas as pd

    from ..stages.graph import group_star_edges_multi, triangle_count

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])

    def bucket(batch: pa.Table) -> pa.Table:
        nb = pc.cast(batch["n_chars"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "lang": batch["lang"],
            "source": batch["source"],
            "cb": pa.array(nb // 100, pa.int64()),
        })

    d = docs.map_batches(bucket, batch_format="pyarrow")
    edges = group_star_edges_multi(d, [["lang", "cb"], ["source", "cb"]])
    n = triangle_count(edges)
    return pd.DataFrame({"n_triangles": [n]})


def q_srs_sample(sf_dir: str):
    """Global simple random sample without replacement: the 100 docs with
    the smallest Lehmer rank of doc_id — deterministic integer math both
    engines run literally; the per-batch top-k combiner means only
    100 rows per batch reach the (single-group) final."""
    from ..stages.keyed import topk_per_group

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def rank(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array(np.zeros(len(ids), np.int64)),
            "doc_id": pa.array(ids),
            "lang": batch["lang"],
            "r": pa.array((ids * 48271) % 2147483647, pa.int64()),
        })

    out = topk_per_group(ds.map_batches(rank, batch_format="pyarrow"),
                         ["g"], "r", 100, tiebreak_col="doc_id",
                         descending=False)
    return out.map_batches(
        lambda b: b.select(["doc_id", "lang"]), batch_format="pyarrow"
    )


def q_oov_rate(sf_dir: str):
    """Out-of-vocabulary curation signal: per doc, total tokens and how
    many fall OUTSIDE the corpus top-100 vocabulary (term_df's exact
    df ranking) — vocabulary built once (combiner-bounded), broadcast via
    ray.put, then a shuffle-free per-batch membership pass."""
    import ray as _ray

    from ..stages.textstats import term_document_frequency

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    vocab = term_document_frequency(ds, top_n=100).to_pandas()["term"].tolist()
    vocab_ref = _ray.put(frozenset(vocab))

    def score(batch: pa.Table, _v=vocab_ref) -> pa.Table:
        import re

        vset = _ray.get(_v)
        word_re = re.compile(r"[A-Za-z]+")
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        n_tok = np.zeros(len(ids), np.int64)
        n_oov = np.zeros(len(ids), np.int64)
        for i, txt in enumerate(batch["text"].to_pylist()):
            toks = word_re.findall(txt or "")
            n_tok[i] = len(toks)
            n_oov[i] = sum(1 for t in toks if t.lower() not in vset)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(n_tok),
            "n_oov": pa.array(n_oov),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def q_cluster_sizes(sf_dir: str):
    """Dup-cluster size distribution: how many components have each
    member count (the dedup yield report) — connected components over the
    dup graph, per-component count, bounded size histogram."""
    from ..stages.graph import connected_components, group_star_edges_multi
    from ..stages.keyed import sharded_grouped_agg

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    edges = group_star_edges_multi(
        docs, [["lang", "n_chars"], ["source", "n_chars"]])
    cc = connected_components(edges, docs, node_col="doc_id")

    def comp_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "component": pc.cast(batch["component"], pa.int64()),
            "size": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        g = t.group_by(["component"]).aggregate([("size", "sum")])
        return g.rename_columns(["component", "size"])

    sizes = sharded_grouped_agg(
        cc.map_batches(comp_partial, batch_format="pyarrow"),
        ["component"], [("size", "sum")], num_shards=16,
    )

    def size_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "size": batch["size"],
            "n_components": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        g = t.group_by(["size"]).aggregate([("n_components", "sum")])
        return g.rename_columns(["size", "n_components"])

    return sharded_grouped_agg(
        sizes.map_batches(size_partial, batch_format="pyarrow"),
        ["size"], [("n_components", "sum")], num_shards=4,
    )


def q_media_resize(sf_dir: str):
    """Image-resize plumbing (stages/multimodal.resize_media actor pool,
    stubbed codec): images normalized to 64x64 thumbnails, other media
    passes through; thumb_hash stands in for the resized payload.
    Fixture-oracled by the independent blake2b reference."""
    from ..stages.multimodal import resize_media

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        payloads = [t.encode("utf-8") if t else b"" for t in batch["text"].to_pylist()]
        kinds = ["image" if i % 3 else "video" for i in ids]
        return pa.table({
            "media_id": pa.array(ids),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(320 + (ids % 5) * 64, pa.int32()),
            "height": pa.array(240 + (ids % 3) * 80, pa.int32()),
        })

    return resize_media(ds.map_batches(to_media, batch_format="pyarrow"),
                        target_size=(64, 64), concurrency=(1, 4))


def q_pca_top(sf_dir: str):
    """Top principal component of the embedding table
    (stages/similarity.pca_top_component; exact int64 scatter-matrix
    combiner — one row per batch — + driver power iteration on the d x d
    covariance).  Fixture-oracled by an independent numpy reference."""
    import pandas as pd

    from ..stages.similarity import pca_top_component

    ds = _read(sf_dir, "embeddings", ["embedding"])
    v, eig, _n = pca_top_component(ds)
    return pd.DataFrame({
        "dim": np.arange(len(v), dtype=np.int64),
        "component": np.round(v, 6),
        "eigenvalue": np.round(np.full(len(v), eig), 6),
    })


def q_bpe_merges(sf_dir: str):
    """Tokenizer fitting: the first 8 BPE merges learned from the corpus
    (stages/textstats.bpe_train; one combiner-bounded pass per round —
    only the pair vocabulary reaches the driver).  Fixture-oracled by an
    independent single-process reference."""
    import pandas as pd

    from ..stages.textstats import bpe_train

    ds = _read(sf_dir, "documents", ["text"])
    merges = bpe_train(ds, k=8)
    return pd.DataFrame({
        "merge_idx": np.arange(len(merges), dtype=np.int64),
        "left": [a for a, _, _ in merges],
        "right": [b for _, b, _ in merges],
        "n": np.array([n for _, _, n in merges], np.int64),
    })


def q_slo_burn(sf_dir: str):
    """SLO burn report: per day, how many aligned 5m windows had an
    error share above 10% — exact integer cross-multiply (10 * errors >
    total), per-batch (window, counts) combiner, bounded day final."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        tsms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        w = (tsms // MS_5M) * MS_5M
        err = pc.equal(batch["event_type"], "error").to_numpy(zero_copy_only=False)
        t = pa.table({
            "w": pa.array(w, pa.int64()),
            "n_err": pa.array(err.astype(np.int64)),
            "n_all": pa.array(np.ones(len(w), np.int64)),
        })
        g = t.group_by(["w"]).aggregate([("n_err", "sum"), ("n_all", "sum")])
        return g.rename_columns(["w", "n_err", "n_all"])

    win = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["w"], [("n_err", "sum"), ("n_all", "sum")], num_shards=16,
    )

    def day_partial(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False)
        ne = batch["n_err"].to_numpy(zero_copy_only=False)
        na = batch["n_all"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "day": pa.array((w // MS_1D) * MS_1D, pa.int64()),
            "n_burn": pa.array((10 * ne > na).astype(np.int64)),
            "n_windows": pa.array(np.ones(len(w), np.int64)),
        })
        g = t.group_by(["day"]).aggregate([("n_burn", "sum"), ("n_windows", "sum")])
        return g.rename_columns(["day", "n_burn", "n_windows"])

    return sharded_grouped_agg(
        win.map_batches(day_partial, batch_format="pyarrow"),
        ["day"], [("n_burn", "sum"), ("n_windows", "sum")], num_shards=4,
    )


def q_max_drawdown(sf_dir: str):
    """Largest peak-to-trough drop of each (type, user) value series
    (stages/keyed.max_drawdown; segment-reset running max via the offset
    trick, exact centi-ints)."""
    from ..stages.keyed import max_drawdown

    ds = _read(sf_dir, "events", ["event_type", "user_id", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "tsms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "cval": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })

    out = max_drawdown(ds.map_batches(prep, batch_format="pyarrow"),
                       ["event_type", "user_id"], ["tsms", "event_id"], "cval")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "user_id": batch["user_id"],
            "max_dd": pc.divide(pc.cast(batch["max_dd"], pa.float64()), 100.0),
            "n": batch["n"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


def q_cume_dist(sf_dir: str):
    """cume_dist() of each event within its type by floor(value) — ties
    share the value (stages/keyed.cume_dist; percent_rank's narrow
    exchange with event_id carried)."""
    from ..stages.keyed import cume_dist

    ds = _read(sf_dir, "events", ["event_type", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "vfloor": pa.array(np.floor(v).astype(np.int64), pa.int64()),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
        })

    out = cume_dist(ds.map_batches(prep, batch_format="pyarrow"),
                    ["event_type"], ["vfloor"], carry_cols=["event_id"])
    return out.map_batches(
        lambda b: b.select(["event_type", "event_id", "cd"]),
        batch_format="pyarrow",
    )


def q_monthly_rollup(sf_dir: str):
    """CALENDAR-window rollup (months are not fixed-duration, so the
    epoch-aligned window math of O3 cannot express them): per (type,
    month) count + sum, the month key derived vectorized via numpy
    datetime64[M] truncation; bounded-key final."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        tsms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        month_ms = (
            tsms.astype("datetime64[ms]").astype("datetime64[M]")
            .astype("datetime64[ms]").astype(np.int64)
        )
        v = batch["value"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": batch["event_type"],
            "month_ms": pa.array(month_ms, pa.int64()),
            "n": pa.array(np.ones(len(tsms), np.int64)),
            "csum": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })
        g = t.group_by(["event_type", "month_ms"]).aggregate(
            [("n", "sum"), ("csum", "sum")]
        )
        return g.rename_columns(["event_type", "month_ms", "n", "csum"])

    out = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "month_ms"], [("n", "sum"), ("csum", "sum")],
        num_shards=8,
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "month_ms": batch["month_ms"],
            "n": batch["n"],
            "sum_value": pc.divide(pc.cast(batch["csum"], pa.float64()), 100.0),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def q_k_anonymity(sf_dir: str):
    """Privacy audit: quasi-identifier combos (lang, source) held by
    fewer than k=5 docs, and how many docs are at risk — group-size
    combiner + bounded final + vectorized filter."""
    from ..stages.keyed import sharded_grouped_agg

    K_ANON = 5
    ds = _read(sf_dir, "documents", ["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "lang": batch["lang"],
            "source": batch["source"],
            "n_docs": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        g = t.group_by(["lang", "source"]).aggregate([("n_docs", "sum")])
        return g.rename_columns(["lang", "source", "n_docs"])

    counts = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "source"], [("n_docs", "sum")], num_shards=8,
    )
    # bounded by distinct (lang, source); collected schema-stably because a
    # dense corpus (sf1: 10x docs) has NO under-k combos -> empty result
    return _collect_stable(counts.map_batches(
        lambda b: b.filter(pc.less(b["n_docs"], K_ANON)),
        batch_format="pyarrow",
    ))


def q_dup_spans(sf_dir: str):
    """Exact substring-duplication fractions per doc (40-char spans at
    stride 8; stages/curation.dup_span_stats — one bounded-payload wide
    exchange + a narrow doc-sharded sum)."""
    from ..stages.curation import dup_span_stats

    return dup_span_stats(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_minhash_index_pairs(sf_dir: str):
    """Online dedup with a PERSISTED LSH index: even-id docs indexed once
    (cached per corpus under /tmp), odd-id docs stream against it — only
    the (band, bucket) partitions the new hashes land in are read
    (stages/dedup.build_minhash_index / minhash_index_query).  Candidates
    equal the cross (even, odd) subset of the full-corpus LSH run, so the
    oracle is the minhash_pairs fixture filtered by parity."""
    import os

    from ..stages.dedup import build_minhash_index, minhash_index_query

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def half(parity):
        def fn(batch: pa.Table) -> pa.Table:
            ids = pc.cast(batch["doc_id"], pa.int64())
            keep = pc.equal(
                pc.bit_wise_and(ids, pa.scalar(1, pa.int64())),
                pa.scalar(parity, pa.int64()),
            )
            return batch.filter(keep)

        return docs.map_batches(fn, batch_format="pyarrow")

    index_dir = f"/tmp/graft_mh_index_v2_{_corpus_tag(sf_dir, 'documents')}"
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        build_minhash_index(half(0), index_dir)
    pairs = minhash_index_query(index_dir, half(1))

    def canon(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array(np.minimum(a, b)),
            "b": pa.array(np.maximum(a, b)),
        })

    return pairs.map_batches(canon, batch_format="pyarrow")


def q_zorder_sample(sf_dir: str):
    """Z-ORDER layout key (lakehouse data clustering): the 64 events with
    the smallest Morton interleave of (user_id, minute) — sorting output
    by this key clusters BOTH dimensions so zone maps prune on either
    column (functions/hashing.morton2d; magic-number bit dilation the SQL
    oracle mirrors shift-for-shift; bottom-k combiner, single-group
    final)."""
    from ..functions.hashing import morton2d
    from ..stages.keyed import topk_per_group

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def key(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
        minute = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False) // 60_000
        m = morton2d(uid & 0x7FFFFFFF, minute & 0x7FFFFFFF)
        return pa.table({
            "g": pa.array(np.zeros(len(uid), np.int64)),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "morton": pa.array(m, pa.int64()),
        })

    out = topk_per_group(ds.map_batches(key, batch_format="pyarrow"),
                         ["g"], "morton", 64, tiebreak_col="event_id",
                         descending=False)
    return out.map_batches(
        lambda b: b.select(["event_id", "morton"]), batch_format="pyarrow"
    )


def q_anomaly_3sigma(sf_dir: str):
    """Streaming outlier detection: per (type, user) series, rolling 16-row
    3-sigma test in EXACT cross-multiplied int64 arithmetic
    (stages/windowed.rolling_sigma_outliers) — reported as per-type anomaly
    counts.  The |v-mean| > 3*sigma rule with no float mean/var in either
    engine."""
    from ..stages.keyed import sharded_grouped_agg
    from ..stages.windowed import rolling_sigma_outliers

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "user_id": batch["user_id"],
            "ts_ms": ts_to_ms(batch["ts"]),
            "event_id": batch["event_id"],
            "cv": pa.array(np.rint(v * 100).astype(np.int64)),
        })

    flags = rolling_sigma_outliers(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "user_id"], ["ts_ms", "event_id"], "cv",
        window=16, k=3,
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch["event_type"],
            "n_anomalies": pc.cast(batch["is_anomaly"], pa.int64()),
            "n_points": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        g = t.group_by(["event_type"]).aggregate(
            [("n_anomalies", "sum"), ("n_points", "sum")]
        )
        return g.rename_columns(["event_type", "n_anomalies", "n_points"])

    return sharded_grouped_agg(
        flags.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], [("n_anomalies", "sum"), ("n_points", "sum")],
        num_shards=4,
    )


def q_skyline(sf_dir: str):
    """Pareto frontier over per-user activity: users not dominated on
    (total centi-value, event count) — multi-objective top-N
    (stages/keyed.pareto_skyline; local-frontier semilattice combiner,
    no input shuffle).  Oracle: NOT EXISTS dominance."""
    from ..stages.keyed import pareto_skyline, sharded_grouped_agg

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "x": pa.array(np.rint(v * 100).astype(np.int64)),
            "y": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        g = t.group_by(["user_id"]).aggregate([("x", "sum"), ("y", "sum")])
        return g.rename_columns(["user_id", "x", "y"])

    per_user = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"], [("x", "sum"), ("y", "sum")], num_shards=16,
    )
    return pareto_skyline(per_user, "x", "y")


_HIST_NB = 20


def q_value_histogram(sf_dir: str):
    """Equi-width value histogram per event type (20 buckets over the
    type's [min, max] centi-value range) — data-profiling distribution
    summary.  Bucket index is EXACT integer math (``(c-lo)*NB //
    (hi-lo+1)``) on both sides; pass 1 is a bounded-key min/max combiner
    whose tiny result is broadcast, pass 2 a shuffle-free bucket count
    combiner + bounded final."""
    import ray

    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def to_centi(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "cv": pa.array(np.rint(v * 100).astype(np.int64)),
        })

    centi = ds.map_batches(to_centi, batch_format="pyarrow")

    def minmax(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type"]).aggregate([("cv", "min"), ("cv", "max")])
        return g.rename_columns(["event_type", "lo", "hi"])

    bounds: dict[str, list[int]] = {}
    for part in centi.map_batches(minmax, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for r in part.to_pylist():
            b = bounds.setdefault(r["event_type"], [r["lo"], r["hi"]])
            b[0] = min(b[0], r["lo"])
            b[1] = max(b[1], r["hi"])
    bounds_ref = ray.put(bounds)

    def bucketize(batch: pa.Table) -> pa.Table:
        bmap = ray.get(bounds_ref)
        # dictionary-encode: the Python lookup runs once per DISTINCT type,
        # the per-row gather is a numpy take
        col = batch["event_type"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # 1-chunk CA on older pyarrow
            col = col.chunk(0) if col.num_chunks else pa.array([], pa.string())
        enc = col.dictionary_encode()
        cats = enc.dictionary.to_pylist()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.array([bmap[c][0] for c in cats], np.int64)[idx]
        hi = np.array([bmap[c][1] for c in cats], np.int64)[idx]
        cv = batch["cv"].to_numpy(zero_copy_only=False)
        bucket = (cv - lo) * _HIST_NB // (hi - lo + 1)
        t = pa.table({
            "event_type": batch["event_type"],
            "bucket": pa.array(bucket),
            "n": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        g = t.group_by(["event_type", "bucket"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "bucket", "n"])

    return sharded_grouped_agg(
        centi.map_batches(bucketize, batch_format="pyarrow"),
        ["event_type", "bucket"], [("n", "sum")], num_shards=8,
    )


def q_pmi_pairs(sf_dir: str):
    """Pointwise mutual information between event types over their distinct
    user sets — the association-strength upgrade of cooccurrence:
    ``pmi = ln(N * c_ab / (c_a * c_b))`` with the single libm call floored
    to micro-units on both sides (the bm25 protocol).  ONE pass: the
    cooccurrence kernel's key-hash exchange also emits (``marginals=True``)
    the per-type / global distinct-user denominators — users partition
    across shards, so per-shard distincts sum exactly.  The combined result
    is bounded (|types|^2 + |types| + shards rows), so materializing it
    before the tag split costs nothing."""
    from ..stages.keyed import cooccurrence_pairs

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    combined = cooccurrence_pairs(
        ds, "user_id", "event_type", out_count="n_keys", num_shards=16,
        marginals=True, bounded_final=True,
    ).materialize()

    per_type: dict[str, int] = {}
    n_users = 0
    for part in combined.filter(
        expr="tag != 'pair'"
    ).iter_batches(batch_format="pyarrow"):
        for r in part.to_pylist():
            if r["tag"] == "item":
                per_type[r["ta"]] = r["n_keys"]
            else:
                n_users += r["n_keys"]

    pairs = combined.filter(expr="tag == 'pair'").drop_columns(["tag"])

    def score(batch: pa.Table) -> pa.Table:
        ta = batch["ta"].to_numpy(zero_copy_only=False)
        tb = batch["tb"].to_numpy(zero_copy_only=False)
        nk = batch["n_keys"].to_numpy(zero_copy_only=False).astype(np.int64)
        ca = np.array([per_type[t] for t in ta], np.int64)
        cb = np.array([per_type[t] for t in tb], np.int64)
        ratio = (n_users * nk).astype(np.float64) / (ca * cb).astype(np.float64)
        pmi = np.floor(np.log(ratio) * 1e6) / 1e6
        return batch.append_column("pmi", pa.array(pmi, pa.float64()))

    return pairs.map_batches(score, batch_format="pyarrow")


def q_quality_deciles(sf_dir: str):
    """Decile report: docs bucketed by exact global token-count deciles
    (quantile_disc over the order-preserving composite ``tok*2^22 +
    doc_id`` — a total order, so buckets are unambiguous), per-decile doc
    count + char mass.  Thresholds come from the distributed-selection
    quantile kernel (O(buckets) ints to the driver, no sort/shuffle of the
    data); assignment is a shuffle-free searchsorted; the final is 10
    keys."""
    from ..functions.text import token_count
    from ..stages.keyed import sharded_grouped_agg
    from ..stages.sketch import exact_global_quantiles

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def prep(batch: pa.Table) -> pa.Table:
        tok = token_count(batch["text"]).to_numpy(zero_copy_only=False)
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "comp": pa.array(tok * _COMP + ids),
            "n_chars": pc.cast(batch["n_chars"], pa.int64()),
        })

    narrow = ds.map_batches(prep, batch_format="pyarrow").materialize()
    qs = tuple((i + 1) / 10 for i in range(9))
    th_map = exact_global_quantiles(narrow, "comp", qs)
    th = np.array([th_map[q] for q in qs], np.int64)

    def bucketize(batch: pa.Table) -> pa.Table:
        comp = batch["comp"].to_numpy(zero_copy_only=False)
        decile = np.searchsorted(th, comp, side="right").astype(np.int64)
        t = pa.table({
            "decile": pa.array(decile),
            "n_docs": pa.array(np.ones(batch.num_rows, np.int64)),
            "char_mass": batch["n_chars"],
        })
        g = t.group_by(["decile"]).aggregate([("n_docs", "sum"), ("char_mass", "sum")])
        return g.rename_columns(["decile", "n_docs", "char_mass"])

    return sharded_grouped_agg(
        narrow.map_batches(bucketize, batch_format="pyarrow"),
        ["decile"], [("n_docs", "sum"), ("char_mass", "sum")], num_shards=4,
    )


def q_user_entropy(sf_dir: str):
    """Behavioral diversity: Shannon entropy of each user's event-type
    distribution, computed from INTEGER micro-nat logs (``floor(ln(c)*1e6)``
    per count, exact int64 fold, one float division at the end mirrored
    term-for-term by the SQL) — the engagement-mix signal.  One user-hash
    exchange of bounded (user, type, n) combiner rows."""
    from ..stages.keyed import _key_shard, _segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "event_type": batch["event_type"],
            "n": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        g = t.group_by(["user_id", "event_type"]).aggregate([("n", "sum")])
        g = g.rename_columns(["user_id", "event_type", "n"])
        return g.append_column("_ushard", _key_shard(g, ["user_id"], 16))

    def per_shard(group: pa.Table) -> pa.Table:
        out_empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "entropy": pa.array([], pa.float64()),
        })
        if group.num_rows == 0:
            return out_empty
        t = group.drop_columns("_ushard").sort_by(
            [("user_id", "ascending"), ("event_type", "ascending")]
        )
        # fold cross-batch partials per (user, type)
        both = np.flatnonzero(_segment_starts(t, ["user_id", "event_type"]))
        c = np.add.reduceat(t["n"].to_numpy(zero_copy_only=False), both)
        uid = t["user_id"].to_numpy(zero_copy_only=False)[both]
        # per-user fold: n = sum(c), s = sum(c * floor(ln(c)*1e6))
        lc = np.floor(np.log(c.astype(np.float64)) * 1e6).astype(np.int64)
        ustart = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        n = np.add.reduceat(c, ustart)
        s = np.add.reduceat(c * lc, ustart)
        ln_n = np.floor(np.log(n.astype(np.float64)) * 1e6).astype(np.int64)
        ent = (n * ln_n - s).astype(np.float64) / (n.astype(np.float64) * 1e6)
        return pa.table({
            "user_id": pa.array(uid[ustart]),
            "n_events": pa.array(n.astype(np.int64)),
            "entropy": pc.round(pa.array(ent, pa.float64()), ndigits=6),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_ushard")
        .map_groups(per_shard, batch_format="pyarrow")
    )


def q_term_drift(sf_dir: str):
    """Vocabulary drift report between the even- and odd-id corpus halves
    (stages/textstats.term_parity_drift): per common term, distinct-doc df
    in each half and the integer micro-nat smoothed log-odds
    ``floor(ln(df_e+1)*1e6) - floor(ln(df_o+1)*1e6)`` — the
    distribution-shift monitor for ingest batches."""
    from ..stages.textstats import term_parity_drift

    return term_parity_drift(
        _read(sf_dir, "documents", ["doc_id", "text"]), min_df=20
    )


_KEYWORD_TERMS = ["shuffle", "spark", "gorilla"]


def q_keyword_search(sf_dir: str):
    """Keyword retrieval over a PERSISTED inverted index
    (stages/textstats.build_text_index / text_index_search): the corpus's
    distinct (term, doc) postings are hive-partitioned by term hash once
    (cached per corpus under /tmp); a search opens ONLY the buckets its
    query terms hash into.  Returns (doc_id, n_matched distinct terms)."""
    import os

    from ..stages.textstats import build_text_index, text_index_search

    index_dir = f"/tmp/graft_kw_index_v3_{_corpus_tag(sf_dir, 'documents')}"
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        build_text_index(_read(sf_dir, "documents", ["doc_id", "text"]),
                         index_dir)
    return text_index_search(index_dir, _KEYWORD_TERMS)


def q_bpe_encode(sf_dir: str):
    """Apply the trained tokenizer: per-doc subword-token counts under the
    corpus's first-8 BPE merges (stages/textstats.BPEEncoder actor pool —
    merge list built once by bpe_train, per-word encodings memoized per
    actor).  Fixture-oracled by an independent sequential reference."""
    from ..stages.textstats import bpe_encode_counts, bpe_train

    merges = bpe_train(_read(sf_dir, "documents", ["text"]), k=8)
    return bpe_encode_counts(_read(sf_dir, "documents", ["doc_id", "text"]),
                             merges)


def q_approx_overlap(sf_dir: str):
    """Approximate audience overlap between event types via KMV/theta
    sketches (stages/sketch.theta_overlap_pairs) — the mergeable-sketch
    path of the exact audience_overlap join: one bottom-k combiner
    exchange, O(types x k) ints total, pairwise estimates on the bounded
    sketch table.  Deterministic (fmix64 hashes), fixture-oracled."""
    from ..stages.sketch import theta_overlap_pairs

    return theta_overlap_pairs(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        "event_type", "user_id", k=256,
    )


def q_rate_5m(sf_dir: str):
    """PromQL rate(): increase() per aligned 5m window divided by the
    window length in seconds — completes the counter family (increase,
    resets, deriv/trend, histogram_quantile).  Same single exchange as
    increase_5m; the division is one mirrored float op on the rounded
    sum."""
    from ..stages.windowed import counter_increase

    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "tms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "value": pc.cast(batch["value"], pa.float64()),
        })

    out = counter_increase(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["event_type"], "tms", ["event_id"], "value", MS_5M,
    )

    def rate(batch: pa.Table) -> pa.Table:
        inc = pc.round(batch["increase"], ndigits=4)
        r = pc.round(pc.divide(inc, pa.scalar(300.0, pa.float64())), ndigits=6)
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": batch["window_start"],
            "rate": r,
        })

    return out.map_batches(rate, batch_format="pyarrow")


def q_delta_5m(sf_dir: str):
    """PromQL delta() for gauges: last - first value inside each aligned 5m
    (type, window) over the total (ts, event_id) order — the
    combiner-bounded group_first_last kernel with the window joined into
    the key; the delta is one exact float subtraction of copied values."""
    from ..stages.keyed import group_first_last

    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        tms = ts_to_ms(batch["ts"])
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": window_start(tms, MS_5M),
            "tms": tms,
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "value": pc.cast(batch["value"], pa.float64()),
        })

    out = group_first_last(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "window_start"], ["tms", "event_id"], "value",
    )

    def fin(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "delta", pc.subtract(batch["last_v"], batch["first_v"])
        )

    return out.map_batches(fin, batch_format="pyarrow")


def q_cusum_max(sf_dir: str):
    """Change-point signal: per (type, user) series, the max absolute
    centered CUSUM deviation in exact cross-multiplied int64
    (stages/keyed.cusum_extrema) — level shifts surface as large values;
    no float mean in either engine."""
    from ..stages.keyed import cusum_extrema

    ds = _read(sf_dir, "events", ["event_type", "user_id", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "tms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "cv": pa.array(np.rint(v * 100).astype(np.int64)),
        })

    return cusum_extrema(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "user_id"], ["tms", "event_id"], "cv",
    )


_PSI_NB = 20


def q_psi_buckets(sf_dir: str):
    """Population stability index between the even- and odd-id event
    halves: 20 equi-width centi-value buckets over the GLOBAL range,
    per-bucket counts and the Laplace-smoothed PSI contribution
    ``(p-q) * ln(p/q)`` with the single ln micro-floored (bm25 protocol)
    and every other float op mirrored term-for-term — the
    distribution-shift monitor for metric streams."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_id", "value"])

    def to_centi(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        ids = pc.cast(batch["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "parity": pa.array((ids & 1).astype(np.int64)),
            "cv": pa.array(np.rint(v * 100).astype(np.int64)),
        })

    centi = ds.map_batches(to_centi, batch_format="pyarrow")

    lo = hi = None
    n_even = n_odd = 0
    def minmax(batch: pa.Table) -> pa.Table:
        cv = batch["cv"].to_numpy(zero_copy_only=False)
        par = batch["parity"].to_numpy(zero_copy_only=False)
        if len(cv) == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "ne": pa.array([], pa.int64()),
                             "no": pa.array([], pa.int64())})
        return pa.table({
            "lo": pa.array([int(cv.min())], pa.int64()),
            "hi": pa.array([int(cv.max())], pa.int64()),
            "ne": pa.array([int((par == 0).sum())], pa.int64()),
            "no": pa.array([int((par == 1).sum())], pa.int64()),
        })

    for part in centi.map_batches(minmax, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for r in part.to_pylist():
            lo = r["lo"] if lo is None else min(lo, r["lo"])
            hi = r["hi"] if hi is None else max(hi, r["hi"])
            n_even += r["ne"]
            n_odd += r["no"]

    glo, ghi = lo, hi

    def bucketize(batch: pa.Table) -> pa.Table:
        cv = batch["cv"].to_numpy(zero_copy_only=False)
        par = batch["parity"].to_numpy(zero_copy_only=False)
        bucket = (cv - glo) * _PSI_NB // (ghi - glo + 1)
        t = pa.table({
            "bucket": pa.array(bucket),
            "n_even": pa.array((par == 0).astype(np.int64)),
            "n_odd": pa.array((par == 1).astype(np.int64)),
        })
        g = t.group_by(["bucket"]).aggregate([("n_even", "sum"), ("n_odd", "sum")])
        return g.rename_columns(["bucket", "n_even", "n_odd"])

    counts = sharded_grouped_agg(
        centi.map_batches(bucketize, batch_format="pyarrow"),
        ["bucket"], [("n_even", "sum"), ("n_odd", "sum")], num_shards=4,
    )

    def score(batch: pa.Table) -> pa.Table:
        a = batch["n_even"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = batch["n_odd"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = (a + 1.0) / float(n_even + _PSI_NB)
        q = (b + 1.0) / float(n_odd + _PSI_NB)
        lnq = np.floor(np.log(p / q) * 1e6) / 1e6
        term = (p - q) * lnq
        return batch.append_column(
            "psi_term", pc.round(pa.array(term, pa.float64()), ndigits=9)
        )

    return counts.map_batches(score, batch_format="pyarrow")


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of two document rankings (by token count and
    by char count): ``rrf = 1/(60+r1) + 1/(60+r2)``, top 50.  Each ranking
    is an EXACT distributed global position over the order-preserving
    composite (stages/curation.global_positions — range-partitioned sort of
    a 16-byte projection + block-offset scan), fused via one co-partition
    join, winners selected by a combiner-bounded top-k."""
    from ..functions.text import token_count
    from ..stages.curation import global_positions
    from ..stages.joins import shuffle_join
    from ..stages.keyed import topk_per_group

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def prep(batch: pa.Table) -> pa.Table:
        tok = token_count(batch["text"]).to_numpy(zero_copy_only=False)
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        nch = pc.cast(batch["n_chars"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids),
            "k1": pa.array(-(tok * _COMP + ids)),
            "k2": pa.array(-(nch * _COMP + ids)),
        })

    narrow = ds.map_batches(prep, batch_format="pyarrow").materialize()
    p1 = global_positions(
        narrow.map_batches(lambda b: b.select(["doc_id", "k1"]),
                           batch_format="pyarrow"), "k1")
    p2 = global_positions(
        narrow.map_batches(lambda b: b.select(["doc_id", "k2"]),
                           batch_format="pyarrow"), "k2")

    def r1(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"], "p1": batch["pos"]})

    def r2(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"], "p2": batch["pos"]})

    joined = shuffle_join(
        p1.map_batches(r1, batch_format="pyarrow"),
        p2.map_batches(r2, batch_format="pyarrow"),
        "doc_id", "doc_id", right_cols=["p2"], num_shards=16,
    )

    def fuse(batch: pa.Table) -> pa.Table:
        r_1 = batch["p1"].to_numpy(zero_copy_only=False).astype(np.float64) + 1.0
        r_2 = batch["p2"].to_numpy(zero_copy_only=False).astype(np.float64) + 1.0
        rrf = np.round(1.0 / (60.0 + r_1) + 1.0 / (60.0 + r_2), 9)
        return pa.table({
            "g": pa.array(np.zeros(batch.num_rows, np.int64)),
            "doc_id": batch["doc_id"],
            "rrf": pa.array(rrf, pa.float64()),
        })

    out = topk_per_group(joined.map_batches(fuse, batch_format="pyarrow"),
                         ["g"], "rrf", 50, tiebreak_col="doc_id",
                         descending=True)
    return out.map_batches(
        lambda b: b.select(["doc_id", "rrf"]), batch_format="pyarrow"
    )


_HOP_K = 3  # 15m window hopping every 5m: each event lands in 3 windows


def q_hopping_15m(sf_dir: str):
    """Hopping (overlapping tumbling) window aggregate: count + sum per
    (type, 15-minute window that hops every 5 minutes) — each event is
    REPLICATED into its 3 covering windows by a column-level k-loop (the
    chunk_docs position-loop pattern, vectorized in k not rows), then the
    standard partial + sharded final.  The streaming-window family's third
    member next to tumbling (rollups) and sliding (sliding_1h)."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def explode(batch: pa.Table) -> pa.Table:
        tms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        base = (tms // MS_5M) * MS_5M
        # centi-int sums: exact and associative — a float sum re-associated
        # across 3x-replicated windows flips 4th-decimal rounding
        # boundaries run-to-run (observed at sf0.01)
        cv = np.rint(batch["value"].to_numpy(zero_copy_only=False) * 100
                     ).astype(np.int64)
        parts = []
        for k in range(_HOP_K):
            parts.append(pa.table({
                "event_type": batch["event_type"],
                "window_start": pa.array(base - k * MS_5M),
                "n": pa.array(np.ones(len(tms), np.int64)),
                "sum_c": pa.array(cv),
            }))
        t = pa.concat_tables(parts)
        g = t.group_by(["event_type", "window_start"]).aggregate(
            [("n", "sum"), ("sum_c", "sum")]
        )
        return g.rename_columns(["event_type", "window_start", "n", "sum_c"])

    out = sharded_grouped_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["event_type", "window_start"], [("n", "sum"), ("sum_c", "sum")],
    )

    def fin(batch: pa.Table) -> pa.Table:
        s = batch["sum_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": batch["window_start"],
            "n": batch["n"],
            "sum_value": pa.array(s / 100.0, pa.float64()),
        })

    return out.map_batches(fin, batch_format="pyarrow")


def q_weighted_sample(sf_dir: str):
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    the 100 docs with the smallest ``-ln(u)/w`` key, u = deterministic
    uniform from fmix64(doc_id), w = n_chars — longer docs proportionally
    likelier, every draw reproducible.  Per-batch bottom-k combiner +
    single-group final (the srs_sample shape with a weight-tilted key).
    Fixture-oracled (the key is float libm math — kept out of SQL)."""
    from ..stages.common import fmix64
    from ..stages.keyed import topk_per_group

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def key(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        w = pc.cast(batch["n_chars"], pa.int64()).to_numpy(zero_copy_only=False)
        u = (fmix64(ids).astype(np.float64) + 1.0) / float(2**64)
        es = -np.log(u) / np.maximum(w, 1).astype(np.float64)
        return pa.table({
            "g": pa.array(np.zeros(len(ids), np.int64)),
            "doc_id": pa.array(ids),
            "n_chars": pa.array(w),
            "es_key": pa.array(np.round(es * 1e12) / 1e12, pa.float64()),
        })

    out = topk_per_group(ds.map_batches(key, batch_format="pyarrow"),
                         ["g"], "es_key", 100, tiebreak_col="doc_id",
                         descending=False)
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_chars"]), batch_format="pyarrow"
    )


def q_fuzzy_decontaminate(sf_dir: str):
    """FUZZY benchmark decontamination: near-duplicate candidates between
    the deterministic benchmark slice (doc_id % 53 == 0) and the rest of
    the corpus via the persisted MinHash-LSH index (index the benchmark
    once — it is the small side — and stream the corpus against it; only
    touched (band, bucket) partitions are read).  The exact-4-gram
    `decontaminate` query's recall-oriented sibling.  Candidates provably
    equal the cross (benchmark, rest) subset of a full-corpus LSH run, so
    the oracle is the minhash_pairs fixture filtered by side membership."""
    import os

    from ..stages.dedup import build_minhash_index, minhash_index_query

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def side(is_bench: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            m = ids % 53 == 0
            return batch.filter(pa.array(m if is_bench else ~m))

        return docs.map_batches(fn, batch_format="pyarrow")

    index_dir = f"/tmp/graft_fz_index_v2_{_corpus_tag(sf_dir, 'documents')}"
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        build_minhash_index(side(True), index_dir)
    pairs = minhash_index_query(index_dir, side(False))

    def canon(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array(np.minimum(a, b)),
            "b": pa.array(np.maximum(a, b)),
        })

    return pairs.map_batches(canon, batch_format="pyarrow")


def q_audio_loudness(sf_dir: str):
    """Audio ingest plumbing: synthesize a media table (audio for even
    doc_ids, image otherwise), run the actor-pool loudness profiler
    (stages/multimodal.AudioLoudness — stubbed codec, ALL-INTEGER energy
    spec).  Completes the multimodal ladder: decode (declared stub) /
    feature / resize / frame-sample / AUDIO loudness.  Fixture-oracled."""
    from ..stages.multimodal import audio_loudness

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        payloads = [t.encode("utf-8") if t else b"" for t in batch["text"].to_pylist()]
        n = len(payloads)
        kinds = ["image" if i % 2 else "audio" for i in batch["doc_id"].to_pylist()]
        return pa.table({
            "media_id": ids,
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.nulls(n, pa.string()).fill_null("application/octet-stream"),
            "width": pa.nulls(n, pa.int32()),
            "height": pa.nulls(n, pa.int32()),
            "duration_ms": pa.array([3000] * n, pa.int32()),
        })

    return audio_loudness(ds.map_batches(to_media, batch_format="pyarrow"))


_FAIR_BUDGET = 200


def q_fair_share_sample(sf_dir: str):
    """Fair-share (waterfilling) downsample: a total budget of 200 docs
    split across sources so no source exceeds the waterline T = the
    largest integer with sum(min(n_s, T)) <= budget — small sources keep
    everything, big sources are capped equally (multi-tenant quota
    sampling).  Counts come from a bounded combiner; T is exact integer
    math the SQL mirrors; selection is the deterministic smallest-Lehmer-
    rank docs per source (combiner-bounded top-k).  Output: kept
    (source, doc_id) rows."""
    from ..stages.keyed import sharded_grouped_agg, topk_per_group

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def counts(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "source": batch["source"],
            "n": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        return t.group_by(["source"]).aggregate([("n", "sum")]).rename_columns(
            ["source", "n"]
        )

    per_source: dict[str, int] = {}
    for part in sharded_grouped_agg(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["source"], [("n", "sum")], num_shards=4,
    ).iter_batches(batch_format="pyarrow"):
        for r in part.to_pylist():
            per_source[r["source"]] = per_source.get(r["source"], 0) + r["n"]

    # waterline: sorted n_1 <= ... <= n_m; first k where saturating all of
    # segment k overflows the budget fixes T = (K - pre_k) // (m - k + 1)
    ns = sorted(per_source.values())
    m = len(ns)
    pre = 0
    waterline = ns[-1] if m else 0
    for k, nk in enumerate(ns, start=1):
        if pre + nk * (m - k + 1) > _FAIR_BUDGET:
            waterline = (_FAIR_BUDGET - pre) // (m - k + 1)
            break
        pre += nk

    if waterline <= 0:  # budget below one-per-source: nothing survives
        import ray.data

        return ray.data.from_arrow(pa.table({
            "source": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
        }))

    def rank(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "source": batch["source"],
            "doc_id": pa.array(ids),
            "rank": pa.array((ids * 48271) % 2147483647),
        })

    out = topk_per_group(ds.map_batches(rank, batch_format="pyarrow"),
                         ["source"], "rank", int(waterline),
                         tiebreak_col="doc_id", descending=False)
    return out.map_batches(
        lambda b: b.select(["source", "doc_id"]), batch_format="pyarrow"
    )


def q_phrase_search(sf_dir: str):
    """Exact phrase retrieval ("sort merge" at consecutive token
    positions) over the POSITIONAL inverted index — shares q_keyword_search's
    persisted index; reads only the phrase terms' buckets, then one narrow
    doc-hash exchange of query-term postings (stages/textstats.phrase_search).
    Returns (doc_id, n_matches = phrase start positions)."""
    import os

    from ..stages.textstats import build_text_index, phrase_search

    index_dir = f"/tmp/graft_kw_index_v3_{_corpus_tag(sf_dir, 'documents')}"
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        build_text_index(_read(sf_dir, "documents", ["doc_id", "text"]),
                         index_dir)
    return phrase_search(index_dir, ["sort", "merge"])


def q_quarantine(sf_dir: str):
    """Data-quality gate (stages/curation.quarantine_split): rows failing a
    rule are tagged with the FIRST failing rule (severity order) and
    shunted to a dead-letter side channel; the query reports per-reason
    row counts (''= clean) — the validate-and-continue analogue of the
    reference's hard error on unsupported sample types
    (copyer.go:108-127)."""
    from ..stages.curation import quarantine_split
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def out_of_range(batch: pa.Table) -> np.ndarray:
        return batch["value"].to_numpy(zero_copy_only=False) >= 400.0

    def bad_user(batch: pa.Table) -> np.ndarray:
        uid = pc.cast(batch["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return uid % 97 == 13

    tagged = quarantine_split(
        ds, [("out_of_range", out_of_range), ("bad_user", bad_user)]
    )

    def counts(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "reason": batch["_quarantine_reason"],
            "n": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        return t.group_by(["reason"]).aggregate([("n", "sum")]).rename_columns(
            ["reason", "n"]
        )

    return sharded_grouped_agg(
        tagged.map_batches(counts, batch_format="pyarrow"),
        ["reason"], [("n", "sum")], num_shards=4,
    )


def q_schema_evolution(sf_dir: str):
    """Schema-evolution read (sources/parquet.read_union_schemas): the
    events table split into two files with DIFFERENT schemas (the even
    half lacks props, the odd half lacks user_id and value — the shape a
    lake takes as writers evolve), read back as ONE dataset with
    union-by-name semantics (missing columns null, filled inside the read
    tasks from a footers-only union schema).  Reports per-type row and
    non-null counts the SQL derives from the split rule."""
    import os

    import pyarrow.parquet as pq_mod

    from ..sources.parquet import read_union_schemas
    from ..stages.keyed import sharded_grouped_agg

    evo_dir = f"/tmp/graft_evo_{_corpus_tag(sf_dir, 'events')}"
    if not os.path.exists(os.path.join(evo_dir, "odd.parquet")):
        os.makedirs(evo_dir, exist_ok=True)
        t = pq_mod.read_table(f"{sf_dir}/events.parquet")
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        even = t.filter(pa.array(ids % 2 == 0)).select(
            ["event_id", "ts", "user_id", "event_type", "value"]
        )
        odd = t.filter(pa.array(ids % 2 == 1)).select(
            ["event_id", "ts", "event_type", "props"]
        )
        pq_mod.write_table(even, os.path.join(evo_dir, "even.parquet"))
        pq_mod.write_table(odd, os.path.join(evo_dir, "odd.parquet"))

    ds = read_union_schemas(
        [os.path.join(evo_dir, "even.parquet"),
         os.path.join(evo_dir, "odd.parquet")]
    )

    def counts(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch["event_type"],
            "n": pa.array(np.ones(batch.num_rows, np.int64)),
            "n_value": pc.cast(pc.is_valid(batch["value"]), pa.int64()),
            "n_props": pc.cast(pc.is_valid(batch["props"]), pa.int64()),
        })
        g = t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("n_value", "sum"), ("n_props", "sum")]
        )
        return g.rename_columns(["event_type", "n", "n_value", "n_props"])

    return sharded_grouped_agg(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["event_type"],
        [("n", "sum"), ("n_value", "sum"), ("n_props", "sum")],
        num_shards=4,
    )


_Q3_CUTOFF_MS = 867_715_200_000  # 1997-07-01 UTC


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3 (shipping priority): BUILDING customers' orders placed
    before the cutoff, revenue from lineitems shipped after it, top 10 by
    revenue.  Plan: customer filter -> tiny key broadcast -> date-filtered
    orders semi-join COLLECTED (the window fraction of a dim table) and
    broadcast into the lineitem scan -> exact micro-unit revenue combiner
    -> sharded final -> combiner-bounded top-10.  Zero all-to-all
    shuffles; at 100 TB the orders broadcast escalates to the shuffle
    join on orderkey (stages/joins.shuffle_join)."""
    import pyarrow.parquet as pq_mod

    from ..stages.joins import broadcast_join
    from ..stages.keyed import sharded_grouped_agg, topk_per_group

    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    cust_b = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING")).select(
        ["c_custkey"]
    )

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    def ord_filter(batch: pa.Table) -> pa.Table:
        ms = ts_to_ms(batch["o_orderdate"])
        keep = pc.less(ms, pa.scalar(_Q3_CUTOFF_MS, pa.int64()))
        t = batch.filter(keep)
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_custkey": t["o_custkey"],
            "o_date_ms": ts_to_ms(t["o_orderdate"]),
            "o_orderpriority": t["o_orderpriority"],
        })

    ord_b = broadcast_join(
        orders.map_batches(ord_filter, batch_format="pyarrow"),
        cust_b, "o_custkey", "c_custkey", how="semi",
    )
    ord_tbl = pa.concat_tables(
        ord_b.select_columns(["o_orderkey", "o_date_ms", "o_orderpriority"])
        .iter_batches(batch_format="pyarrow")
    )

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def li_prep(batch: pa.Table) -> pa.Table:
        ms = ts_to_ms(batch["l_shipdate"])
        t = batch.filter(pc.greater(ms, pa.scalar(_Q3_CUTOFF_MS, pa.int64())))
        price_c = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.rint(
            (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        return pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "micro": pa.array(price_c * disc_c),
        })

    joined = broadcast_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        ord_tbl, "l_orderkey", "o_orderkey",
        right_cols=["o_date_ms", "o_orderpriority"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(
            ["l_orderkey", "o_date_ms", "o_orderpriority"]
        ).aggregate([("micro", "sum")])
        return g.rename_columns(
            ["l_orderkey", "o_date_ms", "o_orderpriority", "micro"]
        )

    per_order = sharded_grouped_agg(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey", "o_date_ms", "o_orderpriority"], [("micro", "sum")],
        num_shards=16,
    )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "g", pa.array(np.zeros(batch.num_rows, np.int64))
        )

    top = topk_per_group(per_order.map_batches(tag, batch_format="pyarrow"),
                         ["g"], "micro", 10, tiebreak_col="l_orderkey",
                         descending=True)

    def fin(batch: pa.Table) -> pa.Table:
        rev = batch["micro"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "revenue": pa.array(rev / 10000.0, pa.float64()),
            "o_date_ms": batch["o_date_ms"],
            "o_orderpriority": batch["o_orderpriority"],
        })

    return top.map_batches(fin, batch_format="pyarrow")


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5 (local supplier volume): revenue per ASIA nation from 1996
    orders where the customer and supplier share the nation.  Plan: region
    -> nation -> customer resolved driver-side (dims), date-filtered
    orders carry the customer nation and broadcast into the lineitem scan,
    supplier nation broadcast likewise, the co-nationality filter and
    exact micro-unit revenue run vectorized in-scan, final is 25 keys.
    Zero all-to-all shuffles (escalation documented in q_tpch_q3)."""
    import pyarrow.parquet as pq_mod

    from ..stages.joins import broadcast_join
    from ..stages.keyed import sharded_grouped_agg

    region = pq_mod.read_table(f"{sf_dir}/region.parquet")
    nation = pq_mod.read_table(f"{sf_dir}/nation.parquet")
    asia_keys = set(
        region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"]
        .to_pylist()
    )
    nat = nation.filter(
        pc.is_in(pc.cast(nation["n_regionkey"], pa.int64()),
                 value_set=pa.array(sorted(asia_keys), pa.int64()))
    )
    nat_name = dict(zip(nat["n_nationkey"].to_pylist(),
                        nat["n_name"].to_pylist()))

    cust = pq_mod.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
    supp = pq_mod.read_table(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_nationkey"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    t0 = 820_454_400_000   # 1996-01-01 UTC
    t1 = 852_076_800_000   # 1997-01-01 UTC

    def ord_filter(batch: pa.Table) -> pa.Table:
        ms = ts_to_ms(batch["o_orderdate"])
        keep = pc.and_(pc.greater_equal(ms, pa.scalar(t0, pa.int64())),
                       pc.less(ms, pa.scalar(t1, pa.int64())))
        t = batch.filter(keep)
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_custkey": t["o_custkey"],
        })

    ord_nat = broadcast_join(
        orders.map_batches(ord_filter, batch_format="pyarrow"),
        cust, "o_custkey", "c_custkey", right_cols=["c_nationkey"],
    )
    ord_tbl = pa.concat_tables(
        ord_nat.select_columns(["o_orderkey", "c_nationkey"]).iter_batches(
            batch_format="pyarrow"
        )
    )

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    li1 = broadcast_join(li, ord_tbl, "l_orderkey", "o_orderkey",
                         right_cols=["c_nationkey"])
    li2 = broadcast_join(li1, supp, "l_suppkey", "s_suppkey",
                         right_cols=["s_nationkey"])

    nat_keys = np.array(sorted(nat_name), np.int64)
    nat_vals = [nat_name[k] for k in nat_keys.tolist()]

    def score(batch: pa.Table) -> pa.Table:
        cn = pc.cast(batch["c_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
        sn = pc.cast(batch["s_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = (cn == sn) & np.isin(cn, nat_keys)
        t = batch.filter(pa.array(keep))
        cn_k = pc.cast(t["c_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(nat_keys, cn_k)
        price_c = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.rint(
            (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        out = pa.table({
            "n_name": pa.array(
                np.array(nat_vals, dtype=object)[idx].tolist(), pa.string()
            ),
            "micro": pa.array(price_c * disc_c),
        })
        g = out.group_by(["n_name"]).aggregate([("micro", "sum")])
        return g.rename_columns(["n_name", "micro"])

    agg = sharded_grouped_agg(
        li2.map_batches(score, batch_format="pyarrow"),
        ["n_name"], [("micro", "sum")], num_shards=4,
    )

    def fin(batch: pa.Table) -> pa.Table:
        rev = batch["micro"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "n_name": batch["n_name"],
            "revenue": pa.array(rev / 10000.0, pa.float64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


_Q18_QTY = 250           # HAVING threshold: ~top-1% orders at every sf
_Q10_T0 = 820_454_400_000   # 1996-01-01 UTC
_Q10_T1 = 828_316_800_000   # 1996-04-01 UTC (91 days later)


def q_tpch_q18(sf_dir: str):
    """TPC-H Q18 (large-volume orders): orders whose total lineitem
    quantity exceeds 250, with the ordering customer.  Plan: per-batch
    partial sum(qty) per orderkey (quantities are integral -> exact
    int64) -> sharded final -> the tiny HAVING-survivor set collected
    and broadcast into the orders scan -> customer broadcast for the
    name.  The only exchange is the (orderkey, qty) combiner rows —
    the raw lineitems never shuffle; at 100 TB the survivor broadcast
    escalates to a shuffle join on orderkey (stages/joins.shuffle_join)."""
    import pyarrow.parquet as pq_mod

    from ..stages.joins import broadcast_join
    from ..stages.keyed import sharded_grouped_agg

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        qty = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table({
            "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
            "sum_qty": pa.array(qty),
        })
        g = t.group_by(["l_orderkey"]).aggregate([("sum_qty", "sum")])
        return g.rename_columns(["l_orderkey", "sum_qty"])

    per_order = sharded_grouped_agg(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey"], [("sum_qty", "sum")], num_shards=16,
    )

    def having(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater(batch["sum_qty"], pa.scalar(_Q18_QTY, pa.int64()))
        )

    big = pa.concat_tables(
        per_order.map_batches(having, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def ord_prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "o_date_ms": ts_to_ms(batch["o_orderdate"]),
            "o_totalprice": batch["o_totalprice"],
        })

    joined = broadcast_join(
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        big, "o_orderkey", "l_orderkey", right_cols=["sum_qty"],
    )

    cust = pq_mod.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_name"])
    named = broadcast_join(joined, cust, "o_custkey", "c_custkey",
                           right_cols=["c_name"])

    def fin(batch: pa.Table) -> pa.Table:
        return batch.select([
            "o_custkey", "c_name", "o_orderkey", "o_date_ms",
            "o_totalprice", "sum_qty",
        ]).rename_columns([
            "c_custkey", "c_name", "o_orderkey", "o_date_ms",
            "o_totalprice", "sum_qty",
        ])

    return named.map_batches(fin, batch_format="pyarrow")


def q_tpch_q10(sf_dir: str):
    """TPC-H Q10 (returned-item reporting): top 20 customers by revenue
    lost to returns on 1996-Q1 orders.  Plan: the quarter's orders
    collected (a date-window fraction of a dim table) and broadcast
    into the lineitem scan filtered to l_returnflag='R' -> exact
    micro-unit revenue combiner per customer (cents(price) x
    cents(1-disc), associative int64, the q_tpch_q3 protocol) ->
    sharded final -> combiner-bounded top-20 -> customer + nation
    names resolved driver-side.  Zero all-to-all shuffles; escalation
    documented in q_tpch_q3."""
    import pyarrow.parquet as pq_mod

    from ..stages.joins import broadcast_join
    from ..stages.keyed import sharded_grouped_agg, topk_per_group

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_filter(batch: pa.Table) -> pa.Table:
        ms = ts_to_ms(batch["o_orderdate"])
        keep = pc.and_(pc.greater_equal(ms, pa.scalar(_Q10_T0, pa.int64())),
                       pc.less(ms, pa.scalar(_Q10_T1, pa.int64())))
        t = batch.filter(keep)
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
        })

    ord_tbl = pa.concat_tables(
        orders.map_batches(ord_filter, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])

    def li_prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        price_c = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.rint(
            (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        return pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "micro": pa.array(price_c * disc_c),
        })

    joined = broadcast_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        ord_tbl, "l_orderkey", "o_orderkey", right_cols=["o_custkey"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_custkey"]).aggregate([("micro", "sum")])
        return g.rename_columns(["o_custkey", "micro"])

    per_cust = sharded_grouped_agg(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"], [("micro", "sum")], num_shards=16,
    )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "g", pa.array(np.zeros(batch.num_rows, np.int64))
        )

    top = topk_per_group(per_cust.map_batches(tag, batch_format="pyarrow"),
                         ["g"], "micro", 20, tiebreak_col="o_custkey",
                         descending=True)

    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    nation = pq_mod.read_table(f"{sf_dir}/nation.parquet",
                               columns=["n_nationkey", "n_name"])
    nat_name = dict(zip(nation["n_nationkey"].to_pylist(),
                        nation["n_name"].to_pylist()))

    named = broadcast_join(top, cust, "o_custkey", "c_custkey",
                           right_cols=["c_name", "c_acctbal", "c_nationkey"])

    def fin(batch: pa.Table) -> pa.Table:
        rev = batch["micro"].to_numpy(zero_copy_only=False).astype(np.float64)
        nk = pc.cast(batch["c_nationkey"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table({
            "c_custkey": batch["o_custkey"],
            "c_name": batch["c_name"],
            "revenue": pa.array(rev / 10000.0, pa.float64()),
            "c_acctbal": batch["c_acctbal"],
            "n_name": pa.array([nat_name[int(k)] for k in nk], pa.string()),
        })

    return named.map_batches(fin, batch_format="pyarrow")


_EWMA_K = 16


def q_ewma_decay(sf_dir: str):
    """Time-decayed aggregate (alpha = 1/2 EWMA over each type's last 16
    events): the streaming-sketch answer to "what is this signal doing
    RIGHT NOW".  Weights are exact powers of two on centi-unit int64
    values, so the decayed sum is associative integer math — bit-identical
    across block layouts and SQL-checkable (a float (1-a)^k accumulation
    would re-associate).  Plan: combiner-bounded top-16-by-ts per type
    (topk_per_group: per-batch partials, one tiny exchange), rank + shift
    weights on the n_types x 16 survivor table."""
    import pandas as pd

    from ..stages.keyed import topk_per_group

    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cv = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({
            "event_type": batch["event_type"],
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "ts_ms": ts_to_ms(batch["ts"]),
            "centi": pa.array(cv),
        })

    last = topk_per_group(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type"], "ts_ms", _EWMA_K,
        tiebreak_col="event_id", descending=True,
    )
    t = pa.concat_tables(last.iter_batches(batch_format="pyarrow"))
    t = t.sort_by([("event_type", "ascending"), ("ts_ms", "descending"),
                   ("event_id", "ascending")])
    types = np.asarray(t["event_type"].to_pylist(), dtype=object)
    new = np.r_[True, types[1:] != types[:-1]]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.r_[starts, len(types)])
    rn = np.arange(len(types), dtype=np.int64) - np.repeat(starts, sizes) + 1
    w = np.int64(1) << (_EWMA_K - rn)
    centi = t["centi"].to_numpy(zero_copy_only=False)
    dec = np.add.reduceat(centi * w, starts)
    wsum = np.add.reduceat(w, starts)
    return pd.DataFrame({
        "event_type": types[starts],
        "n_used": sizes.astype(np.int64),
        "decayed_centi": dec.astype(np.int64),
        "ewma": dec.astype(np.float64) / wsum / 100.0,
    })


_JL_DIMS = 8
_JL_A = 6364136223846793005   # Knuth LCG multiplier
_JL_B = 1442695040888963407


def _jl_sign_matrix(in_dims: int) -> np.ndarray:
    """Deterministic +-1 projection matrix: sign(j, d) = bit 37 of the
    mod-2^64 hash A*j + B*d — reproducible in SQL via HUGEINT math, so the
    projection is oracle-checkable (a seeded Gaussian matrix would not be).
    Sign matrices satisfy the JL lemma like Gaussians (Achlioptas 2003)."""
    j = np.arange(in_dims, dtype=np.uint64)[:, None]
    d = np.arange(_JL_DIMS, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        h = np.uint64(_JL_A) * j + np.uint64(_JL_B) * d
    bit = (h >> np.uint64(37)) & np.uint64(1)
    return (1 - 2 * bit.astype(np.int64))


def q_rand_projection(sf_dir: str):
    """Johnson-Lindenstrauss dimensionality reduction census: every
    embedding projected 64 -> 8 dims through a deterministic +-1 sign
    matrix on micro-unit int64 elements (exact integer matmul — associative,
    bit-identical across block layouts), reported as per-output-dim
    positive/negative counts and projection sum.  One int64 matmul per
    batch against a matrix built once per task; only 8-row partials leave
    the scan.  The projection is the standard preprocessing step before
    LSH / clustering at billion-vector scale."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "embeddings", ["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        arrs = batch["embedding"]
        flat = np.asarray(
            arrs.combine_chunks().flatten(), dtype=np.float64
        ).reshape(-1, 64)
        micro = np.rint(flat * 1e6).astype(np.int64)
        proj = micro @ _jl_sign_matrix(64)          # (n, 8) exact int64
        return pa.table({
            "dim": pa.array(np.arange(_JL_DIMS, dtype=np.int64)),
            "n_pos": pa.array((proj > 0).sum(axis=0).astype(np.int64)),
            "n_neg": pa.array((proj < 0).sum(axis=0).astype(np.int64)),
            "sum_proj": pa.array(proj.sum(axis=0, dtype=np.int64)),
        })

    return sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["dim"],
        [("n_pos", "sum"), ("n_neg", "sum"), ("sum_proj", "sum")],
        num_shards=1,
    )


def q_benford_digits(sf_dir: str):
    """Data-forensics census: first significant digit of every positive
    event value per type (Benford's-law audit input — fabricated or
    unit-mixed feeds skew this distribution).  The digit is extracted by
    integer division on exact centi-units (a float log10 would flip
    floor() at representation boundaries, e.g. log10(0.01)); partial
    (type, digit) counts combine in-scan, one 9-key-per-type exchange."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        centi = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        d = centi[centi > 0]
        types = batch["event_type"].filter(pa.array(centi > 0))
        while True:
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        t = pa.table({
            "event_type": types,
            "digit": pa.array(d),
            "n": pa.array(np.ones(len(d), np.int64)),
        })
        g = t.group_by(["event_type", "digit"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "digit", "n"])

    return sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "digit"], [("n", "sum")], num_shards=4,
    )


