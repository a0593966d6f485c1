"""Driver-conformance query battery (``__ray_entry__.queries`` backing).

Each ``q_*`` function takes ``sf_dir`` and returns a Dataset / pyarrow
Table; ``ORACLE_SQL`` holds the DuckDB-equivalent SQL keyed by the same
names (omitted for non-SQL-expressible ops -> driver does a rows-only
check).  Column names and rounding are kept IDENTICAL between the Ray and
SQL sides (the driver hashes values after sorting columns by name).

Float policy: aggregates that sum floats round to a fixed number of
decimals on BOTH sides (distributed summation order differs from DuckDB's;
rounding removes the last-ulp nondeterminism).  Min/max/first/last and sums
of integral-valued floats are exact and stay unrounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.matchers import Matcher, make_filter_fn
from ..functions.relabel import make_relabel_fn
from ..windows import MS_1D, MS_1H, MS_5M, aligned_windows, ts_to_ms, window_start
from .registry import GuardedRegistry

# composite (ts, id) ordering trick: ts_ms * 2^22 + id is order-preserving
# while id < 4,194,304 (testdata event_id max ~1e5 at sf1)
_COMP = 1 << 22


def _read(sf_dir: str, name: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _collect_stable(ds):
    """``to_pandas`` that survives an ALL-EMPTY Dataset: Ray drops the
    schema of zero-row results (``to_pandas()`` -> a (0, 0) frame), which
    breaks the driver's column-sorted compare against a DuckDB oracle that
    correctly returns 0 rows WITH columns.  Found by the sf1 sweep —
    ``absent_series`` is legitimately empty at 10x user density.  Only for
    queries whose results are bounded by construction (censuses, alert
    complements); big results must stay lazy Datasets."""
    import pandas as pd

    df = ds.to_pandas()
    if len(df.columns) == 0:
        sch = ds.schema()
        df = pd.DataFrame(
            {n: pd.Series([], dtype=t.to_pandas_dtype())
             for n, t in zip(sch.names, sch.types)})
    return df


def _finalize(ds, renames: dict[str, str], rounds: dict[str, int] | None = None):
    """Rename aggregate columns and apply fixed rounding (both small maps)."""

    def fn(batch: pa.Table) -> pa.Table:
        for old, new in renames.items():
            if old in batch.column_names:
                batch = batch.rename_columns(
                    [new if c == old else c for c in batch.column_names]
                )
        for col, nd in (rounds or {}).items():
            batch = batch.set_column(
                batch.column_names.index(col),
                col,
                pc.round(batch[col], ndigits=nd),
            )
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def _windowed_partial(keys: list[str], d_ms: int, ts_col: str = "ts", val_col: str = "value"):
    """map_batches kernel: per-batch partial (count/sum/min/max) per
    (keys..., window_start) — the pre-aggregation that keeps the groupby
    shuffle small (SURVEY.md §4 partial+final pattern)."""

    def fn(batch: pa.Table) -> pa.Table:
        w = window_start(ts_to_ms(batch[ts_col]), d_ms)
        t = batch.append_column("window_start", w)
        return t.group_by(keys + ["window_start"]).aggregate(
            [(val_col, "count"), (val_col, "sum"), (val_col, "min"), (val_col, "max")]
        )

    return fn


def _final_rollup(ds, keys: list[str], val_col: str = "value"):
    # keys = (labels..., window) — cardinality grows with the time span, so
    # the final merge is the sharded segment kernel, not a per-key Ray
    # aggregate (float sums are re-associated; every sum_value consumer
    # rounds to 4 decimals on both sides)
    from ..stages.keyed import sharded_grouped_agg

    out = sharded_grouped_agg(
        ds, keys,
        [(f"{val_col}_count", "sum"), (f"{val_col}_sum", "sum"),
         (f"{val_col}_min", "min"), (f"{val_col}_max", "max")],
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            list(keys) + ["n", "sum_value", "min_value", "max_value"]
        )

    return out.map_batches(rename, batch_format="pyarrow")


def _rollup_events(sf_dir: str, d_ms: int):
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    part = ds.map_batches(_windowed_partial(["event_type"], d_ms), batch_format="pyarrow")
    return _final_rollup(part, ["event_type", "window_start"])


def _round_sum(ds):
    return _finalize(ds, {}, {"sum_value": 4})


_ROLLUP_SQL = """
SELECT event_type,
       (epoch_ms(ts) // {d}) * {d} AS window_start,
       count(*) AS n,
       round(sum(value), 4) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events GROUP BY 1, 2
"""


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
    return counts.map_batches(
        lambda b: b.filter(pc.less(b["n_docs"], K_ANON)),
        batch_format="pyarrow",
    )


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


def q_gini_concentration(sf_dir: str):
    """Inequality profile: exact Gini coefficient of document length per
    source (how concentrated is each feed's token mass — the long-tail
    diagnostic behind sampling-temperature choices).  Plan: (source,
    n_chars) census combiner in-scan + sharded final (the exchange is
    bounded by sources x distinct lengths, NOT docs), then the
    mean-absolute-difference Gini on the sorted census via integer
    prefix sums — numerator/denominator stay int64 (bound: n_docs x
    total_chars x max_len per source must fit 2^63; at web scale bucket
    lengths first), one final double division on both engines."""
    import pandas as pd

    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "source": batch["source"],
            "n_chars": pc.cast(batch["n_chars"], pa.int64()),
            "cnt": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        g = t.group_by(["source", "n_chars"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["source", "n_chars", "cnt"])

    census = pa.concat_tables(
        sharded_grouped_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["source", "n_chars"], [("cnt", "sum")], num_shards=8,
        ).iter_batches(batch_format="pyarrow")
    ).sort_by([("source", "ascending"), ("n_chars", "ascending")])

    src = np.asarray(census["source"].to_pylist(), dtype=object)
    v = census["n_chars"].to_numpy(zero_copy_only=False)
    c = census["cnt"].to_numpy(zero_copy_only=False)
    new = np.r_[True, src[1:] != src[:-1]]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.r_[starts, len(src)])
    # per-source exclusive prefix sums of counts and count*value
    cum_n = np.cumsum(c) - c
    cum_s = np.cumsum(c * v) - c * v
    base_n = np.repeat(cum_n[starts], sizes)
    base_s = np.repeat(cum_s[starts], sizes)
    nlt = cum_n - base_n
    slt = cum_s - base_s
    absdiff_terms = c * (v * nlt - slt)
    absdiff = 2 * np.add.reduceat(absdiff_terms, starts)
    n_docs = np.add.reduceat(c, starts)
    total = np.add.reduceat(c * v, starts)
    return pd.DataFrame({
        "source": src[starts],
        "n_docs": n_docs.astype(np.int64),
        "total_chars": total.astype(np.int64),
        "gini": absdiff.astype(np.float64) / (2.0 * n_docs * total),
    })


def q_bigram_logprob(sf_dir: str):
    """Per-doc mean negative log-prob under the corpus bigram LM — the
    conditional (word-order-aware) perplexity quality score next to
    unigram_logprob (stages/textstats.bigram_logprob: pair-census
    combiner + one broadcast, then a shuffle-free vectorized scoring
    pass)."""
    from ..stages.textstats import bigram_logprob

    return bigram_logprob(_read(sf_dir, "documents", ["doc_id", "text"]))


_BLOOM_PROBE_USERS = [7, 101, -1]   # two present, one absent (FP-path probe)


def q_bloom_lookup(sf_dir: str):
    """Point lookup through a persisted per-file Bloom skip index
    (sources/parquet.build_bloom_index): events hash-sharded into 32
    files by user (cached per corpus under /tmp — the layout where
    min/max footer stats prune NOTHING because every file spans the full
    user range), then a 3-user probe opens only the bloom-surviving
    files (~3/32 + false positives) and applies the exact filter
    in-scan.  test_parquet_source asserts the file-skip evidence;
    correctness here is vs the full-scan SQL."""
    import os

    from ..sources.parquet import build_bloom_index, read_bloom_pruned
    from ..stages.keyed import sharded_grouped_agg

    corpus = f"/tmp/graft_bloom_corpus_v1_{_corpus_tag(sf_dir, 'events')}"
    data_dir = os.path.join(corpus, "data")
    index_dir = os.path.join(corpus, "index")
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        ds = _read(sf_dir, "events", ["user_id", "value"])

        def shard(batch: pa.Table) -> pa.Table:
            u = pc.cast(batch["user_id"], pa.int64())
            return pa.table({
                "user_id": u,
                "value": batch["value"],
                "_shard": pc.cast(
                    pc.bit_wise_and(u, pa.scalar(31, pa.int64())), pa.int64()
                ),
            })

        # sort by the partition col before the hive write (one file per
        # shard, not one per block x shard — the persisted-index layout
        # protocol)
        (ds.map_batches(shard, batch_format="pyarrow")
         .sort("_shard")
         .write_parquet(data_dir, partition_cols=["_shard"]))
        build_bloom_index(data_dir, "user_id", index_dir)

    probe = _BLOOM_PROBE_USERS
    ds = read_bloom_pruned(data_dir, index_dir, probe,
                           columns=["user_id", "value"])

    def exact(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(batch["user_id"], pa.int64()),
                        value_set=pa.array(probe, pa.int64()))
        t = batch.filter(keep)
        centi = np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        g = pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "n_events": pa.array(np.ones(t.num_rows, np.int64)),
            "sum_centi": pa.array(centi),
        }).group_by(["user_id"]).aggregate(
            [("n_events", "sum"), ("sum_centi", "sum")]
        )
        return g.rename_columns(["user_id", "n_events", "sum_centi"])

    return sharded_grouped_agg(
        ds.map_batches(exact, batch_format="pyarrow"),
        ["user_id"], [("n_events", "sum"), ("sum_centi", "sum")],
        num_shards=1,
    )


def q_count_meta(sf_dir: str):
    """Aggregate pushdown to metadata: exact row counts of every table from
    Parquet footers alone (sources/parquet.count_rows_metadata — zero data
    pages, the COUNT(*) analogue of the footer-only range discovery O2)."""
    import pandas as pd

    from ..sources.parquet import count_rows_metadata

    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    return pd.DataFrame({
        "tbl": tables,
        "n_rows": [count_rows_metadata(f"{sf_dir}/{t}.parquet")
                   for t in tables],
    })


def q_funnel_latency(sf_dir: str):
    """Time-to-convert: for every user with a purchase strictly after
    their first signup, the signup->purchase latency; reported as
    n_converted + exact p50/p90 latency seconds (quantile_disc).  One
    user-hash exchange of distinct (user, step, ts) combiner rows derives
    the latencies (two masked segment mins per shard); the quantiles come
    from the distributed-selection kernel over the tiny latency table."""
    from ..stages.keyed import _key_shard, _segment_starts
    from ..stages.sketch import exact_global_quantiles

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    # combiner carries ALL distinct (user, step, ts) rows: a per-batch
    # min(purchase) would be wrong when the global min purchase precedes
    # the first signup but a later purchase follows it
    def full_rows(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["event_type"],
                     value_set=pa.array(["signup", "purchase"], pa.string()))
        t = batch.filter(m)
        out = pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "step": t["event_type"],
            "tms": ts_to_ms(t["ts"]),
        })
        g = out.group_by(["user_id", "step", "tms"]).aggregate([])
        return g.append_column("_fshard", _key_shard(g, ["user_id"], 16))

    def per_shard(group: pa.Table) -> pa.Table:
        out_empty = pa.table({"lat_s": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return out_empty
        t = group.drop_columns("_fshard").sort_by(
            [("user_id", "ascending"), ("step", "ascending"),
             ("tms", "ascending")]
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        step = t["step"].to_numpy(zero_copy_only=False)
        tms = t["tms"].to_numpy(zero_copy_only=False)
        lats = []
        starts = np.flatnonzero(_segment_starts(t, ["user_id"]))
        ends = np.r_[starts[1:], t.num_rows]
        for a, b in zip(starts, ends):
            sg = tms[a:b][step[a:b] == "signup"]
            pu = tms[a:b][step[a:b] == "purchase"]
            if len(sg) == 0 or len(pu) == 0:
                continue
            t0 = sg.min()
            after = pu[pu > t0]
            if len(after):
                lats.append((after.min() - t0) // 1000)
        return pa.table({"lat_s": pa.array(np.array(lats, np.int64))})

    lat = (
        ds.map_batches(full_rows, batch_format="pyarrow")
        .groupby("_fshard")
        .map_groups(per_shard, batch_format="pyarrow")
        .materialize()
    )
    n = lat.count()
    import pandas as pd

    if n == 0:
        return pd.DataFrame({"n_converted": [0], "p50_s": [None], "p90_s": [None]})
    qs = exact_global_quantiles(lat, "lat_s", (0.5, 0.9))
    return pd.DataFrame({
        "n_converted": np.array([n], np.int64),
        "p50_s": np.array([qs[0.5]], np.int64),
        "p90_s": np.array([qs[0.9]], np.int64),
    })


def q_window_share(sf_dir: str):
    """Market share over time: each type's share of its 1h window's event
    volume — ratio-to-report with the WINDOW as the partition key
    (stages/keyed.ratio_to_total; exact int window sums broadcast once,
    shuffle-free divide)."""
    from ..stages.keyed import ratio_to_total, sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch["event_type"],
            "window_start": window_start(ts_to_ms(batch["ts"]), MS_1H),
            "n": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        g = t.group_by(["event_type", "window_start"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "window_start", "n"])

    counts = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "window_start"], [("n", "sum")], num_shards=16,
    )
    return ratio_to_total(counts, ["window_start"], "n",
                          carry_cols=["event_type"], out_col="share")


def q_hourly_growth(sf_dir: str):
    """Hour-over-hour growth per type: lag over the AGGREGATED hourly
    stream (counts combiner -> sharded final -> lag_column's narrow
    exchange), pct change on present hours, first hour dropped like SQL
    lag() IS NULL."""
    from ..stages.keyed import lag_column, sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch["event_type"],
            "window_start": window_start(ts_to_ms(batch["ts"]), MS_1H),
            "n": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        g = t.group_by(["event_type", "window_start"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "window_start", "n"])

    hourly = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "window_start"], [("n", "sum")], num_shards=16,
    )
    lagged = lag_column(hourly, ["event_type"], ["window_start"], "n")

    def pct(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = batch["prev"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": batch["window_start"],
            "n": batch["n"],
            "growth_pct": pc.round(pa.array((n - p) / p, pa.float64()),
                                   ndigits=6),
        })

    return lagged.map_batches(pct, batch_format="pyarrow")


def q_skew_report(sf_dir: str):
    """Partitioning-skew profile of candidate shuffle keys: for each key
    column, row count, exact distinct count, the hottest key's count and
    its share — what the engine's own salting/sharding decisions read.
    One (col, value) combiner exchange; the per-column fold is bounded."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        uid = pc.cast(pc.cast(batch["user_id"], pa.int64()), pa.string())
        parts = []
        for col, vals in (("event_type", batch["event_type"]), ("user_id", uid)):
            t = pa.table({
                "col": pa.array([col] * batch.num_rows, pa.string()),
                "val": vals,
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
            })
            parts.append(
                t.group_by(["col", "val"]).aggregate([("n", "sum")])
                .rename_columns(["col", "val", "n"])
            )
        return pa.concat_tables(parts)

    counts = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["col", "val"], [("n", "sum")], num_shards=16,
    )

    # fold stays distributed: a key column's distinct count can be huge,
    # so the (col, value) rows reduce through a second bounded-key
    # sharded aggregate, never a driver loop
    def fold(batch: pa.Table) -> pa.Table:
        return pa.table({
            "col": batch["col"],
            "n_rows": batch["n"],
            "n_distinct": pa.array(np.ones(batch.num_rows, np.int64)),
            "max_count": batch["n"],
        })

    folded = sharded_grouped_agg(
        counts.map_batches(fold, batch_format="pyarrow"),
        ["col"],
        [("n_rows", "sum"), ("n_distinct", "sum"), ("max_count", "max")],
        num_shards=2,
    )

    def fin(batch: pa.Table) -> pa.Table:
        mx = batch["max_count"].to_numpy(zero_copy_only=False).astype(np.float64)
        nr = batch["n_rows"].to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column(
            "top_share", pc.round(pa.array(mx / nr, pa.float64()), ndigits=6)
        )

    return folded.map_batches(fin, batch_format="pyarrow")


_COS_PAIRS = 200


def q_cos_histogram(sf_dir: str):
    """Corpus-diversity signal: histogram of cosine similarities over a
    deterministic sample of embedding pairs (Lehmer-style index math both
    engines run literally; vec_ids are dense).  Scale shape: only the
    sample's <= 2*|pairs| vectors leave the scan (vectorized is_in
    filter); everything after is sample-sized driver math.  Cosines follow
    the battery's CAST-to-DOUBLE protocol; round-6 before bucketing."""
    import pandas as pd

    from ..sources.parquet import count_rows_metadata

    n = count_rows_metadata(f"{sf_dir}/embeddings.parquet")
    k = np.arange(_COS_PAIRS, dtype=np.int64)
    i = (k * 48271) % n
    j = (k * 1664525 + 1013904223) % n
    keep = i != j
    i, j = i[keep], j[keep]
    need = np.unique(np.r_[i, j])

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    need_arr = pa.array(need, pa.int64())

    def pick(batch: pa.Table) -> pa.Table:
        m = pc.is_in(pc.cast(batch["vec_id"], pa.int64()), value_set=need_arr)
        return batch.filter(m)

    rows = pa.concat_tables(
        ds.map_batches(pick, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    ids = pc.cast(rows["vec_id"], pa.int64()).to_numpy(zero_copy_only=False)
    vecs = np.stack(
        [np.asarray(v, np.float64) for v in rows["embedding"].to_pylist()]
    )
    order = np.argsort(ids)
    ids_s, vecs_s = ids[order], vecs[order]
    a = vecs_s[np.searchsorted(ids_s, i)]
    b = vecs_s[np.searchsorted(ids_s, j)]
    cos = (a * b).sum(axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    )
    c6 = np.round(cos, 6)
    bucket = np.minimum(np.floor((c6 + 1.0) * 5).astype(np.int64), 9)
    uniq, cnt = np.unique(bucket, return_counts=True)
    return pd.DataFrame({
        "bucket": uniq.astype(np.int64),
        "n_pairs": cnt.astype(np.int64),
    })


def q_pq_codes(sf_dir: str):
    """Product-quantization census: per (subspace, code), how many vectors
    encode to it under deterministic per-subspace kmeans codebooks
    (stages/similarity.pq_code_counts — smallest-id init + exact int64
    sums, so bit-identical across block layouts and fixture-oracle-
    checkable).  PQ is the documented memory-escalation path for the IVF
    index at billion-vector scale."""
    from ..stages.similarity import pq_code_counts

    return pq_code_counts(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                          n_sub=4, k=8)


def q_lang_top_terms(sf_dir: str):
    """Grouped text top-k: each language's 5 most document-frequent terms
    (ties to the lexicographically smallest term) — per-batch distinct-
    per-doc Counter combiner keyed by (lang, term), term-hash sharded
    segment sum, then the combiner-bounded top-k kernel per lang."""
    import re
    from collections import Counter

    from ..stages.keyed import sharded_grouped_agg, topk_per_group

    ds = _read(sf_dir, "documents", ["lang", "text"])
    word_re = re.compile(r"[A-Za-z]+")

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        langs = batch["lang"].to_pylist()
        for lang, t in zip(langs, batch["text"].to_pylist()):
            counts.update(
                (lang, w) for w in {m.lower() for m in word_re.findall(t or "")}
            )
        keys = list(counts.keys())
        return pa.table({
            "lang": pa.array([k[0] for k in keys], pa.string()),
            "term": pa.array([k[1] for k in keys], pa.string()),
            "df": pa.array([counts[k] for k in keys], pa.int64()),
        })

    df_tbl = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "term"], [("df", "sum")], num_shards=16,
    )
    return topk_per_group(df_tbl, ["lang"], "df", 5, tiebreak_col="term",
                          descending=True)


def q_session_quantiles(sf_dir: str):
    """Engagement distribution: exact p50/p90 of session LENGTHS (event
    counts per gap-based session) plus the session count — sessionize's
    one keyed exchange feeding the distributed-selection quantile kernel
    over the (tiny) per-session table."""
    import pandas as pd

    from ..stages.keyed import sessionize
    from ..stages.sketch import exact_global_quantiles

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "ts_ms": ts_to_ms(b["ts"]),
        })

    sess = sessionize(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id", "ts_ms", SESSION_GAP_MS,
    ).materialize()
    n = sess.count()
    qs = exact_global_quantiles(sess, "n_events", (0.5, 0.9))
    return pd.DataFrame({
        "n_sessions": np.array([n], np.int64),
        "p50_events": np.array([qs[0.5]], np.int64),
        "p90_events": np.array([qs[0.9]], np.int64),
    })


def q_irate(sf_dir: str):
    """PromQL ``irate()``: instantaneous rate from each series' LAST TWO
    samples in the total (ts desc, event_id asc) order — the gauge-family
    completion of rate/increase/delta/resets.  The top-2 rows per type come
    from the combiner-bounded topk kernel (the exchange moves 2 rows per
    (type, batch)); the bounded result (2 x |types| rows) finishes on the
    driver.  Rate is in value-units/sec off integer cents:
    ``cents_delta * 10.0 / dt_ms`` (one mirrored float op); a tied
    timestamp pair (dt=0) yields NULL on both engines."""
    from ..stages.keyed import topk_per_group

    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "tms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "cval": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })

    top2 = topk_per_group(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type"], "tms", k=2, tiebreak_col="event_id",
        descending=True, num_shards=8,
    ).to_pandas()

    rows = {"event_type": [], "last_ts_ms": [], "dt_ms": [], "irate_per_s": []}
    for etype, g in top2.groupby("event_type", sort=True):
        g = g.sort_values(["tms", "event_id"], ascending=[False, True])
        if len(g) < 2:
            continue
        t1, t0 = int(g["tms"].iloc[0]), int(g["tms"].iloc[1])
        c1, c0 = int(g["cval"].iloc[0]), int(g["cval"].iloc[1])
        dt = t1 - t0
        rows["event_type"].append(etype)
        rows["last_ts_ms"].append(t1)
        rows["dt_ms"].append(dt)
        rows["irate_per_s"].append(
            float(c1 - c0) * 10.0 / float(dt) if dt != 0 else None
        )
    return pa.table({
        "event_type": pa.array(rows["event_type"], pa.string()),
        "last_ts_ms": pa.array(rows["last_ts_ms"], pa.int64()),
        "dt_ms": pa.array(rows["dt_ms"], pa.int64()),
        "irate_per_s": pa.array(rows["irate_per_s"], pa.float64()),
    })


def q_interpolate_5m(sf_dir: str):
    """Gap-fill by LINEAR INTERPOLATION (the north rule's gap-fill, upgraded
    from zero/NaN fill): per type, the aligned 5m grid between that type's
    first and last observed window; missing slots get the line between the
    nearest observed neighbors, in integer-cents space so both engines
    divide the same ints (``prev + (next-prev)*(w-pw)/(nw-pw)``).

    Scale shape: the raw events collapse via partial agg + one sharded
    exchange FIRST; the per-type ``map_groups`` then walks only the
    collapsed window series (O(windows) rows per group, never raw
    events)."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        tms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": batch["event_type"],
            "window_start": pa.array((tms // MS_5M) * MS_5M, pa.int64()),
            "cs": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })
        g = t.group_by(["event_type", "window_start"]).aggregate([("cs", "sum")])
        return g.rename_columns(["event_type", "window_start", "cs"])

    counts = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "window_start"], [("cs", "sum")], num_shards=8,
    )

    def interp(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "window_start": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
                "is_interp": pa.array([], pa.int64()),
            })
        g = group.sort_by([("window_start", "ascending")])
        w = g["window_start"].to_numpy(zero_copy_only=False)
        cs = g["cs"].to_numpy(zero_copy_only=False)
        grid = np.arange(w[0], w[-1] + MS_5M, MS_5M, dtype=np.int64)
        pos = np.searchsorted(w, grid)
        present = (pos < len(w)) & (w[np.minimum(pos, len(w) - 1)] == grid)
        # nearest observed neighbor indices for the missing slots
        nxt = pos  # first observed >= grid slot (missing => strictly after)
        prv = pos - 1
        vals = np.empty(len(grid), np.float64)
        vals[present] = cs[pos[present]].astype(np.float64)
        miss = ~present
        if miss.any():
            pc_, nc_ = cs[prv[miss]], cs[nxt[miss]]
            pw_, nw_ = w[prv[miss]], w[nxt[miss]]
            interp_c = pc_.astype(np.float64) + (
                (nc_ - pc_) * (grid[miss] - pw_)
            ).astype(np.float64) / (nw_ - pw_).astype(np.float64)
            vals[miss] = interp_c
        etype = group["event_type"][0].as_py()
        return pa.table({
            "event_type": pa.array([etype] * len(grid), pa.string()),
            "window_start": pa.array(grid, pa.int64()),
            "sum_value": pa.array(vals / 100.0, pa.float64()),
            "is_interp": pa.array(miss.astype(np.int64), pa.int64()),
        })

    return counts.groupby("event_type").map_groups(interp, batch_format="pyarrow")


def q_absent_series(sf_dir: str):
    """PromQL ``absent()`` as a batch operator: the (type, aligned 1h
    window) slots of the global range where a series reported NOTHING —
    the alerting complement of gap-fill.  Same distributed zero-grid +
    union + fine-keyed sum shape as gapfill_5m, then a vectorized
    ``n == 0`` filter; only the two scalar bounds and the type list touch
    the driver."""
    import ray.data
    from ray.data.aggregate import Count, Max, Min

    from ..stages.keyed import sharded_grouped_agg

    counts = (
        _rollup_events(sf_dir, MS_1H)
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
    n_slots = int((w1 - w0) // MS_1H) + 1

    def grid_rows(batch) -> pa.Table:
        ids = batch["id"].to_numpy()
        ws = w0 + ids * MS_1H
        k = len(types)
        return pa.table({
            "event_type": pa.array(np.repeat(np.array(types, dtype=object), len(ws))),
            "window_start": pa.array(np.tile(ws, k), pa.int64()),
            "n": pa.array(np.zeros(len(ws) * k, dtype=np.int64)),
        })

    grid = ray.data.range(n_slots).map_batches(grid_rows, batch_format="pyarrow")
    summed = sharded_grouped_agg(
        grid.union(counts), ["event_type", "window_start"], [("n", "sum")]
    )

    def only_absent(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["n"], 0))
        return t.select(["event_type", "window_start"])

    # bounded by types x calendar slots; collected schema-stably because a
    # dense-enough corpus (sf1: 10x users, same span) makes this EMPTY
    return _collect_stable(summed.map_batches(only_absent, batch_format="pyarrow"))


def q_tpch_q14(sf_dir: str):
    """TPC-H Q14 shape (promo revenue share) per ship month: part's promo
    flag broadcast into lineitem (dim side, one ray.put), per-batch integer
    micro-unit revenue partials keyed by calendar month, bounded driver
    final (months are few).  ``rev_u = cents(extendedprice) * (100 -
    cents(discount))`` stays in int64, so the sums are exact and the one
    percentage division mirrors the oracle bit-for-bit."""
    import pyarrow.parquet as pq
    import ray

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    promo_keys = pc.filter(
        part["p_partkey"], pc.equal(part["p_type"], "PROMO")
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    promo_ref = ray.put(np.sort(promo_keys))

    ds = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        keys = np.sort(ray.get(promo_ref))
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(keys, pk)
        promo = (idx < len(keys)) & (keys[np.minimum(idx, len(keys) - 1)] == pk)
        tsms = ts_to_ms(batch["l_shipdate"]).to_numpy(zero_copy_only=False)
        month_ms = (
            tsms.astype("datetime64[ms]").astype("datetime64[M]")
            .astype("datetime64[ms]").astype(np.int64)
        )
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev_u = np.rint(ep * 100).astype(np.int64) * (
            100 - np.rint(dc * 100).astype(np.int64)
        )
        t = pa.table({
            "month_ms": pa.array(month_ms, pa.int64()),
            "promo_rev_u": pa.array(np.where(promo, rev_u, 0), pa.int64()),
            "total_rev_u": pa.array(rev_u, pa.int64()),
        })
        g = t.group_by(["month_ms"]).aggregate(
            [("promo_rev_u", "sum"), ("total_rev_u", "sum")]
        )
        return g.rename_columns(["month_ms", "promo_rev_u", "total_rev_u"])

    parts = [
        b for b in ds.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    final = (
        pa.concat_tables(parts).group_by(["month_ms"])
        .aggregate([("promo_rev_u", "sum"), ("total_rev_u", "sum")])
        .rename_columns(["month_ms", "promo_rev_u", "total_rev_u"])
    )
    promo_u = final["promo_rev_u"].to_numpy(zero_copy_only=False)
    total_u = final["total_rev_u"].to_numpy(zero_copy_only=False)
    pct = (100.0 * promo_u.astype(np.float64)) / total_u.astype(np.float64)
    return final.append_column("promo_pct", pa.array(pct, pa.float64()))


def q_canonical_url(sf_dir: str):
    """URL canonicalization (crawl dedup key): five deterministic messy
    variants per sampled doc (scheme/case/www/default-port/query/fragment
    noise, closed-form so the oracle generates the identical strings),
    collapsed through :func:`functions.text.canonical_url` — correct
    canonicalization yields exactly one (doc, canonical) row with
    n_variants = 5; any divergence shows up as extra rows AND as a value
    mismatch on the canonical string itself."""
    from ..functions.text import canonical_url
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def variants(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids % 7 == 0
        ids = ids[keep]
        src = np.asarray(batch["source"].to_pylist(), dtype=object)[keep]
        host = np.array([f"{s}.example.com" for s in src], dtype=object)
        path = np.array([f"/doc/{i}" for i in ids], dtype=object)
        forms = [
            "https://" + host + path,
            "HTTP://WWW." + host + path + "/",
            "https://" + host + ":443" + path + "#frag",
            "http://" + host + ":80" + path + "?utm_source=x",
            "HTTPS://WWW." + host + ":443" + path + "?utm_medium=y#z",
        ]
        t = pa.table({
            "doc_id": pa.array(np.tile(ids, 5), pa.int64()),
            "url": pa.array(np.concatenate(forms) if len(ids) else
                            np.array([], dtype=object), pa.string()),
        })
        t = t.set_column(1, "url_canon", canonical_url(t["url"]))
        t = t.append_column("n_variants",
                            pa.array(np.ones(t.num_rows, np.int64)))
        g = t.group_by(["doc_id", "url_canon"]).aggregate([("n_variants", "sum")])
        return g.rename_columns(["doc_id", "url_canon", "n_variants"])

    return sharded_grouped_agg(
        ds.map_batches(variants, batch_format="pyarrow"),
        ["doc_id", "url_canon"], [("n_variants", "sum")], num_shards=8,
    )


def q_tpch_q12(sf_dir: str):
    """TPC-H Q12 shape (late-shipment priority census): the ONE plan in the
    battery where BOTH join sides are fact-scale, so it exercises
    stages/joins.shuffle_join — a single co-partitioning tag-union exchange
    on orderkey, vectorized sorted-merge probe per shard (no broadcast; at
    100 TB neither lineitem nor orders fits a ray.put).  Post-join the rows
    collapse per batch to (returnflag, high, low) partials; the driver
    final sees |flags| rows.  A line is "late" when it shipped after the
    order date (the sandbox schema has no commit/receipt dates —
    l_shipdate > o_orderdate keeps Q12's date-inversion predicate);
    high = o_orderpriority in ('1-URGENT','2-HIGH')."""
    from ..stages.joins import shuffle_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_shipdate"])

    def li_prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
            "l_returnflag": batch["l_returnflag"],
            "l_ship_ms": ts_to_ms(batch["l_shipdate"]),
        })

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
            "o_date_ms": ts_to_ms(batch["o_orderdate"]),
            "o_orderpriority": batch["o_orderpriority"],
        })

    joined = shuffle_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        orders.map_batches(o_prep, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey",
        right_cols=["o_date_ms", "o_orderpriority"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        late = pc.greater(batch["l_ship_ms"], batch["o_date_ms"])
        t = batch.filter(late)
        prio = t["o_orderpriority"]
        high = pc.or_(pc.equal(prio, "1-URGENT"), pc.equal(prio, "2-HIGH"))
        hi = pc.cast(high, pa.int64())
        t2 = pa.table({
            "l_returnflag": t["l_returnflag"],
            "high_line_count": hi,
            "low_line_count": pc.subtract(pa.scalar(1, pa.int64()), hi),
        })
        g = t2.group_by(["l_returnflag"]).aggregate(
            [("high_line_count", "sum"), ("low_line_count", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "high_line_count", "low_line_count"])

    parts = [
        b for b in joined.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    return (
        pa.concat_tables(parts).group_by(["l_returnflag"])
        .aggregate([("high_line_count", "sum"), ("low_line_count", "sum")])
        .rename_columns(["l_returnflag", "high_line_count", "low_line_count"])
    )

def q_lttb_downsample(sf_dir: str):
    """LTTB (largest-triangle-three-buckets) viz downsample, per type: the
    5m-collapsed series reduced to 50 shape-preserving points.  Collapse is
    the scale step (partial agg + one sharded exchange; raw events never
    reach the sequential kernel); the per-type LTTB then walks O(windows)
    collapsed rows in the documented integer-boundary float64 spec
    (stages/windowed.lttb_indices) that the fixture oracle mirrors
    bit-for-bit."""
    from ..stages.keyed import sharded_grouped_agg
    from ..stages.windowed import lttb_indices

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        tms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": batch["event_type"],
            "window_start": pa.array((tms // MS_5M) * MS_5M, pa.int64()),
            "cs": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })
        g = t.group_by(["event_type", "window_start"]).aggregate([("cs", "sum")])
        return g.rename_columns(["event_type", "window_start", "cs"])

    counts = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "window_start"], [("cs", "sum")], num_shards=8,
    )

    def downsample(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "window_start": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
            })
        g = group.sort_by([("window_start", "ascending")])
        w = g["window_start"].to_numpy(zero_copy_only=False)
        cs = g["cs"].to_numpy(zero_copy_only=False)
        idx = lttb_indices(w, cs, 50)
        etype = group["event_type"][0].as_py()
        return pa.table({
            "event_type": pa.array([etype] * len(idx), pa.string()),
            "window_start": pa.array(w[idx], pa.int64()),
            "sum_value": pa.array(cs[idx].astype(np.float64) / 100.0,
                                  pa.float64()),
        })

    return counts.groupby("event_type").map_groups(
        downsample, batch_format="pyarrow")

def q_locf_5m(sf_dir: str):
    """Gap-fill by LAST-OBSERVATION-CARRIED-FORWARD (the lookback fill of
    PromQL instant vectors / TimescaleDB ``locf``): per type, the aligned
    5m grid between that type's first and last observed window; a missing
    slot repeats the nearest earlier observed value.  Same collapse-first
    scale shape as interpolate_5m (partial agg + one sharded exchange; the
    per-type fill walks O(windows) collapsed rows with one searchsorted —
    exact, no float recursion)."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        tms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": batch["event_type"],
            "window_start": pa.array((tms // MS_5M) * MS_5M, pa.int64()),
            "cs": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })
        g = t.group_by(["event_type", "window_start"]).aggregate([("cs", "sum")])
        return g.rename_columns(["event_type", "window_start", "cs"])

    counts = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "window_start"], [("cs", "sum")], num_shards=8,
    )

    def locf(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "window_start": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
                "is_filled": pa.array([], pa.int64()),
            })
        g = group.sort_by([("window_start", "ascending")])
        w = g["window_start"].to_numpy(zero_copy_only=False)
        cs = g["cs"].to_numpy(zero_copy_only=False)
        grid = np.arange(w[0], w[-1] + MS_5M, MS_5M, dtype=np.int64)
        # index of the last observed window <= each grid slot
        prev = np.searchsorted(w, grid, side="right") - 1
        present = w[prev] == grid
        etype = group["event_type"][0].as_py()
        return pa.table({
            "event_type": pa.array([etype] * len(grid), pa.string()),
            "window_start": pa.array(grid, pa.int64()),
            "sum_value": pa.array(cs[prev].astype(np.float64) / 100.0,
                                  pa.float64()),
            "is_filled": pa.array((~present).astype(np.int64), pa.int64()),
        })

    return counts.groupby("event_type").map_groups(locf, batch_format="pyarrow")


def q_label_ops(sf_dir: str):
    """PromQL ``label_replace`` + ``label_join`` over the pages series
    labels: extract the crawl shard from the domain via an anchored RE2
    capture, synthesize ``instance = domain:lang``, then count samples per
    relabeled series.  Label rewriting is two vectorized Arrow kernel calls
    per batch (functions/relabel.py); the only exchange is the final
    (metric, shard, instance) count."""
    from ..functions.relabel import label_join, label_replace
    from ..pipelines.copy import pages_to_samples
    from ..sources.pages import read_pages_from_documents
    from ..stages.keyed import sharded_grouped_agg

    pages = read_pages_from_documents(sf_dir)
    samples = pages_to_samples(pages, concurrency=(1, 4))

    def relabel_count(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "metric": batch["__name__"],
            "domain": batch["domain"],
            "lang": batch["lang"],
        })
        t = label_replace(t, "shard", r"\1", "domain",
                          r"(src[0-9]+)\.example\.com")
        t = label_join(t, "instance", ":", ["domain", "lang"])
        t = t.select(["metric", "shard", "instance"])
        t = t.append_column("n", pa.array(np.ones(t.num_rows, np.int64)))
        g = t.group_by(["metric", "shard", "instance"]).aggregate([("n", "sum")])
        return g.rename_columns(["metric", "shard", "instance", "n"])

    return sharded_grouped_agg(
        samples.map_batches(relabel_count, batch_format="pyarrow"),
        ["metric", "shard", "instance"], [("n", "sum")], num_shards=8,
    )

def q_holt_winters(sf_dir: str):
    """PromQL ``holt_winters`` (Holt double exponential smoothing) per
    type: final smoothed level + trend of the 5m-collapsed series with
    alpha=0.3, gamma=0.1.  The recursion is sequential by definition, so
    the scale story is collapse-first (partial agg + one sharded exchange);
    the per-type kernel (stages/windowed.holt_linear) then walks O(windows)
    collapsed points in a documented float op order the fixture oracle
    mirrors bit-for-bit."""
    from ..stages.keyed import sharded_grouped_agg
    from ..stages.windowed import holt_linear

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        tms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": batch["event_type"],
            "window_start": pa.array((tms // MS_5M) * MS_5M, pa.int64()),
            "cs": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })
        g = t.group_by(["event_type", "window_start"]).aggregate([("cs", "sum")])
        return g.rename_columns(["event_type", "window_start", "cs"])

    counts = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "window_start"], [("cs", "sum")], num_shards=8,
    )

    def smooth(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "level": pa.array([], pa.float64()),
                "trend": pa.array([], pa.float64()),
            })
        g = group.sort_by([("window_start", "ascending")])
        cs = g["cs"].to_numpy(zero_copy_only=False)
        level, trend = holt_linear(cs, 0.3, 0.1)
        etype = group["event_type"][0].as_py()
        return pa.table({
            "event_type": pa.array([etype], pa.string()),
            "level": pa.array([level / 100.0], pa.float64()),
            "trend": pa.array([trend / 100.0], pa.float64()),
        })

    return counts.groupby("event_type").map_groups(smooth, batch_format="pyarrow")

def q_skew_join(sf_dir: str):
    """Skew-aware hybrid join (stages/joins.skew_aware_join): events keyed
    by a deliberately pathological key (user_id%3==0 collapses to key 0 —
    ~1/3 of all rows on ONE key) joined to a derived per-key dim.  The
    exact key census routes key 0 through the broadcast+inline-probe path
    (its pre-joined rows ride the exchange spread round-robin) while the
    long tail takes the ordinary co-partitioned tag-union — no shard ever
    sees the hot key's mass.  Final census per type proves multiset
    equality with the oracle's plain SQL join."""
    import ray.data

    from ..stages.joins import skew_aware_join
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def keyed(batch: pa.Table) -> pa.Table:
        u = pc.cast(batch["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
        k = np.where(u % 3 == 0, 0, u)
        return pa.table({
            "event_type": batch["event_type"],
            "k": pa.array(k, pa.int64()),
        })

    left = ds.map_batches(keyed, batch_format="pyarrow")

    def distinct_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["k"]).group_by(["k"]).aggregate([])
        return t.append_column("n", pa.array(np.ones(t.num_rows, np.int64)))

    dim = sharded_grouped_agg(
        left.map_batches(distinct_partial, batch_format="pyarrow"),
        ["k"], [("n", "max")], num_shards=8,
    )

    def add_grp(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": batch["k"],
            "grp": pa.array(k % 97, pa.int64()),
        })

    dim = dim.map_batches(add_grp, batch_format="pyarrow")
    joined = skew_aware_join(left, dim, "k", "k", right_cols=["grp"],
                             hot_threshold=1000, num_shards=16)

    def census(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch["event_type"],
            "n": pa.array(np.ones(batch.num_rows, np.int64)),
            "sum_grp": batch["grp"],
        })
        g = t.group_by(["event_type"]).aggregate([("n", "sum"), ("sum_grp", "sum")])
        return g.rename_columns(["event_type", "n", "sum_grp"])

    parts = [
        b for b in joined.map_batches(census, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    return (
        pa.concat_tables(parts).group_by(["event_type"])
        .aggregate([("n", "sum"), ("sum_grp", "sum")])
        .rename_columns(["event_type", "n", "sum_grp"])
    )

def q_hist_fraction(sf_dir: str):
    """PromQL ``histogram_fraction(-Inf, 75, ...)`` over the 5m histogram
    tier: the interpolated fraction of observations <= 75 per (type,
    window) — the CDF inverse of hist_p90's quantile.  75 sits inside the
    (50, 100] bucket, so the linear interpolation path is always
    exercised: ``(c1 + (c2 - c1) * 0.5) / total`` in float64, mirrored
    op-for-op by the oracle."""
    names = [f"le_{int(le)}" for le in HIST_LES]

    def frac(batch: pa.Table) -> pa.Table:
        c1 = batch[names[0]].to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = batch[names[1]].to_numpy(zero_copy_only=False).astype(np.float64)
        total = batch["le_inf"].to_numpy(zero_copy_only=False).astype(np.float64)
        f = (c1 + (c2 - c1) * 0.5) / total
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": batch["window_start"],
            "frac_le_75": pa.array(np.round(f, 6), pa.float64()),
        })

    return q_hist_5m(sf_dir).map_batches(frac, batch_format="pyarrow")

def q_xrate_5m(sf_dir: str):
    """Prometheus ``rate()`` with FULL extrapolation semantics per 5m
    window (stages/windowed.extrapolated_rate): within-window
    reset-adjusted increase in exact int64 cents, boundary gaps
    extrapolated per promql extrapolatedRate (1.1x-average-interval
    threshold, half-interval fallback, counter time-to-zero cap).
    Complements increase_5m (cross-window deltas, no extrapolation) and
    rate_5m (simple division)."""
    from ..stages.windowed import extrapolated_rate

    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "tms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "cv": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })

    return extrapolated_rate(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["event_type"], "tms", ["event_id"], "cv", MS_5M,
    )

def q_max_xrate_1h(sf_dir: str):
    """PromQL subquery composition ``max_over_time(rate(x[5m])[1h:5m])``:
    the extrapolated 5m rates (q_xrate_5m's stage, one keyed exchange)
    re-keyed to their 1h parent window and max-reduced — continuous
    aggregates composing upward without touching raw events again.  The
    second exchange moves one row per (type, 5m window)."""
    from ..stages.keyed import sharded_grouped_agg
    from ..stages.windowed import extrapolated_rate

    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def norm(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "tms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "cv": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })

    r5 = extrapolated_rate(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["event_type"], "tms", ["event_id"], "cv", MS_5M,
    )

    def rekey(batch: pa.Table) -> pa.Table:
        w = batch["window_start"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": pa.array((w // MS_1H) * MS_1H, pa.int64()),
            "max_xrate": batch["xrate_per_s"],
        })

    return sharded_grouped_agg(
        r5.map_batches(rekey, batch_format="pyarrow"),
        ["event_type", "window_start"], [("max_xrate", "max")], num_shards=8,
    )


def q_changes(sf_dir: str):
    """PromQL changes(): how often each (type, user) value CHANGED (any
    direction) along its (ts, event_id) timeline — the gauge complement
    of q_resets' counter-decrease census (same lag -> vectorized compare
    -> count combiner -> sharded-sum composition; reference sample
    iteration semantics copyer.go:108-127)."""
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
            "n_changes": pa.array((v != p).astype(np.int64)),
        })
        g = t.group_by(["event_type", "user_id"]).aggregate([("n_changes", "sum")])
        return g.rename_columns(["event_type", "user_id", "n_changes"])

    return sharded_grouped_agg(
        lagged.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "user_id"], [("n_changes", "sum")], num_shards=16,
    )


# predict_linear extrapolates every (type, user) trend to this fixed
# abscissa: epoch hour 474432 = 2024-02-15T00:00Z, ~2 weeks past the
# synthetic corpus (Jan 2024), in the same x units as q_trend_slope
# (epoch hours - 473000).
_PREDICT_AT_X = 474_432 - 473_000


def q_predict_linear(sf_dir: str):
    """PromQL predict_linear(): least-squares extrapolation of each
    (type, user) value trend to a fixed future timestamp
    (stages/keyed.group_linear_trend with predict_at — exact int64
    sufficient statistics, 5-int-per-key combiner, one O(keys) exchange;
    intercept+slope evaluated in a documented float op order the SQL
    oracle mirrors).  x/y normalization identical to q_trend_slope."""
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
        ["event_type", "user_id"], "x", "y", out_col="pred_10k",
        predict_at=_PREDICT_AT_X,
    )

    def descale(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("pred_10k"), "pred_value",
            pc.divide(batch["pred_10k"], 10000.0))

    return _finalize(out.map_batches(descale, batch_format="pyarrow"),
                     {}, {"pred_value": 6})


def q_autocorr_lag1(sf_dir: str):
    """Lag-1 autocorrelation of each event_type's value series along its
    (ts, event_id) timeline: lag_column feeds grouped_corr(prev, value) —
    the Pearson estimator over consecutive pairs, exact int64 sufficient
    statistics.  Values in cents centered at a FIXED 28000 (shift
    invariance of correlation; keeps n*Syy under 2^63 for per-type n up
    to ~10M at this value range — document, don't check)."""
    from ..stages.keyed import grouped_corr, lag_column

    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "tsms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "y": pa.array(np.rint(v * 100).astype(np.int64) - 28000, pa.int64()),
        })

    lagged = lag_column(ds.map_batches(prep, batch_format="pyarrow"),
                        ["event_type"], ["tsms", "event_id"], "y")

    out = grouped_corr(lagged, ["event_type"], "prev", "y",
                       out_col="acf1", num_shards=8)
    return _finalize(out, {}, {"acf1": 8})


def q_stddev_1h(sf_dir: str):
    """PromQL stddev_over_time()/stdvar_over_time(): population standard
    deviation and variance of value per (type, 1h window) — exact int64
    cent sums + sums-of-squares per-batch combiner, one O(keys) sharded
    exchange, single correctly-rounded sqrt at the end (IEEE sqrt is
    exact-deterministic, so the SQL mirror is bit-identical)."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        cv = np.rint(v * 100).astype(np.int64)
        w = window_start(ts_to_ms(batch["ts"]), MS_1H)
        t = pa.table({
            "event_type": batch["event_type"],
            "window_start": w,
            "_n": pa.array(np.ones(len(cv), np.int64)),
            "_s": pa.array(cv),
            "_s2": pa.array(cv * cv),
        })
        g = t.group_by(["event_type", "window_start"]).aggregate(
            [("_n", "sum"), ("_s", "sum"), ("_s2", "sum")])
        return g.rename_columns(
            ["event_type", "window_start", "_n", "_s", "_s2"])

    merged = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "window_start"],
        [("_n", "sum"), ("_s", "sum"), ("_s2", "sum")], num_shards=16,
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["_n"].to_numpy(zero_copy_only=False)
        s = batch["_s"].to_numpy(zero_copy_only=False)
        s2 = batch["_s2"].to_numpy(zero_copy_only=False)
        var = (n * s2 - s * s).astype(np.float64) / (n * n).astype(np.float64)
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": batch["window_start"],
            "n_samples": pa.array(n, pa.int64()),
            "stddev_v": pa.array(np.sqrt(var) / 100.0, pa.float64()),
            "stdvar_v": pa.array(var / 10000.0, pa.float64()),
        })

    return _finalize(merged.map_batches(finish, batch_format="pyarrow"),
                     {}, {"stddev_v": 6, "stdvar_v": 6})


def q_seasonal_residual(sf_dir: str):
    """Seasonally-adjusted anomaly: top-3 events per type by absolute
    deviation from their (type, hour-of-day) mean — the aggregate ->
    broadcast -> apply -> top-k shape.  Pass 1 computes the exact
    hour-of-day census (n, sum-of-cents) per type (combiner-bounded, at
    most types x 24 rows cross the exchange); the tiny census is
    broadcast once via ``ray.put`` and probed per batch; the residual
    ``|cv*n - s| / n`` stays exact-integer until one final division, so
    the SQL oracle is bit-identical; winners ride the
    :func:`topk_per_group` combiner (k rows per batch, never the
    dataset)."""
    import ray

    from ..stages.keyed import sharded_grouped_agg, topk_per_group

    ds = _read(sf_dir, "events", ["event_type", "event_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        tms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "hod": pa.array((tms // 3600000) % 24, pa.int64()),
            "cv": pa.array(np.rint(v * 100).astype(np.int64), pa.int64()),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow")

    def census_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch["event_type"],
            "hod": batch["hod"],
            "_n": pa.array(np.ones(batch.num_rows, np.int64)),
            "_s": batch["cv"],
        })
        g = t.group_by(["event_type", "hod"]).aggregate(
            [("_n", "sum"), ("_s", "sum")])
        return g.rename_columns(["event_type", "hod", "_n", "_s"])

    census = sharded_grouped_agg(
        prepped.map_batches(census_partial, batch_format="pyarrow"),
        ["event_type", "hod"], [("_n", "sum"), ("_s", "sum")], num_shards=4,
    ).to_pandas()
    lut = {}  # type -> (n[24], s[24])
    for et, grp in census.groupby("event_type"):
        n = np.zeros(24, np.int64)
        s = np.zeros(24, np.int64)
        n[grp["hod"].to_numpy()] = grp["_n"].to_numpy()
        s[grp["hod"].to_numpy()] = grp["_s"].to_numpy()
        lut[et] = (n, s)
    lut_ref = ray.put(lut)

    def residual(batch: pa.Table, _c=lut_ref) -> pa.Table:
        lut_b = ray.get(_c)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        hod = batch["hod"].to_numpy(zero_copy_only=False)
        cv = batch["cv"].to_numpy(zero_copy_only=False)
        dev = np.zeros(len(cv), np.float64)
        for t, (n, s) in lut_b.items():
            m = et == t
            nn = n[hod[m]]
            dev[m] = np.abs(cv[m] * nn - s[hod[m]]).astype(np.float64) \
                / nn.astype(np.float64) / 100.0
        return pa.table({
            "event_type": batch["event_type"],
            "event_id": batch["event_id"],
            "dev": pa.array(dev, pa.float64()),
        })

    top = topk_per_group(
        prepped.map_batches(residual, batch_format="pyarrow"),
        ["event_type"], "dev", k=3, tiebreak_col="event_id", num_shards=4,
    )
    return _finalize(top, {}, {"dev": 6})


def q_weighted_median(sf_dir: str):
    """Weighted median document length per language (weight = whitespace
    token count, the q_token_count protocol): lower weighted median —
    smallest n_chars whose cumulative weight reaches half the total.
    Scale shape: per-batch (lang, n_chars) weight census collapses the
    docs to a value-distinct table (bounded by the n_chars value range,
    NOT corpus size), one sharded exchange sums it, and the per-lang
    cumulative-weight scan walks only census rows — integer-exact
    end-to-end, no interpolation."""
    from ..functions.text import token_count
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "documents", ["lang", "n_chars", "text"])

    def census_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "lang": batch["lang"],
            "n_chars": pc.cast(batch["n_chars"], pa.int64()),
            "w": pc.cast(token_count(batch["text"]), pa.int64()),
        })
        g = t.group_by(["lang", "n_chars"]).aggregate([("w", "sum")])
        return g.rename_columns(["lang", "n_chars", "w"])

    census = sharded_grouped_agg(
        ds.map_batches(census_partial, batch_format="pyarrow"),
        ["lang", "n_chars"], [("w", "sum")], num_shards=8,
    )

    def per_lang(group: pa.Table) -> pa.Table:
        t = group.sort_by([("lang", "ascending"), ("n_chars", "ascending")])
        langs = t["lang"].to_numpy(zero_copy_only=False)
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        out_l, out_m = [], []
        starts = np.flatnonzero(np.r_[True, langs[1:] != langs[:-1]])
        bounds = np.r_[starts, len(langs)]
        for i, st in enumerate(starts):
            en = bounds[i + 1]
            cw = np.cumsum(w[st:en])
            tw = cw[-1]
            j = int(np.flatnonzero(2 * cw >= tw)[0])
            out_l.append(langs[st])
            out_m.append(int(nc[st + j]))
        return pa.table({
            "lang": pa.array(out_l, pa.string()),
            "wmedian_chars": pa.array(out_m, pa.int64()),
        })

    def add_shard(batch: pa.Table) -> pa.Table:
        from ..stages.keyed import _key_shard
        return batch.append_column("_ws", _key_shard(batch, ["lang"], 8))

    return (
        census.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_ws")
        .map_groups(lambda g: per_lang(g.drop_columns("_ws")),
                    batch_format="pyarrow")
    )


def q_ks_statistic(sf_dir: str):
    """Exact two-sample Kolmogorov-Smirnov distance between the purchase
    and view value distributions: per-batch (cent-value, count-per-side)
    census combiner -> one sharded exchange -> driver-final CDF scan.
    The census is bounded by the VALUE DOMAIN (distinct cents), not the
    corpus, so only value-distinct rows cross the exchange and the final
    scan is tiny; the statistic ``max |C1*N2 - C2*N1|`` stays exact
    integer until one final division (overflow bound: N1*N2 < 2^63 —
    at larger corpora switch the scan to float128/int128, documented not
    checked).  at_cv reports the smallest cent value attaining the max
    (deterministic tie-break)."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def census_partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "purchase") | (et == "view")
        v = batch["value"].to_numpy(zero_copy_only=False)[keep]
        cv = np.rint(v * 100).astype(np.int64)
        is1 = (et[keep] == "purchase").astype(np.int64)
        t = pa.table({
            "cv": pa.array(cv),
            "c1": pa.array(is1),
            "c2": pa.array(1 - is1),
        })
        g = t.group_by(["cv"]).aggregate([("c1", "sum"), ("c2", "sum")])
        return g.rename_columns(["cv", "c1", "c2"])

    census = sharded_grouped_agg(
        ds.map_batches(census_partial, batch_format="pyarrow"),
        ["cv"], [("c1", "sum"), ("c2", "sum")], num_shards=8,
    ).to_pandas().sort_values("cv")

    cv = census["cv"].to_numpy()
    a1 = np.cumsum(census["c1"].to_numpy())
    a2 = np.cumsum(census["c2"].to_numpy())
    n1, n2 = int(a1[-1]), int(a2[-1])
    dn = np.abs(a1 * n2 - a2 * n1)
    mx = int(dn.max())
    at = int(cv[np.flatnonzero(dn == mx)[0]])
    ks = round(float(mx) / (float(n1) * float(n2)), 8)
    return pa.table({
        "type_a": pa.array(["purchase"]),
        "type_b": pa.array(["view"]),
        "d_num": pa.array([mx], pa.int64()),
        "at_cv": pa.array([at], pa.int64()),
        "ks": pa.array([ks], pa.float64()),
    })


def q_chi2_independence(sf_dir: str):
    """Pearson chi-square independence test of event_type vs hour-of-day:
    per-batch contingency census combiner -> one sharded exchange ->
    driver-final scan over the types x 24 cells.  Each cell's
    ``(o*N - r*c)^2 / (N*r*c)`` is exact-integer in numerator/denominator
    and micro-floored before the sum (the bm25 libm protocol) so the
    120-term float sum is an associative integer sum — bit-identical
    across engines and block layouts."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def census_partial(batch: pa.Table) -> pa.Table:
        tms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": batch["event_type"],
            "hod": pa.array((tms // 3600000) % 24, pa.int64()),
            "o": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        g = t.group_by(["event_type", "hod"]).aggregate([("o", "sum")])
        return g.rename_columns(["event_type", "hod", "o"])

    census = sharded_grouped_agg(
        ds.map_batches(census_partial, batch_format="pyarrow"),
        ["event_type", "hod"], [("o", "sum")], num_shards=4,
    ).to_pandas()

    piv = census.pivot_table(index="event_type", columns="hod", values="o",
                             fill_value=0, aggfunc="sum")
    o = piv.to_numpy().astype(np.int64)
    r = o.sum(axis=1, keepdims=True)
    c = o.sum(axis=0, keepdims=True)
    n = int(o.sum())
    num = (o * n - r * c).astype(np.float64) ** 2
    den = (float(n) * (r * c).astype(np.float64))
    cells = np.floor(num / den * 1e6).astype(np.int64)
    chi2 = float(cells.sum()) / 1e6
    dof = (o.shape[0] - 1) * (o.shape[1] - 1)
    return pa.table({
        "chi2": pa.array([round(chi2, 6)], pa.float64()),
        "dof": pa.array([dof], pa.int64()),
        "n": pa.array([n], pa.int64()),
    })


def q_basket_lift(sf_dir: str):
    """Market-basket lift between event types co-occurring in the same
    user session (q_sessions' gap definition): sessionize -> per-session
    distinct type set -> vectorized within-session pair expansion
    (bounded C(T,2) per session, T = #types) -> census.  The exchange
    moves (user, ts, type) triples once; the census and the final
    ``lift = (n_ab*N) / (n_a*n_b)`` (exact ints, one division) are
    driver-final over at most T + C(T,2) + 1 rows."""
    from ..stages.keyed import _key_shard

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "ts_ms": ts_to_ms(batch["ts"]),
            "event_type": batch["event_type"],
        })
        return t.append_column("_kshard", _key_shard(t, ["user_id"], 64))

    def census(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "ta": pa.array([], pa.string()),
            "tb": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        })
        if group.num_rows == 0:
            return empty
        user = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts_ms"].to_numpy(zero_copy_only=False)
        et = group["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, user))
        user, ts, et = user[order], ts[order], et[order]
        brk = np.ones(len(user), dtype=bool)
        brk[1:] = (user[1:] != user[:-1]) | (ts[1:] - ts[:-1] > SESSION_GAP_MS)
        sid = np.cumsum(brk) - 1
        types, code = np.unique(et, return_inverse=True)
        k = len(types)
        # distinct (session, type) memberships
        mem = np.unique(sid * k + code)
        msid, mcode = mem // k, mem % k
        n_sessions = int(sid[-1]) + 1
        singles = np.bincount(mcode, minlength=k).astype(np.int64)
        # vectorized pairs within each session's (sorted) type set
        seg = np.r_[np.flatnonzero(np.r_[True, msid[1:] != msid[:-1]]),
                    len(msid)]
        lens = np.diff(seg)
        npairs = lens * (lens - 1) // 2
        rows_a, rows_b = [], []
        if npairs.sum() > 0:
            # per segment emit (i, j) index pairs i<j via offset arithmetic
            for st, ln in zip(seg[:-1], lens):
                if ln < 2:
                    continue
                c = mcode[st:st + ln]
                ia, ib = np.triu_indices(ln, k=1)
                rows_a.append(c[ia])
                rows_b.append(c[ib])
        out_rows = {"ta": [], "tb": [], "n": []}
        # total-session sentinel row
        out_rows["ta"].append("")
        out_rows["tb"].append("")
        out_rows["n"].append(n_sessions)
        for i in range(k):
            if singles[i]:
                out_rows["ta"].append(str(types[i]))
                out_rows["tb"].append("")
                out_rows["n"].append(int(singles[i]))
        if rows_a:
            pa_, pb_ = np.concatenate(rows_a), np.concatenate(rows_b)
            pk = pa_ * k + pb_
            uniq, cnt = np.unique(pk, return_counts=True)
            for u, c in zip(uniq, cnt):
                out_rows["ta"].append(str(types[u // k]))
                out_rows["tb"].append(str(types[u % k]))
                out_rows["n"].append(int(c))
        return pa.table({
            "ta": pa.array(out_rows["ta"], pa.string()),
            "tb": pa.array(out_rows["tb"], pa.string()),
            "n": pa.array(out_rows["n"], pa.int64()),
        })

    cen = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_kshard")
        .map_groups(lambda g: census(g.drop_columns("_kshard")),
                    batch_format="pyarrow")
        .to_pandas()
    )
    agg = cen.groupby(["ta", "tb"], as_index=False)["n"].sum()
    total = int(agg.loc[(agg["ta"] == "") & (agg["tb"] == ""), "n"].iloc[0])
    singles = {r["ta"]: int(r["n"]) for _, r in
               agg[(agg["ta"] != "") & (agg["tb"] == "")].iterrows()}
    pairs = agg[(agg["ta"] != "") & (agg["tb"] != "")]
    out = {"type_a": [], "type_b": [], "n_both": [], "lift": []}
    for _, r in pairs.sort_values(["ta", "tb"]).iterrows():
        a, b, nab = r["ta"], r["tb"], int(r["n"])
        out["type_a"].append(a)
        out["type_b"].append(b)
        out["n_both"].append(nab)
        out["lift"].append(round(
            float(nab * total) / float(singles[a] * singles[b]), 6))
    return pa.table({
        "type_a": pa.array(out["type_a"], pa.string()),
        "type_b": pa.array(out["type_b"], pa.string()),
        "n_both": pa.array(out["n_both"], pa.int64()),
        "lift": pa.array(out["lift"], pa.float64()),
    })


def q_isotonic_hourly(sf_dir: str):
    """Isotonic (non-decreasing) least-squares fit of mean value over
    hour-of-day per event type — monotone trend extraction, the shape-
    constrained cousin of q_trend_slope.  The distributed part is the
    exact (type, hod) cent census (combiner + one sharded exchange); the
    fit itself is driver-final over <= types x 24 cells via the MINIMAX
    characterization ``fit[i] = max_{j<=i} min_{k>=i} avg(S[j..k])``
    (equivalent to PAVA) so both engines enumerate the IDENTICAL
    candidate set of exact-int divisions — bit-identical doubles, no
    fixture needed."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def census_partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        tms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": batch["event_type"],
            "hod": pa.array((tms // 3600000) % 24, pa.int64()),
            "_n": pa.array(np.ones(batch.num_rows, np.int64)),
            "_s": pa.array(np.rint(v * 100).astype(np.int64)),
        })
        g = t.group_by(["event_type", "hod"]).aggregate(
            [("_n", "sum"), ("_s", "sum")])
        return g.rename_columns(["event_type", "hod", "_n", "_s"])

    census = sharded_grouped_agg(
        ds.map_batches(census_partial, batch_format="pyarrow"),
        ["event_type", "hod"], [("_n", "sum"), ("_s", "sum")], num_shards=4,
    ).to_pandas().sort_values(["event_type", "hod"])

    out = {"event_type": [], "hod": [], "iso_mean": []}
    for et, grp in census.groupby("event_type", sort=True):
        hod = grp["hod"].to_numpy()
        n = grp["_n"].to_numpy().astype(np.int64)
        s = grp["_s"].to_numpy().astype(np.int64)
        m = len(hod)
        cn = np.cumsum(n)
        cs = np.cumsum(s)
        # avg[j, k] over observed cells j..k (inclusive, 0-based)
        cn0 = np.r_[0, cn]
        cs0 = np.r_[0, cs]
        avg = np.full((m, m), np.nan)
        for j in range(m):
            avg[j, j:] = (cs[j:] - cs0[j]).astype(np.float64) \
                / (cn[j:] - cn0[j]).astype(np.float64)
        for i in range(m):
            # min over k>=i for each j<=i, then max over j
            fit = max(np.nanmin(avg[j, i:]) for j in range(i + 1))
            out["event_type"].append(et)
            out["hod"].append(int(hod[i]))
            out["iso_mean"].append(round(fit / 100.0, 6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "hod": pa.array(out["hod"], pa.int64()),
        "iso_mean": pa.array(out["iso_mean"], pa.float64()),
    })


def q_mannwhitney_u(sf_dir: str):
    """Mann-Whitney U rank-sum test (purchase vs view values) with
    midrank tie handling — the rank-based complement of q_ks_statistic,
    over the SAME value-domain census shape: per-batch (cent, side)
    counts, one sharded exchange, driver-final rank scan.  Midranks are
    half-integers, so everything is kept in doubled units (exact int64)
    until the final two float ops: ``u = U1_2x / 2`` and the common-
    language effect size ``cles = U1_2x / (2*n1*n2)``."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def census_partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "purchase") | (et == "view")
        v = batch["value"].to_numpy(zero_copy_only=False)[keep]
        cv = np.rint(v * 100).astype(np.int64)
        is1 = (et[keep] == "purchase").astype(np.int64)
        t = pa.table({
            "cv": pa.array(cv),
            "c1": pa.array(is1),
            "c2": pa.array(1 - is1),
        })
        g = t.group_by(["cv"]).aggregate([("c1", "sum"), ("c2", "sum")])
        return g.rename_columns(["cv", "c1", "c2"])

    census = sharded_grouped_agg(
        ds.map_batches(census_partial, batch_format="pyarrow"),
        ["cv"], [("c1", "sum"), ("c2", "sum")], num_shards=8,
    ).to_pandas().sort_values("cv")

    c1 = census["c1"].to_numpy().astype(np.int64)
    c2 = census["c2"].to_numpy().astype(np.int64)
    cnt = c1 + c2
    n1, n2 = int(c1.sum()), int(c2.sum())
    before = np.cumsum(cnt) - cnt
    midrank2 = 2 * before + cnt + 1  # midrank in doubled units
    r1_2 = int((c1 * midrank2).sum())
    u1_2 = r1_2 - n1 * (n1 + 1)
    u = float(u1_2) / 2.0
    cles = float(u1_2) / (2.0 * float(n1) * float(n2))
    return pa.table({
        "type_a": pa.array(["purchase"]),
        "type_b": pa.array(["view"]),
        "n1": pa.array([n1], pa.int64()),
        "n2": pa.array([n2], pa.int64()),
        "u1": pa.array([u], pa.float64()),
        "cles": pa.array([round(cles, 8)], pa.float64()),
    })


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6 forecasting-revenue-change: a pure filtered aggregate
    whose date range is PUSHED INTO the Parquet scan
    (sources/parquet.read_pruned — file pruning + row-group stats + exact
    row filter on l_shipdate, the copyer.go:75 querier-bounds pattern);
    discount/quantity predicates are vectorized batch kernels on the
    pruned stream.  Revenue = sum(extendedprice * discount) in exact
    cent x cent integer units, one final division."""
    from ray.data.aggregate import Sum

    from ..sources.parquet import read_pruned

    t0 = 820_454_400_000   # 1996-01-01T00:00Z
    t1 = 852_076_800_000   # 1997-01-01T00:00Z
    ds = read_pruned(
        f"{sf_dir}/lineitem.parquet",
        ts_col="l_shipdate", t_from_ms=t0, t_to_ms=t1 - 1,
        columns=["l_shipdate", "l_quantity", "l_extendedprice",
                 "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        pc_ = np.rint(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        dc = np.rint(batch["l_discount"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        keep = (dc >= 5) & (dc <= 7) & (qty < 24)
        return pa.table({
            "_rev": pa.array([int((pc_[keep] * dc[keep]).sum())], pa.int64()),
            "_n": pa.array([int(keep.sum())], pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .aggregate(Sum("_rev", alias_name="rev"), Sum("_n", alias_name="n"))
    )
    return pa.table({
        "revenue": pa.array(
            [round(float(agg["rev"] or 0) / 10000.0, 4)], pa.float64()),
        "n_lines": pa.array([int(agg["n"] or 0)], pa.int64()),
    })


def q_debounce_events(sf_dir: str):
    """Debounce census: per event type, how many events survive
    burst-collapse keep-first per (user, type) with a 5-minute gap (an
    event is kept iff it starts a burst — no predecessor, or > gap since
    the previous event).  The reference's dedup-identical-samples
    semantics (compact.go:37) extended to proximity.  One narrow
    (user, type, ts, id) exchange; per-shard segment scan; per-type
    (total, kept) census is all that reaches the merge."""
    from ..stages.keyed import _key_shard, sharded_grouped_agg

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "event_type": batch["event_type"],
            "tsms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
        })
        return t.append_column(
            "_kshard", _key_shard(t, ["user_id", "event_type"], 64))

    def census(group: pa.Table) -> pa.Table:
        g = group.drop_columns("_kshard")
        if g.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "n_total": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
            })
        user = g["user_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        ts = g["tsms"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        types, code = np.unique(et, return_inverse=True)
        order = np.lexsort((eid, ts, code, user))
        user, code, ts = user[order], code[order], ts[order]
        first = np.ones(len(user), dtype=bool)
        first[1:] = (user[1:] != user[:-1]) | (code[1:] != code[:-1])
        # kept = segment start, or gap from the previous (same-segment) row
        # exceeds the debounce window
        kept = first | np.r_[False, ts[1:] - ts[:-1] > MS_5M]
        n_total = np.bincount(code, minlength=len(types)).astype(np.int64)
        n_kept = np.bincount(code[kept], minlength=len(types)).astype(np.int64)
        return pa.table({
            "event_type": pa.array([str(t) for t in types], pa.string()),
            "n_total": pa.array(n_total),
            "n_kept": pa.array(n_kept),
        })

    merged = sharded_grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_kshard")
        .map_groups(census, batch_format="pyarrow"),
        ["event_type"], [("n_total", "sum"), ("n_kept", "sum")],
        num_shards=4,
    )

    def finish(batch: pa.Table) -> pa.Table:
        nt = batch["n_total"].to_numpy(zero_copy_only=False)
        nk = batch["n_kept"].to_numpy(zero_copy_only=False)
        ratio = 1.0 - nk.astype(np.float64) / nt.astype(np.float64)
        return batch.append_column(
            "suppress_ratio", pa.array(np.round(ratio, 6), pa.float64()))

    return merged.map_batches(finish, batch_format="pyarrow")


def q_max_concurrency(sf_dir: str):
    """Peak concurrent user sessions per day — the distributed SWEEP-LINE
    / two-phase scan pattern: sessions (q_sessions' gap definition) emit
    +1/-1 boundary deltas; each day bucket sorts its own boundaries and
    computes a LOCAL prefix max + total; the driver then prefix-sums the
    per-day totals (bounded by #days) into carry-in offsets, and
    ``max_concurrent[day] = carry[day] + local_max[day]``.  No global
    sort — the only exchanges are the sessionize key shuffle and the
    O(sessions) boundary rows bucketed by day.  Tie rule: at equal time,
    starts (+1) are processed before ends (-1)."""
    from ..stages.keyed import sessionize

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "ts_ms": ts_to_ms(b["ts"]),
        })

    sess = sessionize(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id", "ts_ms", SESSION_GAP_MS,
    )

    def boundaries(b: pa.Table) -> pa.Table:
        st = b["session_start_ms"].to_numpy(zero_copy_only=False)
        en = b["session_end_ms"].to_numpy(zero_copy_only=False) + 1
        t = np.concatenate([st, en])
        d = np.concatenate([np.ones(len(st), np.int64),
                            np.full(len(en), -1, np.int64)])
        return pa.table({
            "day": pa.array((t // MS_1D) * MS_1D, pa.int64()),
            "t": pa.array(t),
            "d": pa.array(d),
        })

    def local_scan(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "day": pa.array([], pa.int64()),
                "local_max": pa.array([], pa.int64()),
                "total": pa.array([], pa.int64()),
            })
        t = group["t"].to_numpy(zero_copy_only=False)
        d = group["d"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-d, t))  # +1 before -1 at equal t
        run = np.cumsum(d[order])
        return pa.table({
            "day": group["day"].slice(0, 1),
            "local_max": pa.array([int(run.max())], pa.int64()),
            "total": pa.array([int(run[-1])], pa.int64()),
        })

    per_day = (
        sess.map_batches(boundaries, batch_format="pyarrow")
        .groupby("day")
        .map_groups(local_scan, batch_format="pyarrow")
        .to_pandas()
        .sort_values("day")
    )
    carry = np.r_[0, np.cumsum(per_day["total"].to_numpy())[:-1]]
    return pa.table({
        "day": pa.array(per_day["day"].to_numpy(), pa.int64()),
        "max_concurrent": pa.array(
            carry + per_day["local_max"].to_numpy(), pa.int64()),
    })


def _type_moment_census(sf_dir: str, keys_hod: bool):
    """Shared exact moment census: per (type[, hod]) n, sum-cents,
    sum-squared-cents as int64 — one combiner + sharded exchange,
    driver-final (bounded by types x 24)."""
    from ..stages.keyed import sharded_grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        cv = np.rint(v * 100).astype(np.int64)
        cols = {"event_type": batch["event_type"]}
        keys = ["event_type"]
        if keys_hod:
            tms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
            cols["hod"] = pa.array((tms // 3600000) % 24, pa.int64())
            keys.append("hod")
        cols.update({
            "_n": pa.array(np.ones(len(cv), np.int64)),
            "_s": pa.array(cv),
            "_s2": pa.array(cv * cv),
        })
        t = pa.table(cols)
        g = t.group_by(keys).aggregate(
            [("_n", "sum"), ("_s", "sum"), ("_s2", "sum")])
        return g.rename_columns(keys + ["_n", "_s", "_s2"])

    keys = ["event_type", "hod"] if keys_hod else ["event_type"]
    return sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys, [("_n", "sum"), ("_s", "sum"), ("_s2", "sum")], num_shards=4,
    ).to_pandas()


def q_anova_hod(sf_dir: str):
    """One-way ANOVA F per event type: does mean value differ across
    hour-of-day groups?  SSB/SSW from the exact (type, hod) moment
    census; each ``s_h^2/n_h`` term is evaluated in doubles and
    MICRO-FLOORED before summation (the bm25 libm protocol) so the
    between-groups sum is an associative integer sum; the remaining ops
    are a fixed mirrored float sequence."""
    census = _type_moment_census(sf_dir, keys_hod=True)
    out = {"event_type": [], "k_groups": [], "f_stat": []}
    for et, grp in census.groupby("event_type", sort=True):
        n_h = grp["_n"].to_numpy().astype(np.int64)
        s_h = grp["_s"].to_numpy().astype(np.int64)
        n = int(n_h.sum())
        s = int(s_h.sum())
        s2 = int(grp["_s2"].to_numpy().astype(np.int64).sum())
        k = len(n_h)
        if k < 2 or n <= k:
            continue
        b_terms = np.floor(
            s_h.astype(np.float64) * s_h.astype(np.float64)
            / n_h.astype(np.float64) * 1e6).astype(np.int64)
        bsum = int(b_terms.sum())
        g = int(np.floor(float(s) * float(s) / float(n) * 1e6))
        ssb = float(bsum - g) / 1e6
        ssw = float(s2) - float(bsum) / 1e6
        f = (ssb / float(k - 1)) / (ssw / float(n - k))
        out["event_type"].append(et)
        out["k_groups"].append(k)
        out["f_stat"].append(round(f, 6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "k_groups": pa.array(out["k_groups"], pa.int64()),
        "f_stat": pa.array(out["f_stat"], pa.float64()),
    })


def q_cohens_d(sf_dir: str):
    """Cohen's d effect size for every event-type pair (pooled-SD
    standardized mean difference) from the exact per-type moment census:
    sample variances and the pooled SD are a fixed mirrored float
    sequence over exact int64 sums; one row per unordered pair."""
    census = _type_moment_census(sf_dir, keys_hod=False) \
        .sort_values("event_type")
    types = census["event_type"].tolist()
    n = census["_n"].to_numpy().astype(np.int64)
    s = census["_s"].to_numpy().astype(np.int64)
    s2 = census["_s2"].to_numpy().astype(np.int64)
    out = {"type_a": [], "type_b": [], "d": []}
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            n1, n2 = float(n[i]), float(n[j])
            m1 = float(s[i]) / n1
            m2 = float(s[j]) / n2
            v1 = float(n[i] * s2[i] - s[i] * s[i]) / (n1 * (n1 - 1.0))
            v2 = float(n[j] * s2[j] - s[j] * s[j]) / (n2 * (n2 - 1.0))
            sp = np.sqrt(((n1 - 1.0) * v1 + (n2 - 1.0) * v2)
                         / (n1 + n2 - 2.0))
            out["type_a"].append(types[i])
            out["type_b"].append(types[j])
            out["d"].append(round((m1 - m2) / sp, 6))
    return pa.table({
        "type_a": pa.array(out["type_a"], pa.string()),
        "type_b": pa.array(out["type_b"], pa.string()),
        "d": pa.array(out["d"], pa.float64()),
    })


def q_media_pure_grid(sf_dir: str):
    """REAL image decode in the battery: every document becomes a
    deterministic 8x8 binary-P6 netpbm payload (pixel = (doc_id*31 +
    r*7 + c*3) % 256, gray in all channels), REALLY encoded to bytes and
    REALLY decoded back by the pure-numpy netpbm codec inside the
    MediaFeatureExtractor actor pool (stages/multimodal.decode_netpbm);
    three of the 4x4 block-mean features are value-checked against the
    oracle's arithmetic expansion of the same raster.  Proves the decode
    -> pool path byte-for-byte, not just the plumbing."""
    from ..stages.multimodal import extract_media_features

    ds = _read(sf_dir, "documents", ["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        r = np.arange(8)[:, None]
        c = np.arange(8)[None, :]
        payloads = []
        for d in ids:
            v = ((int(d) * 31 + r * 7 + c * 3) % 256).astype(np.uint8)
            rgb = np.repeat(v[:, :, None], 3, axis=2)
            payloads.append(b"P6\n8 8\n255\n" + rgb.tobytes())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["image"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/x-portable-pixmap"] * len(ids)),
            "width": pa.array([8] * len(ids), pa.int32()),
            "height": pa.array([8] * len(ids), pa.int32()),
            "duration_ms": pa.array([None] * len(ids), pa.int32()),
        })

    feats = extract_media_features(
        ds.map_batches(to_media, batch_format="pyarrow"),
        concurrency=(1, 4), batch_size=128, decoder="pure",
    )

    def select(batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": batch["media_id"],
            "f00": pa.array(np.round(emb[:, 0], 6)),
            "f12": pa.array(np.round(emb[:, 6], 6)),
            "f33": pa.array(np.round(emb[:, 15], 6)),
        })

    return feats.map_batches(select, batch_format="pyarrow")


def q_audio_pure_rms(sf_dir: str):
    """REAL audio decode in the battery: every document becomes a 1-second
    16-bit PCM WAV (8 kHz; first half amplitude a = (doc_id*13)%8000+1000,
    second half amplitude 2a), REALLY encoded with stdlib ``wave`` and
    REALLY decoded back by AudioLoudness(decoder='pure') — per-500ms-frame
    integer energies (sum of squared int16 samples, exact) the oracle
    derives arithmetically: frame energies [4000*a^2, 4000*4*a^2]."""
    import io
    import wave as wavemod

    from ..stages.multimodal import AudioLoudness

    ds = _read(sf_dir, "documents", ["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for d in ids:
            a = int(d) * 13 % 8000 + 1000
            s = np.r_[np.full(4000, a, np.int16),
                      np.full(4000, 2 * a, np.int16)]
            buf = io.BytesIO()
            with wavemod.open(buf, "wb") as wv:
                wv.setnchannels(1)
                wv.setsampwidth(2)
                wv.setframerate(8000)
                wv.writeframes(s.tobytes())
            payloads.append(buf.getvalue())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["audio"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["audio/wav"] * len(ids)),
            "width": pa.array([None] * len(ids), pa.int32()),
            "height": pa.array([None] * len(ids), pa.int32()),
            "duration_ms": pa.array([1000] * len(ids), pa.int32()),
        })

    out = (
        ds.map_batches(to_media, batch_format="pyarrow")
        .map_batches(AudioLoudness,
                     fn_constructor_kwargs={"frame_ms": 500,
                                            "decoder": "pure"},
                     batch_format="pyarrow", batch_size=128,
                     concurrency=(1, 4))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["media_id"],
            "n_frames": batch["n_frames"],
            "energy_mean": batch["energy_mean"],
            "energy_max": batch["energy_max"],
        })

    return out.map_batches(rename, batch_format="pyarrow")


def q_entropy_rate(sf_dir: str):
    """Entropy rate of the event-type Markov chain: conditional entropy
    H(next | current) in nats over q_transitions' census (one user-hash
    exchange, O(|types|^2) driver-final).  Each cell's
    ``ln(n_st / n_s)`` is MICRO-FLOORED (the bm25 libm protocol) and
    weighted by the exact int64 pair count, so the sum is associative
    and the SQL mirror is bit-identical through the single final
    division."""
    from ..stages.keyed import transition_counts

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "tms": ts_to_ms(batch["ts"]),
            "event_type": batch["event_type"],
            "event_id": pc.cast(batch["event_id"], pa.int64()),
        })

    census = transition_counts(
        ds.map_batches(norm, batch_format="pyarrow"),
        "user_id", ["tms", "event_type", "event_id"], "event_type",
        out_count="n_pairs",
    ).to_pandas()

    n_st = census["n_pairs"].to_numpy().astype(np.int64)
    n_s = census.groupby("from_state")["n_pairs"].transform("sum") \
        .to_numpy().astype(np.int64)
    total = int(n_st.sum())
    terms = np.floor(np.log(n_st.astype(np.float64)
                            / n_s.astype(np.float64)) * 1e6).astype(np.int64)
    acc = int((n_st * terms).sum())
    h = -float(acc) / (float(total) * 1e6)
    return pa.table({
        "n_pairs": pa.array([total], pa.int64()),
        "entropy_rate_nats": pa.array([round(h, 6)], pa.float64()),
    })


def q_longest_streak(sf_dir: str):
    """Longest strictly-increasing value run per event type (max over its
    users): the comparison flavor of gaps-and-islands (merge_intervals is
    the time flavor) — one (user, type)-sharded exchange, per-shard
    vectorized run-length over the (ts, event_id)-ordered timeline,
    per-type max combiner.  SQL mirror is the classic row_number-
    difference islands construction."""
    from ..stages.keyed import _key_shard, sharded_grouped_agg

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id",
                                  "value"])

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "event_type": batch["event_type"],
            "tsms": ts_to_ms(batch["ts"]),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "value": batch["value"],
        })
        return t.append_column(
            "_kshard", _key_shard(t, ["user_id", "event_type"], 64))

    def runs(group: pa.Table) -> pa.Table:
        g = group.drop_columns("_kshard")
        if g.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "streak": pa.array([], pa.int64()),
            })
        user = g["user_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        ts = g["tsms"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        v = g["value"].to_numpy(zero_copy_only=False)
        types, code = np.unique(et, return_inverse=True)
        order = np.lexsort((eid, ts, code, user))
        user, code, v = user[order], code[order], v[order]
        # a run breaks at segment starts or non-increasing steps
        brk = np.ones(len(v), dtype=bool)
        brk[1:] = (user[1:] != user[:-1]) | (code[1:] != code[:-1]) \
            | (v[1:] <= v[:-1])
        run_id = np.cumsum(brk) - 1
        lengths = np.bincount(run_id)
        # per-type max run length: map each run to its type via run starts
        run_code = code[np.flatnonzero(brk)]
        best = np.zeros(len(types), np.int64)
        np.maximum.at(best, run_code, lengths)
        return pa.table({
            "event_type": pa.array([str(t) for t in types], pa.string()),
            "streak": pa.array(best),
        })

    return sharded_grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_kshard")
        .map_groups(runs, batch_format="pyarrow"),
        ["event_type"], [("streak", "max")], num_shards=4,
    )


# collision-proof registries: duplicate names raise at import (round-3
# verdict item 6 — dict.update silently shadowed four wave names once)
QUERIES = GuardedRegistry("QUERIES")
ORACLE_SQL = GuardedRegistry("ORACLE_SQL")

QUERIES.update({
    "rollup_5m": q_rollup_5m,
    "rollup_1h": q_rollup_1h,
    "rollup_1d": q_rollup_1d,
    "range_discovery": q_range_discovery,
    "filter_matchers": q_filter_matchers,
    "relabel_merge": q_relabel_merge,
    "time_filter": q_time_filter,
    "dedup_first": q_dedup_first,
    "gapfill_5m": q_gapfill_5m,
    "window_align": q_window_align,
    "retention": q_retention,
    "pricing_summary": q_pricing_summary,
    "top_sources": q_top_sources,
    "distinct_pairs": q_distinct_pairs,
    "sample_mod10": q_sample_mod10,
    "docs_stats": q_docs_stats,
    "token_count": q_token_count,
    "token_bpe": q_token_bpe,
    "quality": q_quality,
    "exact_dedup": q_exact_dedup,
    "dedup_rows": q_dedup_rows,
    "ann_topk": q_ann_topk,
    "cosine_pairs_exact": q_cosine_pairs_exact,
    "union_merge": q_union_merge,
    "sliding_1h": q_sliding_1h,
    "hist_5m": q_hist_5m,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "pages_rollup_5m": q_pages_rollup_5m,
    "pages_rollup_1h": q_pages_rollup_1h,
    "topk_events": q_topk_events,
    "sessions": q_sessions,
    "value_quantiles": q_value_quantiles,
    "distinct_users": q_distinct_users,
    "approx_users": q_approx_users,
    "topk_windowed": q_topk_windowed,
    "top_user": q_top_user,
    "approx_quantiles": q_approx_quantiles,
    "dup_clusters": q_dup_clusters,
    "term_df": q_term_df,
    "orders_per_nation": q_orders_per_nation,
    "cust_no_orders": q_cust_no_orders,
    "repetition": q_repetition,
    "decontaminate": q_decontaminate,
    "stratified_sample": q_stratified_sample,
    "normalize_text": q_normalize_text,
    "chunk_docs": q_chunk_docs,
    "pack_sequences": q_pack_sequences,
    "mix_sources": q_mix_sources,
    "props_extract": q_props_extract,
    "tfidf_topk": q_tfidf_topk,
    "centroid_topk": q_centroid_topk,
    "curate_summary": q_curate_summary,
    "event_rank": q_event_rank,
    "running_total": q_running_total,
    "increase_5m": q_increase_5m,
    "dup_grams": q_dup_grams,
    "redact_pii": q_redact_pii,
    "shuffle_order": q_shuffle_order,
    "lang_quartile_filter": q_lang_quartile_filter,
    "hist_p90": q_hist_p90,
    "pivot_events": q_pivot_events,
    "trend_slope": q_trend_slope,
    "cube_docs": q_cube_docs,
    "percent_rank": q_percent_rank,
    "twa_5m": q_twa_5m,
    "bloom_semi": q_bloom_semi,
    "zscore": q_zscore,
    "ntile": q_ntile,
    "merge_intervals": q_merge_intervals,
    "heavy_users": q_heavy_users,
    "lag_value": q_lag_value,
    "cohort_retention": q_cohort_retention,
    "except_users": q_except_users,
    "unpivot_events": q_unpivot_events,
    "profile_docs": q_profile_docs,
    "funnel": q_funnel,
    "corr_hour": q_corr_hour,
    "string_agg": q_string_agg,
    "knn_join": q_knn_join,
    "kmeans": q_kmeans,
    "rolling_median": q_rolling_median,
    "cooccurrence": q_cooccurrence,
    "full_join": q_full_join,
    "robust_stats": q_robust_stats,
    "edit_distance_pairs": q_edit_distance_pairs,
    "transitions": q_transitions,
    "impute_median": q_impute_median,
    "watermark_window": q_watermark_window,
    "compression_ratio": q_compression_ratio,
    "unigram_logprob": q_unigram_logprob,
    "weekly_active": q_weekly_active,
    "global_quantiles": q_global_quantiles,
    "frame_features": q_frame_features,
    "cluster_keep_best": q_cluster_keep_best,
    "pagerank": q_pagerank,
    "share_of_type": q_share_of_type,
    "cdc_merge": q_cdc_merge,
    "char_entropy": q_char_entropy,
    "audience_overlap": q_audience_overlap,
    "mad_outliers": q_mad_outliers,
    "first_last": q_first_last,
    "dense_rank": q_dense_rank,
    "winsorized": q_winsorized,
    "scd2_intervals": q_scd2_intervals,
    "dataset_split": q_dataset_split,
    "ohlc_1h": q_ohlc_1h,
    "peak_hour": q_peak_hour,
    "bm25": q_bm25,
    "resets": q_resets,
    "triangles": q_triangles,
    "srs_sample": q_srs_sample,
    "oov_rate": q_oov_rate,
    "cluster_sizes": q_cluster_sizes,
    "media_resize": q_media_resize,
    "pca_top": q_pca_top,
    "asof_tolerance": q_asof_tolerance,
    "gap_stats": q_gap_stats,
    "bpe_merges": q_bpe_merges,
    "slo_burn": q_slo_burn,
    "max_drawdown": q_max_drawdown,
    "cume_dist": q_cume_dist,
    "monthly_rollup": q_monthly_rollup,
    "k_anonymity": q_k_anonymity,
    "dup_spans": q_dup_spans,
    "minhash_index_pairs": q_minhash_index_pairs,
    "zorder_sample": q_zorder_sample,
    "anomaly_3sigma": q_anomaly_3sigma,
    "skyline": q_skyline,
    "value_histogram": q_value_histogram,
    "pmi_pairs": q_pmi_pairs,
    "quality_deciles": q_quality_deciles,
    "user_entropy": q_user_entropy,
    "term_drift": q_term_drift,
    "keyword_search": q_keyword_search,
    "bpe_encode": q_bpe_encode,
    "approx_overlap": q_approx_overlap,
    "rate_5m": q_rate_5m,
    "delta_5m": q_delta_5m,
    "cusum_max": q_cusum_max,
    "psi_buckets": q_psi_buckets,
    "rrf_fusion": q_rrf_fusion,
    "hopping_15m": q_hopping_15m,
    "weighted_sample": q_weighted_sample,
    "fuzzy_decontaminate": q_fuzzy_decontaminate,
    "audio_loudness": q_audio_loudness,
    "fair_share_sample": q_fair_share_sample,
    "phrase_search": q_phrase_search,
    "quarantine": q_quarantine,
    "schema_evolution": q_schema_evolution,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "tpch_q18": q_tpch_q18,
    "tpch_q10": q_tpch_q10,
    "ewma_decay": q_ewma_decay,
    "rand_projection": q_rand_projection,
    "benford_digits": q_benford_digits,
    "gini_concentration": q_gini_concentration,
    "bigram_logprob": q_bigram_logprob,
    "bloom_lookup": q_bloom_lookup,
    "count_meta": q_count_meta,
    "funnel_latency": q_funnel_latency,
    "window_share": q_window_share,
    "hourly_growth": q_hourly_growth,
    "skew_report": q_skew_report,
    "cos_histogram": q_cos_histogram,
    "pq_codes": q_pq_codes,
    "lang_top_terms": q_lang_top_terms,
    "session_quantiles": q_session_quantiles,
    # rows-only (non-SQL-expressible)
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "simhash": q_simhash,
    "minhash_pairs": q_minhash_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "embedding_neardup": q_embedding_neardup,
    "ivf_topk": q_ivf_topk,
    "ivf_index_topk": q_ivf_index_topk,
    "media_features": q_media_features,
    "pages_tiers_chunks": q_pages_tiers_chunks,
    "pages_verify": q_pages_verify,
    "irate": q_irate,
    "interpolate_5m": q_interpolate_5m,
    "absent_series": q_absent_series,
    "tpch_q14": q_tpch_q14,
    "canonical_url": q_canonical_url,
    "tpch_q12": q_tpch_q12,
    "lttb_downsample": q_lttb_downsample,
    "locf_5m": q_locf_5m,
    "label_ops": q_label_ops,
    "holt_winters": q_holt_winters,
    "skew_join": q_skew_join,
    "hist_fraction": q_hist_fraction,
    "xrate_5m": q_xrate_5m,
    "max_xrate_1h": q_max_xrate_1h,
    "changes": q_changes,
    "predict_linear": q_predict_linear,
    "autocorr_lag1": q_autocorr_lag1,
    "stddev_1h": q_stddev_1h,
    "seasonal_residual": q_seasonal_residual,
    "weighted_median": q_weighted_median,
    "ks_statistic": q_ks_statistic,
    "chi2_independence": q_chi2_independence,
    "basket_lift": q_basket_lift,
    "isotonic_hourly": q_isotonic_hourly,
    "mannwhitney_u": q_mannwhitney_u,
    "tpch_q6": q_tpch_q6,
    "debounce_events": q_debounce_events,
    "max_concurrency": q_max_concurrency,
    "anova_hod": q_anova_hod,
    "cohens_d": q_cohens_d,
    "media_pure_grid": q_media_pure_grid,
    "audio_pure_rms": q_audio_pure_rms,
    "entropy_rate": q_entropy_rate,
    "longest_streak": q_longest_streak,
})

# TPC-H completion wave (pipelines/relational.py): the remaining canonical
# join plans adapted to this star schema — broadcast/semi/anti joins,
# distinct-count, argmin join-back, and two-pass global-scalar patterns.
from .relational import (  # noqa: E402
    q_tpch_q2,
    q_tpch_q4,
    q_tpch_q7,
    q_tpch_q8,
    q_tpch_q9,
    q_tpch_q11,
    q_tpch_q15,
    q_tpch_q16,
    q_tpch_q17,
    q_tpch_q19,
    q_tpch_q20,
    q_tpch_q21,
    q_tpch_q22,
)

# Session-10 statistics wave (pipelines/stats2.py): census-bounded rank
# correlation, robust slope, changepoint and runs-test analytics.
from .stats2 import (  # noqa: E402
    q_changepoint,
    q_kendall_tau,
    q_runs_test,
    q_spearman_corr,
    q_theil_sen,
)

# Session-10 extras (pipelines/extras.py): pure-video decode, k-hop BFS,
# l-diversity, interpolated quantiles, exact mode.
from .extras import (  # noqa: E402
    q_adamic_adar,
    q_attribution,
    q_cramers_v,
    q_cross_corr,
    q_fano_factor,
    q_jackknife_se,
    q_kaplan_meier,
    q_linreg_2f,
    q_media_equalize,
    q_ndcg_at_k,
    q_readability,
    q_sax_words,
    q_t_closeness,
    q_khop_reach,
    q_l_diversity,
    q_mean_family,
    q_mode_value,
    q_mutual_information,
    q_quantile_cont,
    q_skew_kurtosis,
    q_video_pure_frames,
    q_welch_t,
)

QUERIES.update({
    "t_closeness": q_t_closeness,
    "adamic_adar": q_adamic_adar,
    "readability": q_readability,
    "ndcg_at_k": q_ndcg_at_k,
    "sax_words": q_sax_words,
    "media_equalize": q_media_equalize,
    "attribution": q_attribution,
    "fano_factor": q_fano_factor,
    "kaplan_meier": q_kaplan_meier,
    "linreg_2f": q_linreg_2f,
    "cramers_v": q_cramers_v,
    "mutual_information": q_mutual_information,
    "jackknife_se": q_jackknife_se,
    "welch_t": q_welch_t,
    "skew_kurtosis": q_skew_kurtosis,
    "mean_family": q_mean_family,
    "cross_corr": q_cross_corr,
    "tpch_q20": q_tpch_q20,
    "video_pure_frames": q_video_pure_frames,
    "khop_reach": q_khop_reach,
    "l_diversity": q_l_diversity,
    "quantile_cont": q_quantile_cont,
    "mode_value": q_mode_value,
    "spearman_corr": q_spearman_corr,
    "kendall_tau": q_kendall_tau,
    "theil_sen": q_theil_sen,
    "changepoint": q_changepoint,
    "runs_test": q_runs_test,
    "tpch_q2": q_tpch_q2,
    "tpch_q4": q_tpch_q4,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q11": q_tpch_q11,
    "tpch_q15": q_tpch_q15,
    "tpch_q16": q_tpch_q16,
    "tpch_q17": q_tpch_q17,
    "tpch_q19": q_tpch_q19,
    "tpch_q21": q_tpch_q21,
    "tpch_q22": q_tpch_q22,
})


ORACLE_SQL.update({
    "pivot_events": """
        SELECT user_id,
            """ + ", ".join(
                f"CAST(count(*) FILTER (WHERE event_type = '{c}') AS BIGINT)"
                f" AS n_{c}, "
                f"round(coalesce(sum(value) FILTER (WHERE event_type = '{c}'),"
                f" 0), 4) AS v_{c}"
                for c in _PIVOT_CATS
            ) + """
        FROM events GROUP BY user_id
    """,
    "funnel": """
        WITH s1 AS (SELECT CAST(user_id AS BIGINT) AS u,
                           min(epoch_ms(ts)) AS t
                    FROM events WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT CAST(e.user_id AS BIGINT) AS u,
                      min(epoch_ms(e.ts)) AS t
               FROM events e JOIN s1 ON CAST(e.user_id AS BIGINT) = s1.u
               WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s1.t
               GROUP BY 1),
        s3 AS (SELECT CAST(e.user_id AS BIGINT) AS u,
                      min(epoch_ms(e.ts)) AS t
               FROM events e JOIN s2 ON CAST(e.user_id AS BIGINT) = s2.u
               WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s2.t
               GROUP BY 1)
        SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name,
               CAST(count(*) AS BIGINT) AS n_users FROM s1
        UNION ALL SELECT CAST(2 AS BIGINT), 'click',
               CAST(count(*) AS BIGINT) FROM s2
        UNION ALL SELECT CAST(3 AS BIGINT), 'purchase',
               CAST(count(*) AS BIGINT) FROM s3
    """,
    "corr_hour": """
        WITH s AS (SELECT event_type,
                          (epoch_ms(ts) // 3600000) % 24 AS x,
                          CAST(value * 100 AS BIGINT) AS y
                   FROM events),
        a AS (SELECT event_type, count(*) AS n,
                     sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                     sum(x * x) AS sxx, sum(y * y) AS syy
              FROM s GROUP BY 1)
        SELECT event_type,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 8)
                   AS corr_hv
        FROM a WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    "string_agg": """
        SELECT CAST(user_id AS BIGINT) AS user_id,
               string_agg(event_type, ','
                          ORDER BY epoch_ms(ts), event_type) AS type_seq
        FROM events GROUP BY 1
    """,
    "audience_overlap": """
        WITH d AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u, event_type
                   FROM events),
        sz AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1),
        iv AS (SELECT a.event_type AS ta, b.event_type AS tb,
                      count(*) AS inter
               FROM d a JOIN d b ON a.u = b.u
                    AND a.event_type < b.event_type
               GROUP BY 1, 2)
        SELECT iv.ta, iv.tb, iv.inter,
               round(CAST(iv.inter AS DOUBLE)
                     / CAST(sa.n + sb.n - iv.inter AS DOUBLE), 8) AS jaccard
        FROM iv JOIN sz sa ON iv.ta = sa.event_type
                JOIN sz sb ON iv.tb = sb.event_type
    """,
    "char_entropy": """
        WITH ch AS (SELECT doc_id, unnest(str_split_regex(text, '')) AS c
                    FROM documents WHERE length(text) > 0)
        SELECT doc_id, round(entropy(c), 6) AS h FROM ch GROUP BY 1
    """,
    "mad_outliers": """
        WITH s AS (SELECT event_type, CAST(value * 100 AS BIGINT) AS cval
                   FROM events),
        m AS (SELECT event_type, median(cval) AS med, mad(cval) AS madv
              FROM s GROUP BY 1)
        SELECT s.event_type,
               count(*) FILTER (WHERE abs(s.cval - m.med) > 3 * m.madv)
                   AS n_outliers,
               count(*) AS n_total
        FROM s JOIN m USING (event_type) GROUP BY 1
    """,
    "first_last": """
        WITH r AS (
          SELECT event_type, CAST(user_id AS BIGINT) AS user_id, value,
                 row_number() OVER (PARTITION BY event_type, user_id
                                    ORDER BY ts, event_id) AS ra,
                 row_number() OVER (PARTITION BY event_type, user_id
                                    ORDER BY ts DESC, event_id DESC) AS rd
          FROM events)
        SELECT event_type, user_id,
               max(CASE WHEN ra = 1 THEN value END) AS first_v,
               max(CASE WHEN rd = 1 THEN value END) AS last_v
        FROM r GROUP BY 1, 2
    """,
    "dense_rank": """
        SELECT event_type, CAST(event_id AS BIGINT) AS event_id,
               dense_rank() OVER (PARTITION BY event_type
                                  ORDER BY CAST(floor(value) AS BIGINT)) AS dr
        FROM events
    """,
    "srs_sample": """
        SELECT doc_id, lang FROM documents
        ORDER BY (doc_id * 48271) % 2147483647, doc_id LIMIT 100
    """,
    "oov_rate": """
        WITH tok AS (SELECT doc_id,
                            lower(unnest(regexp_extract_all(text, '[A-Za-z]+')))
                                AS tok
                     FROM documents),
        vocab AS (SELECT tok FROM (
                    SELECT tok, count(DISTINCT doc_id) AS df
                    FROM tok GROUP BY 1)
                  ORDER BY df DESC, tok LIMIT 100)
        SELECT d.doc_id,
               CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(t.n_oov, 0) AS BIGINT) AS n_oov
        FROM documents d LEFT JOIN (
          SELECT doc_id, count(*) AS n_tokens,
                 count(*) FILTER (WHERE tok NOT IN (SELECT tok FROM vocab))
                     AS n_oov
          FROM tok GROUP BY 1) t USING (doc_id)
    """,
    "cluster_sizes": """
        WITH RECURSIVE
        e1 AS (SELECT min(doc_id) OVER (PARTITION BY lang, n_chars) AS a,
                      doc_id AS b FROM documents),
        e2 AS (SELECT min(doc_id) OVER (PARTITION BY source, n_chars) AS a,
                      doc_id AS b FROM documents),
        ed AS (SELECT a, b FROM e1 WHERE a <> b
               UNION SELECT a, b FROM e2 WHERE a <> b),
        bi AS (SELECT a, b FROM ed UNION SELECT b AS a, a AS b FROM ed),
        reach(node, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT bi.b, reach.r FROM reach JOIN bi ON bi.a = reach.node
        ),
        comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
        SELECT size, count(*) AS n_components FROM (
          SELECT component, count(*) AS size FROM comp GROUP BY 1)
        GROUP BY 1
    """,
    "bm25": """
        WITH tok AS (SELECT doc_id,
                            lower(unnest(regexp_extract_all(text, '[A-Za-z]+')))
                                AS tok
                     FROM documents),
        dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
               FROM tok GROUP BY 1),
        c AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n,
                     (SELECT CAST(count(*) AS DOUBLE) FROM tok)
                         / (SELECT CAST(count(*) AS DOUBLE) FROM documents)
                         AS avgdl),
        tf AS (SELECT doc_id,
                      CAST(count(*) FILTER (WHERE tok = 'hash') AS DOUBLE) AS t0,
                      CAST(count(*) FILTER (WHERE tok = 'join') AS DOUBLE) AS t1,
                      CAST(count(*) FILTER (WHERE tok = 'window') AS DOUBLE) AS t2,
                      CAST(count(*) FILTER (WHERE tok = 'stream') AS DOUBLE) AS t3
               FROM tok GROUP BY 1),
        df AS (SELECT
                 CAST(count(*) FILTER (WHERE t0 > 0) AS DOUBLE) AS d0,
                 CAST(count(*) FILTER (WHERE t1 > 0) AS DOUBLE) AS d1,
                 CAST(count(*) FILTER (WHERE t2 > 0) AS DOUBLE) AS d2,
                 CAST(count(*) FILTER (WHERE t3 > 0) AS DOUBLE) AS d3
               FROM tf),
        idf AS (SELECT
                  floor(ln((c.n - df.d0 + 0.5) / (df.d0 + 0.5) + 1) * 1e6) / 1e6 AS i0,
                  floor(ln((c.n - df.d1 + 0.5) / (df.d1 + 0.5) + 1) * 1e6) / 1e6 AS i1,
                  floor(ln((c.n - df.d2 + 0.5) / (df.d2 + 0.5) + 1) * 1e6) / 1e6 AS i2,
                  floor(ln((c.n - df.d3 + 0.5) / (df.d3 + 0.5) + 1) * 1e6) / 1e6 AS i3,
                  c.avgdl AS avgdl
                FROM df, c)
        SELECT tf.doc_id,
               round(  idf.i0 * (tf.t0 * 2.2) / (tf.t0 + 1.2 * (1 - 0.75 + 0.75 * (dl.dl / idf.avgdl)))
                     + idf.i1 * (tf.t1 * 2.2) / (tf.t1 + 1.2 * (1 - 0.75 + 0.75 * (dl.dl / idf.avgdl)))
                     + idf.i2 * (tf.t2 * 2.2) / (tf.t2 + 1.2 * (1 - 0.75 + 0.75 * (dl.dl / idf.avgdl)))
                     + idf.i3 * (tf.t3 * 2.2) / (tf.t3 + 1.2 * (1 - 0.75 + 0.75 * (dl.dl / idf.avgdl)))
                     , 6) AS score
        FROM tf JOIN dl USING (doc_id) CROSS JOIN idf
        WHERE tf.t0 + tf.t1 + tf.t2 + tf.t3 > 0
    """,
    "resets": """
        WITH o AS (SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
                          value,
                          lag(value) OVER (PARTITION BY event_type, user_id
                                           ORDER BY ts, event_id) AS prev
                   FROM events)
        SELECT event_type, user_id,
               CAST(count(*) FILTER (WHERE value < prev) AS BIGINT) AS n_resets
        FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
    """,
    "triangles": """
        WITH d AS (SELECT doc_id, lang, source, n_chars // 100 AS cb
                   FROM documents),
        m1 AS (SELECT lang, cb, min(doc_id) AS a FROM d GROUP BY 1, 2),
        e1 AS (SELECT m1.a, d.doc_id AS b FROM d JOIN m1 USING (lang, cb)
               WHERE d.doc_id != m1.a),
        m2 AS (SELECT source, cb, min(doc_id) AS a FROM d GROUP BY 1, 2),
        e2 AS (SELECT m2.a, d.doc_id AS b FROM d JOIN m2 USING (source, cb)
               WHERE d.doc_id != m2.a),
        e AS (SELECT DISTINCT a, b
              FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2))
        SELECT count(*) AS n_triangles
        FROM e ab JOIN e bc ON ab.b = bc.a
                  JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
    """,
    "scd2_intervals": """
        SELECT CAST(user_id AS BIGINT) AS user_id, value,
               epoch_ms(ts) AS valid_from,
               lead(epoch_ms(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS valid_to
        FROM events
    """,
    "dataset_split": """
        WITH s AS (
          SELECT lang, n_chars,
                 CASE WHEN ((doc_id * 48271) % 2147483647) % 100 < 80
                          THEN 'train'
                      WHEN ((doc_id * 48271) % 2147483647) % 100 < 90
                          THEN 'val'
                      ELSE 'test' END AS split
          FROM documents)
        SELECT split, lang, count(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM s GROUP BY 1, 2
    """,
    "ohlc_1h": """
        WITH r AS (
          SELECT event_type,
                 (epoch_ms(ts) // 3600000) * 3600000 AS w, value,
                 row_number() OVER (PARTITION BY event_type,
                                        epoch_ms(ts) // 3600000
                                    ORDER BY ts, event_id) AS ra,
                 row_number() OVER (PARTITION BY event_type,
                                        epoch_ms(ts) // 3600000
                                    ORDER BY ts DESC, event_id DESC) AS rd
          FROM events)
        SELECT event_type, w,
               max(CASE WHEN ra = 1 THEN value END) AS open,
               max(value) AS high, min(value) AS low,
               max(CASE WHEN rd = 1 THEN value END) AS close
        FROM r GROUP BY 1, 2
    """,
    "peak_hour": """
        WITH c AS (SELECT event_type,
                          (epoch_ms(ts) // 3600000) % 24 AS hour,
                          count(*) AS n
                   FROM events GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                           ORDER BY n DESC, hour) AS rn
              FROM c)
        SELECT event_type, hour, n FROM r WHERE rn = 1
    """,
    "winsorized": """
        WITH s AS (SELECT event_type, CAST(value * 100 AS BIGINT) AS cval
                   FROM events),
        q AS (SELECT event_type,
                     quantile_disc(cval, 0.1) AS qlo,
                     quantile_disc(cval, 0.9) AS qhi
              FROM s GROUP BY 1)
        SELECT s.event_type, count(*) AS n,
               (CAST(SUM(LEAST(GREATEST(s.cval, q.qlo), q.qhi)) AS DOUBLE)
                / 100.0) / count(*) AS w_mean
        FROM s JOIN q USING (event_type) GROUP BY 1
    """,
    "cdc_merge": """
        WITH s AS (SELECT CAST(user_id AS BIGINT) AS user_id,
                          epoch_ms(ts) * 1048576 + event_id % 1048576
                              AS okey,
                          event_type = 'purchase' AS is_del,
                          value
                   FROM events),
        r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY okey DESC) AS rn
              FROM s)
        SELECT user_id, value AS last_value FROM r
        WHERE rn = 1 AND NOT is_del
    """,
    "share_of_type": """
        WITH c AS (SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
                          count(*) AS n
                   FROM events GROUP BY 1, 2)
        SELECT event_type, user_id, n,
               CAST(n AS DOUBLE)
                   / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE)
                   AS share
        FROM c
    """,
    "cluster_keep_best": """
        WITH RECURSIVE
        e1 AS (SELECT min(doc_id) OVER (PARTITION BY lang, n_chars) AS a,
                      doc_id AS b FROM documents),
        e2 AS (SELECT min(doc_id) OVER (PARTITION BY source, n_chars) AS a,
                      doc_id AS b FROM documents),
        ed AS (SELECT a, b FROM e1 WHERE a <> b
               UNION SELECT a, b FROM e2 WHERE a <> b),
        bi AS (SELECT a, b FROM ed UNION SELECT b AS a, a AS b FROM ed),
        reach(node, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT bi.b, reach.r FROM reach JOIN bi ON bi.a = reach.node
        ),
        comp AS (SELECT node AS doc_id, min(r) AS component
                 FROM reach GROUP BY node),
        j AS (SELECT c.component, d.doc_id, CAST(d.n_chars AS BIGINT)
                       AS n_chars
              FROM comp c JOIN documents d ON c.doc_id = d.doc_id)
        SELECT component, doc_id AS keep_doc, n_chars AS keep_chars
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY component
                  ORDER BY n_chars DESC, doc_id) AS rn FROM j)
        WHERE rn = 1
    """,
    "global_quantiles": """
        WITH s AS (SELECT CAST(value * 100 AS BIGINT) AS cval FROM events)
        SELECT q, v FROM (
            SELECT CAST(0.5 AS DOUBLE) AS q,
                   quantile_disc(cval, 0.5) / 100.0 AS v FROM s
            UNION ALL
            SELECT CAST(0.9 AS DOUBLE), quantile_disc(cval, 0.9) / 100.0 FROM s
            UNION ALL
            SELECT CAST(0.99 AS DOUBLE), quantile_disc(cval, 0.99) / 100.0 FROM s
        )
    """,
    "weekly_active": """
        WITH d AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
                          epoch_ms(ts) // 86400000 AS day FROM events),
        days AS (SELECT DISTINCT day AS d0 FROM d)
        SELECT d0, CAST(count(DISTINCT u) AS BIGINT) AS n_active
        FROM days JOIN d ON d.day BETWEEN days.d0 - 6 AND days.d0
        GROUP BY 1
    """,
    "unigram_logprob": f"""
        WITH toks AS ({_SQL_TOKS}),
        ex AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
        c AS (SELECT tok, count(*) AS n FROM ex GROUP BY 1),
        tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM c)
        SELECT e.doc_id, round(-avg(ln(c.n / tot.t)), 6) AS nll
        FROM ex e JOIN c ON e.tok = c.tok CROSS JOIN tot
        GROUP BY 1
    """,
    "watermark_window": """
        WITH o AS (SELECT event_type, epoch_ms(ts) AS tms,
                          (event_id // 16) * 16 + (event_id % 16 * 5) % 16
                              AS aid,
                          max(epoch_ms(ts)) OVER (
                              ORDER BY (event_id // 16) * 16
                                       + (event_id % 16 * 5) % 16
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS wm
                   FROM events)
        SELECT event_type, (tms // 300000) * 300000 AS window_start,
               count(*) AS n_kept
        FROM o WHERE wm IS NULL OR tms >= wm - 1800000
        GROUP BY 1, 2
    """,
    "transitions": """
        WITH o AS (SELECT CAST(user_id AS BIGINT) AS u, event_type,
                          lead(event_type) OVER (
                              PARTITION BY user_id
                              ORDER BY epoch_ms(ts), event_type, event_id
                          ) AS nxt
                   FROM events)
        SELECT event_type AS from_state, nxt AS to_state,
               count(*) AS n_pairs
        FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
    """,
    "impute_median": """
        WITH s AS (SELECT event_type,
                          CASE WHEN value < 5 THEN NULL
                               ELSE CAST(value * 100 AS BIGINT) END AS cval
                   FROM events)
        SELECT event_type, CAST(cval AS DOUBLE) AS cval,
               coalesce(CAST(cval AS DOUBLE),
                        quantile_cont(cval, 0.5)
                            OVER (PARTITION BY event_type)) / 100.0
                   AS imputed
        FROM s
    """,
    "edit_distance_pairs": """
        WITH k AS (SELECT doc_id, substr(text, 1, 32) AS key FROM documents)
        SELECT a.doc_id AS a, b.doc_id AS b,
               CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
        FROM k a JOIN k b ON a.doc_id < b.doc_id
        WHERE levenshtein(a.key, b.key) <= 2
    """,
    "robust_stats": """
        WITH s AS (SELECT event_type, CAST(value * 100 AS BIGINT) AS cval
                   FROM events)
        SELECT event_type,
               median(cval) / 100.0 AS med_v,
               mad(cval) / 100.0 AS mad_v
        FROM s GROUP BY 1
    """,
    "cooccurrence": """
        WITH d AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u, event_type
                   FROM events)
        SELECT a.event_type AS ta, b.event_type AS tb,
               count(*) AS n_users
        FROM d a JOIN d b ON a.u = b.u AND a.event_type < b.event_type
        GROUP BY 1, 2
    """,
    "full_join": """
        WITH s AS (SELECT CAST(user_id AS BIGINT) AS user_id,
                          count(*) AS n_signup
                   FROM events WHERE event_type = 'signup' GROUP BY 1),
        p AS (SELECT CAST(user_id AS BIGINT) AS user_id_r,
                     count(*) AS n_purchase
              FROM events WHERE event_type = 'purchase' GROUP BY 1)
        SELECT s.user_id, s.n_signup, p.user_id_r, p.n_purchase
        FROM s FULL JOIN p ON s.user_id = p.user_id_r
    """,
    "rolling_median": """
        WITH s AS (SELECT CAST(user_id AS BIGINT) AS user_id,
                          epoch_ms(ts) AS tms,
                          CAST(value * 100 AS BIGINT) AS cval
                   FROM events)
        SELECT user_id, tms, cval,
               quantile_cont(cval, 0.5) OVER (
                   PARTITION BY user_id ORDER BY tms, cval
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 100.0 AS med5
        FROM s
    """,
    "knn_join": f"""
        WITH s AS (SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
                          list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                 CAST(b.embedding AS DOUBLE[]))
                            AS sim
                   FROM embeddings a JOIN embeddings b
                     ON a.vec_id <> b.vec_id),
        r AS (SELECT vec_id, nn_id, sim,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, nn_id) - 1 AS rank
              FROM s)
        SELECT vec_id, nn_id, rank, round(sim, 6) AS cosine
        FROM r WHERE rank < {KNN_K}
    """,
    "profile_docs": """
        """ + " UNION ALL ".join(
            f"SELECT '{c}' AS \"column\","
            f" CAST(count({c}) AS BIGINT) AS n_nonnull,"
            f" CAST(count(*) - count({c}) AS BIGINT) AS n_null,"
            f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct"
            f" FROM documents"
            for c in _PROFILE_COLS
        ) + """
    """,
    "unpivot_events": """
        SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    """,
    "except_users": """
        SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id,
               epoch_ms(ts) // 86400000 AS day
        FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id,
               epoch_ms(ts) // 86400000 AS day
        FROM events WHERE event_type = 'purchase'
    """,
    "cohort_retention": """
        WITH a AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
                          epoch_ms(ts) // 86400000 AS day
                   FROM events),
        c AS (SELECT u, min(day) AS cohort FROM a GROUP BY 1)
        SELECT c.cohort * 86400000 AS cohort_start,
               CAST(a.day - c.cohort AS BIGINT) AS offset_days,
               CAST(count(*) AS BIGINT) AS n_users
        FROM a JOIN c USING (u)
        GROUP BY 1, 2
    """,
    "lag_value": """
        SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
               epoch_ms(ts) AS tms, CAST(event_id AS BIGINT) AS event_id,
               value,
               lag(value) OVER (PARTITION BY event_type, user_id
                                ORDER BY ts, event_id) AS prev
        FROM events
        QUALIFY prev IS NOT NULL
    """,
    "heavy_users": """
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
        ORDER BY n DESC, user_id LIMIT 10
    """,
    "merge_intervals": """
        WITH iv AS (SELECT CAST(user_id AS BIGINT) AS user_id,
                           epoch_ms(ts) AS s,
                           epoch_ms(ts) + (event_id % 7 + 1) * 60000 AS e
                    FROM events),
        o AS (SELECT user_id, s, e,
                     max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS pm
              FROM iv),
        g AS (SELECT *, sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS UNBOUNDED PRECEDING) AS grp
              FROM o)
        SELECT user_id, min(s) AS start, max(e) AS "end",
               CAST(count(*) AS BIGINT) AS n_intervals
        FROM g GROUP BY user_id, grp
    """,
    "ntile": """
        SELECT event_type, value, event_id,
               CAST(ntile(7) OVER (
                   PARTITION BY event_type
                   ORDER BY value, event_id) AS BIGINT) AS tile
        FROM events
    """,
    "zscore": """
        WITH s AS (SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
                          CAST(event_id AS BIGINT) AS event_id,
                          CAST(round(value, 4) * 10000 AS BIGINT) AS vm
                   FROM events),
        a AS (SELECT event_type, user_id, count(*) AS n, sum(vm) AS sy,
                     sum(vm * vm) AS syy
              FROM s GROUP BY 1, 2)
        SELECT s.event_type, s.user_id, s.event_id, s.vm,
               round((CAST(s.vm AS DOUBLE) - CAST(a.sy AS DOUBLE) / a.n)
                     / sqrt(CAST(a.n * a.syy - a.sy * a.sy AS DOUBLE)
                            / (CAST(a.n AS DOUBLE) * a.n)), 6) AS z
        FROM s JOIN a USING (event_type, user_id)
        WHERE a.n * a.syy - a.sy * a.sy > 0
    """,
    "bloom_semi": """
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(user_id AS BIGINT) AS user_id
        FROM events
        WHERE user_id IN (SELECT user_id FROM events
                          WHERE event_type = 'purchase')
    """,
    "twa_5m": """
        WITH s AS (SELECT event_type, epoch_ms(ts) AS tms, event_id,
                          CAST(round(value, 4) * 10000 AS BIGINT) AS vm
                   FROM events),
        w AS (SELECT event_type, tms, vm,
                     (tms // 300000) * 300000 AS window_start,
                     lead(tms) OVER (PARTITION BY event_type
                                     ORDER BY tms, event_id) AS nxt
              FROM s),
        d AS (SELECT event_type, window_start, vm,
                     CASE WHEN nxt IS NOT NULL
                               AND (nxt // 300000) * 300000 = window_start
                          THEN nxt - tms
                          ELSE window_start + 300000 - tms END AS dur
              FROM w)
        SELECT event_type, window_start,
               CAST(count(*) AS BIGINT) AS n_samples,
               CAST(sum(vm * dur) AS DOUBLE) / CAST(sum(dur) AS DOUBLE)
                   AS twa_m
        FROM d GROUP BY 1, 2
    """,
    "percent_rank": """
        SELECT event_type, value, event_id,
               percent_rank() OVER (
                   PARTITION BY event_type ORDER BY value) AS pr
        FROM events
    """,
    "cube_docs": """
        SELECT coalesce(lang, '(all)') AS lang,
               coalesce(source, '(all)') AS source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY CUBE(lang, source)
    """,
    "trend_slope": """
        WITH s AS (SELECT event_type, user_id,
                          epoch_ms(ts) // 3600000 - 473000 AS x,
                          CAST(round(value, 4) * 10000 AS BIGINT) AS y
                   FROM events),
        a AS (SELECT event_type, user_id, count(*) AS n,
                     sum(x) AS sx, sum(y) AS sy,
                     sum(x * y) AS sxy, sum(x * x) AS sxx
              FROM s GROUP BY 1, 2)
        SELECT event_type, user_id,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 8) AS slope_m
        FROM a WHERE n * sxx - sx * sx <> 0
    """,
    "repetition": f"""
        WITH toks AS ({_SQL_TOKS}),
        g AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                     i -> tk[i] || chr(1) || tk[i+1])) AS gram FROM toks),
        gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
        gm AS (SELECT doc_id, max(c) AS mx FROM gc GROUP BY 1)
        SELECT t.doc_id,
               CAST(len(t.tk) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(t.tk)) AS BIGINT) AS n_distinct_tokens,
               CAST(coalesce(gm.mx, 0) AS BIGINT) AS max_gram2_count
        FROM toks t LEFT JOIN gm ON t.doc_id = gm.doc_id
    """,
    "decontaminate": f"""
        WITH toks AS ({_SQL_TOKS}),
        grams AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 2),
                        i -> tk[i] || chr(1) || tk[i+1] || chr(1) || tk[i+2]
                             || chr(1) || tk[i+3])) AS g FROM toks),
        bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 53 = 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams
        FROM grams WHERE doc_id % 53 <> 0 AND g IN (SELECT g FROM bench)
        GROUP BY 1
    """,
    "stratified_sample": """
        SELECT doc_id, lang, (doc_id * 48271) % 2147483647 AS rank
        FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY lang
            ORDER BY (doc_id * 48271) % 2147483647, doc_id) <= 5
    """,
    "normalize_text": r"""
        WITH n AS (SELECT doc_id,
                          trim(regexp_replace(lower(nfc_normalize(text)),
                               '[ \t\r\n]+', ' ', 'g'), ' ') AS norm_text
                   FROM documents)
        SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS n_chars_norm
        FROM n
    """,
    "chunk_docs": """
        WITH c AS (SELECT doc_id, text,
                          unnest(range(0, CAST(ceil(len(text) / 120.0) AS BIGINT)))
                          AS chunk_idx
                   FROM documents)
        SELECT doc_id, chunk_idx,
               substr(text, CAST(chunk_idx * 120 + 1 AS BIGINT), 120) AS chunk_text
        FROM c
    """,
    "pack_sequences": f"""
        WITH t AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok
                   FROM ({_SQL_TOKS})),
        c AS (SELECT doc_id, n_tok,
                     coalesce(sum(n_tok) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS before FROM t)
        SELECT CAST(before // 256 AS BIGINT) AS seq_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM c GROUP BY 1
    """,
    "mix_sources": """
        WITH k AS (
            SELECT source, doc_id FROM documents
            WHERE ((doc_id * 48271) % 2147483647) * 10 <
                  CAST(CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
                            THEN 8 ELSE 3 END AS BIGINT) * 2147483647
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        FROM k GROUP BY 1
    """,
    "event_rank": """
        SELECT event_type, value, event_id,
               CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn
        FROM events
    """,
    "lang_quartile_filter": f"""
        WITH toks AS ({_SQL_TOKS}),
        t AS (SELECT d.lang, CAST(len(tk.tk) AS BIGINT) AS n_tokens
              FROM documents d JOIN toks tk ON d.doc_id = tk.doc_id),
        th AS (SELECT lang, CAST(quantile_disc(n_tokens, 0.25) AS BIGINT)
                      AS p25 FROM t GROUP BY 1)
        SELECT t.lang, th.p25,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(t.n_tokens) AS BIGINT) AS sum_tokens_kept
        FROM t JOIN th USING (lang)
        WHERE t.n_tokens >= th.p25 GROUP BY 1, 2
    """,
    "shuffle_order": """
        SELECT doc_id, (doc_id * 48271) % 2147483647 AS rank,
               CAST(row_number() OVER (
                   ORDER BY (doc_id * 48271) % 2147483647) - 1 AS BIGINT) AS pos
        FROM documents
    """,
    "redact_pii": r"""
        SELECT CAST(event_id AS BIGINT) AS event_id,
               regexp_replace(regexp_replace(regexp_replace(props,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                   '[0-9]+', '<NUM>', 'g') AS red_props,
               CAST(len(regexp_extract_all(props,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                  + len(regexp_extract_all(props,
                        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                  + len(regexp_extract_all(props, '[0-9]+'))
                  AS BIGINT) AS n_redactions
        FROM events
    """,
    "dup_grams": f"""
        WITH toks AS ({_SQL_TOKS}),
        g0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
                     i -> tk[i] || chr(1) || tk[i+1] || chr(1) || tk[i+2]))
                     AS g FROM toks),
        g AS (SELECT DISTINCT doc_id, g FROM g0),
        df AS (SELECT g, count(*) AS c FROM g GROUP BY 1)
        SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN df.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_grams
        FROM g JOIN df USING (g) GROUP BY 1
    """,
    "increase_5m": """
        WITH e AS (SELECT event_type, epoch_ms(ts) AS tms, value,
                          lag(value) OVER (
                              PARTITION BY event_type
                              ORDER BY ts, event_id) AS prev
                   FROM events)
        SELECT event_type, (tms // 300000) * 300000 AS window_start,
               CAST(count(*) AS BIGINT) AS n_deltas,
               round(sum(CASE WHEN value >= prev THEN value - prev
                              ELSE value END), 4) AS increase
        FROM e WHERE prev IS NOT NULL GROUP BY 1, 2
    """,
    "running_total": """
        WITH e AS (SELECT event_type, ts, event_id,
                          CAST(round(value, 4) * 10000 AS BIGINT) AS value_m
                   FROM events)
        SELECT event_type, ts, event_id, value_m,
               CAST(sum(value_m) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_m
        FROM e
    """,
    "curate_summary": r"""
        WITH n AS (SELECT doc_id, lang,
                          trim(regexp_replace(lower(nfc_normalize(text)),
                               '[ \t\r\n]+', ' ', 'g'), ' ') AS t
                   FROM documents),
        toks AS (SELECT doc_id, lang, t,
                        CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
                             ELSE regexp_split_to_array(t, '[ \t\r\n]+') END AS tk
                 FROM n),
        st AS (SELECT doc_id, lang, t,
                      CAST(len(tk) AS BIGINT) AS n_tokens,
                      len(list_distinct(tk)) AS n_distinct
               FROM toks),
        f AS (SELECT * FROM st
              WHERE n_tokens >= 30 AND n_distinct * 3 >= n_tokens),
        d AS (SELECT * FROM f
              QUALIFY row_number() OVER (PARTITION BY t ORDER BY doc_id) = 1)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        FROM d GROUP BY 1
    """,
    "tfidf_topk": """
        WITH tok AS (SELECT doc_id,
                            unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                     FROM documents),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
               FROM tok GROUP BY 1, 2),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        s AS (SELECT tf.doc_id, tf.term, tf.tf,
                     CAST(tf.tf * ((n.n * 1000) // df.df) AS BIGINT) AS score
              FROM tf, df, n WHERE tf.term = df.term)
        SELECT doc_id, term, tf, score FROM s
        QUALIFY row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term) <= 3
    """,
    "centroid_topk": """
        WITH u AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
                          generate_subscripts(embedding, 1) AS i
                   FROM embeddings),
        c AS (SELECT label, i, avg(v) AS cv FROM u GROUP BY 1, 2),
        cn AS (SELECT label, sqrt(sum(cv * cv)) AS cnorm FROM c GROUP BY 1),
        vn AS (SELECT vec_id, sqrt(sum(v * v)) AS vnorm FROM u GROUP BY 1),
        d AS (SELECT u.vec_id, u.label, sum(u.v * c.cv) AS dot
              FROM u JOIN c ON u.label = c.label AND u.i = c.i GROUP BY 1, 2)
        SELECT d.vec_id, CAST(d.label AS BIGINT) AS label,
               round(d.dot / (vn.vnorm * cn.cnorm), 6) AS cosine
        FROM d JOIN vn ON d.vec_id = vn.vec_id JOIN cn ON d.label = cn.label
        QUALIFY row_number() OVER (
            PARTITION BY d.label
            ORDER BY d.dot / (vn.vnorm * cn.cnorm) DESC, d.vec_id) <= 5
    """,
    "props_extract": r"""
        WITH e AS (SELECT event_type,
                          TRY_CAST(regexp_extract(props, '"k":\s*([0-9]+)', 1)
                                   AS BIGINT) AS k
                   FROM events)
        SELECT event_type, CAST(count(k) AS BIGINT) AS n,
               CAST(sum(k) AS BIGINT) AS sum_k,
               min(k) AS min_k, max(k) AS max_k
        FROM e GROUP BY 1
    """,
    "rollup_5m": _ROLLUP_SQL.format(d=MS_5M),
    "rollup_1h": _ROLLUP_SQL.format(d=MS_1H),
    "rollup_1d": _ROLLUP_SQL.format(d=MS_1D),
    "range_discovery": (
        "SELECT min(epoch_ms(ts)) AS min_ts_ms, max(epoch_ms(ts)) AS max_ts_ms, "
        "count(*) AS n FROM events"
    ),
    "filter_matchers": (
        "SELECT event_type, count(*) AS n FROM events "
        "WHERE regexp_matches(event_type, '^(?:click|view)$') GROUP BY 1"
    ),
    "relabel_merge": "SELECT 'all' AS event_type, count(*) AS n FROM events",
    "time_filter": f"""
        SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        FROM events WHERE epoch_ms(ts) >= {T0_MS} AND epoch_ms(ts) < {T1_MS}
        GROUP BY 1
    """,
    "dedup_first": f"""
        SELECT user_id, event_type,
               min(epoch_ms(ts) * {_COMP} + event_id) // {_COMP} AS first_ts_ms,
               min(epoch_ms(ts) * {_COMP} + event_id) % {_COMP} AS first_event_id
        FROM events GROUP BY 1, 2
    """,
    "gapfill_5m": """
        WITH b AS (
          SELECT (min(epoch_ms(ts)) // 300000) * 300000 AS w0,
                 (max(epoch_ms(ts)) // 300000) * 300000 AS w1 FROM events),
        grid AS (
          SELECT t.event_type, g.ws AS window_start
          FROM (SELECT DISTINCT event_type FROM events) t,
               (SELECT unnest(generate_series(w0, w1, 300000)) AS ws FROM b) g),
        c AS (
          SELECT event_type, (epoch_ms(ts) // 300000) * 300000 AS window_start,
                 count(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT g.event_type, g.window_start, coalesce(c.n, 0) AS n
        FROM grid g LEFT JOIN c USING (event_type, window_start)
    """,
    "window_align": """
        WITH b AS (SELECT min(epoch_ms(ts)) AS f, max(epoch_ms(ts)) AS t FROM events)
        SELECT greatest(ws, f) AS window_start_ms,
               least(ws + 3599999, t) AS window_end_ms
        FROM (SELECT f, t, unnest(generate_series((f // 3600000) * 3600000, t, 3600000)) AS ws
              FROM b)
    """,
    "retention": f"""
        WITH r AS (
          SELECT event_type, (epoch_ms(ts) // 300000) * 300000 AS window_start,
                 count(*) AS n, round(sum(value), 4) AS sum_value,
                 min(value) AS min_value, max(value) AS max_value
          FROM events GROUP BY 1, 2)
        SELECT * FROM r
        WHERE window_start >= (SELECT max(window_start) FROM r) - {RETENTION_KEEP_MS}
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               count(*) AS n
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1, 2
    """,
    "top_sources": (
        "SELECT source, count(*) AS n FROM documents GROUP BY 1 "
        "ORDER BY n DESC, source LIMIT 10"
    ),
    "distinct_pairs": "SELECT DISTINCT source, lang FROM documents",
    "sample_mod10": (
        "SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 10 = 0"
    ),
    "docs_stats": """
        SELECT lang, source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM documents GROUP BY 1, 2
    """,
    "token_count": r"""
        SELECT doc_id,
               CASE WHEN trim(text, ' ' || chr(9) || chr(13) || chr(10)) = '' THEN 0
                    ELSE len(regexp_split_to_array(
                         trim(text, ' ' || chr(9) || chr(13) || chr(10)),
                         '[ \t\r\n]+'))
               END AS n_tokens
        FROM documents
    """,
    "token_bpe": r"""
        SELECT doc_id,
               len(regexp_extract_all(text,
                   '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))
                 AS n_bpe_tokens
        FROM documents
    """,
    "quality": r"""
        SELECT doc_id,
               length(text) AS n_chars_text,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
               length(text) - length(replace(text, ' ', '')) AS n_space,
               CASE WHEN trim(text, ' ' || chr(9) || chr(13) || chr(10)) = '' THEN 0
                    ELSE len(regexp_split_to_array(
                         trim(text, ' ' || chr(9) || chr(13) || chr(10)),
                         '[ \t\r\n]+'))
               END AS n_tokens
        FROM documents
    """,
    "exact_dedup": (
        "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"
    ),
    "dedup_rows": """
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
    """,
    "topk_events": f"""
        SELECT event_type, event_id, round(value, 4) AS value FROM (
          SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id) AS rn
          FROM events) WHERE rn <= {TOPK_K}
    """,
    "sessions": f"""
        WITH x AS (SELECT user_id, epoch_ms(ts) AS ms, value FROM events),
        y AS (SELECT user_id, ms, value,
                     CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
                          > {SESSION_GAP_MS} THEN 1 ELSE 0 END AS brk
              FROM x),
        s AS (SELECT user_id, ms, value,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ms
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM y)
        SELECT user_id, min(ms) AS session_start_ms, max(ms) AS session_end_ms,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM s GROUP BY user_id, sid
    """,
    "value_quantiles": """
        SELECT event_type,
               quantile_disc(value, 0.5) AS p50,
               quantile_disc(value, 0.9) AS p90,
               quantile_disc(value, 0.99) AS p99
        FROM events GROUP BY 1
    """,
    "distinct_users": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1
    """,
    "topk_windowed": f"""
        SELECT event_type, window_start, event_id, round(value, 4) AS value FROM (
          SELECT event_type, (epoch_ms(ts) // {MS_1H}) * {MS_1H} AS window_start,
                 event_id, value,
                 row_number() OVER (PARTITION BY event_type, (epoch_ms(ts) // {MS_1H})
                                    ORDER BY value DESC, event_id) AS rn
          FROM events) WHERE rn <= 2
    """,
    "top_user": """
        SELECT event_type, user_id, n FROM (
          SELECT event_type, user_id, count(*) AS n,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY count(*) DESC, user_id) AS rn
          FROM events GROUP BY 1, 2) WHERE rn = 1
    """,
    "dup_clusters": """
        WITH RECURSIVE
        e1 AS (SELECT min(doc_id) OVER (PARTITION BY lang, n_chars) AS a,
                      doc_id AS b FROM documents),
        e2 AS (SELECT min(doc_id) OVER (PARTITION BY source, n_chars) AS a,
                      doc_id AS b FROM documents),
        ed AS (SELECT a, b FROM e1 WHERE a <> b
               UNION SELECT a, b FROM e2 WHERE a <> b),
        bi AS (SELECT a, b FROM ed UNION SELECT b AS a, a AS b FROM ed),
        reach(node, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT bi.b, reach.r FROM reach JOIN bi ON bi.a = reach.node
        )
        SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node
    """,
    "term_df": """
        SELECT term, df FROM (
          SELECT lower(term) AS term, count(DISTINCT doc_id) AS df
          FROM (SELECT doc_id,
                       unnest(regexp_extract_all(text, '[A-Za-z]+')) AS term
                FROM documents)
          GROUP BY 1)
        ORDER BY df DESC, term LIMIT 100
    """,
    "orders_per_nation": """
        SELECT n_name,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
                 AS sum_total,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1
    """,
    "cust_no_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    "ann_topk": f"""
        WITH q AS (SELECT vec_id AS query_idx, embedding AS qe FROM embeddings
                   WHERE vec_id < {N_ANN_QUERIES}),
        s AS (SELECT q.query_idx, e.vec_id,
                     list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])) AS sim
              FROM q CROSS JOIN embeddings e),
        r AS (SELECT query_idx, vec_id,
                     row_number() OVER (PARTITION BY query_idx
                                        ORDER BY sim DESC, vec_id) - 1 AS rank
              FROM s)
        SELECT query_idx, vec_id, rank FROM r WHERE rank < {ANN_K}
    """,
    "cosine_pairs_exact": f"""
        -- CAST to DOUBLE[]: list_cosine_similarity on FLOAT[] computes in
        -- float32 and can flip the 6th rounded decimal vs the engine's
        -- float64 path (observed at sf0.01: one pair off by 1e-6)
        SELECT a.vec_id AS a, b.vec_id AS b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6)
                 AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
              >= {COSINE_PAIRS_THRESHOLD}
    """,
    "hist_5m": """
        SELECT event_type, (epoch_ms(ts) // 300000) * 300000 AS window_start,
               CAST(count(*) FILTER (value <= 50) AS BIGINT) AS le_50,
               CAST(count(*) FILTER (value <= 100) AS BIGINT) AS le_100,
               CAST(count(*) FILTER (value <= 200) AS BIGINT) AS le_200,
               count(*) AS le_inf
        FROM events GROUP BY 1, 2
    """,
    "hist_p90": """
        WITH h AS (
          SELECT event_type, (epoch_ms(ts) // 300000) * 300000 AS window_start,
                 CAST(count(*) FILTER (value <= 50) AS DOUBLE) AS c1,
                 CAST(count(*) FILTER (value <= 100) AS DOUBLE) AS c2,
                 CAST(count(*) FILTER (value <= 200) AS DOUBLE) AS c3,
                 CAST(count(*) AS DOUBLE) AS total
          FROM events GROUP BY 1, 2),
        r AS (SELECT *, 0.9 * total AS rank FROM h)
        SELECT event_type, window_start,
               round(CASE
                 WHEN c1 >= rank THEN 0 + (50 - 0) *
                   (CASE WHEN c1 - 0 <= 0 THEN 0 ELSE (rank - 0) / (c1 - 0) END)
                 WHEN c2 >= rank THEN 50 + (100 - 50) *
                   (CASE WHEN c2 - c1 <= 0 THEN 0 ELSE (rank - c1) / (c2 - c1) END)
                 WHEN c3 >= rank THEN 100 + (200 - 100) *
                   (CASE WHEN c3 - c2 <= 0 THEN 0 ELSE (rank - c2) / (c3 - c2) END)
                 ELSE 200 END, 6) AS q90
        FROM r
    """,
    "sliding_1h": """
        WITH r AS (
          SELECT event_type, (epoch_ms(ts) // 300000) * 300000 AS window_start,
                 count(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT event_type, window_start, n,
               CAST(sum(n) OVER (PARTITION BY event_type ORDER BY window_start
                    RANGE BETWEEN 3599999 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS sliding_n
        FROM r
    """,
    "asof_join": """
        WITH clicks AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
          WHERE event_type = 'click'),
        errors AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events
          WHERE event_type = 'error')
        SELECT c.user_id, c.event_id, c.ts_ms,
               e.ts_ms AS error_ts_ms, e.value AS error_value
        FROM clicks c ASOF JOIN errors e
          ON c.user_id = e.user_id AND c.ts_ms >= e.ts_ms
    """,
    "asof_tolerance": f"""
        WITH clicks AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
          WHERE event_type = 'click'),
        errors AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events
          WHERE event_type = 'error')
        SELECT * FROM (
          SELECT c.user_id, c.event_id, c.ts_ms,
                 e.ts_ms AS error_ts_ms, e.value AS error_value
          FROM clicks c ASOF JOIN errors e
            ON c.user_id = e.user_id AND c.ts_ms >= e.ts_ms)
        WHERE ts_ms - error_ts_ms <= {ASOF_TOL_MS}
    """,
    "zorder_sample": """
        WITH s AS (
          SELECT CAST(event_id AS BIGINT) AS event_id,
                 CAST(user_id AS BIGINT) & 2147483647 AS x,
                 (epoch_ms(ts) // 60000) & 2147483647 AS y
          FROM events),
        a AS (SELECT event_id,
                     (x | (x << 16)) & 281470681808895 AS x1,
                     (y | (y << 16)) & 281470681808895 AS y1
              FROM s),
        b AS (SELECT event_id,
                     (x1 | (x1 << 8)) & 71777214294589695 AS x2,
                     (y1 | (y1 << 8)) & 71777214294589695 AS y2
              FROM a),
        c AS (SELECT event_id,
                     (x2 | (x2 << 4)) & 1085102592571150095 AS x3,
                     (y2 | (y2 << 4)) & 1085102592571150095 AS y3
              FROM b),
        d AS (SELECT event_id,
                     (x3 | (x3 << 2)) & 3689348814741910323 AS x4,
                     (y3 | (y3 << 2)) & 3689348814741910323 AS y4
              FROM c),
        e AS (SELECT event_id,
                     (x4 | (x4 << 1)) & 6148914691236517205 AS xs,
                     (y4 | (y4 << 1)) & 6148914691236517205 AS ys
              FROM d)
        SELECT event_id, xs | (ys << 1) AS morton
        FROM e ORDER BY morton, event_id LIMIT 64
    """,
    "dup_spans": """
        WITH w AS (
          SELECT doc_id, substr(text, 1 + k * 8, 40) AS win
          FROM documents,
               unnest(generate_series(0, (length(text) - 40) // 8)) AS t(k)
          WHERE length(text) >= 40
        ),
        d AS (SELECT win FROM w GROUP BY win
              HAVING count(DISTINCT doc_id) > 1)
        SELECT doc_id, count(*) AS n_windows,
               CAST(count(*) FILTER (WHERE win IN (SELECT win FROM d))
                    AS BIGINT) AS n_dup
        FROM w GROUP BY 1
    """,
    "monthly_rollup": """
        WITH s AS (SELECT event_type,
                          epoch_ms(date_trunc('month', ts)) AS month_ms,
                          CAST(value * 100 AS BIGINT) AS cval
                   FROM events)
        SELECT event_type, month_ms, count(*) AS n,
               CAST(SUM(cval) AS DOUBLE) / 100.0 AS sum_value
        FROM s GROUP BY 1, 2
    """,
    "k_anonymity": """
        SELECT lang, source, count(*) AS n_docs
        FROM documents GROUP BY 1, 2 HAVING count(*) < 5
    """,
    "max_drawdown": """
        WITH s AS (SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
                          ts, event_id,
                          CAST(value * 100 AS BIGINT) AS cval
                   FROM events),
        r AS (SELECT event_type, user_id,
                     max(cval) OVER (PARTITION BY event_type, user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) - cval AS dd
              FROM s)
        SELECT event_type, user_id, max(dd) / 100.0 AS max_dd,
               count(*) AS n
        FROM r GROUP BY 1, 2
    """,
    "cume_dist": """
        SELECT event_type, CAST(event_id AS BIGINT) AS event_id,
               cume_dist() OVER (PARTITION BY event_type
                                 ORDER BY CAST(floor(value) AS BIGINT)) AS cd
        FROM events
    """,
    "slo_burn": """
        WITH w AS (SELECT (epoch_ms(ts) // 300000) * 300000 AS w,
                          count(*) FILTER (WHERE event_type = 'error')
                              AS n_err,
                          count(*) AS n_all
                   FROM events GROUP BY 1)
        SELECT (w // 86400000) * 86400000 AS day,
               CAST(count(*) FILTER (WHERE 10 * n_err > n_all) AS BIGINT)
                   AS n_burn,
               count(*) AS n_windows
        FROM w GROUP BY 1
    """,
    "gap_stats": """
        WITH o AS (SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
                          epoch_ms(ts) - lag(epoch_ms(ts))
                              OVER (PARTITION BY event_type, user_id
                                    ORDER BY ts, event_id) AS gap
                   FROM events)
        SELECT event_type, user_id,
               max(gap) AS max_gap_ms,
               CAST(count(*) FILTER (WHERE gap > 3600000) AS BIGINT)
                   AS n_gaps_1h
        FROM o WHERE gap IS NOT NULL GROUP BY 1, 2
    """,
    "range_join": f"""
        SELECT c.user_id, c.event_id, epoch_ms(c.ts) AS ts_ms,
               e.event_id AS session_id_right
        FROM events c JOIN events e
          ON c.user_id = e.user_id
         AND c.event_type = 'click' AND e.event_type = 'error'
         AND epoch_ms(c.ts) BETWEEN epoch_ms(e.ts)
                                AND epoch_ms(e.ts) + {SESSION_MS}
    """,
    "union_merge": """
        WITH u AS (
          SELECT event_id, event_type FROM events WHERE event_id % 3 IN (0, 1)
          UNION ALL
          SELECT event_id, event_type FROM events WHERE event_id % 3 IN (1, 2))
        SELECT event_type, count(DISTINCT event_id) AS n FROM u GROUP BY 1
    """,
    "pages_rollup_5m": _PAGES_SAMPLES_SQL + """
        SELECT metric, domain, lang,
               (ts_ms // 300000) * 300000 AS window_start,
               count(*) AS agg_count, sum(value) AS agg_sum,
               min(value) AS agg_min, max(value) AS agg_max
        FROM samples GROUP BY 1, 2, 3, 4
    """,
    "pages_verify": _PAGES_SAMPLES_SQL + """
        SELECT count(*) AS "rows", CAST(0 AS BIGINT) AS bad_rows FROM (
          SELECT metric, domain, lang, (ts_ms // 300000) * 300000
          FROM samples GROUP BY 1, 2, 3, 4)
    """,
    "pages_rollup_1h": _PAGES_SAMPLES_SQL + """
        SELECT metric, domain, lang,
               (ts_ms // 3600000) * 3600000 AS window_start,
               count(*) AS agg_count, sum(value) AS agg_sum,
               min(value) AS agg_min, max(value) AS agg_max
        FROM samples GROUP BY 1, 2, 3, 4
    """,
    "irate": """
        WITH s AS (SELECT event_type, epoch_ms(ts) AS tms,
                          CAST(event_id AS BIGINT) AS event_id,
                          CAST(value * 100 AS BIGINT) AS cval,
                          row_number() OVER (
                              PARTITION BY event_type
                              ORDER BY epoch_ms(ts) DESC, event_id ASC) AS rn
                   FROM events),
             p AS (SELECT event_type,
                          max(CASE WHEN rn = 1 THEN tms END) AS t1,
                          max(CASE WHEN rn = 2 THEN tms END) AS t0,
                          max(CASE WHEN rn = 1 THEN cval END) AS c1,
                          max(CASE WHEN rn = 2 THEN cval END) AS c0
                   FROM s WHERE rn <= 2 GROUP BY event_type)
        SELECT event_type, t1 AS last_ts_ms, t1 - t0 AS dt_ms,
               CASE WHEN t1 - t0 != 0
                    THEN CAST(c1 - c0 AS DOUBLE) * 10.0 / CAST(t1 - t0 AS DOUBLE)
               END AS irate_per_s
        FROM p WHERE t0 IS NOT NULL
    """,
    "interpolate_5m": """
        WITH c AS (SELECT event_type,
                          (epoch_ms(ts) // 300000) * 300000 AS window_start,
                          sum(CAST(value * 100 AS BIGINT)) AS cs
                   FROM events GROUP BY 1, 2),
             b AS (SELECT event_type, min(window_start) AS w0,
                          max(window_start) AS w1
                   FROM c GROUP BY 1),
             grid AS (SELECT event_type,
                             unnest(generate_series(w0, w1, 300000))
                                 AS window_start
                      FROM b),
             j AS (SELECT grid.event_type, grid.window_start, c.cs
                   FROM grid LEFT JOIN c USING (event_type, window_start)),
             f AS (SELECT event_type, window_start, cs,
                          last_value(cs IGNORE NULLS) OVER wp AS pc,
                          last_value(CASE WHEN cs IS NOT NULL
                                          THEN window_start END IGNORE NULLS)
                              OVER wp AS pw,
                          first_value(cs IGNORE NULLS) OVER wn AS nc,
                          first_value(CASE WHEN cs IS NOT NULL
                                           THEN window_start END IGNORE NULLS)
                              OVER wn AS nw
                   FROM j
                   WINDOW wp AS (PARTITION BY event_type ORDER BY window_start
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                          wn AS (PARTITION BY event_type ORDER BY window_start
                                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT event_type, window_start,
               CASE WHEN cs IS NOT NULL THEN CAST(cs AS DOUBLE) / 100.0
                    ELSE (CAST(pc AS DOUBLE)
                          + CAST((nc - pc) * (window_start - pw) AS DOUBLE)
                            / CAST(nw - pw AS DOUBLE)) / 100.0
               END AS sum_value,
               CASE WHEN cs IS NULL THEN 1 ELSE 0 END AS is_interp
        FROM f
    """,
    "absent_series": """
        WITH c AS (SELECT event_type,
                          (epoch_ms(ts) // 3600000) * 3600000 AS window_start,
                          count(*) AS n
                   FROM events GROUP BY 1, 2),
             b AS (SELECT min(window_start) AS w0, max(window_start) AS w1 FROM c),
             t AS (SELECT DISTINCT event_type FROM c),
             grid AS (SELECT t.event_type,
                             unnest(generate_series(b.w0, b.w1, 3600000))
                                 AS window_start
                      FROM t, b)
        SELECT grid.event_type, grid.window_start
        FROM grid LEFT JOIN c USING (event_type, window_start)
        WHERE c.n IS NULL
    """,
    "tpch_q14": """
        WITH l AS (SELECT epoch_ms(date_trunc('month', li.l_shipdate)) AS month_ms,
                          CAST(li.l_extendedprice * 100 AS BIGINT)
                          * (100 - CAST(li.l_discount * 100 AS BIGINT)) AS rev_u,
                          p.p_type = 'PROMO' AS promo
                   FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey)
        SELECT month_ms,
               CAST(sum(CASE WHEN promo THEN rev_u ELSE 0 END) AS BIGINT)
                   AS promo_rev_u,
               CAST(sum(rev_u) AS BIGINT) AS total_rev_u,
               (100.0 * CAST(sum(CASE WHEN promo THEN rev_u ELSE 0 END) AS DOUBLE))
                   / CAST(sum(rev_u) AS DOUBLE) AS promo_pct
        FROM l GROUP BY 1
    """,
    "canonical_url": """
        SELECT doc_id,
               lower(source) || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
                   AS url_canon,
               CAST(5 AS BIGINT) AS n_variants
        FROM documents WHERE doc_id % 7 = 0
    """,
    "max_xrate_1h": """
        WITH x AS (
            WITH s AS (SELECT event_type, epoch_ms(ts) AS tms,
                              CAST(value * 100 AS BIGINT) AS cv,
                              (epoch_ms(ts) // 300000) * 300000 AS w,
                              lag(CAST(value * 100 AS BIGINT)) OVER wsa AS prev,
                              row_number() OVER wsa AS rn
                       FROM events
                       WINDOW wsa AS (
                           PARTITION BY event_type,
                                        (epoch_ms(ts) // 300000) * 300000
                           ORDER BY ts, event_id)),
                 g AS (SELECT event_type, w, count(*) AS n,
                              min(tms) AS first_t, max(tms) AS last_t,
                              max(CASE WHEN rn = 1 THEN cv END) AS first_v,
                              CAST(sum(CASE WHEN prev IS NULL THEN 0
                                            WHEN cv >= prev THEN cv - prev
                                            ELSE cv END) AS BIGINT) AS inc
                       FROM s GROUP BY 1, 2),
                 f AS (SELECT *,
                              CAST(last_t - first_t AS DOUBLE) AS si,
                              CAST(last_t - first_t AS DOUBLE) / (n - 1) AS ai,
                              CAST(first_t - w AS DOUBLE) AS d0,
                              CAST(w + 300000 - last_t AS DOUBLE) AS d1
                       FROM g WHERE n >= 2 AND last_t > first_t),
                 x AS (SELECT *,
                              CASE WHEN d0 >= 1.1 * ai THEN ai / 2.0 ELSE d0 END AS ds0,
                              CASE WHEN d1 >= 1.1 * ai THEN ai / 2.0 ELSE d1 END AS de0
                       FROM f),
                 z AS (SELECT *,
                              CASE WHEN inc > 0 AND first_v >= 0
                                        AND si * (CAST(first_v AS DOUBLE)
                                                  / CAST(inc AS DOUBLE)) < ds0
                                   THEN si * (CAST(first_v AS DOUBLE)
                                              / CAST(inc AS DOUBLE))
                                   ELSE ds0 END AS ds1
                       FROM x)
            SELECT event_type, w AS window_start, CAST(n AS BIGINT) AS n_samples,
                   round(CAST(inc AS DOUBLE) * ((si + ds1 + de0) / si)
                         / 100.0 / 300.0, 6) AS xrate_per_s
            FROM z
        )
        SELECT event_type,
               (window_start // 3600000) * 3600000 AS window_start,
               max(xrate_per_s) AS max_xrate
        FROM x GROUP BY 1, 2
    """,
    "xrate_5m": """
        WITH s AS (SELECT event_type, epoch_ms(ts) AS tms,
                          CAST(value * 100 AS BIGINT) AS cv,
                          (epoch_ms(ts) // 300000) * 300000 AS w,
                          lag(CAST(value * 100 AS BIGINT)) OVER wsa AS prev,
                          row_number() OVER wsa AS rn
                   FROM events
                   WINDOW wsa AS (
                       PARTITION BY event_type,
                                    (epoch_ms(ts) // 300000) * 300000
                       ORDER BY ts, event_id)),
             g AS (SELECT event_type, w, count(*) AS n,
                          min(tms) AS first_t, max(tms) AS last_t,
                          max(CASE WHEN rn = 1 THEN cv END) AS first_v,
                          CAST(sum(CASE WHEN prev IS NULL THEN 0
                                        WHEN cv >= prev THEN cv - prev
                                        ELSE cv END) AS BIGINT) AS inc
                   FROM s GROUP BY 1, 2),
             f AS (SELECT *,
                          CAST(last_t - first_t AS DOUBLE) AS si,
                          CAST(last_t - first_t AS DOUBLE) / (n - 1) AS ai,
                          CAST(first_t - w AS DOUBLE) AS d0,
                          CAST(w + 300000 - last_t AS DOUBLE) AS d1
                   FROM g WHERE n >= 2 AND last_t > first_t),
             x AS (SELECT *,
                          CASE WHEN d0 >= 1.1 * ai THEN ai / 2.0 ELSE d0 END AS ds0,
                          CASE WHEN d1 >= 1.1 * ai THEN ai / 2.0 ELSE d1 END AS de0
                   FROM f),
             z AS (SELECT *,
                          CASE WHEN inc > 0 AND first_v >= 0
                                    AND si * (CAST(first_v AS DOUBLE)
                                              / CAST(inc AS DOUBLE)) < ds0
                               THEN si * (CAST(first_v AS DOUBLE)
                                          / CAST(inc AS DOUBLE))
                               ELSE ds0 END AS ds1
                   FROM x)
        SELECT event_type, w AS window_start, CAST(n AS BIGINT) AS n_samples,
               round(CAST(inc AS DOUBLE) * ((si + ds1 + de0) / si)
                     / 100.0 / 300.0, 6) AS xrate_per_s
        FROM z
    """,
    "hist_fraction": """
        WITH h AS (
          SELECT event_type, (epoch_ms(ts) // 300000) * 300000 AS window_start,
                 CAST(count(*) FILTER (value <= 50) AS DOUBLE) AS c1,
                 CAST(count(*) FILTER (value <= 100) AS DOUBLE) AS c2,
                 CAST(count(*) AS DOUBLE) AS total
          FROM events GROUP BY 1, 2)
        SELECT event_type, window_start,
               round((c1 + (c2 - c1) * 0.5) / total, 6) AS frac_le_75
        FROM h
    """,
    "skew_join": """
        WITH l AS (SELECT event_type,
                          CASE WHEN user_id % 3 = 0 THEN 0
                               ELSE CAST(user_id AS BIGINT) END AS k
                   FROM events),
             d AS (SELECT DISTINCT k FROM l),
             d2 AS (SELECT k, k % 97 AS grp FROM d)
        SELECT l.event_type, count(*) AS n,
               CAST(sum(d2.grp) AS BIGINT) AS sum_grp
        FROM l JOIN d2 USING (k) GROUP BY 1
    """,
    "locf_5m": """
        WITH c AS (SELECT event_type,
                          (epoch_ms(ts) // 300000) * 300000 AS window_start,
                          sum(CAST(value * 100 AS BIGINT)) AS cs
                   FROM events GROUP BY 1, 2),
             b AS (SELECT event_type, min(window_start) AS w0,
                          max(window_start) AS w1
                   FROM c GROUP BY 1),
             grid AS (SELECT event_type,
                             unnest(generate_series(w0, w1, 300000))
                                 AS window_start
                      FROM b),
             j AS (SELECT grid.event_type, grid.window_start, c.cs
                   FROM grid LEFT JOIN c USING (event_type, window_start)),
             f AS (SELECT event_type, window_start, cs,
                          last_value(cs IGNORE NULLS) OVER (
                              PARTITION BY event_type ORDER BY window_start
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                          ) AS pc
                   FROM j)
        SELECT event_type, window_start,
               CAST(pc AS DOUBLE) / 100.0 AS sum_value,
               CASE WHEN cs IS NULL THEN 1 ELSE 0 END AS is_filled
        FROM f
    """,
    "label_ops": _PAGES_SAMPLES_SQL + """
        SELECT metric,
               CASE WHEN regexp_full_match(domain, '(src[0-9]+)\\.example\\.com')
                    THEN regexp_replace(domain,
                                        '^(?:(src[0-9]+)\\.example\\.com)$', '\\1')
                    ELSE '' END AS shard,
               domain || ':' || lang AS instance,
               count(*) AS n
        FROM samples GROUP BY 1, 2, 3
    """,
    "tpch_q12": """
        SELECT li.l_returnflag,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey
        WHERE epoch_ms(li.l_shipdate) > epoch_ms(o.o_orderdate)
        GROUP BY 1
    """,
    "changes": """
        WITH o AS (SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
                          value,
                          lag(value) OVER (PARTITION BY event_type, user_id
                                           ORDER BY ts, event_id) AS prev
                   FROM events)
        SELECT event_type, user_id,
               CAST(count(*) FILTER (WHERE value <> prev) AS BIGINT)
                   AS n_changes
        FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
    """,
    "predict_linear": """
        WITH s AS (SELECT event_type, user_id,
                          epoch_ms(ts) // 3600000 - 473000 AS x,
                          CAST(round(value, 4) * 10000 AS BIGINT) AS y
                   FROM events),
        a AS (SELECT event_type, user_id, count(*) AS n,
                     sum(x) AS sx, sum(y) AS sy,
                     sum(x * y) AS sxy, sum(x * x) AS sxx
              FROM s GROUP BY 1, 2),
        b AS (SELECT *, CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
              FROM a WHERE n * sxx - sx * sx <> 0)
        SELECT event_type, user_id,
               round(((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                      / CAST(n AS DOUBLE) + slope * 1432.0) / 10000.0, 6)
                   AS pred_value
        FROM b
    """,
    "autocorr_lag1": """
        WITH s AS (SELECT event_type, ts, event_id,
                          CAST(value * 100 AS BIGINT) - 28000 AS y
                   FROM events),
        o AS (SELECT event_type, y,
                     lag(y) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS x
              FROM s),
        a AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
              FROM o WHERE x IS NOT NULL GROUP BY 1)
        SELECT event_type,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 8) AS acf1
        FROM a WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    "stddev_1h": """
        WITH s AS (SELECT event_type,
                          (epoch_ms(ts) // 3600000) * 3600000 AS window_start,
                          CAST(value * 100 AS BIGINT) AS cv
                   FROM events),
        a AS (SELECT event_type, window_start, count(*) AS n,
                     sum(cv) AS s, sum(cv * cv) AS s2
              FROM s GROUP BY 1, 2)
        SELECT event_type, window_start, CAST(n AS BIGINT) AS n_samples,
               round(sqrt(CAST(n * s2 - s * s AS DOUBLE)
                          / CAST(n * n AS DOUBLE)) / 100.0, 6) AS stddev_v,
               round(CAST(n * s2 - s * s AS DOUBLE)
                     / CAST(n * n AS DOUBLE) / 10000.0, 6) AS stdvar_v
        FROM a
    """,
    "seasonal_residual": """
        WITH s AS (SELECT event_type, CAST(event_id AS BIGINT) AS event_id,
                          CAST(value * 100 AS BIGINT) AS cv,
                          (epoch_ms(ts) // 3600000) % 24 AS hod
                   FROM events),
        a AS (SELECT event_type, hod, count(*) AS n, sum(cv) AS sm
              FROM s GROUP BY 1, 2),
        d AS (SELECT s.event_type, s.event_id,
                     CAST(abs(s.cv * a.n - a.sm) AS DOUBLE)
                     / CAST(a.n AS DOUBLE) / 100.0 AS dev
              FROM s JOIN a USING (event_type, hod)),
        r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                           ORDER BY dev DESC, event_id) AS rn
              FROM d)
        SELECT event_type, event_id, round(dev, 6) AS dev
        FROM r WHERE rn <= 3
    """,
    "weighted_median": """
        WITH toks AS (
            SELECT doc_id,
                   CASE WHEN trim(text, ' ' || chr(9) || chr(13) || chr(10)) = ''
                        THEN CAST([] AS VARCHAR[])
                        ELSE regexp_split_to_array(
                             trim(text, ' ' || chr(9) || chr(13) || chr(10)),
                             '[ \t\r\n]+') END AS tk
            FROM documents),
        w AS (SELECT d.lang, d.n_chars, len(t.tk) AS wt
              FROM documents d JOIN toks t USING (doc_id)),
        a AS (SELECT lang, n_chars, CAST(sum(wt) AS BIGINT) AS w
              FROM w GROUP BY 1, 2),
        c AS (SELECT *,
                     sum(w) OVER (PARTITION BY lang ORDER BY n_chars) AS cw,
                     sum(w) OVER (PARTITION BY lang) AS tw
              FROM a)
        SELECT lang, CAST(min(n_chars) AS BIGINT) AS wmedian_chars
        FROM c WHERE 2 * cw >= tw GROUP BY 1
    """,
    "ks_statistic": """
        WITH s AS (SELECT event_type, CAST(value * 100 AS BIGINT) AS cv
                   FROM events WHERE event_type IN ('purchase', 'view')),
        c AS (SELECT cv,
                     count(*) FILTER (event_type = 'purchase') AS c1,
                     count(*) FILTER (event_type = 'view') AS c2
              FROM s GROUP BY 1),
        t AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM c),
        k AS (SELECT cv, sum(c1) OVER (ORDER BY cv) AS a1,
                     sum(c2) OVER (ORDER BY cv) AS a2 FROM c),
        d AS (SELECT k.cv, abs(k.a1 * t.n2 - k.a2 * t.n1) AS dn,
                     t.n1, t.n2
              FROM k CROSS JOIN t)
        SELECT 'purchase' AS type_a, 'view' AS type_b,
               CAST(max(dn) AS BIGINT) AS d_num,
               CAST(min(cv) FILTER (dn = (SELECT max(dn) FROM d)) AS BIGINT)
                   AS at_cv,
               round(CAST(max(dn) AS DOUBLE)
                     / (CAST(any_value(n1) AS DOUBLE)
                        * CAST(any_value(n2) AS DOUBLE)), 8) AS ks
        FROM d
    """,
    "chi2_independence": """
        WITH s AS (SELECT event_type,
                          (epoch_ms(ts) // 3600000) % 24 AS hod FROM events),
        cs AS (SELECT event_type, hod, count(*) AS o FROM s GROUP BY 1, 2),
        ty AS (SELECT DISTINCT event_type FROM s),
        hh AS (SELECT DISTINCT hod FROM s),
        grid AS (SELECT ty.event_type, hh.hod, coalesce(cs.o, 0) AS o
                 FROM ty CROSS JOIN hh
                 LEFT JOIN cs USING (event_type, hod)),
        tot AS (SELECT sum(o) AS n FROM grid),
        r AS (SELECT event_type, sum(o) AS rr FROM grid GROUP BY 1),
        c AS (SELECT hod, sum(o) AS cc FROM grid GROUP BY 1),
        cells AS (SELECT CAST(floor(
                      CAST(g.o * t.n - r.rr * c.cc AS DOUBLE)
                      * CAST(g.o * t.n - r.rr * c.cc AS DOUBLE)
                      / (CAST(t.n AS DOUBLE) * CAST(r.rr * c.cc AS DOUBLE))
                      * 1e6) AS BIGINT) AS m
                  FROM grid g JOIN r USING (event_type)
                  JOIN c USING (hod) CROSS JOIN tot t)
        SELECT round(CAST(sum(m) AS DOUBLE) / 1e6, 6) AS chi2,
               CAST((SELECT count(*) - 1 FROM ty)
                    * (SELECT count(*) - 1 FROM hh) AS BIGINT) AS dof,
               CAST((SELECT n FROM tot) AS BIGINT) AS n
        FROM cells
    """,
    "basket_lift": f"""
        WITH x AS (SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events),
        y AS (SELECT user_id, ms, event_type,
                     CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
                          > {SESSION_GAP_MS} THEN 1 ELSE 0 END AS brk
              FROM x),
        s AS (SELECT user_id, event_type,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ms
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM y),
        d AS (SELECT DISTINCT user_id, sid, event_type FROM s),
        tot AS (SELECT count(*) AS n FROM
                (SELECT DISTINCT user_id, sid FROM d)),
        m AS (SELECT event_type, count(*) AS c FROM d GROUP BY 1),
        p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     count(*) AS n_both
              FROM d a JOIN d b
                ON a.user_id = b.user_id AND a.sid = b.sid
               AND a.event_type < b.event_type
              GROUP BY 1, 2)
        SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both,
               round(CAST(p.n_both * tot.n AS DOUBLE)
                     / CAST(ma.c * mb.c AS DOUBLE), 6) AS lift
        FROM p CROSS JOIN tot
        JOIN m ma ON ma.event_type = p.type_a
        JOIN m mb ON mb.event_type = p.type_b
    """,
    "isotonic_hourly": """
        WITH s AS (SELECT event_type,
                          (epoch_ms(ts) // 3600000) % 24 AS hod,
                          CAST(value * 100 AS BIGINT) AS cv FROM events),
        c AS (SELECT event_type, hod, count(*) AS n, sum(cv) AS sm
              FROM s GROUP BY 1, 2),
        p AS (SELECT event_type, hod, n, sm,
                     row_number() OVER w AS r,
                     sum(n) OVER w AS cn,
                     sum(sm) OVER w AS cs
              FROM c
              WINDOW w AS (PARTITION BY event_type ORDER BY hod
                           ROWS UNBOUNDED PRECEDING)),
        a AS (SELECT pj.event_type, pj.r AS j, pk.r AS k,
                     CAST(pk.cs - (pj.cs - pj.sm) AS DOUBLE)
                     / CAST(pk.cn - (pj.cn - pj.n) AS DOUBLE) AS avg
              FROM p pj JOIN p pk
                ON pj.event_type = pk.event_type AND pj.r <= pk.r),
        mn AS (SELECT a.event_type, pi.r AS i, a.j, min(a.avg) AS lo
               FROM a JOIN p pi
                 ON pi.event_type = a.event_type
                AND a.j <= pi.r AND pi.r <= a.k
               GROUP BY 1, 2, 3),
        f AS (SELECT event_type, i, max(lo) AS fit
              FROM mn GROUP BY 1, 2)
        SELECT f.event_type, CAST(p.hod AS BIGINT) AS hod,
               round(f.fit / 100.0, 6) AS iso_mean
        FROM f JOIN p ON p.event_type = f.event_type AND p.r = f.i
    """,
    "mannwhitney_u": """
        WITH s AS (SELECT event_type, CAST(value * 100 AS BIGINT) AS cv
                   FROM events WHERE event_type IN ('purchase', 'view')),
        c AS (SELECT cv,
                     count(*) FILTER (event_type = 'purchase') AS c1,
                     count(*) FILTER (event_type = 'view') AS c2
              FROM s GROUP BY 1),
        t AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM c),
        k AS (SELECT cv, c1, c1 + c2 AS cnt,
                     sum(c1 + c2) OVER (ORDER BY cv) - (c1 + c2) AS bf
              FROM c),
        r AS (SELECT sum(c1 * (2 * bf + cnt + 1)) AS r1_2 FROM k)
        SELECT 'purchase' AS type_a, 'view' AS type_b,
               CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2,
               CAST(r.r1_2 - t.n1 * (t.n1 + 1) AS DOUBLE) / 2.0 AS u1,
               round(CAST(r.r1_2 - t.n1 * (t.n1 + 1) AS DOUBLE)
                     / (2.0 * CAST(t.n1 AS DOUBLE)
                        * CAST(t.n2 AS DOUBLE)), 8) AS cles
        FROM t, r
    """,
    "tpch_q6": """
        SELECT round(CAST(sum(CAST(l_extendedprice * 100 AS BIGINT)
                              * CAST(l_discount * 100 AS BIGINT))
                     AS DOUBLE) / 10000.0, 4) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND CAST(l_discount * 100 AS BIGINT) BETWEEN 5 AND 7
          AND l_quantity < 24
    """,
    "debounce_events": """
        WITH o AS (SELECT event_type, epoch_ms(ts) AS ms,
                          lag(epoch_ms(ts)) OVER (
                              PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS prev
                   FROM events)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
               CAST(count(*) FILTER (prev IS NULL OR ms - prev > 300000)
                    AS BIGINT) AS n_kept,
               round(1.0 - CAST(count(*) FILTER (prev IS NULL
                                                 OR ms - prev > 300000)
                                AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS suppress_ratio
        FROM o GROUP BY 1
    """,
    "max_concurrency": f"""
        WITH x AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        y AS (SELECT user_id, ms,
                     CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id
                                                  ORDER BY ms)
                          > {SESSION_GAP_MS} THEN 1 ELSE 0 END AS brk
              FROM x),
        s AS (SELECT user_id, ms,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ms
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM y),
        b AS (SELECT min(ms) AS t, 1 AS d FROM s GROUP BY user_id, sid
              UNION ALL
              SELECT max(ms) + 1 AS t, -1 AS d FROM s GROUP BY user_id, sid),
        p AS (SELECT t, d,
                     sum(d) OVER (ORDER BY t, d DESC
                                  ROWS UNBOUNDED PRECEDING) AS c
              FROM b)
        SELECT (t // 86400000) * 86400000 AS day,
               CAST(max(c) AS BIGINT) AS max_concurrent
        FROM p GROUP BY 1
    """,
    "anova_hod": """
        WITH s AS (SELECT event_type,
                          (epoch_ms(ts) // 3600000) % 24 AS hod,
                          CAST(value * 100 AS BIGINT) AS cv FROM events),
        c AS (SELECT event_type, hod, count(*) AS n,
                     sum(cv) AS sm, sum(cv * cv) AS s2
              FROM s GROUP BY 1, 2),
        b AS (SELECT event_type,
                     sum(CAST(floor(CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
                                    / CAST(n AS DOUBLE) * 1e6)
                         AS BIGINT)) AS bsum,
                     sum(n) AS n, sum(sm) AS s, sum(s2) AS s2t,
                     count(*) AS k
              FROM c GROUP BY 1)
        SELECT event_type, CAST(k AS BIGINT) AS k_groups,
               round(((CAST(bsum
                            - CAST(floor(CAST(s AS DOUBLE)
                                         * CAST(s AS DOUBLE)
                                         / CAST(n AS DOUBLE) * 1e6)
                                   AS BIGINT) AS DOUBLE) / 1e6)
                      / (CAST(k AS DOUBLE) - 1.0))
                     / ((CAST(s2t AS DOUBLE) - CAST(bsum AS DOUBLE) / 1e6)
                        / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
                   AS f_stat
        FROM b WHERE k >= 2 AND n > k
    """,
    "cohens_d": """
        WITH c AS (SELECT event_type, count(*) AS n,
                          sum(cv) AS s, sum(cv * cv) AS s2
                   FROM (SELECT event_type,
                                CAST(value * 100 AS BIGINT) AS cv
                         FROM events)
                   GROUP BY 1)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               round((CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
                      - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
                     / sqrt(((CAST(a.n AS DOUBLE) - 1.0)
                             * (CAST(a.n * a.s2 - a.s * a.s AS DOUBLE)
                                / (CAST(a.n AS DOUBLE)
                                   * (CAST(a.n AS DOUBLE) - 1.0)))
                             + (CAST(b.n AS DOUBLE) - 1.0)
                             * (CAST(b.n * b.s2 - b.s * b.s AS DOUBLE)
                                / (CAST(b.n AS DOUBLE)
                                   * (CAST(b.n AS DOUBLE) - 1.0))))
                            / (CAST(a.n AS DOUBLE) + CAST(b.n AS DOUBLE)
                               - 2.0)), 6) AS d
        FROM c a JOIN c b ON a.event_type < b.event_type
    """,
    "media_pure_grid": """
        WITH px AS (SELECT d.doc_id, t1.r, t2.c,
                           (d.doc_id * 31 + t1.r * 7 + t2.c * 3) % 256 AS v
                    FROM documents d,
                         (SELECT unnest(generate_series(0, 7)) AS r) t1,
                         (SELECT unnest(generate_series(0, 7)) AS c) t2),
        cell AS (SELECT doc_id, r // 2 AS gr, c // 2 AS gc,
                        sum(v) AS s
                 FROM px GROUP BY 1, 2, 3)
        SELECT doc_id,
               round(CAST(max(CASE WHEN gr = 0 AND gc = 0 THEN s END)
                          AS DOUBLE) / 4.0 / 255.0, 6) AS f00,
               round(CAST(max(CASE WHEN gr = 1 AND gc = 2 THEN s END)
                          AS DOUBLE) / 4.0 / 255.0, 6) AS f12,
               round(CAST(max(CASE WHEN gr = 3 AND gc = 3 THEN s END)
                          AS DOUBLE) / 4.0 / 255.0, 6) AS f33
        FROM cell GROUP BY 1
    """,
    "audio_pure_rms": """
        WITH a AS (SELECT doc_id, doc_id * 13 % 8000 + 1000 AS amp
                   FROM documents)
        SELECT doc_id,
               CAST(2 AS BIGINT) AS n_frames,
               CAST((4000 * amp * amp + 4000 * 4 * amp * amp) // 2
                    AS BIGINT) AS energy_mean,
               CAST(4000 * 4 * amp * amp AS BIGINT) AS energy_max
        FROM a
    """,
    "entropy_rate": """
        WITH o AS (SELECT CAST(user_id AS BIGINT) AS u, event_type,
                          lead(event_type) OVER (
                              PARTITION BY user_id
                              ORDER BY epoch_ms(ts), event_type, event_id
                          ) AS nxt
                   FROM events),
        c AS (SELECT event_type AS f, nxt AS t, count(*) AS n_st
              FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
        s AS (SELECT f, sum(n_st) AS n_s FROM c GROUP BY 1),
        x AS (SELECT c.n_st,
                     CAST(floor(ln(CAST(c.n_st AS DOUBLE)
                                   / CAST(s.n_s AS DOUBLE)) * 1e6)
                          AS BIGINT) AS term
              FROM c JOIN s USING (f))
        SELECT CAST(sum(n_st) AS BIGINT) AS n_pairs,
               round(-CAST(sum(n_st * term) AS DOUBLE)
                     / (CAST(sum(n_st) AS DOUBLE) * 1e6), 6)
                   AS entropy_rate_nats
        FROM x
    """,
    "longest_streak": """
        WITH o AS (SELECT user_id, event_type, value,
                          lag(value) OVER w AS prev,
                          row_number() OVER w AS rn
                   FROM events
                   WINDOW w AS (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id)),
        m AS (SELECT user_id, event_type, rn,
                     sum(CASE WHEN prev IS NULL OR value <= prev
                              THEN 1 ELSE 0 END)
                         OVER (PARTITION BY user_id, event_type ORDER BY rn
                               ROWS UNBOUNDED PRECEDING) AS island
              FROM o),
        r AS (SELECT event_type, count(*) AS len
              FROM m GROUP BY user_id, event_type, island)
        SELECT event_type, CAST(max(len) AS BIGINT) AS streak
        FROM r GROUP BY 1
    """,
})

# --- fixture-join oracles for the hash pipelines ----------------------------
# No tractable pure-SQL expression exists for the rolling-hash / MinHash /
# SimHash operators, so the oracle reads PRECOMPUTED expected values written
# by an independent from-the-spec reference implementation
# (tests/fixtures/gen_oracle_fixtures.py) — "oracle = fixture join", as the
# round-1 verdict suggested.  corpus_key = SUM(n_chars) keys the fixture to
# whichever sf dir the driver runs against.

_FIXTURE_DIR = "/root/repo/tests/fixtures"
_CORPUS_KEY = "(SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents)"


def _fixture_sql(fname: str, cols: str) -> str:
    return (
        f"SELECT {cols} FROM read_parquet('{_FIXTURE_DIR}/oracle_{fname}.parquet') "
        f"WHERE corpus_key = {_CORPUS_KEY}"
    )


ORACLE_SQL.update(
    {
        "fingerprint": _fixture_sql("fingerprint", "doc_id, fingerprint"),
        "holt_winters": (
            "SELECT event_type, level, trend FROM read_parquet("
            f"'{_FIXTURE_DIR}/oracle_holt.parquet') WHERE corpus_key = "
            "(SELECT CAST(SUM(CAST(value * 100 AS BIGINT)) AS BIGINT) FROM events)"
        ),
        "lttb_downsample": (
            "SELECT event_type, window_start, sum_value FROM read_parquet("
            f"'{_FIXTURE_DIR}/oracle_lttb.parquet') WHERE corpus_key = "
            "(SELECT CAST(SUM(CAST(value * 100 AS BIGINT)) AS BIGINT) FROM events)"
        ),
        "simhash": _fixture_sql("simhash", "doc_id, simhash"),
        "lang_id": _fixture_sql("lang_id", "doc_id, pred_lang"),
        "minhash_pairs": _fixture_sql("minhash_pairs", "a, b"),
        "minhash_index_pairs": _fixture_sql(
            "minhash_pairs", "a, b"
        ) + " AND (a % 2) != (b % 2)",
        "ngram_jaccard_pairs": _fixture_sql("ngram_jaccard", "a, b, jaccard"),
        "embedding_neardup": (
            "SELECT a, b, round(cosine, 6) AS cosine FROM read_parquet("
            f"'{_FIXTURE_DIR}/oracle_embedding_neardup.parquet') WHERE corpus_key = "
            "(SELECT CAST(SUM(CAST(floor(abs(embedding[1]) * 1000) AS BIGINT)) AS BIGINT) "
            "FROM embeddings)"
        ),
        "ivf_topk": (
            "SELECT query_idx, vec_id, rank FROM read_parquet("
            f"'{_FIXTURE_DIR}/oracle_ivf_topk.parquet') WHERE corpus_key = "
            "(SELECT CAST(SUM(CAST(floor(abs(embedding[1]) * 1000) AS BIGINT)) AS BIGINT) "
            "FROM embeddings)"
        ),
        "ivf_index_topk": (
            "SELECT query_idx, vec_id, rank FROM read_parquet("
            f"'{_FIXTURE_DIR}/oracle_ivf_topk.parquet') WHERE corpus_key = "
            "(SELECT CAST(SUM(CAST(floor(abs(embedding[1]) * 1000) AS BIGINT)) AS BIGINT) "
            "FROM embeddings)"
        ),
        "media_features": _fixture_sql("media_features", "media_id, kind, embedding"),
        "media_resize": _fixture_sql(
            "media_resize", "media_id, kind, out_w, out_h, thumb_hash"
        ),
        "compression_ratio": _fixture_sql(
            "compression", "doc_id, n_bytes, c_bytes, ratio"
        ),
        "frame_features": _fixture_sql(
            "frame_features", "media_id, n_frames, embedding"
        ),
        "pagerank": _fixture_sql("pagerank", "node, rank"),
        "bpe_merges": _fixture_sql("bpe_merges", 'merge_idx, "left", "right", n'),
        "pca_top": (
            "SELECT dim, component, eigenvalue FROM read_parquet("
            f"'{_FIXTURE_DIR}/oracle_pca_top.parquet') WHERE corpus_key = "
            "(SELECT CAST(SUM(CAST(floor(abs(embedding[1]) * 1000) AS BIGINT)) AS BIGINT) "
            "FROM embeddings)"
        ),
        "kmeans": (
            "SELECT cluster, n_vecs, c0 FROM read_parquet("
            f"'{_FIXTURE_DIR}/oracle_kmeans.parquet') WHERE corpus_key = "
            "(SELECT CAST(SUM(CAST(floor(abs(embedding[1]) * 1000) AS BIGINT)) AS BIGINT) "
            "FROM embeddings)"
        ),
        "approx_users": (
            "SELECT event_type, round(approx_users, 4) AS approx_users "
            f"FROM read_parquet('{_FIXTURE_DIR}/oracle_approx_users.parquet') "
            "WHERE corpus_key = (SELECT CAST(SUM(event_id) AS BIGINT) FROM events)"
        ),
        "approx_quantiles": (
            "SELECT event_type, round(p50, 6) AS p50, round(p90, 6) AS p90, "
            "round(p99, 6) AS p99 "
            f"FROM read_parquet('{_FIXTURE_DIR}/oracle_approx_quantiles.parquet') "
            "WHERE corpus_key = (SELECT CAST(SUM(event_id) AS BIGINT) FROM events)"
        ),
    }
)

ORACLE_SQL.update(
    {
        "anomaly_3sigma": """
            WITH w AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS cv,
                     sum(CAST(round(value * 100) AS BIGINT)) OVER win AS s,
                     sum(CAST(round(value * 100) AS BIGINT)
                         * CAST(round(value * 100) AS BIGINT)) OVER win AS q,
                     count(*) OVER win AS n
              FROM events
              WINDOW win AS (PARTITION BY event_type, user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN 15 PRECEDING AND CURRENT ROW))
            SELECT event_type,
                   CAST(count(*) FILTER (
                        WHERE (cv*n - s)*(cv*n - s) > 9*(n*q - s*s)
                   ) AS BIGINT) AS n_anomalies,
                   CAST(count(*) AS BIGINT) AS n_points
            FROM w GROUP BY event_type
        """,
        "skyline": """
            WITH u AS (
              SELECT CAST(user_id AS BIGINT) AS user_id,
                     CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x,
                     CAST(count(*) AS BIGINT) AS y
              FROM events GROUP BY 1)
            SELECT user_id, x, y FROM u a
            WHERE NOT EXISTS (
              SELECT 1 FROM u b
              WHERE b.x >= a.x AND b.y >= a.y AND (b.x > a.x OR b.y > a.y))
        """,
        "value_histogram": """
            WITH c AS (
              SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cv
              FROM events),
            m AS (SELECT event_type, min(cv) AS lo, max(cv) AS hi
                  FROM c GROUP BY 1)
            SELECT c.event_type,
                   CAST((cv - lo) * 20 // (hi - lo + 1) AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n
            FROM c JOIN m USING (event_type)
            GROUP BY 1, 2
        """,
        "pmi_pairs": """
            WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
            nu AS (SELECT count(DISTINCT user_id) AS n FROM events),
            c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
                  FROM d GROUP BY 1),
            p AS (SELECT a.event_type AS ta, b.event_type AS tb,
                         CAST(count(*) AS BIGINT) AS n_keys
                  FROM d a JOIN d b USING (user_id)
                  WHERE a.event_type < b.event_type GROUP BY 1, 2)
            SELECT p.ta, p.tb, p.n_keys,
                   floor(ln(CAST(nu.n * p.n_keys AS DOUBLE)
                            / CAST(ca.cnt * cb.cnt AS DOUBLE)) * 1e6) / 1e6
                     AS pmi
            FROM p, nu
            JOIN c ca ON ca.event_type = p.ta
            JOIN c cb ON cb.event_type = p.tb
        """,
        "quality_deciles": r"""
            WITH t AS (
              SELECT doc_id, n_chars,
                     CAST(CASE WHEN trim(text, ' ' || chr(9) || chr(13) || chr(10)) = ''
                               THEN 0
                               ELSE len(regexp_split_to_array(
                                    trim(text, ' ' || chr(9) || chr(13) || chr(10)),
                                    '[ \t\r\n]+'))
                          END AS BIGINT) * 4194304 + doc_id AS comp
              FROM documents),
            q AS (SELECT quantile_disc(comp, 0.1) AS t1, quantile_disc(comp, 0.2) AS t2,
                         quantile_disc(comp, 0.3) AS t3, quantile_disc(comp, 0.4) AS t4,
                         quantile_disc(comp, 0.5) AS t5, quantile_disc(comp, 0.6) AS t6,
                         quantile_disc(comp, 0.7) AS t7, quantile_disc(comp, 0.8) AS t8,
                         quantile_disc(comp, 0.9) AS t9
                  FROM t)
            SELECT CAST((comp >= t1) AS BIGINT) + CAST((comp >= t2) AS BIGINT)
                 + CAST((comp >= t3) AS BIGINT) + CAST((comp >= t4) AS BIGINT)
                 + CAST((comp >= t5) AS BIGINT) + CAST((comp >= t6) AS BIGINT)
                 + CAST((comp >= t7) AS BIGINT) + CAST((comp >= t8) AS BIGINT)
                 + CAST((comp >= t9) AS BIGINT) AS decile,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS char_mass
            FROM t, q GROUP BY 1
        """,
    }
)

ORACLE_SQL.update(
    {
        "user_entropy": """
            WITH c AS (SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
                              CAST(count(*) AS BIGINT) AS cnt
                       FROM events GROUP BY 1, 2),
            u AS (SELECT user_id,
                         CAST(sum(cnt) AS BIGINT) AS n,
                         CAST(sum(cnt * CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e6)
                                             AS BIGINT)) AS BIGINT) AS s
                  FROM c GROUP BY 1)
            SELECT user_id, n AS n_events,
                   round(CAST(n * CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
                              - s AS DOUBLE)
                         / (CAST(n AS DOUBLE) * 1e6), 6) AS entropy
            FROM u
        """,
        "term_drift": """
            WITH tok AS (
              SELECT doc_id, lower(unnest(regexp_extract_all(text, '[A-Za-z]+')))
                       AS term
              FROM documents),
            d AS (SELECT DISTINCT doc_id, term FROM tok),
            f AS (SELECT term,
                         CAST(count(*) FILTER (WHERE doc_id % 2 = 0) AS BIGINT)
                           AS df_even,
                         CAST(count(*) FILTER (WHERE doc_id % 2 = 1) AS BIGINT)
                           AS df_odd
                  FROM d GROUP BY 1)
            SELECT term, df_even, df_odd,
                   CAST(floor(ln(CAST(df_even + 1 AS DOUBLE)) * 1e6) AS BIGINT)
                   - CAST(floor(ln(CAST(df_odd + 1 AS DOUBLE)) * 1e6) AS BIGINT)
                     AS drift_micro
            FROM f WHERE df_even + df_odd >= 20
        """,
    }
)

ORACLE_SQL.update(
    {
        "keyword_search": """
            WITH tok AS (
              SELECT doc_id, lower(unnest(regexp_extract_all(text, '[A-Za-z]+')))
                       AS term
              FROM documents),
            d AS (SELECT DISTINCT doc_id, term FROM tok)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched
            FROM d WHERE term IN ('shuffle', 'spark', 'gorilla')
            GROUP BY 1
        """,
    }
)

ORACLE_SQL.update(
    {
        "bpe_encode": _fixture_sql("bpe_encode", "doc_id, n_bpe"),
        "approx_overlap": (
            "SELECT ta, tb, round(est_overlap, 4) AS est_overlap "
            f"FROM read_parquet('{_FIXTURE_DIR}/oracle_theta_overlap.parquet') "
            "WHERE corpus_key = (SELECT CAST(SUM(event_id) AS BIGINT) FROM events)"
        ),
    }
)

ORACLE_SQL.update(
    {
        "rate_5m": """
            WITH e AS (SELECT event_type, epoch_ms(ts) AS tms, value,
                              lag(value) OVER (
                                  PARTITION BY event_type
                                  ORDER BY ts, event_id) AS prev
                       FROM events)
            SELECT event_type, (tms // 300000) * 300000 AS window_start,
                   round(round(sum(CASE WHEN value >= prev THEN value - prev
                                        ELSE value END), 4) / 300.0, 6)
                     AS rate
            FROM e WHERE prev IS NOT NULL GROUP BY 1, 2
        """,
        "delta_5m": """
            WITH e AS (SELECT event_type,
                              (epoch_ms(ts) // 300000) * 300000 AS window_start,
                              ts, event_id, value,
                              row_number() OVER (
                                  PARTITION BY event_type,
                                               (epoch_ms(ts) // 300000)
                                  ORDER BY ts, event_id) AS ra,
                              row_number() OVER (
                                  PARTITION BY event_type,
                                               (epoch_ms(ts) // 300000)
                                  ORDER BY ts DESC, event_id DESC) AS rd
                       FROM events)
            SELECT f.event_type, f.window_start,
                   f.value AS first_v, l.value AS last_v,
                   l.value - f.value AS delta
            FROM (SELECT * FROM e WHERE ra = 1) f
            JOIN (SELECT * FROM e WHERE rd = 1) l
              USING (event_type, window_start)
        """,
        "cusum_max": """
            WITH c AS (SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
                              CAST(round(value * 100) AS BIGINT) AS cv,
                              ts, event_id
                       FROM events),
            w AS (SELECT event_type, user_id,
                         sum(cv) OVER (PARTITION BY event_type, user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS s_i,
                         row_number() OVER (PARTITION BY event_type, user_id
                                            ORDER BY ts, event_id) AS i,
                         sum(cv) OVER (PARTITION BY event_type, user_id) AS s_n,
                         count(*) OVER (PARTITION BY event_type, user_id) AS n
                  FROM c)
            SELECT event_type, user_id,
                   CAST(max(abs(n * s_i - i * s_n)) AS BIGINT) AS cusum_max,
                   CAST(max(n) AS BIGINT) AS n_points
            FROM w GROUP BY 1, 2
        """,
        "psi_buckets": """
            WITH c AS (SELECT CAST(event_id AS BIGINT) % 2 AS parity,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            m AS (SELECT min(cv) AS lo, max(cv) AS hi,
                         count(*) FILTER (WHERE parity = 0) AS n_even_tot,
                         count(*) FILTER (WHERE parity = 1) AS n_odd_tot
                  FROM c),
            b AS (SELECT (cv - lo) * 20 // (hi - lo + 1) AS bucket,
                         CAST(count(*) FILTER (WHERE parity = 0) AS BIGINT)
                           AS n_even,
                         CAST(count(*) FILTER (WHERE parity = 1) AS BIGINT)
                           AS n_odd,
                         max(n_even_tot) AS net, max(n_odd_tot) AS not_
                  FROM c, m GROUP BY 1)
            SELECT bucket, n_even, n_odd,
                   round((CAST(n_even + 1 AS DOUBLE) / (net + 20)
                          - CAST(n_odd + 1 AS DOUBLE) / (not_ + 20))
                         * (floor(ln((CAST(n_even + 1 AS DOUBLE) / (net + 20))
                                     / (CAST(n_odd + 1 AS DOUBLE) / (not_ + 20)))
                                  * 1e6) / 1e6), 9) AS psi_term
            FROM b
        """,
        "rrf_fusion": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(CASE WHEN trim(text, ' ' || chr(9) || chr(13) || chr(10)) = ''
                               THEN 0
                               ELSE len(regexp_split_to_array(
                                    trim(text, ' ' || chr(9) || chr(13) || chr(10)),
                                    '[ \t\r\n]+'))
                          END AS BIGINT) AS tok,
                     n_chars
              FROM documents),
            r AS (SELECT doc_id,
                         row_number() OVER (ORDER BY tok DESC, doc_id DESC)
                           AS p1,
                         row_number() OVER (ORDER BY n_chars DESC, doc_id DESC)
                           AS p2
                  FROM t)
            SELECT doc_id,
                   round(1.0 / (60.0 + p1) + 1.0 / (60.0 + p2), 9) AS rrf
            FROM r ORDER BY rrf DESC, doc_id LIMIT 50
        """,
    }
)

ORACLE_SQL.update(
    {
        "hopping_15m": """
            SELECT event_type,
                   (epoch_ms(ts) // 300000) * 300000 - k.k * 300000
                     AS window_start,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                     / 100.0 AS sum_value
            FROM events, (SELECT unnest([0, 1, 2]) AS k) k
            GROUP BY 1, 2
        """,
        "weighted_sample": (
            "SELECT doc_id, n_chars "
            f"FROM read_parquet('{_FIXTURE_DIR}/oracle_weighted_sample.parquet') "
            f"WHERE corpus_key = {_CORPUS_KEY}"
        ),
        "fuzzy_decontaminate": _fixture_sql(
            "minhash_pairs", "a, b"
        ) + " AND ((a % 53 = 0) != (b % 53 = 0))",
    }
)

ORACLE_SQL.update(
    {
        "audio_loudness": (
            "SELECT media_id, kind, n_frames, energy_mean, energy_max "
            f"FROM read_parquet('{_FIXTURE_DIR}/oracle_audio_loudness.parquet') "
            f"WHERE corpus_key = {_CORPUS_KEY}"
        ),
    }
)

ORACLE_SQL.update(
    {
        "fair_share_sample": """
            WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                       FROM documents GROUP BY 1),
            o AS (SELECT source, n,
                         row_number() OVER (ORDER BY n, source) AS rn,
                         sum(n) OVER (ORDER BY n, source
                                      ROWS UNBOUNDED PRECEDING) AS cum,
                         count(*) OVER () AS m
                  FROM c),
            brk AS (SELECT min(rn) AS k0
                    FROM o WHERE (cum - n) + n * (m - rn + 1) > 200),
            t AS (SELECT CASE WHEN (SELECT k0 FROM brk) IS NULL
                              THEN (SELECT max(n) FROM o)
                              ELSE (SELECT (200 - (cum - n)) // (m - rn + 1)
                                    FROM o WHERE rn = (SELECT k0 FROM brk))
                         END AS waterline),
            r AS (SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
                         row_number() OVER (
                             PARTITION BY source
                             ORDER BY (doc_id * 48271) % 2147483647, doc_id)
                           AS pos
                  FROM documents)
            SELECT source, doc_id FROM r, t WHERE pos <= t.waterline
        """,
    }
)

ORACLE_SQL.update(
    {
        "phrase_search": """
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS l
              FROM documents),
            pos AS (
              SELECT doc_id, unnest(l) AS term,
                     generate_subscripts(l, 1) AS p
              FROM tok)
            SELECT CAST(a.doc_id AS BIGINT) AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_matches
            FROM (SELECT doc_id, p FROM pos WHERE term = 'sort') a
            JOIN (SELECT doc_id, p FROM pos WHERE term = 'merge') b
              ON a.doc_id = b.doc_id AND b.p = a.p + 1
            GROUP BY 1
        """,
    }
)

ORACLE_SQL.update(
    {
        "quarantine": """
            SELECT CASE WHEN value >= 400 THEN 'out_of_range'
                        WHEN CAST(user_id AS BIGINT) % 97 = 13 THEN 'bad_user'
                        ELSE '' END AS reason,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        """,
    }
)

ORACLE_SQL.update(
    {
        "schema_evolution": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) FILTER (WHERE event_id % 2 = 0) AS BIGINT)
                     AS n_value,
                   CAST(count(*) FILTER (WHERE event_id % 2 = 1) AS BIGINT)
                     AS n_props
            FROM events GROUP BY 1
        """,
    }
)

ORACLE_SQL.update(
    {
        "tpch_q3": """
            WITH rev AS (
              SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
                     epoch_ms(o_orderdate) AS o_date_ms,
                     o_orderpriority,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * CAST(round((1 - l_discount) * 100) AS BIGINT))
                       AS micro
              FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              WHERE c_mktsegment = 'BUILDING'
                AND epoch_ms(o_orderdate) < 867715200000
                AND epoch_ms(l_shipdate) > 867715200000
              GROUP BY 1, 2, 3)
            SELECT l_orderkey,
                   CAST(micro AS DOUBLE) / 10000.0 AS revenue,
                   o_date_ms, o_orderpriority
            FROM rev
            ORDER BY micro DESC, l_orderkey LIMIT 10
        """,
        "tpch_q5": """
            SELECT n_name,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * CAST(round((1 - l_discount) * 100) AS BIGINT))
                        AS DOUBLE) / 10000.0 AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND epoch_ms(o_orderdate) >= 820454400000
              AND epoch_ms(o_orderdate) < 852076800000
            GROUP BY 1
        """,
    }
)

ORACLE_SQL.update(
    {
        "count_meta": """
            SELECT 'region' AS tbl, CAST(count(*) AS BIGINT) AS n_rows FROM region
            UNION ALL SELECT 'nation', count(*) FROM nation
            UNION ALL SELECT 'customer', count(*) FROM customer
            UNION ALL SELECT 'supplier', count(*) FROM supplier
            UNION ALL SELECT 'part', count(*) FROM part
            UNION ALL SELECT 'orders', count(*) FROM orders
            UNION ALL SELECT 'lineitem', count(*) FROM lineitem
            UNION ALL SELECT 'events', count(*) FROM events
            UNION ALL SELECT 'documents', count(*) FROM documents
            UNION ALL SELECT 'embeddings', count(*) FROM embeddings
        """,
    }
)

ORACLE_SQL.update(
    {
        "funnel_latency": """
            WITH s1 AS (SELECT CAST(user_id AS BIGINT) AS u,
                               min(epoch_ms(ts)) AS t
                        FROM events WHERE event_type = 'signup' GROUP BY 1),
            s2 AS (SELECT CAST(e.user_id AS BIGINT) AS u,
                          min(epoch_ms(e.ts)) AS t
                   FROM events e JOIN s1 ON CAST(e.user_id AS BIGINT) = s1.u
                   WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s1.t
                   GROUP BY 1),
            l AS (SELECT (s2.t - s1.t) // 1000 AS lat
                  FROM s2 JOIN s1 ON s2.u = s1.u)
            SELECT CAST(count(*) AS BIGINT) AS n_converted,
                   CAST(quantile_disc(lat, 0.5) AS BIGINT) AS p50_s,
                   CAST(quantile_disc(lat, 0.9) AS BIGINT) AS p90_s
            FROM l
        """,
    }
)

ORACLE_SQL.update(
    {
        "window_share": """
            WITH c AS (SELECT event_type,
                              (epoch_ms(ts) // 3600000) * 3600000
                                AS window_start,
                              count(*) AS n
                       FROM events GROUP BY 1, 2)
            SELECT event_type, window_start, n,
                   CAST(n AS DOUBLE)
                       / CAST(sum(n) OVER (PARTITION BY window_start)
                              AS DOUBLE) AS share
            FROM c
        """,
        "hourly_growth": """
            WITH c AS (SELECT event_type,
                              (epoch_ms(ts) // 3600000) * 3600000
                                AS window_start,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            l AS (SELECT event_type, window_start, n,
                         lag(n) OVER (PARTITION BY event_type
                                      ORDER BY window_start) AS prev
                  FROM c)
            SELECT event_type, window_start, n,
                   round((CAST(n AS DOUBLE) - CAST(prev AS DOUBLE))
                         / CAST(prev AS DOUBLE), 6) AS growth_pct
            FROM l WHERE prev IS NOT NULL
        """,
        "skew_report": """
            WITH a AS (SELECT event_type AS v, CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            b AS (SELECT CAST(CAST(user_id AS BIGINT) AS VARCHAR) AS v,
                         CAST(count(*) AS BIGINT) AS n
                  FROM events GROUP BY 1),
            u AS (SELECT 'event_type' AS col, sum(n) AS n_rows,
                         count(*) AS n_distinct, max(n) AS max_count FROM a
                  UNION ALL
                  SELECT 'user_id', sum(n), count(*), max(n) FROM b)
            SELECT col, CAST(n_rows AS BIGINT) AS n_rows,
                   CAST(n_distinct AS BIGINT) AS n_distinct,
                   CAST(max_count AS BIGINT) AS max_count,
                   round(CAST(max_count AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
                     AS top_share
            FROM u
        """,
    }
)

ORACLE_SQL.update(
    {
        "cos_histogram": """
            WITH n AS (SELECT count(*) AS n FROM embeddings),
            p AS (SELECT (t.k * 48271) % n.n AS i,
                         (t.k * 1664525 + 1013904223) % n.n AS j
                  FROM range(200) t(k), n),
            pp AS (SELECT i, j FROM p WHERE i != j),
            c AS (SELECT round(list_cosine_similarity(
                              CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])), 6) AS c6
                  FROM pp
                  JOIN embeddings a ON CAST(a.vec_id AS BIGINT) = pp.i
                  JOIN embeddings b ON CAST(b.vec_id AS BIGINT) = pp.j)
            SELECT LEAST(CAST(floor((c6 + 1.0) * 5) AS BIGINT), 9) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM c GROUP BY 1
        """,
    }
)

ORACLE_SQL.update(
    {
        "pq_codes": (
            "SELECT subspace, code, n_vecs "
            f"FROM read_parquet('{_FIXTURE_DIR}/oracle_pq_codes.parquet') "
            "WHERE corpus_key = (SELECT CAST(SUM(CAST(floor(abs(embedding[1]) "
            "* 1000) AS BIGINT)) AS BIGINT) FROM embeddings)"
        ),
    }
)

ORACLE_SQL.update(
    {
        "lang_top_terms": """
            WITH d AS (SELECT doc_id, lang,
                              lower(unnest(regexp_extract_all(text,
                                                              '[A-Za-z]+')))
                                AS term
                       FROM documents),
            u AS (SELECT DISTINCT doc_id, lang, term FROM d),
            f AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS df
                  FROM u GROUP BY 1, 2),
            r AS (SELECT lang, term, df,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY df DESC, term) AS rn
                  FROM f)
            SELECT lang, term, df FROM r WHERE rn <= 5
        """,
    }
)

ORACLE_SQL.update(
    {
        "tpch_q18": """
            WITH s AS (SELECT CAST(l_orderkey AS BIGINT) AS okey,
                              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                                AS sum_qty
                       FROM lineitem GROUP BY 1)
            SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name,
                   CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
                   epoch_ms(o.o_orderdate) AS o_date_ms,
                   o.o_totalprice, s.sum_qty
            FROM s
            JOIN orders o ON o.o_orderkey = s.okey
            JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE s.sum_qty > 250
        """,
        "bloom_lookup": """
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     AS sum_centi
            FROM events
            WHERE user_id IN (7, 101, -1)
            GROUP BY 1
        """,
        "bigram_logprob": f"""
            WITH toks AS ({_SQL_TOKS}),
            ex AS (SELECT doc_id, generate_subscripts(tk, 1) AS i,
                          unnest(tk) AS tok
                   FROM toks),
            bg AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2
                   FROM ex a
                   JOIN ex b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
            c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
                   FROM bg GROUP BY 1, 2),
            c1 AS (SELECT w1, CAST(sum(n) AS DOUBLE) AS t
                   FROM c2 GROUP BY 1)
            SELECT g.doc_id, round(-avg(ln(c2.n / c1.t)), 6) AS nll2
            FROM bg g
            JOIN c2 ON c2.w1 = g.w1 AND c2.w2 = g.w2
            JOIN c1 ON c1.w1 = g.w1
            GROUP BY 1
        """,
        "gini_concentration": """
            WITH c AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
                              CAST(count(*) AS BIGINT) AS cnt
                       FROM documents GROUP BY 1, 2),
            p AS (SELECT source, v, cnt,
                         coalesce(sum(cnt) OVER w, 0) AS nlt,
                         coalesce(sum(cnt * v) OVER w, 0) AS slt
                  FROM c
                  WINDOW w AS (PARTITION BY source ORDER BY v
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)),
            a AS (SELECT source,
                         CAST(sum(cnt) AS BIGINT) AS n_docs,
                         CAST(sum(cnt * v) AS BIGINT) AS total_chars,
                         CAST(2 * sum(cnt * (v * nlt - slt)) AS BIGINT)
                           AS absdiff
                  FROM p GROUP BY 1)
            SELECT source, n_docs, total_chars,
                   CAST(absdiff AS DOUBLE)
                     / (2.0 * n_docs * total_chars) AS gini
            FROM a
        """,
        "benford_digits": """
            WITH c AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS centi
                       FROM events),
            d AS (SELECT event_type,
                         CAST(substr(CAST(centi AS VARCHAR), 1, 1) AS BIGINT)
                           AS digit
                  FROM c WHERE centi > 0)
            SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
            FROM d GROUP BY 1, 2
        """,
        "rand_projection": """
            WITH el AS (SELECT vec_id,
                               generate_subscripts(embedding, 1) - 1 AS j,
                               unnest(embedding) AS elem
                        FROM embeddings),
            m AS (SELECT vec_id, j,
                         CAST(round(CAST(elem AS DOUBLE) * 1e6) AS BIGINT)
                           AS micro
                  FROM el),
            dims AS (SELECT unnest(generate_series(0, 7)) AS dim),
            sgn AS (SELECT m.vec_id, dims.dim,
                           SUM(m.micro * (1 - 2 * CAST(
                               ((CAST(6364136223846793005 AS HUGEINT) * m.j
                                 + CAST(1442695040888963407 AS HUGEINT)
                                   * dims.dim)
                                % 18446744073709551616
                                // 137438953472) % 2 AS BIGINT)))
                             AS proj
                    FROM m, dims GROUP BY 1, 2)
            SELECT dim,
                   CAST(sum(CASE WHEN proj > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_pos,
                   CAST(sum(CASE WHEN proj < 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_neg,
                   CAST(sum(proj) AS BIGINT) AS sum_proj
            FROM sgn GROUP BY 1
        """,
        "ewma_decay": """
            WITH e AS (SELECT event_type,
                              CAST(event_id AS BIGINT) AS event_id,
                              epoch_ms(ts) AS t,
                              CAST(round(value * 100) AS BIGINT) AS centi
                       FROM events),
            r AS (SELECT *, row_number()
                             OVER (PARTITION BY event_type
                                   ORDER BY t DESC, event_id) AS rn
                  FROM e),
            k AS (SELECT * FROM r WHERE rn <= 16),
            a AS (SELECT event_type,
                         CAST(count(*) AS BIGINT) AS n_used,
                         CAST(sum(centi * (1::BIGINT << (16 - rn)))
                              AS BIGINT) AS decayed_centi,
                         CAST(sum(1::BIGINT << (16 - rn)) AS BIGINT) AS wsum
                  FROM k GROUP BY 1)
            SELECT event_type, n_used, decayed_centi,
                   CAST(decayed_centi AS DOUBLE) / wsum / 100.0 AS ewma
            FROM a
        """,
        "tpch_q10": """
            WITH r AS (
              SELECT CAST(o.o_custkey AS BIGINT) AS o_custkey,
                     SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
                       AS micro
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE l.l_returnflag = 'R'
                AND o.o_orderdate >= TIMESTAMP '1996-01-01'
                AND o.o_orderdate <  TIMESTAMP '1996-04-01'
              GROUP BY 1),
            t AS (SELECT *, row_number()
                             OVER (ORDER BY micro DESC, o_custkey) AS rn
                  FROM r)
            SELECT t.o_custkey AS c_custkey, c.c_name,
                   CAST(t.micro AS DOUBLE) / 10000.0 AS revenue,
                   c.c_acctbal, n.n_name
            FROM t
            JOIN customer c ON c.c_custkey = t.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            WHERE t.rn <= 20
        """,
    }
)

ORACLE_SQL.update(
    {
        "session_quantiles": """
            WITH e AS (SELECT CAST(user_id AS BIGINT) AS u, epoch_ms(ts) AS t
                       FROM events),
            l AS (SELECT u, t, lag(t) OVER (PARTITION BY u ORDER BY t) AS prev
                  FROM e),
            s AS (SELECT u, t,
                         sum(CASE WHEN prev IS NULL OR t - prev > 86400000
                                  THEN 1 ELSE 0 END)
                             OVER (PARTITION BY u ORDER BY t
                                   ROWS UNBOUNDED PRECEDING) AS sid
                  FROM l),
            c AS (SELECT u, sid, CAST(count(*) AS BIGINT) AS n_events
                  FROM s GROUP BY 1, 2)
            SELECT CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(quantile_disc(n_events, 0.5) AS BIGINT) AS p50_events,
                   CAST(quantile_disc(n_events, 0.9) AS BIGINT) AS p90_events
            FROM c
        """,
    }
)

# --- TPC-H completion wave oracles (pipelines/relational.py) ----------------
# Money stays in exact cent x cent micro int64 on BOTH engines with one final
# division (the tpch_q3 protocol); date bounds are epoch-ms literals.

ORACLE_SQL.update(
    {
        "tpch_q4": """
            SELECT o_orderpriority,
                   CAST(count(DISTINCT o_orderkey) AS BIGINT) AS order_count
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            WHERE epoch_ms(o_orderdate) >= 820454400000
              AND epoch_ms(o_orderdate) < 836179200000
              AND epoch_ms(l_shipdate) > epoch_ms(o_orderdate) + 5184000000
            GROUP BY 1
        """,
        "tpch_q7": """
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * CAST(round((1 - l_discount) * 100) AS BIGINT))
                        AS DOUBLE) / 10000.0 AS revenue
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation cn ON cn.n_nationkey = c_nationkey
            JOIN nation sn ON sn.n_nationkey = s_nationkey
            WHERE s_nationkey <> c_nationkey
              AND epoch_ms(l_shipdate) >= 820454400000
              AND epoch_ms(l_shipdate) < 883612800000
            GROUP BY 1, 2, 3
        """,
        "tpch_q8": """
            WITH t AS (
                SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l_discount) * 100) AS BIGINT) AS micro,
                       s_nationkey AS sn
                FROM lineitem
                JOIN orders ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation ON n_nationkey = c_nationkey
                JOIN region ON r_regionkey = n_regionkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN part ON p_partkey = l_partkey
                WHERE r_name = 'ASIA' AND p_type = 'PROMO'
                  AND epoch_ms(o_orderdate) >= 820454400000
                  AND epoch_ms(o_orderdate) < 915148800000
            )
            SELECT o_year,
                   CAST(sum(CASE WHEN sn = 0 THEN micro ELSE 0 END) AS DOUBLE)
                   / CAST(sum(micro) AS DOUBLE) AS mkt_share
            FROM t GROUP BY 1
        """,
        "tpch_q9": """
            SELECT n_name AS nation,
                   CAST(year(l_shipdate) AS BIGINT) AS o_year,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * CAST(round((1 - l_discount) * 100) AS BIGINT)
                            - CAST(round(p_retailprice * 100) AS BIGINT)
                              * CAST(round(l_quantity) AS BIGINT) * 100)
                        AS DOUBLE) / 10000.0 AS sum_profit
            FROM lineitem
            JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            GROUP BY 1, 2
        """,
        "tpch_q11": """
            WITH v AS (
                SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS c
                FROM lineitem GROUP BY 1
            )
            SELECT l_partkey, CAST(c AS DOUBLE) / 100.0 AS value
            FROM v
            WHERE c * (SELECT count(*) FROM v) > (SELECT sum(c) FROM v)
        """,
        "tpch_q15": """
            WITH rev AS (
                SELECT CAST(l_suppkey AS BIGINT) AS s,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS m
                FROM lineitem
                WHERE epoch_ms(l_shipdate) >= 820454400000
                  AND epoch_ms(l_shipdate) < 828316800000
                GROUP BY 1
            )
            SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
                   CAST(m AS DOUBLE) / 10000.0 AS total_revenue
            FROM rev JOIN supplier ON s_suppkey = s
            WHERE m = (SELECT max(m) FROM rev)
        """,
        "tpch_q16": """
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
              AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
              AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
              )
            GROUP BY 1, 2, 3
        """,
        "tpch_q17": """
            WITH s AS (
                SELECT CAST(l_partkey AS BIGINT) AS pk,
                       sum(CAST(round(l_quantity) AS BIGINT)) AS sum_q,
                       count(*) AS cnt
                FROM lineitem
                WHERE CAST(l_partkey AS BIGINT) IN (
                    SELECT CAST(p_partkey AS BIGINT) FROM part
                    WHERE p_brand = 'Brand#3'
                )
                GROUP BY 1
            )
            SELECT CAST(coalesce(sum(
                       CAST(round(l_extendedprice * 100) AS BIGINT)), 0)
                   AS DOUBLE) / 700.0 AS avg_yearly
            FROM lineitem JOIN s ON s.pk = CAST(l_partkey AS BIGINT)
            WHERE CAST(round(l_quantity) AS BIGINT) * 5 * cnt < sum_q
        """,
        "tpch_q19": """
            SELECT CAST(coalesce(sum(
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l_discount) * 100) AS BIGINT)), 0)
                   AS DOUBLE) / 10000.0 AS revenue
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size <= 10
                   AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 20)
               OR (p_brand = 'Brand#2' AND p_size <= 20
                   AND CAST(round(l_quantity) AS BIGINT) BETWEEN 5 AND 30)
               OR (p_brand = 'Brand#3' AND p_size <= 30
                   AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 40)
        """,
        "tpch_q21": """
            WITH f AS (
                SELECT CAST(o_orderkey AS BIGINT) AS ok,
                       epoch_ms(o_orderdate) AS od
                FROM orders WHERE o_orderstatus = 'F'
            ),
            ls AS (
                SELECT CAST(l_orderkey AS BIGINT) AS ok,
                       CAST(l_suppkey AS BIGINT) AS sk,
                       max(CASE WHEN epoch_ms(l_shipdate) > od + 7776000000
                                THEN 1 ELSE 0 END) AS late
                FROM lineitem JOIN f ON f.ok = CAST(l_orderkey AS BIGINT)
                GROUP BY 1, 2
            ),
            po AS (
                SELECT ok, count(*) AS n_supp, sum(late) AS n_late,
                       sum(late * sk) AS late_supp
                FROM ls GROUP BY 1
            )
            SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
                   CAST(count(*) AS BIGINT) AS numwait
            FROM po JOIN supplier ON s_suppkey = late_supp
            WHERE n_supp >= 2 AND n_late = 1
            GROUP BY 1, 2
        """,
        "tpch_q22": """
            WITH b AS (
                SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS bc,
                       CAST(c_custkey AS BIGINT) AS ck,
                       CAST(c_nationkey AS BIGINT) AS nk
                FROM customer
            ),
            g AS (
                SELECT sum(CASE WHEN bc > 0 THEN bc ELSE 0 END) AS sp,
                       sum(CASE WHEN bc > 0 THEN 1 ELSE 0 END) AS np
                FROM b
            )
            SELECT nk AS c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
                   CAST(sum(bc) AS DOUBLE) / 100.0 AS totacctbal
            FROM b, g
            WHERE bc * np > sp
              AND ck NOT IN (
                  SELECT CAST(o_custkey AS BIGINT) FROM orders
                  WHERE epoch_ms(o_orderdate) >= 820454400000
                    AND epoch_ms(o_orderdate) < 852076800000
              )
            GROUP BY 1
        """,
        "tpch_q2": """
            WITH comp AS (
                SELECT CAST(l_partkey AS BIGINT) AS pk,
                       min((CAST(round(s_acctbal * 100) AS BIGINT) + 10000000)
                           * 1048576 + CAST(s_suppkey AS BIGINT)) AS c
                FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                WHERE CAST(l_partkey AS BIGINT) IN (
                    SELECT CAST(p_partkey AS BIGINT) FROM part
                    WHERE p_size >= 40
                )
                GROUP BY 1
            )
            SELECT pk AS p_partkey, CAST(c % 1048576 AS BIGINT) AS s_suppkey,
                   s_name,
                   CAST(c // 1048576 - 10000000 AS DOUBLE) / 100.0 AS s_acctbal
            FROM comp JOIN supplier ON CAST(s_suppkey AS BIGINT) = c % 1048576
        """,
    }
)

# --- session-10 statistics wave oracles (pipelines/stats2.py) ---------------
# Exact-int censuses end-to-end; every float statistic is ONE mirrored
# cast/multiply/sqrt/divide sequence over identical exact integers
# (HUGEINT in SQL, Python bignums in the engine) — bit-identical results.

ORACLE_SQL.update(
    {
        "spearman_corr": """
            WITH e AS (SELECT (epoch_ms(ts) // 3600000) % 24 AS hod,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            c AS (SELECT hod, cv, CAST(count(*) AS BIGINT) AS n
                  FROM e GROUP BY 1, 2),
            vm AS (SELECT cv, sum(n) AS nv FROM c GROUP BY 1),
            vr AS (SELECT cv,
                          2 * coalesce(sum(nv) OVER (ORDER BY cv
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) + nv + 1 AS r2
                   FROM vm),
            hm AS (SELECT hod, sum(n) AS nh FROM c GROUP BY 1),
            hr AS (SELECT hod,
                          2 * coalesce(sum(nh) OVER (ORDER BY hod
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) + nh + 1 AS r2
                   FROM hm),
            m AS (SELECT CAST(sum(n) AS HUGEINT) AS n,
                         sum(CAST(n AS HUGEINT) * vr.r2) AS sx,
                         sum(CAST(n AS HUGEINT) * hr.r2) AS sy,
                         sum(CAST(n AS HUGEINT) * vr.r2 * vr.r2) AS sxx,
                         sum(CAST(n AS HUGEINT) * hr.r2 * hr.r2) AS syy,
                         sum(CAST(n AS HUGEINT) * vr.r2 * hr.r2) AS sxy
                  FROM c JOIN vr USING (cv) JOIN hr USING (hod))
            SELECT CAST(n AS BIGINT) AS n,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE)) AS rho
            FROM m
        """,
        "kendall_tau": """
            WITH e AS (SELECT (epoch_ms(ts) // 3600000) % 24 AS hod,
                              CAST(round(value * 100) AS BIGINT) // 5000 AS vb
                       FROM events),
            c AS (SELECT hod, vb, CAST(count(*) AS BIGINT) AS n
                  FROM e GROUP BY 1, 2),
            p AS (SELECT
                      coalesce(sum(CAST(c1.n AS HUGEINT) * c2.n)
                               FILTER (WHERE c2.vb > c1.vb), 0) AS conc,
                      coalesce(sum(CAST(c1.n AS HUGEINT) * c2.n)
                               FILTER (WHERE c2.vb < c1.vb), 0) AS disc
                  FROM c c1 JOIN c c2 ON c2.hod > c1.hod),
            hm AS (SELECT hod, sum(n) AS nh FROM c GROUP BY 1),
            vm AS (SELECT vb, sum(n) AS nv FROM c GROUP BY 1),
            tot AS (SELECT CAST(sum(n) AS HUGEINT) AS n FROM c),
            t1 AS (SELECT sum(CAST(nh AS HUGEINT) * (nh - 1) // 2) AS t
                   FROM hm),
            t2 AS (SELECT sum(CAST(nv AS HUGEINT) * (nv - 1) // 2) AS t
                   FROM vm)
            SELECT CAST(tot.n AS BIGINT) AS n,
                   CAST(conc AS BIGINT) AS concordant,
                   CAST(disc AS BIGINT) AS discordant,
                   CAST(conc - disc AS DOUBLE)
                   / sqrt(CAST(tot.n * (tot.n - 1) // 2 - t1.t AS DOUBLE)
                          * CAST(tot.n * (tot.n - 1) // 2 - t2.t AS DOUBLE))
                       AS tau_b
            FROM p, tot, t1, t2
        """,
        "theil_sen": """
            WITH e AS (SELECT (epoch_ms(ts) // 3600000) % 24 AS hod,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            h AS (SELECT hod, CAST(sum(cv) AS HUGEINT) AS s,
                         CAST(count(*) AS HUGEINT) AS c
                  FROM e GROUP BY 1),
            p AS (SELECT CAST(h2.s * h1.c - h1.s * h2.c AS DOUBLE)
                         / CAST((h2.hod - h1.hod) * h1.c * h2.c AS DOUBLE)
                             AS slope
                  FROM h h1 JOIN h h2 ON h2.hod > h1.hod)
            SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                   quantile_disc(slope, 0.5) / 100.0 AS theil_sen_slope
            FROM p
        """,
        "changepoint": """
            WITH e AS (SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            d AS (SELECT day_ms, CAST(sum(cv) AS HUGEINT) AS s,
                         CAST(count(*) AS HUGEINT) AS c
                  FROM e GROUP BY 1),
            o AS (SELECT sum(s) OVER (ORDER BY day_ms) AS sl,
                         sum(c) OVER (ORDER BY day_ms) AS nl,
                         lead(day_ms) OVER (ORDER BY day_ms) AS next_day
                  FROM d),
            tot AS (SELECT CAST(sum(s) AS HUGEINT) AS st,
                           CAST(sum(c) AS HUGEINT) AS nt FROM d),
            g AS (SELECT next_day AS split_day_ms,
                         (sl * sl * 1000000) // nl
                         + ((st - sl) * (st - sl) * 1000000) // (nt - nl)
                         - (st * st * 1000000) // nt AS gain_micro
                  FROM o, tot WHERE next_day IS NOT NULL)
            SELECT CAST(split_day_ms AS BIGINT) AS split_day_ms,
                   CAST(gain_micro AS DOUBLE) / 1e6 AS gain
            FROM g ORDER BY gain_micro DESC, split_day_ms ASC LIMIT 1
        """,
        "runs_test": """
            WITH med AS (SELECT quantile_disc(
                                    CAST(round(value * 100) AS BIGINT), 0.5
                                ) AS m FROM events),
            e AS (SELECT event_type, ts, event_id,
                         CASE WHEN CAST(round(value * 100) AS BIGINT) > m
                              THEN 1 ELSE 0 END AS sign
                  FROM events, med
                  WHERE CAST(round(value * 100) AS BIGINT) <> m),
            x AS (SELECT event_type, sign,
                         lag(sign) OVER (PARTITION BY event_type
                                         ORDER BY ts, event_id) AS prev
                  FROM e),
            r AS (SELECT event_type,
                         CAST(sum(CASE WHEN prev IS NULL OR sign <> prev
                                       THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
                         CAST(sum(sign) AS BIGINT) AS n_above,
                         CAST(count(*) AS BIGINT) AS n_total
                  FROM x GROUP BY 1)
            SELECT event_type, n_runs, n_above,
                   n_total - n_above AS n_below,
                   CAST(n_runs * n_total - n_total
                        - 2 * CAST(n_above AS HUGEINT) * (n_total - n_above)
                        AS DOUBLE)
                   * sqrt(CAST(n_total - 1 AS DOUBLE))
                   / sqrt(CAST(
                         2 * CAST(n_above AS HUGEINT) * (n_total - n_above)
                         * (2 * CAST(n_above AS HUGEINT) * (n_total - n_above)
                            - n_total) AS DOUBLE)) AS z
            FROM r
        """,
    }
)

# --- session-10 extras oracles (pipelines/extras.py) -------------------------

ORACLE_SQL.update(
    {
        "video_pure_frames": """
            WITH f AS (SELECT unnest(generate_series(0, 4, 2)) AS f),
            r AS (SELECT unnest(generate_series(0, 7)) AS r),
            c AS (SELECT unnest(generate_series(0, 7)) AS c),
            px AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                          (CAST(d.doc_id AS BIGINT) * 31 + f.f * 11
                           + r.r * 7 + c.c * 3) % 256 AS v
                   FROM documents d, f, r, c)
            SELECT doc_id, CAST(3 AS BIGINT) AS n_frames,
                   CAST(sum(v) AS BIGINT) AS pixel_sum,
                   CAST(sum(v) AS DOUBLE) / 192.0 AS mean_pixel
            FROM px GROUP BY 1
        """,
        "khop_reach": """
            WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                              source, n_chars // 100 AS cb
                       FROM documents),
            m1 AS (SELECT lang, cb, min(doc_id) AS a FROM d GROUP BY 1, 2),
            e1 AS (SELECT m1.a, d.doc_id AS b
                   FROM d JOIN m1 USING (lang, cb) WHERE d.doc_id != m1.a),
            m2 AS (SELECT source, cb, min(doc_id) AS a FROM d GROUP BY 1, 2),
            e2 AS (SELECT m2.a, d.doc_id AS b
                   FROM d JOIN m2 USING (source, cb) WHERE d.doc_id != m2.a),
            e AS (SELECT DISTINCT a, b
                  FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2)),
            s AS (SELECT min(doc_id) AS seed FROM d),
            rec AS (
                WITH RECURSIVE walk(node, depth) AS (
                    SELECT seed, 0 FROM s
                    UNION
                    SELECT CASE WHEN e.a = walk.node THEN e.b ELSE e.a END,
                           walk.depth + 1
                    FROM walk JOIN e ON e.a = walk.node OR e.b = walk.node
                    WHERE walk.depth < 3
                )
                SELECT count(DISTINCT node) AS n_reach FROM walk
            )
            SELECT s.seed, CAST(rec.n_reach AS BIGINT) AS n_reach
            FROM s, rec
        """,
        "l_diversity": """
            SELECT lang, n_chars // 1000 AS size_bucket,
                   CAST(count(DISTINCT source) AS BIGINT) AS l
            FROM documents GROUP BY 1, 2
        """,
        "quantile_cont": """
            WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS cv,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            s AS (SELECT cv, sum(n) OVER (ORDER BY cv) AS cum FROM c),
            nt AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM c),
            q AS (SELECT unnest([50, 90, 99]) AS pct),
            pos AS (SELECT pct, ((n - 1) * pct) // 100 AS lo0,
                           ((n - 1) * pct) % 100 AS fi,
                           least(((n - 1) * pct) // 100 + 1, n - 1) AS hi0
                    FROM q, nt)
            SELECT CAST(pct AS BIGINT) AS pct,
                   (CAST((SELECT min(cv) FROM s WHERE cum >= lo0 + 1)
                         AS DOUBLE)
                    + CAST((SELECT min(cv) FROM s WHERE cum >= hi0 + 1)
                           - (SELECT min(cv) FROM s WHERE cum >= lo0 + 1)
                           AS DOUBLE) * (fi / 100.0)) / 100.0 AS q_value
            FROM pos
        """,
        "mode_value": """
            WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS cv,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1)
            SELECT CAST(cv AS DOUBLE) / 100.0 AS mode_value, n AS n_mode
            FROM c ORDER BY n DESC, cv ASC LIMIT 1
        """,
    }
)

# --- second extras wave oracles ----------------------------------------------

ORACLE_SQL.update(
    {
        "welch_t": """
            WITH c AS (SELECT event_type, count(*) AS n,
                              sum(cv) AS s, sum(cv * cv) AS s2
                       FROM (SELECT event_type,
                                    CAST(value * 100 AS BIGINT) AS cv
                             FROM events)
                       GROUP BY 1),
            p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                         CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS m1,
                         CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS m2,
                         (CAST(a.n * a.s2 - a.s * a.s AS DOUBLE)
                          / (CAST(a.n AS DOUBLE)
                             * (CAST(a.n AS DOUBLE) - 1.0)))
                         / CAST(a.n AS DOUBLE) AS se1,
                         (CAST(b.n * b.s2 - b.s * b.s AS DOUBLE)
                          / (CAST(b.n AS DOUBLE)
                             * (CAST(b.n AS DOUBLE) - 1.0)))
                         / CAST(b.n AS DOUBLE) AS se2,
                         CAST(a.n AS DOUBLE) AS na, CAST(b.n AS DOUBLE) AS nb
                  FROM c a JOIN c b ON a.event_type < b.event_type)
            SELECT type_a, type_b,
                   round((m1 - m2) / sqrt(se1 + se2), 6) AS t_stat,
                   round(((se1 + se2) * (se1 + se2))
                         / ((se1 * se1) / (na - 1.0)
                            + (se2 * se2) / (nb - 1.0)), 6) AS df
            FROM p
        """,
        "skew_kurtosis": """
            WITH e AS (SELECT event_type,
                              CAST(value * 100 AS BIGINT) AS cv FROM events),
            c AS (SELECT event_type, cv, count(*) AS cnt FROM e GROUP BY 1, 2),
            m AS (SELECT event_type, sum(cnt) AS n,
                         sum(cv * cnt) AS s FROM c GROUP BY 1),
            t AS (SELECT c.event_type,
                         CAST(c.cv AS DOUBLE)
                         - CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE) AS d,
                         CAST(c.cnt AS DOUBLE) AS w
                  FROM c JOIN m USING (event_type)),
            f AS (SELECT event_type,
                         sum(CAST(floor((d * d) * w) AS HUGEINT)) AS f2,
                         sum(CAST(floor(((d * d) * d) * w) AS HUGEINT)) AS f3,
                         sum(CAST(floor((((d * d) * d) * d) * w)
                                  AS HUGEINT)) AS f4
                  FROM t GROUP BY 1)
            SELECT m.event_type, CAST(m.n AS BIGINT) AS n,
                   round((CAST(f.f3 AS DOUBLE) / CAST(m.n AS DOUBLE))
                         / (sqrt(CAST(f.f2 AS DOUBLE) / CAST(m.n AS DOUBLE))
                            * (CAST(f.f2 AS DOUBLE) / CAST(m.n AS DOUBLE))),
                         6) AS skewness,
                   round((CAST(f.f4 AS DOUBLE) / CAST(m.n AS DOUBLE))
                         / ((CAST(f.f2 AS DOUBLE) / CAST(m.n AS DOUBLE))
                            * (CAST(f.f2 AS DOUBLE) / CAST(m.n AS DOUBLE)))
                         - 3.0, 6) AS ex_kurtosis
            FROM f JOIN m USING (event_type) ORDER BY 1
        """,
        "mean_family": """
            WITH e AS (SELECT event_type,
                              CAST(value * 100 AS BIGINT) AS cv FROM events),
            c AS (SELECT event_type, cv, count(*) AS cnt
                  FROM e WHERE cv > 0 GROUP BY 1, 2),
            f AS (SELECT event_type, sum(cnt) AS n, sum(cv * cnt) AS s,
                         sum(CAST(floor((CAST(cnt AS DOUBLE)
                                         / CAST(cv AS DOUBLE))
                                        * 1000000000000.0)
                                  AS HUGEINT)) AS hf,
                         sum(CAST(floor(ln(CAST(cv AS DOUBLE)) * 1000000.0)
                                  AS HUGEINT) * cnt) AS lf
                  FROM c GROUP BY 1)
            SELECT event_type, CAST(n AS BIGINT) AS n_pos,
                   round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0,
                         6) AS arith_mean,
                   round((CAST(n AS DOUBLE)
                          / (CAST(hf AS DOUBLE) / 1000000000000.0)) / 100.0,
                         6) AS harmonic_mean,
                   round((CAST(lf AS DOUBLE) / 1000000.0)
                         / CAST(n AS DOUBLE), 6) AS log_gmean_cents
            FROM f ORDER BY 1
        """,
        "cross_corr": """
            WITH h AS (SELECT event_type,
                              epoch_ms(ts) // 3600000 AS hr,
                              sum(CAST(value * 100 AS BIGINT)) AS s
                       FROM events
                       WHERE event_type IN ('click', 'view')
                       GROUP BY 1, 2),
            x AS (SELECT hr, s FROM h WHERE event_type = 'click'),
            y AS (SELECT hr, s FROM h WHERE event_type = 'view'),
            l AS (SELECT unnest([0, 1, 2, 3]) AS lag),
            p AS (SELECT l.lag, x.s AS xs, y.s AS ys
                  FROM l JOIN x ON true JOIN y ON y.hr = x.hr + l.lag),
            a AS (SELECT lag, count(*) AS n, sum(xs) AS sx, sum(ys) AS sy,
                         sum(xs * xs) AS sxx, sum(ys * ys) AS syy,
                         sum(xs * ys) AS sxy
                  FROM p GROUP BY 1)
            SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
                   round(CAST(n * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))),
                         6) AS r
            FROM a ORDER BY lag
        """,
        "tpch_q20": """
            WITH w AS (SELECT CAST(p_partkey AS BIGINT) AS pk FROM part
                       WHERE p_name LIKE '%widget'),
            q AS (SELECT CAST(l_suppkey AS BIGINT) AS sk,
                         sum(CAST(round(l_quantity) AS BIGINT)) AS qall,
                         sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                                   AND l_shipdate < TIMESTAMP '1997-01-01'
                                  THEN CAST(round(l_quantity) AS BIGINT)
                                  ELSE 0 END) AS q96
                  FROM lineitem JOIN w ON CAST(l_partkey AS BIGINT) = w.pk
                  GROUP BY CAST(l_suppkey AS BIGINT),
                           CAST(l_partkey AS BIGINT))
            SELECT DISTINCT q.sk AS s_suppkey, s.s_name
            FROM q JOIN supplier s ON CAST(s.s_suppkey AS BIGINT) = q.sk
            WHERE q.q96 > 0 AND q.qall > 2 * q.q96
            ORDER BY 1
        """,
    }
)

ORACLE_SQL.update(
    {
        "cramers_v": """
            WITH s AS (SELECT event_type,
                              (epoch_ms(ts) // 3600000) % 24 AS hod
                       FROM events),
            cs AS (SELECT event_type, hod, count(*) AS o FROM s GROUP BY 1, 2),
            ty AS (SELECT DISTINCT event_type FROM s),
            hh AS (SELECT DISTINCT hod FROM s),
            grid AS (SELECT ty.event_type, hh.hod, coalesce(cs.o, 0) AS o
                     FROM ty CROSS JOIN hh
                     LEFT JOIN cs USING (event_type, hod)),
            tot AS (SELECT sum(o) AS n FROM grid),
            r AS (SELECT event_type, sum(o) AS rr FROM grid GROUP BY 1),
            c AS (SELECT hod, sum(o) AS cc FROM grid GROUP BY 1),
            cells AS (SELECT CAST(floor(
                          CAST(g.o * t.n - r.rr * c.cc AS DOUBLE)
                          * CAST(g.o * t.n - r.rr * c.cc AS DOUBLE)
                          / (CAST(t.n AS DOUBLE)
                             * CAST(r.rr * c.cc AS DOUBLE))
                          * 1e6) AS BIGINT) AS m
                      FROM grid g JOIN r USING (event_type)
                      JOIN c USING (hod) CROSS JOIN tot t),
            agg AS (SELECT CAST(sum(m) AS DOUBLE) / 1e6 AS chi2 FROM cells),
            mind AS (SELECT least((SELECT count(*) - 1 FROM ty),
                                  (SELECT count(*) - 1 FROM hh)) AS d)
            SELECT round(sqrt(agg.chi2
                              / (CAST((SELECT n FROM tot) AS DOUBLE)
                                 * CAST(mind.d AS DOUBLE))), 6) AS cramers_v,
                   round(agg.chi2, 6) AS chi2,
                   CAST((SELECT n FROM tot) AS BIGINT) AS n
            FROM agg, mind
        """,
        "mutual_information": """
            WITH s AS (SELECT event_type,
                              (epoch_ms(ts) // 3600000) % 24 AS hod
                       FROM events),
            cs AS (SELECT event_type, hod, count(*) AS o FROM s GROUP BY 1, 2),
            tot AS (SELECT sum(o) AS n FROM cs),
            r AS (SELECT event_type, sum(o) AS rr FROM cs GROUP BY 1),
            c AS (SELECT hod, sum(o) AS cc FROM cs GROUP BY 1),
            cells AS (SELECT CAST(floor(
                          ln(CAST(g.o * t.n AS DOUBLE)
                             / CAST(r.rr * c.cc AS DOUBLE)) * 1e6)
                          AS BIGINT) * g.o AS m
                      FROM cs g JOIN r USING (event_type)
                      JOIN c USING (hod) CROSS JOIN tot t
                      WHERE g.o > 0)
            SELECT round((CAST(sum(m) AS DOUBLE) / 1e6)
                         / CAST((SELECT n FROM tot) AS DOUBLE), 6) AS mi_nats,
                   CAST((SELECT n FROM tot) AS BIGINT) AS n
            FROM cells
        """,
        "jackknife_se": """
            WITH s AS (SELECT event_type,
                              (epoch_ms(ts) // 3600000) % 24 AS hod,
                              CAST(value * 100 AS BIGINT) AS cv FROM events),
            c AS (SELECT event_type, hod, count(*) AS nh, sum(cv) AS sh
                  FROM s GROUP BY 1, 2),
            t AS (SELECT event_type, sum(nh) AS n, sum(sh) AS ss,
                         count(*) AS g FROM c GROUP BY 1),
            th AS (SELECT c.event_type,
                          CAST(floor(CAST(t.ss - c.sh AS DOUBLE)
                                     / CAST(t.n - c.nh AS DOUBLE)
                                     * 1000000.0) AS BIGINT) AS tf
                   FROM c JOIN t USING (event_type)),
            tb AS (SELECT event_type, sum(tf) AS stf FROM th GROUP BY 1),
            d AS (SELECT th.event_type, t.g,
                         CAST(th.tf AS DOUBLE) / 1000000.0
                         - (CAST(tb.stf AS DOUBLE) / 1000000.0)
                           / CAST(t.g AS DOUBLE) AS dd
                  FROM th JOIN tb USING (event_type) JOIN t USING (event_type)),
            f AS (SELECT event_type, any_value(g) AS g,
                         sum(CAST(floor((dd * dd) * 1000000.0)
                                  AS BIGINT)) AS ssq
                  FROM d GROUP BY 1)
            SELECT event_type, CAST(g AS BIGINT) AS g_groups,
                   round(sqrt((CAST(g - 1 AS DOUBLE) / CAST(g AS DOUBLE))
                              * (CAST(ssq AS DOUBLE) / 1000000.0))
                         / 100.0, 6) AS jk_se
            FROM f ORDER BY 1
        """,
    }
)

ORACLE_SQL.update(
    {
        "kaplan_meier": """
            WITH u AS (SELECT user_id, min(epoch_ms(ts)) AS mn,
                              max(epoch_ms(ts)) AS mx
                       FROM events GROUP BY 1),
            dm AS (SELECT max(mx) AS dmax FROM u),
            d AS (SELECT (mx - mn) // 3600000 AS dur,
                         CASE WHEN dm.dmax - mx < 86400000
                              THEN 1 ELSE 0 END AS cens
                  FROM u, dm),
            c AS (SELECT dur, count(*) AS all_n,
                         sum(CASE WHEN cens = 0 THEN 1 ELSE 0 END) AS deaths
                  FROM d GROUP BY 1),
            k AS (SELECT dur, deaths,
                         (SELECT sum(all_n) FROM c)
                         - (sum(all_n) OVER (ORDER BY dur) - all_n) AS at_risk
                  FROM c),
            s AS (SELECT dur, at_risk, deaths,
                         CAST(floor(ln(CAST(at_risk - deaths AS DOUBLE)
                                       / CAST(at_risk AS DOUBLE))
                                    * 1000000.0) AS BIGINT) AS term
                  FROM k WHERE deaths > 0 AND at_risk > deaths),
            f AS (SELECT dur, at_risk, deaths,
                         sum(term) OVER (ORDER BY dur) AS lt FROM s)
            SELECT CAST(dur AS BIGINT) AS duration_h,
                   CAST(at_risk AS BIGINT) AS at_risk,
                   CAST(deaths AS BIGINT) AS deaths,
                   round(CAST(lt AS DOUBLE) / 1000000.0, 6) AS log_surv
            FROM f ORDER BY 1
        """,
        "linreg_2f": """
            WITH s AS (SELECT (epoch_ms(ts) // 3600000) % 24 AS h,
                              ((epoch_ms(ts) // 86400000) + 4) % 7 AS d,
                              CAST(value * 100 AS BIGINT) AS cv FROM events),
            m AS (SELECT CAST(count(*) AS HUGEINT) AS s1,
                         CAST(sum(h) AS HUGEINT) AS sh,
                         CAST(sum(d) AS HUGEINT) AS sd,
                         CAST(sum(h * h) AS HUGEINT) AS shh,
                         CAST(sum(d * d) AS HUGEINT) AS sdd,
                         CAST(sum(h * d) AS HUGEINT) AS shd,
                         CAST(sum(cv) AS HUGEINT) AS sy,
                         CAST(sum(h * cv) AS HUGEINT) AS shy,
                         CAST(sum(d * cv) AS HUGEINT) AS sdy
                  FROM s),
            dets AS (SELECT s1,
                        s1 * (shh * sdd - shd * shd)
                        - sh * (sh * sdd - shd * sd)
                        + sd * (sh * shd - shh * sd) AS det,
                        sy * (shh * sdd - shd * shd)
                        - sh * (shy * sdd - shd * sdy)
                        + sd * (shy * shd - shh * sdy) AS d0,
                        s1 * (shy * sdd - shd * sdy)
                        - sy * (sh * sdd - shd * sd)
                        + sd * (sh * sdy - shy * sd) AS d1,
                        s1 * (shh * sdy - shy * shd)
                        - sh * (sh * sdy - shy * sd)
                        + sy * (sh * shd - shh * sd) AS d2
                     FROM m)
            SELECT CAST(s1 AS BIGINT) AS n,
                   round((CAST(d0 AS DOUBLE) / CAST(det AS DOUBLE)) / 100.0,
                         6) AS beta0,
                   round((CAST(d1 AS DOUBLE) / CAST(det AS DOUBLE)) / 100.0,
                         6) AS beta_hod,
                   round((CAST(d2 AS DOUBLE) / CAST(det AS DOUBLE)) / 100.0,
                         6) AS beta_dow
            FROM dets
        """,
    }
)

ORACLE_SQL.update(
    {
        "t_closeness": """
            WITH d AS (SELECT lang, n_chars // 100 AS sb, source
                       FROM documents),
            g AS (SELECT lang, sb, source, count(*) AS ngs
                  FROM d GROUP BY 1, 2, 3),
            gg AS (SELECT lang, sb, sum(ngs) AS ng FROM g GROUP BY 1, 2),
            s AS (SELECT source, sum(ngs) AS ns FROM g GROUP BY 1),
            tot AS (SELECT sum(ngs) AS n FROM g),
            grid AS (SELECT gg.lang, gg.sb, gg.ng, s.ns, t.n,
                            coalesce(g.ngs, 0) AS ngs
                     FROM gg CROSS JOIN s
                     LEFT JOIN g ON g.lang = gg.lang AND g.sb = gg.sb
                                AND g.source = s.source
                     CROSS JOIN tot t),
            f AS (SELECT lang, sb, any_value(ng) AS ng, any_value(n) AS n,
                         sum(abs(ngs * n - ns * ng)) AS num
                  FROM grid GROUP BY 1, 2)
            SELECT lang, CAST(sb AS BIGINT) AS size_bucket,
                   round(CAST(num AS DOUBLE)
                         / ((2.0 * CAST(ng AS DOUBLE)) * CAST(n AS DOUBLE)),
                         6) AS t_close
            FROM f ORDER BY 1, 2
        """,
        "adamic_adar": """
            WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                              source, n_chars // 100 AS cb
                       FROM documents),
            m1 AS (SELECT lang, cb, min(doc_id) AS a FROM d GROUP BY 1, 2),
            e1 AS (SELECT m1.a, d.doc_id AS b
                   FROM d JOIN m1 USING (lang, cb) WHERE d.doc_id != m1.a),
            m2 AS (SELECT source, cb, min(doc_id) AS a FROM d GROUP BY 1, 2),
            e2 AS (SELECT m2.a, d.doc_id AS b
                   FROM d JOIN m2 USING (source, cb) WHERE d.doc_id != m2.a),
            e AS (SELECT DISTINCT a, b
                  FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2)),
            dd AS (SELECT DISTINCT w, x FROM (
                       SELECT a AS w, b AS x FROM e
                       UNION ALL SELECT b AS w, a AS x FROM e)),
            dg AS (SELECT w, count(*) AS k FROM dd GROUP BY 1),
            t AS (SELECT w, CAST(floor(1000000.0
                                       / ln(CAST(k AS DOUBLE)))
                                 AS BIGINT) AS term
                  FROM dg WHERE k BETWEEN 2 AND 64),
            p AS (SELECT d1.x AS a, d2.x AS b, t.term
                  FROM dd d1 JOIN dd d2 ON d1.w = d2.w AND d1.x < d2.x
                  JOIN t ON t.w = d1.w),
            sc AS (SELECT a, b, sum(term) AS s FROM p GROUP BY 1, 2)
            SELECT a, b, round(CAST(s AS DOUBLE) / 1000000.0, 6) AS aa_score
            FROM sc ORDER BY s DESC, a, b LIMIT 20
        """,
    }
)

ORACLE_SQL.update(
    {
        "readability": r"""
            WITH c AS (SELECT lang, count(*) AS n_docs,
                              sum(len(regexp_extract_all(text,
                                                         '\S+'))) AS words,
                              sum(len(regexp_extract_all(
                                  text, '\S{6,}'))) AS longw,
                              sum(len(regexp_extract_all(
                                  text, '[aeiouAEIOU]+'))) AS vgroups
                       FROM documents GROUP BY 1)
            SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(words AS BIGINT) AS words,
                   CAST(longw AS BIGINT) AS longw,
                   CAST(vgroups AS BIGINT) AS vgroups,
                   round(CAST(words AS DOUBLE) / CAST(n_docs AS DOUBLE),
                         6) AS wpd,
                   round(CAST(words AS DOUBLE) / CAST(n_docs AS DOUBLE)
                         + (100.0 * (CAST(longw AS DOUBLE)
                                     / CAST(words AS DOUBLE))),
                         6) AS lix
            FROM c ORDER BY 1
        """,
    }
)

ORACLE_SQL.update(
    {
        "ndcg_at_k": """
            WITH r AS (SELECT lang, CAST(doc_id AS BIGINT) % 4 AS g,
                              row_number() OVER (PARTITION BY lang
                                  ORDER BY n_chars DESC, doc_id ASC) AS rk
                       FROM documents),
            t AS (SELECT lang, g, rk FROM r WHERE rk <= 10),
            d AS (SELECT lang,
                         sum(CAST(floor((CAST(g AS DOUBLE)
                                         / (ln(CAST(rk + 1 AS DOUBLE))
                                            / ln(2.0))) * 1000000.0)
                                  AS BIGINT)) AS dcg_f
                  FROM t GROUP BY 1),
            i AS (SELECT lang, g,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY g DESC) AS irk
                  FROM t),
            ii AS (SELECT lang,
                          sum(CAST(floor((CAST(g AS DOUBLE)
                                          / (ln(CAST(irk + 1 AS DOUBLE))
                                             / ln(2.0))) * 1000000.0)
                                   AS BIGINT)) AS idcg_f
                   FROM i GROUP BY 1)
            SELECT d.lang,
                   round(CAST(d.dcg_f AS DOUBLE) / 1000000.0, 6) AS dcg,
                   round(CAST(d.dcg_f AS DOUBLE)
                         / CAST(ii.idcg_f AS DOUBLE), 6) AS ndcg
            FROM d JOIN ii USING (lang) ORDER BY 1
        """,
    }
)

ORACLE_SQL.update(
    {
        "sax_words": """
            WITH s AS (SELECT event_type,
                              epoch_ms(ts) // 86400000 AS day,
                              ((epoch_ms(ts) // 3600000) % 24) // 6 AS seg,
                              CAST(value * 100 AS BIGINT) AS cv FROM events),
            c AS (SELECT event_type, day, seg, count(*) AS n,
                         sum(cv) AS ss FROM s GROUP BY 1, 2, 3),
            g AS (SELECT event_type, sum(n) AS nn, sum(ss) AS tot
                  FROM c GROUP BY 1),
            l AS (SELECT c.event_type, c.day, c.seg,
                         chr(97
                             + CASE WHEN 2 * CAST(c.ss AS HUGEINT) * g.nn
                                         > CAST(g.tot AS HUGEINT) * c.n
                                    THEN 1 ELSE 0 END
                             + CASE WHEN CAST(c.ss AS HUGEINT) * g.nn
                                         > CAST(g.tot AS HUGEINT) * c.n
                                    THEN 1 ELSE 0 END
                             + CASE WHEN 2 * CAST(c.ss AS HUGEINT) * g.nn
                                         > 3 * CAST(g.tot AS HUGEINT) * c.n
                                    THEN 1 ELSE 0 END) AS letter
                  FROM c JOIN g USING (event_type)),
            w AS (SELECT event_type, day,
                         string_agg(letter, '' ORDER BY seg) AS word,
                         count(*) AS nseg
                  FROM l GROUP BY 1, 2)
            SELECT event_type, word, CAST(count(*) AS BIGINT) AS n_days
            FROM w WHERE nseg = 4 GROUP BY 1, 2 ORDER BY 1, 2
        """,
    }
)

ORACLE_SQL.update(
    {
        "media_equalize": """
            WITH px AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                               (CAST(d.doc_id AS BIGINT) * 31
                                + t1.r * 7 + t2.c * 3) % 256 AS v
                        FROM documents d,
                             (SELECT unnest(generate_series(0, 7)) AS r) t1,
                             (SELECT unnest(generate_series(0, 7)) AS c) t2),
            c AS (SELECT doc_id, v, count(*) AS cnt FROM px GROUP BY 1, 2),
            k AS (SELECT doc_id, v, cnt,
                         sum(cnt) OVER (PARTITION BY doc_id
                                        ORDER BY v) AS cdf,
                         min(v) OVER (PARTITION BY doc_id) AS vmin
                  FROM c),
            m AS (SELECT doc_id,
                         max(CASE WHEN v = vmin THEN cdf END) AS cdf_min
                  FROM k GROUP BY 1),
            e AS (SELECT k.doc_id, k.cnt,
                         ((k.cdf - m.cdf_min) * 255)
                         // (64 - m.cdf_min) AS nv
                  FROM k JOIN m USING (doc_id))
            SELECT doc_id, CAST(sum(nv * cnt) AS BIGINT) AS eq_sum,
                   CAST(min(nv) AS BIGINT) AS eq_min,
                   CAST(max(nv) AS BIGINT) AS eq_max
            FROM e GROUP BY 1
        """,
        "attribution": """
            WITH o AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
                              event_type FROM events),
            w AS (SELECT event_type, ms,
                         last_value(CASE WHEN event_type != 'purchase'
                                         THEN event_type END IGNORE NULLS)
                             OVER (PARTITION BY user_id
                                   ORDER BY ms, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS prev_type,
                         last_value(CASE WHEN event_type != 'purchase'
                                         THEN ms END IGNORE NULLS)
                             OVER (PARTITION BY user_id
                                   ORDER BY ms, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS prev_ms
                  FROM o),
            p AS (SELECT CASE WHEN prev_type IS NOT NULL
                               AND ms - prev_ms <= 3600000
                              THEN prev_type ELSE 'none' END AS attributed
                  FROM w WHERE event_type = 'purchase')
            SELECT attributed, CAST(count(*) AS BIGINT) AS n_purchases
            FROM p GROUP BY 1 ORDER BY 1
        """,
    }
)

ORACLE_SQL.update(
    {
        "fano_factor": """
            WITH s AS (SELECT event_type,
                              epoch_ms(ts) // 3600000 AS hr FROM events),
            c AS (SELECT event_type, hr, count(*) AS c FROM s GROUP BY 1, 2),
            g AS (SELECT max(hr) - min(hr) + 1 AS hours FROM c),
            f AS (SELECT event_type, sum(c) AS s1, sum(c * c) AS s2
                  FROM c GROUP BY 1)
            SELECT f.event_type, CAST(g.hours AS BIGINT) AS n_hours,
                   CAST(f.s1 AS BIGINT) AS n_events,
                   round(CAST(g.hours * f.s2 - f.s1 * f.s1 AS DOUBLE)
                         / CAST(g.hours * f.s1 AS DOUBLE), 6) AS fano
            FROM f, g ORDER BY 1
        """,
    }
)

# Session-12 statistics (pipelines/stats3.py): trend / randomness /
# stability tests over the dense per-type hourly count grid.
from .stats3 import (  # noqa: E402
    q_allan_variance,
    q_mann_kendall,
    q_turning_points,
)

QUERIES.update({
    "mann_kendall": q_mann_kendall,
    "turning_points": q_turning_points,
    "allan_variance": q_allan_variance,
})

# Shared dense-grid CTE prefix for the session-12 oracles: the census,
# the corpus hour grid, and the zero-filled per-type series.
_DENSE_GRID_CTE = """
            WITH cs AS (SELECT event_type, epoch_ms(ts) // 3600000 AS hr,
                               count(*) AS c
                        FROM events GROUP BY 1, 2),
            bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM cs),
            hours AS (SELECT unnest(generate_series(lo, hi)) AS hr
                      FROM bounds),
            types AS (SELECT DISTINCT event_type FROM events),
            d AS (SELECT t.event_type, h.hr, COALESCE(cs.c, 0) AS c
                  FROM types t CROSS JOIN hours h
                  LEFT JOIN cs ON cs.event_type = t.event_type
                              AND cs.hr = h.hr),
            hh AS (SELECT count(*) AS hh FROM hours)
"""

ORACLE_SQL.update(
    {
        "mann_kendall": _DENSE_GRID_CTE + """
            , s AS (SELECT a.event_type,
                           CAST(sum(CASE WHEN b.c > a.c THEN 1
                                         WHEN b.c < a.c THEN -1
                                         ELSE 0 END) AS BIGINT) AS s_stat
                    FROM d a JOIN d b ON b.event_type = a.event_type
                                     AND b.hr > a.hr
                    GROUP BY 1),
            ties AS (SELECT event_type,
                            CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                                AS tie_sum
                     FROM (SELECT event_type, c, count(*) AS t
                           FROM d GROUP BY 1, 2)
                     GROUP BY 1),
            v AS (SELECT s.event_type, s.s_stat,
                         CAST(hh.hh * (hh.hh - 1) * (2 * hh.hh + 5)
                              - ties.tie_sum AS BIGINT) AS var_num
                  FROM s JOIN ties USING (event_type) CROSS JOIN hh)
            SELECT event_type, s_stat, var_num,
                   round(CASE WHEN s_stat > 0 THEN
                                (CAST(s_stat AS DOUBLE) - 1.0)
                                / sqrt(CAST(var_num AS DOUBLE) / 18.0)
                              WHEN s_stat < 0 THEN
                                (CAST(s_stat AS DOUBLE) + 1.0)
                                / sqrt(CAST(var_num AS DOUBLE) / 18.0)
                              ELSE 0.0 END, 6) AS z
            FROM v ORDER BY 1
        """,
        "turning_points": _DENSE_GRID_CTE + """
            , w AS (SELECT event_type, c,
                           lag(c) OVER win AS c0, lead(c) OVER win AS c2
                    FROM d
                    WINDOW win AS (PARTITION BY event_type ORDER BY hr)),
            tp AS (SELECT event_type,
                          CAST(sum(CASE WHEN (c0 < c AND c > c2)
                                          OR (c0 > c AND c < c2)
                                        THEN 1 ELSE 0 END) AS BIGINT)
                              AS t_points
                   FROM w WHERE c0 IS NOT NULL AND c2 IS NOT NULL
                   GROUP BY 1)
            SELECT event_type, t_points, CAST(hh.hh AS BIGINT) AS n_hours,
                   round((CAST(t_points AS DOUBLE)
                          - 2.0 * CAST(hh.hh - 2 AS DOUBLE) / 3.0)
                         / sqrt((16.0 * CAST(hh.hh AS DOUBLE) - 29.0)
                                / 90.0), 6) AS z
            FROM tp CROSS JOIN hh ORDER BY 1
        """,
        "allan_variance": _DENSE_GRID_CTE + """
            , taus AS (SELECT unnest([1, 2, 4]) AS tau),
            wins AS (SELECT d.event_type, t.tau,
                            (d.hr - b.lo) // t.tau AS w,
                            sum(d.c) AS wsum
                     FROM d CROSS JOIN taus t CROSS JOIN bounds b
                          CROSS JOIN hh
                     WHERE (d.hr - b.lo) // t.tau < hh.hh // t.tau
                     GROUP BY 1, 2, 3),
            difs AS (SELECT event_type, tau,
                            wsum - lag(wsum) OVER
                                (PARTITION BY event_type, tau ORDER BY w)
                                AS dw
                     FROM wins),
            agg AS (SELECT event_type, tau,
                           CAST(count(*) + 1 AS BIGINT) AS m_windows,
                           CAST(sum(dw * dw) AS BIGINT) AS ssd
                    FROM difs WHERE dw IS NOT NULL GROUP BY 1, 2)
            SELECT event_type, CAST(tau AS BIGINT) AS tau, m_windows,
                   round(CAST(ssd AS DOUBLE)
                         / CAST(2 * (m_windows - 1) * tau * tau
                                AS DOUBLE), 6) AS avar
            FROM agg ORDER BY 1, 2
        """,
    }
)

# Session-12 wave 2 (pipelines/stats3.py): spectral / ordinal / portmanteau.
from .stats3 import (  # noqa: E402
    q_diurnal_amplitude,
    q_ljung_box,
    q_permutation_entropy,
)

QUERIES.update({
    "diurnal_amplitude": q_diurnal_amplitude,
    "permutation_entropy": q_permutation_entropy,
    "ljung_box": q_ljung_box,
})

ORACLE_SQL.update(
    {
        "diurnal_amplitude": """
            WITH trig(d, fc, fs) AS (VALUES
                (0, 1000000, 0), (1, 965925, 258819), (2, 866025, 499999),
                (3, 707106, 707106), (4, 500000, 866025),
                (5, 258819, 965925), (6, 0, 1000000), (7, -258820, 965925),
                (8, -500000, 866025), (9, -707107, 707106),
                (10, -866026, 499999), (11, -965926, 258819),
                (12, -1000000, 0), (13, -965926, -258820),
                (14, -866026, -500000), (15, -707107, -707107),
                (16, -500001, -866026), (17, -258820, -965926),
                (18, -1, -1000000), (19, 258819, -965926),
                (20, 500000, -866026), (21, 707106, -707107),
                (22, 866025, -500001), (23, 965925, -258820)),
            s AS (SELECT event_type,
                         (epoch_ms(ts) // 3600000) % 24 AS d FROM events),
            cs AS (SELECT event_type, d, count(*) AS t FROM s GROUP BY 1, 2),
            ab AS (SELECT cs.event_type,
                          CAST(sum(cs.t * trig.fc) AS BIGINT) AS a,
                          CAST(sum(cs.t * trig.fs) AS BIGINT) AS b,
                          CAST(sum(cs.t) AS BIGINT) AS s1
                   FROM cs JOIN trig USING (d) GROUP BY 1)
            SELECT event_type, s1 AS n, a AS a_cos, b AS b_sin,
                   round(sqrt(CAST(CAST(a AS HUGEINT) * a
                                   + CAST(b AS HUGEINT) * b AS DOUBLE))
                         / (1e6 * CAST(s1 AS DOUBLE)), 6) AS amp_ratio
            FROM ab ORDER BY 1
        """,
        "permutation_entropy": _DENSE_GRID_CTE + """
            , w AS (SELECT event_type, c AS c1,
                           lag(c) OVER win AS c0, lead(c) OVER win AS c2
                    FROM d
                    WINDOW win AS (PARTITION BY event_type ORDER BY hr)),
            p AS (SELECT event_type,
                         4 * CAST(c0 <= c1 AS INT)
                         + 2 * CAST(c0 <= c2 AS INT)
                         + CAST(c1 <= c2 AS INT) AS pid
                  FROM w WHERE c0 IS NOT NULL AND c2 IS NOT NULL),
            cs2 AS (SELECT event_type, pid, count(*) AS np
                    FROM p GROUP BY 1, 2),
            nn AS (SELECT event_type, CAST(sum(np) AS BIGINT) AS n
                   FROM cs2 GROUP BY 1),
            terms AS (SELECT cs2.event_type,
                             CAST(floor(ln(CAST(cs2.np AS DOUBLE)
                                           / CAST(nn.n AS DOUBLE)) * 1e6)
                                  AS BIGINT) * cs2.np AS m
                      FROM cs2 JOIN nn USING (event_type)),
            pe AS (SELECT t.event_type, nn.n AS n_windows,
                          round(-(CAST(sum(t.m) AS DOUBLE) / 1e6)
                                / CAST(nn.n AS DOUBLE), 6) AS pe_nats
                   FROM terms t JOIN nn ON nn.event_type = t.event_type
                   GROUP BY 1, 2)
            SELECT event_type, n_windows, pe_nats,
                   round(pe_nats / 1.791759, 6) AS pe_norm
            FROM pe ORDER BY 1
        """,
        "ljung_box": _DENSE_GRID_CTE + """
            , lags AS (SELECT unnest([1, 2, 3, 4, 5, 6]) AS k),
            lj AS (SELECT a.event_type, l.k,
                          CAST(sum(a.c * b.c) AS BIGINT) AS pk,
                          CAST(sum(a.c) AS BIGINT) AS ak,
                          CAST(sum(b.c) AS BIGINT) AS bk
                   FROM d a CROSS JOIN lags l
                   JOIN d b ON b.event_type = a.event_type
                           AND b.hr = a.hr + l.k
                   GROUP BY 1, 2),
            base AS (SELECT event_type, CAST(sum(c * c) AS BIGINT) AS p0,
                            CAST(sum(c) AS BIGINT) AS s1
                     FROM d GROUP BY 1),
            rk AS (SELECT lj.event_type, lj.k,
                          CAST(hh.hh * hh.hh * lj.pk
                               - hh.hh * base.s1 * (lj.ak + lj.bk)
                               + (hh.hh - lj.k) * base.s1 * base.s1
                               AS DOUBLE)
                          / CAST(hh.hh * (hh.hh * base.p0
                                          - base.s1 * base.s1)
                                 AS DOUBLE) AS r
                   FROM lj JOIN base USING (event_type) CROSS JOIN hh),
            terms AS (SELECT event_type,
                             CAST(floor(r * r / (hh.hh - k) * 1e12)
                                  AS BIGINT) AS term,
                             CASE WHEN k = 1 THEN round(r, 6) END AS r1
                      FROM rk CROSS JOIN hh)
            SELECT t.event_type, CAST(hh.hh AS BIGINT) AS n_hours,
                   max(t.r1) AS r1,
                   round(CAST(hh.hh * (hh.hh + 2) AS DOUBLE)
                         * (CAST(sum(t.term) AS DOUBLE) / 1e12), 6) AS lb_q
            FROM terms t CROSS JOIN hh
            GROUP BY t.event_type, hh.hh ORDER BY 1
        """,
    }
)

# Session-12 wave 3 (pipelines/stats3.py): vocabulary shape, divergence,
# inequality.
from .stats3 import (  # noqa: E402
    q_hapax_rate,
    q_jsd_types,
    q_theil_index,
    q_zipf_slope,
)

QUERIES.update({
    "zipf_slope": q_zipf_slope,
    "hapax_rate": q_hapax_rate,
    "jsd_types": q_jsd_types,
    "theil_index": q_theil_index,
})

ORACLE_SQL.update(
    {
        "zipf_slope": """
            WITH tok AS (SELECT unnest(regexp_extract_all(text,
                                       '[A-Za-z]+')) AS term
                         FROM documents),
            cs AS (SELECT lower(term) AS term, count(*) AS tf
                   FROM tok GROUP BY 1),
            top AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, term)
                            AS rank
                    FROM cs ORDER BY tf DESC, term LIMIT 100),
            xy AS (SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e6)
                               AS BIGINT) AS x,
                          CAST(floor(ln(CAST(tf AS DOUBLE)) * 1e6)
                               AS BIGINT) AS y
                   FROM top),
            s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(x) AS BIGINT) AS sx,
                         CAST(sum(y) AS BIGINT) AS sy,
                         CAST(sum(x * x) AS BIGINT) AS sxx,
                         CAST(sum(x * y) AS BIGINT) AS sxy
                  FROM xy)
            SELECT n AS n_terms,
                   round(CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE), 6)
                       AS zipf_slope
            FROM s
        """,
        "hapax_rate": """
            WITH tok AS (SELECT lang,
                                unnest(regexp_extract_all(text,
                                       '[A-Za-z]+')) AS term
                         FROM documents),
            cs AS (SELECT COALESCE(lang, '') AS lang, lower(term) AS term,
                          count(*) AS n
                   FROM tok GROUP BY 1, 2),
            agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS vocab,
                           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                                AS BIGINT) AS hapax,
                           CAST(sum(n) AS BIGINT) AS tokens
                    FROM cs GROUP BY 1)
            SELECT lang, vocab, hapax, tokens,
                   round(CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE), 6)
                       AS hapax_rate,
                   round(CAST(vocab AS DOUBLE) / CAST(tokens AS DOUBLE), 6)
                       AS ttr
            FROM agg ORDER BY 1
        """,
        "jsd_types": """
            WITH s AS (SELECT event_type,
                              (epoch_ms(ts) // 3600000) % 24 AS d
                       FROM events),
            cs AS (SELECT event_type, d, count(*) AS t FROM s GROUP BY 1, 2),
            tot AS (SELECT event_type, CAST(sum(t) AS BIGINT) AS tt
                    FROM cs GROUP BY 1),
            pairs AS (SELECT a.event_type AS ta, a.tt AS na,
                             b.event_type AS tb, b.tt AS nb
                      FROM tot a JOIN tot b ON a.event_type < b.event_type),
            dd AS (SELECT unnest(generate_series(0, 23)) AS d),
            grid AS (SELECT p.ta, p.tb, p.na, p.nb,
                            COALESCE(ca.t, 0) AS ad, COALESCE(cb.t, 0) AS bd
                     FROM pairs p CROSS JOIN dd
                     LEFT JOIN cs ca ON ca.event_type = p.ta
                                    AND ca.d = dd.d
                     LEFT JOIN cs cb ON cb.event_type = p.tb
                                    AND cb.d = dd.d),
            terms AS (SELECT ta, tb, na, nb,
                             CASE WHEN ad > 0 THEN
                               ad * CAST(floor(ln(
                                 CAST(2 * ad * nb AS DOUBLE)
                                 / CAST(ad * nb + bd * na AS DOUBLE))
                                 * 1e6) AS BIGINT)
                             ELSE 0 END AS tp,
                             CASE WHEN bd > 0 THEN
                               bd * CAST(floor(ln(
                                 CAST(2 * bd * na AS DOUBLE)
                                 / CAST(ad * nb + bd * na AS DOUBLE))
                                 * 1e6) AS BIGINT)
                             ELSE 0 END AS tq
                      FROM grid)
            SELECT ta AS type_a, tb AS type_b, na AS n_a, nb AS n_b,
                   round(CAST(sum(tp) AS DOUBLE) / (2e6 * CAST(na AS DOUBLE))
                         + CAST(sum(tq) AS DOUBLE)
                           / (2e6 * CAST(nb AS DOUBLE)), 6) AS jsd_nats
            FROM terms GROUP BY ta, tb, na, nb ORDER BY 1, 2
        """,
        "theil_index": """
            WITH u AS (SELECT user_id,
                              CAST(sum(CAST(round(value * 100) AS BIGINT))
                                   AS BIGINT) AS x
                       FROM events GROUP BY 1),
            g AS (SELECT CAST(sum(x) AS BIGINT) AS s,
                         CAST(count(*) AS BIGINT) AS n FROM u),
            t AS (SELECT CAST(floor(ln(CAST(u.x * g.n AS DOUBLE)
                                       / CAST(g.s AS DOUBLE)) * 1e6)
                              AS BIGINT) * u.x AS m
                  FROM u CROSS JOIN g)
            SELECT (SELECT n FROM g) AS n_users,
                   round((CAST(sum(m) AS DOUBLE) / 1e6)
                         / CAST((SELECT s FROM g) AS DOUBLE), 6) AS theil
            FROM t
        """,
    }
)

# Session-12 wave 4 (pipelines/stats3.py): extreme values, self-similarity,
# epidemiology-style 2x2.
from .stats3 import (  # noqa: E402
    q_gumbel_daily_max,
    q_hurst_aggvar,
    q_odds_ratio,
)

QUERIES.update({
    "gumbel_daily_max": q_gumbel_daily_max,
    "hurst_aggvar": q_hurst_aggvar,
    "odds_ratio": q_odds_ratio,
})

ORACLE_SQL.update(
    {
        "gumbel_daily_max": _DENSE_GRID_CTE + """
            , nd AS (SELECT hh // 24 AS n_days FROM hh),
            dm AS (SELECT d.event_type, (d.hr - b.lo) // 24 AS day,
                          max(d.c) AS mx
                   FROM d CROSS JOIN bounds b CROSS JOIN nd
                   WHERE (d.hr - b.lo) // 24 < nd.n_days
                   GROUP BY 1, 2),
            mom AS (SELECT event_type, CAST(count(*) AS BIGINT) AS dd,
                           CAST(sum(mx) AS BIGINT) AS s1,
                           CAST(sum(mx * mx) AS BIGINT) AS s2
                    FROM dm GROUP BY 1),
            fit AS (SELECT event_type, dd, s1,
                           sqrt(CAST(dd * s2 - s1 * s1 AS DOUBLE)
                                / CAST(dd * (dd - 1) AS DOUBLE))
                           * 0.779696 AS beta
                    FROM mom)
            SELECT event_type, dd AS n_days, s1 AS max_sum,
                   round(beta, 6) AS gumbel_beta,
                   round(CAST(s1 AS DOUBLE) / CAST(dd AS DOUBLE)
                         - 0.577216 * beta, 6) AS gumbel_mu
            FROM fit ORDER BY 1
        """,
        "hurst_aggvar": _DENSE_GRID_CTE + """
            , sizes(m, lnm) AS (VALUES (1, 0), (2, 693147), (4, 1386294),
                                       (8, 2079441), (16, 2772588)),
            wins AS (SELECT d.event_type, s.m, s.lnm,
                            (d.hr - b.lo) // s.m AS w, sum(d.c) AS wsum
                     FROM d CROSS JOIN sizes s CROSS JOIN bounds b
                          CROSS JOIN hh
                     WHERE (d.hr - b.lo) // s.m < hh.hh // s.m
                     GROUP BY 1, 2, 3, 4),
            v AS (SELECT event_type, m, lnm,
                         CAST(count(*) AS BIGINT) AS mm,
                         CAST(sum(wsum * wsum) AS BIGINT) AS sww,
                         CAST(sum(wsum) AS BIGINT) AS sw
                  FROM wins GROUP BY 1, 2, 3),
            pts AS (SELECT event_type, CAST(lnm AS BIGINT) AS x,
                           CAST(floor(ln(
                               CAST(mm * sww - sw * sw AS DOUBLE)
                               / CAST(mm * (mm - 1) * m * m AS DOUBLE))
                               * 1e6) AS BIGINT) AS y
                    FROM v),
            ols AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(x) AS BIGINT) AS sx,
                           CAST(sum(y) AS BIGINT) AS sy,
                           CAST(sum(x * x) AS BIGINT) AS sxx,
                           CAST(sum(x * y) AS BIGINT) AS sxy
                    FROM pts GROUP BY 1),
            sl AS (SELECT event_type,
                          CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
                   FROM ols)
            SELECT event_type, round(slope, 6) AS slope,
                   round(1.0 + slope / 2.0, 6) AS hurst
            FROM sl ORDER BY 1
        """,
        "odds_ratio": """
            WITH s AS (SELECT
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p,
                CASE WHEN ((epoch_ms(ts) // 86400000) + 3) % 7 >= 5
                     THEN 1 ELSE 0 END AS w
                FROM events),
            c AS (SELECT
                CAST(sum(CASE WHEN p = 1 AND w = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS a,
                CAST(sum(CASE WHEN p = 1 AND w = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS b,
                CAST(sum(CASE WHEN p = 0 AND w = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS c,
                CAST(sum(CASE WHEN p = 0 AND w = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS d
                FROM s),
            f AS (SELECT a, b, c, d,
                         CASE WHEN least(a, b, c, d) = 0 THEN 0.0
                              ELSE CAST(floor(ln(CAST(a * d AS DOUBLE)
                                            / CAST(b * c AS DOUBLE)) * 1e6)
                                        AS BIGINT) / 1e6 END AS lor,
                         CASE WHEN least(a, b, c, d) = 0 THEN 0.0
                              ELSE sqrt(1.0 / a + 1.0 / b
                                        + 1.0 / c + 1.0 / d) END AS se
                  FROM c)
            SELECT a AS n_pw, b AS n_pd, c AS n_ow, d AS n_od,
                   round(CASE WHEN least(a, b, c, d) = 0 THEN 0.0
                              ELSE CAST(a * d AS DOUBLE)
                                   / CAST(b * c AS DOUBLE) END,
                         6) AS odds_ratio,
                   lor AS log_or,
                   CASE WHEN least(a, b, c, d) = 0 THEN 0.0
                        ELSE round(lor - 1.959964 * se, 6) END AS ci_lo,
                   CASE WHEN least(a, b, c, d) = 0 THEN 0.0
                        ELSE round(lor + 1.959964 * se, 6) END AS ci_hi
            FROM f
        """,
    }
)

# Session-12 wave 5 (pipelines/stats3.py): distributional distance,
# concordance, directional coupling.
from .stats3 import (  # noqa: E402
    q_bhattacharyya,
    q_kendall_w,
    q_transfer_entropy,
)

QUERIES.update({
    "bhattacharyya": q_bhattacharyya,
    "kendall_w": q_kendall_w,
    "transfer_entropy": q_transfer_entropy,
})

ORACLE_SQL.update(
    {
        "bhattacharyya": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            cs AS (SELECT event_type, cv, count(*) AS n
                   FROM s GROUP BY 1, 2),
            tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tt
                    FROM cs GROUP BY 1),
            terms AS (SELECT a.event_type AS ta, b.event_type AS tb,
                             ta_t.tt AS na, tb_t.tt AS nb,
                             CAST(floor(sqrt(
                                 CAST(a.n * b.n AS DOUBLE)
                                 / CAST(ta_t.tt * tb_t.tt AS DOUBLE))
                                 * 1e12) AS BIGINT) AS term
                      FROM cs a
                      JOIN cs b ON b.cv = a.cv
                              AND a.event_type < b.event_type
                      JOIN tot ta_t ON ta_t.event_type = a.event_type
                      JOIN tot tb_t ON tb_t.event_type = b.event_type),
            bcs AS (SELECT ta, tb,
                           CAST(sum(term) AS DOUBLE) / 1e12 AS bc
                    FROM terms GROUP BY 1, 2)
            SELECT ta AS type_a, tb AS type_b, round(bc, 6) AS bc,
                   round(sqrt(1.0 - bc), 6) AS hellinger
            FROM bcs ORDER BY 1, 2
        """,
        "kendall_w": """
            WITH s AS (SELECT event_type,
                              (epoch_ms(ts) // 3600000) % 24 AS d
                       FROM events),
            cs AS (SELECT event_type, d, count(*) AS t FROM s GROUP BY 1, 2),
            types AS (SELECT DISTINCT event_type FROM events),
            dd AS (SELECT unnest(generate_series(0, 23)) AS d),
            grid AS (SELECT ty.event_type, dd.d, COALESCE(cs.t, 0) AS t
                     FROM types ty CROSS JOIN dd
                     LEFT JOIN cs ON cs.event_type = ty.event_type
                                 AND cs.d = dd.d),
            ranked AS (SELECT event_type, d, t,
                              2 * (rank() OVER (PARTITION BY event_type
                                                ORDER BY t) - 1)
                              + count(*) OVER (PARTITION BY event_type, t)
                              + 1 AS r2
                       FROM grid),
            rsum AS (SELECT d, CAST(sum(r2) AS BIGINT) AS r2d
                     FROM ranked GROUP BY 1),
            ties AS (SELECT CAST(sum(g * g * g - g) AS BIGINT) AS tie_sum
                     FROM (SELECT event_type, t, count(*) AS g
                           FROM grid GROUP BY 1, 2)),
            kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM types),
            agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(r2d) AS BIGINT) AS sr,
                           CAST(sum(r2d * r2d) AS BIGINT) AS srr
                    FROM rsum)
            SELECT kk.k AS k_judges, agg.n AS n_items,
                   round(CAST(3 * (agg.n * agg.srr - agg.sr * agg.sr)
                              AS DOUBLE)
                         / CAST(agg.n * (kk.k * kk.k
                                         * (agg.n * agg.n * agg.n - agg.n)
                                         - kk.k * ties.tie_sum)
                                AS DOUBLE), 6) AS kendall_w
            FROM agg CROSS JOIN kk CROSS JOIN ties
        """,
        "transfer_entropy": _DENSE_GRID_CTE + """
            , tots AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1
                       FROM d GROUP BY 1),
            bits AS (SELECT d.event_type, d.hr,
                            CASE WHEN d.c * hh.hh > t.s1
                                 THEN 1 ELSE 0 END AS b
                     FROM d JOIN tots t USING (event_type) CROSS JOIN hh),
            pairs AS (SELECT a.event_type AS src, b.event_type AS dst
                      FROM types a JOIN types b
                        ON a.event_type <> b.event_type),
            tri AS (SELECT p.src, p.dst, x1.b AS x1, x0.b AS x0, y0.b AS y0,
                           count(*) AS n
                    FROM pairs p
                    JOIN bits x0 ON x0.event_type = p.dst
                    JOIN bits x1 ON x1.event_type = p.dst
                               AND x1.hr = x0.hr + 1
                    JOIN bits y0 ON y0.event_type = p.src
                               AND y0.hr = x0.hr
                    GROUP BY 1, 2, 3, 4, 5),
            m_xy AS (SELECT src, dst, x0, y0,
                            CAST(sum(n) AS BIGINT) AS n
                     FROM tri GROUP BY 1, 2, 3, 4),
            m_xx AS (SELECT src, dst, x1, x0,
                            CAST(sum(n) AS BIGINT) AS n
                     FROM tri GROUP BY 1, 2, 3, 4),
            m_x AS (SELECT src, dst, x0, CAST(sum(n) AS BIGINT) AS n
                    FROM tri GROUP BY 1, 2, 3),
            terms AS (SELECT t.src, t.dst,
                             t.n * CAST(floor(ln(
                                 CAST(t.n * mx.n AS DOUBLE)
                                 / CAST(mxy.n * mxx.n AS DOUBLE)) * 1e6)
                                 AS BIGINT) AS m
                      FROM tri t
                      JOIN m_xy mxy ON mxy.src = t.src AND mxy.dst = t.dst
                                   AND mxy.x0 = t.x0 AND mxy.y0 = t.y0
                      JOIN m_xx mxx ON mxx.src = t.src AND mxx.dst = t.dst
                                   AND mxx.x1 = t.x1 AND mxx.x0 = t.x0
                      JOIN m_x mx ON mx.src = t.src AND mx.dst = t.dst
                                 AND mx.x0 = t.x0),
            te AS (SELECT src, dst,
                          round((CAST(sum(m) AS DOUBLE) / 1e6)
                                / CAST(hh.hh - 1 AS DOUBLE), 6) AS te_nats
                   FROM terms CROSS JOIN hh GROUP BY src, dst, hh.hh)
            SELECT src AS src_type, dst AS dst_type,
                   CAST(hh.hh - 1 AS BIGINT) AS n_trans, te_nats
            FROM te CROSS JOIN hh ORDER BY 1, 2
        """,
    }
)

# Session-12 wave 6 (pipelines/stats3.py): heavy tails, reliability,
# paired comparison.
from .stats3 import (  # noqa: E402
    q_cronbach_alpha,
    q_hill_tail,
    q_sign_test,
)

QUERIES.update({
    "hill_tail": q_hill_tail,
    "cronbach_alpha": q_cronbach_alpha,
    "sign_test": q_sign_test,
})

ORACLE_SQL.update(
    {
        "hill_tail": """
            WITH u AS (SELECT user_id,
                              CAST(sum(CAST(round(value * 100) AS BIGINT))
                                   AS BIGINT) AS x
                       FROM events GROUP BY 1),
            top AS (SELECT x FROM u ORDER BY x DESC LIMIT 51),
            mn AS (SELECT CAST(min(x) AS BIGINT) AS xmin,
                          CAST(count(*) - 1 AS BIGINT) AS k FROM top),
            t AS (SELECT CAST(floor(ln(CAST(top.x AS DOUBLE)
                                       / CAST(mn.xmin AS DOUBLE)) * 1e6)
                              AS BIGINT) AS m
                  FROM top CROSS JOIN mn)
            SELECT mn.k AS n_tail, mn.xmin AS x_min,
                   round(CAST(mn.k AS DOUBLE) * 1e6
                         / CAST(sum(t.m) AS DOUBLE), 6) AS hill_alpha
            FROM t CROSS JOIN mn GROUP BY mn.k, mn.xmin
        """,
        "cronbach_alpha": _DENSE_GRID_CTE + """
            , nd AS (SELECT hh // 24 AS n_days FROM hh),
            dc AS (SELECT d.event_type, (d.hr - b.lo) // 24 AS day,
                          CAST(sum(d.c) AS BIGINT) AS x
                   FROM d CROSS JOIN bounds b CROSS JOIN nd
                   WHERE (d.hr - b.lo) // 24 < nd.n_days
                   GROUP BY 1, 2),
            items AS (SELECT event_type, CAST(sum(x) AS BIGINT) AS s,
                             CAST(sum(x * x) AS BIGINT) AS q
                      FROM dc GROUP BY 1),
            ni AS (SELECT CAST(sum(nd.n_days * i.q - i.s * i.s) AS BIGINT)
                          AS num_items,
                          CAST(count(*) AS BIGINT) AS k
                   FROM items i CROSS JOIN nd GROUP BY ALL),
            tots AS (SELECT day, CAST(sum(x) AS BIGINT) AS t
                     FROM dc GROUP BY 1),
            nt AS (SELECT CAST((SELECT n_days FROM nd) * sum(t * t)
                               - sum(t) * sum(t) AS BIGINT) AS num_total
                   FROM tots)
            SELECT ni.k AS k_items,
                   CAST(nd.n_days AS BIGINT) AS n_days,
                   round((CAST(ni.k AS DOUBLE) / CAST(ni.k - 1 AS DOUBLE))
                         * (1.0 - CAST(ni.num_items AS DOUBLE)
                                  / CAST(nt.num_total AS DOUBLE)), 6)
                       AS cronbach_alpha
            FROM ni CROSS JOIN nt CROSS JOIN nd
        """,
        "sign_test": _DENSE_GRID_CTE + """
            , p AS (SELECT a.event_type AS ta, b.event_type AS tb,
                           CAST(sum(CASE WHEN a.c > b.c THEN 1 ELSE 0 END)
                                AS BIGINT) AS a,
                           CAST(sum(CASE WHEN a.c < b.c THEN 1 ELSE 0 END)
                                AS BIGINT) AS b
                    FROM d a JOIN d b ON b.hr = a.hr
                                     AND a.event_type < b.event_type
                    GROUP BY 1, 2)
            SELECT ta AS type_a, tb AS type_b, a AS n_gt, b AS n_lt,
                   round(CASE WHEN a + b = 0 THEN 0.0
                              ELSE (2.0 * CAST(a AS DOUBLE)
                                    - CAST(a + b AS DOUBLE))
                                   / sqrt(CAST(a + b AS DOUBLE)) END,
                         6) AS z
            FROM p ORDER BY 1, 2
        """,
    }
)

# Session-12 wave 7 (pipelines/stats3.py): rank-paired test, spectral
# shape, exact audience continuity.
from .stats3 import (  # noqa: E402
    q_dau_jaccard,
    q_spectral_flatness,
    q_wilcoxon_signed,
)

QUERIES.update({
    "wilcoxon_signed": q_wilcoxon_signed,
    "spectral_flatness": q_spectral_flatness,
    "dau_jaccard": q_dau_jaccard,
})

_TRIG24_VALUES = """(VALUES
                (0, 1000000, 0), (1, 965925, 258819), (2, 866025, 499999),
                (3, 707106, 707106), (4, 500000, 866025),
                (5, 258819, 965925), (6, 0, 1000000), (7, -258820, 965925),
                (8, -500000, 866025), (9, -707107, 707106),
                (10, -866026, 499999), (11, -965926, 258819),
                (12, -1000000, 0), (13, -965926, -258820),
                (14, -866026, -500000), (15, -707107, -707107),
                (16, -500001, -866026), (17, -258820, -965926),
                (18, -1, -1000000), (19, 258819, -965926),
                (20, 500000, -866026), (21, 707106, -707107),
                (22, 866025, -500001), (23, 965925, -258820))"""

ORACLE_SQL.update(
    {
        "wilcoxon_signed": _DENSE_GRID_CTE + """
            , dif AS (SELECT a.event_type AS ta, b.event_type AS tb,
                             a.c - b.c AS dv, abs(a.c - b.c) AS ad
                      FROM d a JOIN d b ON b.hr = a.hr
                                       AND a.event_type < b.event_type
                      WHERE a.c <> b.c),
            ranked AS (SELECT ta, tb, dv,
                              2 * (rank() OVER (PARTITION BY ta, tb
                                                ORDER BY ad) - 1)
                              + count(*) OVER (PARTITION BY ta, tb, ad)
                              + 1 AS r2
                       FROM dif),
            ties AS (SELECT ta, tb,
                            CAST(sum(g * g * g - g) AS BIGINT) AS tie_sum
                     FROM (SELECT ta, tb, ad, count(*) AS g
                           FROM dif GROUP BY 1, 2, 3)
                     GROUP BY 1, 2),
            agg AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(CASE WHEN dv > 0 THEN r2 ELSE 0 END)
                                AS BIGINT) AS w2
                    FROM ranked GROUP BY 1, 2)
            SELECT agg.ta AS type_a, agg.tb AS type_b,
                   agg.n AS n_nonzero, agg.w2,
                   round((CAST(agg.w2 AS DOUBLE)
                          - CAST(agg.n * (agg.n + 1) AS DOUBLE) / 2.0)
                         / sqrt(CAST(2 * agg.n * (agg.n + 1)
                                     * (2 * agg.n + 1) - ties.tie_sum
                                     AS DOUBLE) / 12.0), 6) AS z
            FROM agg JOIN ties ON ties.ta = agg.ta AND ties.tb = agg.tb
            ORDER BY 1, 2
        """,
        "spectral_flatness": """
            WITH trig(d, fc, fs) AS """ + _TRIG24_VALUES + """,
            s AS (SELECT event_type,
                         (epoch_ms(ts) // 3600000) % 24 AS d FROM events),
            cs AS (SELECT event_type, d, count(*) AS t FROM s GROUP BY 1, 2),
            ks AS (SELECT unnest(generate_series(1, 11)) AS k),
            ab AS (SELECT cs.event_type, ks.k,
                          CAST(sum(cs.t * tc.fc) AS BIGINT) AS a,
                          CAST(sum(cs.t * tc.fs) AS BIGINT) AS b
                   FROM cs CROSS JOIN ks
                   JOIN trig tc ON tc.d = (ks.k * cs.d) % 24
                   GROUP BY 1, 2),
            p AS (SELECT event_type, k,
                         CAST(a AS HUGEINT) * a + CAST(b AS HUGEINT) * b
                             AS pk
                  FROM ab),
            agg AS (SELECT event_type,
                           CAST(sum(CAST(floor(ln(CAST(pk AS DOUBLE))
                                               * 1e6) AS BIGINT))
                                AS BIGINT) AS slnp,
                           sum(pk) AS sump
                    FROM p GROUP BY 1)
            SELECT event_type,
                   round(CAST(slnp AS DOUBLE) / (11 * 1e6)
                         - CAST(floor(ln(CAST(sump AS DOUBLE) / 11.0)
                                      * 1e6) AS BIGINT) / 1e6, 6)
                       AS ln_flatness
            FROM agg ORDER BY 1
        """,
        "dau_jaccard": """
            WITH ud AS (SELECT DISTINCT user_id,
                               epoch_ms(ts) // 86400000 AS day
                        FROM events),
            act AS (SELECT day, CAST(count(*) AS BIGINT) AS a
                    FROM ud GROUP BY 1),
            bth AS (SELECT a.day, CAST(count(*) AS BIGINT) AS b
                    FROM ud a JOIN ud b ON b.user_id = a.user_id
                                       AND b.day = a.day + 1
                    GROUP BY 1)
            SELECT CAST(a1.day AS BIGINT) AS day, a1.a AS n_day,
                   a2.a AS n_next, COALESCE(bth.b, 0) AS n_both,
                   round(CAST(COALESCE(bth.b, 0) AS DOUBLE)
                         / CAST(a1.a + a2.a - COALESCE(bth.b, 0)
                                AS DOUBLE), 6) AS jaccard
            FROM act a1 JOIN act a2 ON a2.day = a1.day + 1
            LEFT JOIN bth ON bth.day = a1.day
            ORDER BY 1
        """,
    }
)

# Session-12 wave 8 (pipelines/stats3.py): agreement, blocked ranks,
# collision diversity.
from .stats3 import (  # noqa: E402
    q_cohen_kappa,
    q_friedman_test,
    q_renyi2_entropy,
)

QUERIES.update({
    "cohen_kappa": q_cohen_kappa,
    "friedman_test": q_friedman_test,
    "renyi2_entropy": q_renyi2_entropy,
})

ORACLE_SQL.update(
    {
        "cohen_kappa": _DENSE_GRID_CTE + """
            , tots AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1
                       FROM d GROUP BY 1),
            bits AS (SELECT d.event_type, d.hr,
                            CASE WHEN d.c * hh.hh > t.s1
                                 THEN 1 ELSE 0 END AS b
                     FROM d JOIN tots t USING (event_type) CROSS JOIN hh),
            p AS (SELECT x.event_type AS ta, y.event_type AS tb,
                         CAST(sum(CASE WHEN x.b = y.b THEN 1 ELSE 0 END)
                              AS BIGINT) AS agree,
                         CAST(sum(x.b) AS BIGINT) AS a1,
                         CAST(sum(y.b) AS BIGINT) AS b1
                  FROM bits x JOIN bits y ON y.hr = x.hr
                                         AND x.event_type < y.event_type
                  GROUP BY 1, 2)
            SELECT p.ta AS type_a, p.tb AS type_b, p.agree AS n_agree,
                   round(CAST(hh.hh * p.agree - p.a1 * p.b1
                              - (hh.hh - p.a1) * (hh.hh - p.b1)
                              AS DOUBLE)
                         / CAST(hh.hh * hh.hh - p.a1 * p.b1
                                - (hh.hh - p.a1) * (hh.hh - p.b1)
                                AS DOUBLE), 6) AS kappa
            FROM p CROSS JOIN hh ORDER BY 1, 2
        """,
        "friedman_test": _DENSE_GRID_CTE + """
            , kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM types),
            ranked AS (SELECT event_type, hr,
                              2 * (rank() OVER (PARTITION BY hr
                                                ORDER BY c) - 1)
                              + count(*) OVER (PARTITION BY hr, c)
                              + 1 AS r2
                       FROM d),
            rj AS (SELECT event_type, CAST(sum(r2) AS BIGINT) AS r2j
                   FROM ranked GROUP BY 1),
            aggs AS (SELECT CAST(sum(r2j * r2j) AS BIGINT) AS srr FROM rj),
            a2 AS (SELECT CAST(sum(r2 * r2) AS BIGINT) AS a2 FROM ranked)
            SELECT kk.k AS k_types, CAST(hh.hh AS BIGINT) AS n_blocks,
                   round(CAST((kk.k - 1)
                              * (aggs.srr - hh.hh * hh.hh * kk.k
                                 * (kk.k + 1) * (kk.k + 1)) AS DOUBLE)
                         / CAST(a2.a2 - hh.hh * kk.k
                                * (kk.k + 1) * (kk.k + 1)
                                AS DOUBLE), 6) AS chi2
            FROM kk CROSS JOIN hh CROSS JOIN aggs CROSS JOIN a2
        """,
        "renyi2_entropy": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            cs AS (SELECT event_type, cv, count(*) AS n
                   FROM s GROUP BY 1, 2),
            agg AS (SELECT event_type,
                           CAST(sum(n) AS BIGINT) AS tot,
                           CAST(sum(n * n) AS BIGINT) AS coll
                    FROM cs GROUP BY 1)
            SELECT event_type, tot AS n,
                   round(-CAST(floor(ln(CAST(coll AS DOUBLE)
                                        / CAST(tot * tot AS DOUBLE))
                                     * 1e6) AS BIGINT) / 1e6, 6) AS renyi2
            FROM agg ORDER BY 1
        """,
    }
)

# Session-12 wave 9 (pipelines/stats3.py): seasonality strength, ACF
# half-life, symbolic richness.
from .stats3 import (  # noqa: E402
    q_acf_halflife,
    q_kmer_richness,
    q_seasonal_strength,
)

QUERIES.update({
    "seasonal_strength": q_seasonal_strength,
    "acf_halflife": q_acf_halflife,
    "kmer_richness": q_kmer_richness,
})

ORACLE_SQL.update(
    {
        "seasonal_strength": _DENSE_GRID_CTE + """
            , nd AS (SELECT hh // 24 AS n_days, (hh // 24) * 24 AS use_h
                     FROM hh),
            dw AS (SELECT d.event_type, d.c,
                          (d.hr - b.lo) % 24 AS hod
                   FROM d CROSS JOIN bounds b CROSS JOIN nd
                   WHERE d.hr - b.lo < nd.use_h),
            sh AS (SELECT event_type, hod, CAST(sum(c) AS BIGINT) AS s_hod
                   FROM dw GROUP BY 1, 2),
            r AS (SELECT dw.event_type,
                         CAST(sum((nd.n_days * dw.c - sh.s_hod)
                                  * (nd.n_days * dw.c - sh.s_hod))
                              AS BIGINT) AS ssr,
                         CAST(sum(dw.c) AS BIGINT) AS s1,
                         CAST(sum(dw.c * dw.c) AS BIGINT) AS p0
                  FROM dw JOIN sh ON sh.event_type = dw.event_type
                                 AND sh.hod = dw.hod
                  CROSS JOIN nd GROUP BY 1)
            SELECT event_type,
                   round(1.0 - CAST(nd.use_h * r.ssr AS DOUBLE)
                               / CAST(nd.n_days * nd.n_days
                                      * (nd.use_h * r.p0 - r.s1 * r.s1)
                                      AS DOUBLE), 6) AS r2_seasonal
            FROM r CROSS JOIN nd ORDER BY 1
        """,
        "acf_halflife": _DENSE_GRID_CTE + """
            , lags AS (SELECT unnest(generate_series(1, 48)) AS k),
            lj AS (SELECT a.event_type, l.k,
                          CAST(sum(a.c * b.c) AS BIGINT) AS pk,
                          CAST(sum(a.c) AS BIGINT) AS ak,
                          CAST(sum(b.c) AS BIGINT) AS bk
                   FROM d a CROSS JOIN lags l
                   JOIN d b ON b.event_type = a.event_type
                           AND b.hr = a.hr + l.k
                   GROUP BY 1, 2),
            base AS (SELECT event_type, CAST(sum(c * c) AS BIGINT) AS p0,
                            CAST(sum(c) AS BIGINT) AS s1
                     FROM d GROUP BY 1),
            covs AS (SELECT lj.event_type, lj.k,
                            CAST(hh.hh * hh.hh * lj.pk
                                 - hh.hh * base.s1 * (lj.ak + lj.bk)
                                 + (hh.hh - lj.k) * base.s1 * base.s1
                                 AS BIGINT) AS covk,
                            CAST(hh.hh * (hh.hh * base.p0
                                          - base.s1 * base.s1)
                                 AS BIGINT) AS den
                     FROM lj JOIN base USING (event_type) CROSS JOIN hh),
            c1 AS (SELECT event_type, covk AS cov1, den
                   FROM covs WHERE k = 1),
            hl AS (SELECT c.event_type, CAST(min(c.k) AS BIGINT)
                              AS halflife
                   FROM covs c JOIN c1 USING (event_type)
                   WHERE c.k >= 2 AND 2 * c.covk < c1.cov1
                   GROUP BY 1)
            SELECT c1.event_type,
                   CAST(COALESCE(hl.halflife, -1) AS BIGINT) AS halflife,
                   round(CAST(c1.cov1 AS DOUBLE)
                         / CAST(c1.den AS DOUBLE), 6) AS r1,
                   CASE WHEN hl.halflife IS NULL THEN 0.0
                        ELSE round(CAST(ch.covk AS DOUBLE)
                                   / CAST(c1.den AS DOUBLE), 6)
                   END AS r_half
            FROM c1 LEFT JOIN hl USING (event_type)
            LEFT JOIN covs ch ON ch.event_type = c1.event_type
                             AND ch.k = hl.halflife
            ORDER BY 1
        """,
        "kmer_richness": _DENSE_GRID_CTE + """
            , tots AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1
                       FROM d GROUP BY 1),
            bits AS (SELECT d.event_type, d.hr,
                            CASE WHEN d.c * hh.hh > t.s1
                                 THEN 1 ELSE 0 END AS b
                     FROM d JOIN tots t USING (event_type) CROSS JOIN hh),
            w AS (SELECT event_type,
                         b + 2 * lead(b, 1) OVER win
                         + 4 * lead(b, 2) OVER win
                         + 8 * lead(b, 3) OVER win
                         + 16 * lead(b, 4) OVER win
                         + 32 * lead(b, 5) OVER win
                         + 64 * lead(b, 6) OVER win
                         + 128 * lead(b, 7) OVER win AS wid,
                         lead(b, 7) OVER win AS b7
                  FROM bits
                  WINDOW win AS (PARTITION BY event_type ORDER BY hr)),
            dist AS (SELECT event_type,
                            CAST(count(DISTINCT wid) AS BIGINT) AS nd,
                            CAST(count(*) AS BIGINT) AS nw
                     FROM w WHERE b7 IS NOT NULL GROUP BY 1)
            SELECT event_type, nw AS n_windows, nd AS n_distinct,
                   round(CAST(nd AS DOUBLE)
                         / CAST(least(256, nw) AS DOUBLE), 6) AS richness
            FROM dist ORDER BY 1
        """,
    }
)

# Session-12 wave 10 (pipelines/stats3.py): partial autocorrelation,
# stochastic ordering, median test.
from .stats3 import (  # noqa: E402
    q_moods_median,
    q_pacf2,
    q_stochastic_dominance,
)

QUERIES.update({
    "pacf2": q_pacf2,
    "stochastic_dominance": q_stochastic_dominance,
    "moods_median": q_moods_median,
})

ORACLE_SQL.update(
    {
        "pacf2": _DENSE_GRID_CTE + """
            , lags AS (SELECT unnest([1, 2]) AS k),
            lj AS (SELECT a.event_type, l.k,
                          CAST(sum(a.c * b.c) AS BIGINT) AS pk,
                          CAST(sum(a.c) AS BIGINT) AS ak,
                          CAST(sum(b.c) AS BIGINT) AS bk
                   FROM d a CROSS JOIN lags l
                   JOIN d b ON b.event_type = a.event_type
                           AND b.hr = a.hr + l.k
                   GROUP BY 1, 2),
            base AS (SELECT event_type, CAST(sum(c * c) AS BIGINT) AS p0,
                            CAST(sum(c) AS BIGINT) AS s1
                     FROM d GROUP BY 1),
            covs AS (SELECT lj.event_type, lj.k,
                            CAST(hh.hh * hh.hh * lj.pk
                                 - hh.hh * base.s1 * (lj.ak + lj.bk)
                                 + (hh.hh - lj.k) * base.s1 * base.s1
                                 AS HUGEINT) AS covk,
                            CAST(hh.hh * (hh.hh * base.p0
                                          - base.s1 * base.s1)
                                 AS HUGEINT) AS c0
                     FROM lj JOIN base USING (event_type) CROSS JOIN hh),
            w AS (SELECT c1.event_type, c1.covk AS c1v, c2.covk AS c2v,
                         c1.c0
                  FROM covs c1 JOIN covs c2
                    ON c2.event_type = c1.event_type
                   AND c1.k = 1 AND c2.k = 2)
            SELECT event_type,
                   round(CAST(c1v AS DOUBLE) / CAST(c0 AS DOUBLE), 6)
                       AS phi11,
                   round(CAST(c2v * c0 - c1v * c1v AS DOUBLE)
                         / CAST(c0 * c0 - c1v * c1v AS DOUBLE), 6)
                       AS phi22
            FROM w ORDER BY 1
        """,
        "stochastic_dominance": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            cs AS (SELECT event_type, cv, count(*) AS n
                   FROM s GROUP BY 1, 2),
            tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tt
                    FROM cs GROUP BY 1),
            pairs AS (SELECT a.event_type AS ta, a.tt AS na,
                             b.event_type AS tb, b.tt AS nb
                      FROM tot a JOIN tot b ON a.event_type < b.event_type),
            sup AS (SELECT p.ta, p.tb, p.na, p.nb, v.cv,
                           COALESCE(ca.n, 0) AS an, COALESCE(cb.n, 0) AS bn
                    FROM pairs p
                    JOIN (SELECT DISTINCT cv FROM cs) v ON TRUE
                    LEFT JOIN cs ca ON ca.event_type = p.ta
                                   AND ca.cv = v.cv
                    LEFT JOIN cs cb ON cb.event_type = p.tb
                                   AND cb.cv = v.cv
                    WHERE ca.n IS NOT NULL OR cb.n IS NOT NULL),
            cums AS (SELECT ta, tb, na, nb, cv,
                            sum(an) OVER w AS ca, sum(bn) OVER w AS cb
                     FROM sup
                     WINDOW w AS (PARTITION BY ta, tb ORDER BY cv)),
            flags AS (SELECT ta, tb,
                             CAST(count(*) AS BIGINT) AS ns,
                             CAST(sum(CASE WHEN ca * nb <= cb * na
                                           THEN 1 ELSE 0 END) AS BIGINT)
                                 AS n_le,
                             CAST(sum(CASE WHEN ca * nb >= cb * na
                                           THEN 1 ELSE 0 END) AS BIGINT)
                                 AS n_ge
                      FROM cums GROUP BY 1, 2)
            SELECT ta AS type_a, tb AS type_b, ns AS n_support,
                   round(CAST(n_le AS DOUBLE) / CAST(ns AS DOUBLE), 6)
                       AS frac_a_below,
                   CAST(CASE WHEN n_le = ns THEN 1
                             WHEN n_ge = ns THEN -1 ELSE 0 END AS BIGINT)
                       AS fsd
            FROM flags ORDER BY 1, 2
        """,
        "moods_median": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            cs AS (SELECT event_type, cv, count(*) AS n
                   FROM s GROUP BY 1, 2),
            g AS (SELECT cv, sum(n) AS n FROM cs GROUP BY 1),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM g),
            med AS (SELECT CAST(min(cv) AS BIGINT) AS m
                    FROM (SELECT cv, sum(n) OVER (ORDER BY cv) AS cum
                          FROM g) CROSS JOIN tot
                    WHERE 2 * cum >= tot.nt),
            cells AS (SELECT cs.event_type,
                             CAST(sum(CASE WHEN cs.cv > med.m
                                           THEN cs.n ELSE 0 END)
                                  AS BIGINT) AS o_above,
                             CAST(sum(CASE WHEN cs.cv <= med.m
                                           THEN cs.n ELSE 0 END)
                                  AS BIGINT) AS o_below
                      FROM cs CROSS JOIN med GROUP BY 1),
            rows_ AS (SELECT CAST(sum(o_above) AS BIGINT) AS r_above,
                             CAST(sum(o_below) AS BIGINT) AS r_below,
                             CAST(count(*) AS BIGINT) AS k
                      FROM cells),
            terms AS (SELECT
                CAST(floor(CAST(CAST(c.o_above * t.nt
                                     - r.r_above * (c.o_above + c.o_below)
                                     AS HUGEINT)
                                * (c.o_above * t.nt
                                   - r.r_above * (c.o_above + c.o_below))
                                AS DOUBLE)
                           / CAST(CAST(t.nt AS HUGEINT) * r.r_above
                                  * (c.o_above + c.o_below) AS DOUBLE)
                           * 1e6) AS BIGINT)
                + CAST(floor(CAST(CAST(c.o_below * t.nt
                                       - r.r_below * (c.o_above + c.o_below)
                                       AS HUGEINT)
                                  * (c.o_below * t.nt
                                     - r.r_below * (c.o_above + c.o_below))
                                  AS DOUBLE)
                             / CAST(CAST(t.nt AS HUGEINT) * r.r_below
                                    * (c.o_above + c.o_below) AS DOUBLE)
                             * 1e6) AS BIGINT) AS m
                FROM cells c CROSS JOIN rows_ r CROSS JOIN tot t)
            SELECT (SELECT m FROM med) AS median_cv,
                   (SELECT k FROM rows_) AS k_types,
                   (SELECT nt FROM tot) AS n,
                   round(CAST(sum(m) AS DOUBLE) / 1e6, 6) AS chi2
            FROM terms
        """,
    }
)

# Session-12 wave 11 (pipelines/stats3.py): k-group rank test, variance
# homogeneity, outlier detection.
from .stats3 import (  # noqa: E402
    q_brown_forsythe,
    q_grubbs,
    q_kruskal_wallis,
)

QUERIES.update({
    "kruskal_wallis": q_kruskal_wallis,
    "brown_forsythe": q_brown_forsythe,
    "grubbs": q_grubbs,
})

_CENT_CENSUS_CTE = """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            cs AS (SELECT event_type, cv, count(*) AS n
                   FROM s GROUP BY 1, 2)
"""

ORACLE_SQL.update(
    {
        "kruskal_wallis": _CENT_CENSUS_CTE + """
            , m AS (SELECT cv, sum(n) AS n FROM cs GROUP BY 1),
            rk AS (SELECT cv,
                          2 * (sum(n) OVER (ORDER BY cv) - n) + n + 1 AS r2
                   FROM m),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                           CAST(sum(n * n * n - n) AS BIGINT) AS ties
                    FROM m),
            gj AS (SELECT cs.event_type, CAST(sum(cs.n) AS BIGINT) AS nj,
                          CAST(sum(cs.n * rk.r2) AS BIGINT) AS r2j
                   FROM cs JOIN rk USING (cv) GROUP BY 1),
            terms AS (SELECT CAST(floor(
                          CAST(CAST(r2j AS HUGEINT) * r2j AS DOUBLE)
                          / CAST(nj AS DOUBLE) * 1e6) AS HUGEINT) AS m
                      FROM gj),
            agg AS (SELECT CAST(sum(m) AS HUGEINT) AS total,
                           CAST(count(*) AS BIGINT) AS k
                    FROM terms)
            SELECT agg.k AS k_groups, tot.nt AS n,
                   round((3.0 * (CAST(agg.total AS DOUBLE) / 1e6)
                          / CAST(tot.nt * (tot.nt + 1) AS DOUBLE)
                          - 3.0 * CAST(tot.nt + 1 AS DOUBLE))
                         * CAST(tot.nt * tot.nt * tot.nt - tot.nt
                                AS DOUBLE)
                         / CAST(tot.nt * tot.nt * tot.nt - tot.nt
                                - tot.ties AS DOUBLE), 6) AS h_stat
            FROM agg CROSS JOIN tot
        """,
        "brown_forsythe": _CENT_CENSUS_CTE + """
            , tots AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nj
                       FROM cs GROUP BY 1),
            med AS (SELECT c.event_type, CAST(min(c.cv) AS BIGINT) AS med
                    FROM (SELECT event_type, cv,
                                 sum(n) OVER (PARTITION BY event_type
                                              ORDER BY cv) AS cum
                          FROM cs) c
                    JOIN tots USING (event_type)
                    WHERE 2 * c.cum >= tots.nj GROUP BY 1),
            z AS (SELECT cs.event_type, abs(cs.cv - med.med) AS z, cs.n
                  FROM cs JOIN med USING (event_type)),
            gj AS (SELECT event_type, CAST(sum(n * z) AS BIGINT) AS szj,
                          CAST(sum(n * z * z) AS BIGINT) AS szzj,
                          CAST(sum(n) AS BIGINT) AS nj
                   FROM z GROUP BY 1),
            terms AS (SELECT gj.*, CAST(floor(
                          CAST(CAST(szj AS HUGEINT) * szj AS DOUBLE)
                          / CAST(nj AS DOUBLE) * 1e6) AS HUGEINT) AS f
                      FROM gj),
            agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
                           CAST(sum(nj) AS BIGINT) AS nt,
                           CAST(sum(szj) AS BIGINT) AS sz,
                           CAST(sum(szzj) AS BIGINT) AS szz,
                           CAST(sum(f) AS HUGEINT) AS fsum
                    FROM terms)
            SELECT k AS k_groups, nt AS n,
                   round((CAST(nt - k AS DOUBLE) / CAST(k - 1 AS DOUBLE))
                         * (CAST(nt AS DOUBLE)
                            * (CAST(fsum AS DOUBLE) / 1e6)
                            - CAST(CAST(sz AS HUGEINT) * sz AS DOUBLE))
                         / (CAST(nt AS DOUBLE)
                            * (CAST(szz AS DOUBLE)
                               - CAST(fsum AS DOUBLE) / 1e6)), 6)
                       AS w_stat
            FROM agg
        """,
        "grubbs": _CENT_CENSUS_CTE + """
            , tots AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
                              CAST(sum(n * cv) AS BIGINT) AS s,
                              CAST(sum(n * cv * cv) AS BIGINT) AS sxx
                       FROM cs GROUP BY 1),
            best AS (SELECT event_type, cv AS x_star
                     FROM (SELECT cs.event_type, cs.cv,
                                  row_number() OVER (
                                      PARTITION BY cs.event_type
                                      ORDER BY abs(t.n * cs.cv - t.s)
                                          DESC, cs.cv) AS rn
                           FROM cs JOIN tots t USING (event_type))
                     WHERE rn = 1)
            SELECT t.event_type, b.x_star AS outlier_cv,
                   round(CAST(abs(t.n * b.x_star - t.s) AS DOUBLE)
                         / sqrt(CAST(t.n AS DOUBLE)
                                * CAST(CAST(t.n AS HUGEINT) * t.sxx
                                       - CAST(t.s AS HUGEINT) * t.s
                                       AS DOUBLE)
                                / CAST(t.n - 1 AS DOUBLE)), 6) AS g_stat
            FROM tots t JOIN best b USING (event_type) ORDER BY 1
        """,
    }
)

# Session-12 wave 12 (pipelines/stats3.py): vocabulary growth, lexical
# burstiness, customer segmentation.
from .stats3 import (  # noqa: E402
    q_heaps_law,
    q_rfm_segments,
    q_term_burstiness,
)

QUERIES.update({
    "heaps_law": q_heaps_law,
    "term_burstiness": q_term_burstiness,
    "rfm_segments": q_rfm_segments,
})

ORACLE_SQL.update(
    {
        "heaps_law": """
            WITH dd AS (SELECT CAST(count(*) AS BIGINT) AS d
                        FROM documents),
            ord AS (SELECT doc_id,
                           row_number() OVER (ORDER BY doc_id) AS rn
                    FROM documents),
            cuts AS (SELECT ii.i, ord.doc_id AS c
                     FROM (SELECT unnest(generate_series(1, 5)) AS i) ii
                     CROSS JOIN dd
                     JOIN ord ON ord.rn = (dd.d * ii.i) // 5),
            tok AS (SELECT doc_id, lower(term) AS term
                    FROM (SELECT doc_id,
                                 unnest(regexp_extract_all(text,
                                        '[A-Za-z]+')) AS term
                          FROM documents)),
            tq AS (SELECT cuts.i, CAST(count(*) AS BIGINT) AS t
                   FROM tok JOIN cuts ON tok.doc_id <= cuts.c GROUP BY 1),
            fmin AS (SELECT term, min(doc_id) AS md FROM tok GROUP BY 1),
            vq AS (SELECT cuts.i, CAST(count(*) AS BIGINT) AS v
                   FROM fmin JOIN cuts ON fmin.md <= cuts.c GROUP BY 1),
            pts AS (SELECT CAST(floor(ln(CAST(tq.t AS DOUBLE)) * 1e6)
                                AS BIGINT) AS x,
                           CAST(floor(ln(CAST(vq.v AS DOUBLE)) * 1e6)
                                AS BIGINT) AS y
                    FROM tq JOIN vq USING (i)),
            ols AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(x) AS BIGINT) AS sx,
                           CAST(sum(y) AS BIGINT) AS sy,
                           CAST(sum(x * x) AS BIGINT) AS sxx,
                           CAST(sum(x * y) AS BIGINT) AS sxy
                    FROM pts)
            SELECT n AS n_points,
                   (SELECT CAST(count(*) AS BIGINT) FROM fmin)
                       AS vocab_full,
                   round(CASE WHEN n < 2 OR n * sxx - sx * sx = 0
                              THEN 0.0
                              ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                                   / CAST(n * sxx - sx * sx AS DOUBLE)
                              END, 6) AS heaps_beta
            FROM ols
        """,
        "term_burstiness": """
            WITH tok AS (SELECT doc_id, lower(term) AS term
                         FROM (SELECT doc_id,
                                      unnest(regexp_extract_all(text,
                                             '[A-Za-z]+')) AS term
                               FROM documents)),
            dt AS (SELECT doc_id, term, count(*) AS f
                   FROM tok GROUP BY 1, 2),
            dd AS (SELECT CAST(count(*) AS BIGINT) AS d FROM documents),
            agg AS (SELECT term, CAST(sum(f) AS BIGINT) AS s1,
                           CAST(sum(f * f) AS BIGINT) AS s2
                    FROM dt GROUP BY 1),
            top AS (SELECT * FROM agg ORDER BY s1 DESC, term LIMIT 10)
            SELECT term, s1 AS cf,
                   round(CAST(dd.d * s2 - s1 * s1 AS DOUBLE)
                         / CAST(dd.d * s1 AS DOUBLE), 6) AS vmr
            FROM top CROSS JOIN dd ORDER BY cf DESC, term
        """,
        "rfm_segments": """
            WITH u AS (SELECT user_id,
                              CAST(max(epoch_ms(ts) // 86400000)
                                   AS BIGINT) AS day,
                              CAST(count(*) AS BIGINT) AS n,
                              CAST(sum(CAST(round(value * 100) AS BIGINT))
                                   AS BIGINT) AS cents
                       FROM events GROUP BY 1),
            mx AS (SELECT max(day) AS md FROM u),
            r AS (SELECT user_id,
                         ntile(5) OVER (ORDER BY mx.md - day, user_id)
                             AS r_q,
                         ntile(5) OVER (ORDER BY n, user_id) AS f_q,
                         ntile(5) OVER (ORDER BY cents, user_id) AS m_q
                  FROM u CROSS JOIN mx)
            SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
                   CAST(m_q AS BIGINT) AS m_q,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM r GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
    }
)

# Session-12 wave 13 (pipelines/stats3.py): paired binary change, related
# binary treatments, binary association.
from .stats3 import (  # noqa: E402
    q_cochran_q,
    q_matthews_corr,
    q_mcnemar,
)

QUERIES.update({
    "mcnemar": q_mcnemar,
    "cochran_q": q_cochran_q,
    "matthews_corr": q_matthews_corr,
})

ORACLE_SQL.update(
    {
        "mcnemar": """
            WITH p AS (SELECT user_id,
                              epoch_ms(ts) // 86400000 AS day,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events WHERE event_type = 'purchase'),
            vc AS (SELECT cv, count(*) AS n FROM p GROUP BY 1),
            nt AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM vc),
            thr AS (SELECT CAST(min(cv) AS BIGINT) AS thr
                    FROM (SELECT cv, sum(n) OVER (ORDER BY cv) AS cum
                          FROM vc) CROSS JOIN nt
                    WHERE 10 * cum >= 9 * nt.n),
            g AS (SELECT CAST((min(day) + max(day) + 1) // 2 AS BIGINT)
                             AS mid
                  FROM p),
            hv AS (SELECT p.user_id,
                          max(CASE WHEN p.day < g.mid THEN 1 ELSE 0 END)
                              AS early,
                          max(CASE WHEN p.day >= g.mid THEN 1 ELSE 0 END)
                              AS late
                   FROM p CROSS JOIN g CROSS JOIN thr
                   WHERE p.cv > thr.thr
                   GROUP BY 1),
            cells AS (SELECT
                CAST(sum(CASE WHEN early = 1 AND late = 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS b,
                CAST(sum(CASE WHEN early = 0 AND late = 1
                              THEN 1 ELSE 0 END) AS BIGINT) AS c
                FROM hv)
            SELECT (SELECT mid FROM g) AS mid_day,
                   (SELECT thr FROM thr) AS thr_cv,
                   b AS b_early_only, c AS c_late_only,
                   round(CASE WHEN b + c = 0 THEN 0.0
                              ELSE CAST((b - c) * (b - c) AS DOUBLE)
                                   / CAST(b + c AS DOUBLE) END,
                         6) AS mcnemar
            FROM cells
        """,
        "cochran_q": """
            WITH av AS (SELECT user_id, event_type,
                               CAST(round(value * 100) AS BIGINT) AS cv
                        FROM events),
            vc AS (SELECT cv, count(*) AS n FROM av GROUP BY 1),
            nt AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM vc),
            thr AS (SELECT CAST(min(cv) AS BIGINT) AS thr
                    FROM (SELECT cv, sum(n) OVER (ORDER BY cv) AS cum
                          FROM vc) CROSS JOIN nt
                    WHERE 10 * cum >= 9 * nt.n),
            ut AS (SELECT DISTINCT av.user_id, av.event_type
                   FROM av CROSS JOIN thr WHERE av.cv > thr.thr),
            col AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c
                    FROM ut GROUP BY 1),
            rw AS (SELECT user_id, CAST(count(*) AS BIGINT) AS r
                   FROM ut GROUP BY 1),
            agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
                           CAST(sum(c) AS BIGINT) AS n,
                           CAST(sum(c * c) AS BIGINT) AS sum_c2
                    FROM col),
            rr AS (SELECT CAST(sum(r * r) AS BIGINT) AS sum_r2 FROM rw)
            SELECT agg.k AS k_treatments,
                   (SELECT thr FROM thr) AS thr_cv, agg.n AS n_ones,
                   round(CAST((agg.k - 1)
                              * (agg.k * agg.sum_c2 - agg.n * agg.n)
                              AS DOUBLE)
                         / CAST(agg.k * agg.n - rr.sum_r2 AS DOUBLE), 6)
                       AS cochran_q
            FROM agg CROSS JOIN rr
        """,
        "matthews_corr": _DENSE_GRID_CTE + """
            , tots AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1
                       FROM d GROUP BY 1),
            bits AS (SELECT d.event_type, d.hr,
                            CASE WHEN d.c * hh.hh > t.s1
                                 THEN 1 ELSE 0 END AS b
                     FROM d JOIN tots t USING (event_type) CROSS JOIN hh),
            p AS (SELECT x.event_type AS ta, y.event_type AS tb,
                         CAST(sum(x.b * y.b) AS BIGINT) AS a,
                         CAST(sum(x.b * (1 - y.b)) AS BIGINT) AS b,
                         CAST(sum((1 - x.b) * y.b) AS BIGINT) AS c,
                         CAST(sum((1 - x.b) * (1 - y.b)) AS BIGINT) AS d
                  FROM bits x JOIN bits y ON y.hr = x.hr
                                         AND x.event_type < y.event_type
                  GROUP BY 1, 2)
            SELECT ta AS type_a, tb AS type_b,
                   round(CAST(a * d - b * c AS DOUBLE)
                         / sqrt(CAST((a + b) * (a + c) * (b + d) * (c + d)
                                     AS DOUBLE)), 6) AS mcc
            FROM p ORDER BY 1, 2
        """,
    }
)

# Session-12 wave 14 (pipelines/stats3.py): survival comparison, CDF
# distance, partial correlation.
from .stats3 import (  # noqa: E402
    q_cramer_von_mises,
    q_log_rank,
    q_partial_corr,
)

QUERIES.update({
    "log_rank": q_log_rank,
    "cramer_von_mises": q_cramer_von_mises,
    "partial_corr": q_partial_corr,
})

ORACLE_SQL.update(
    {
        "log_rank": """
            WITH u AS (SELECT user_id, min(epoch_ms(ts)) AS mn,
                              max(epoch_ms(ts)) AS mx
                       FROM events GROUP BY 1),
            gmx AS (SELECT max(mx) AS dmax FROM u),
            c AS (SELECT (mx - mn) // 3600000 AS dur,
                         CASE WHEN gmx.dmax - mx < 86400000
                              THEN 1 ELSE 0 END AS cens,
                         CAST(user_id % 2 AS BIGINT) AS grp,
                         count(*) AS cnt
                  FROM u CROSS JOIN gmx GROUP BY 1, 2, 3),
            tot AS (SELECT CAST(sum(CASE WHEN grp = 1 THEN cnt
                                         ELSE 0 END) AS BIGINT) AS n1,
                           CAST(sum(CASE WHEN grp = 0 THEN cnt
                                         ELSE 0 END) AS BIGINT) AS n0
                    FROM c),
            durs AS (SELECT dur,
                            CAST(sum(CASE WHEN grp = 1 AND cens = 0
                                          THEN cnt ELSE 0 END)
                                 AS BIGINT) AS d1,
                            CAST(sum(CASE WHEN grp = 0 AND cens = 0
                                          THEN cnt ELSE 0 END)
                                 AS BIGINT) AS d0,
                            CAST(sum(CASE WHEN grp = 1 THEN cnt
                                          ELSE 0 END) AS BIGINT) AS r1,
                            CAST(sum(CASE WHEN grp = 0 THEN cnt
                                          ELSE 0 END) AS BIGINT) AS r0
                     FROM c GROUP BY 1),
            risk AS (SELECT dur, d1, d0,
                            tot.n1 - sum(r1) OVER wo + r1 AS at1,
                            tot.n0 - sum(r0) OVER wo + r0 AS at0
                     FROM durs CROSS JOIN tot
                     WINDOW wo AS (ORDER BY dur
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW)),
            terms AS (SELECT d1, at1, at0, at1 + at0 AS nt,
                             d1 + d0 AS dt
                      FROM risk),
            f AS (SELECT
                CAST(sum(CASE WHEN dt > 0 AND nt > 1 THEN d1
                              ELSE 0 END) AS BIGINT) AS o1,
                CAST(sum(CASE WHEN dt > 0 AND nt > 1 THEN
                    CAST(floor(CAST(dt * at1 AS DOUBLE)
                               / CAST(nt AS DOUBLE) * 1e6) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS e1,
                CAST(sum(CASE WHEN dt > 0 AND nt > 1 THEN
                    CAST(floor(CAST(dt * at1 * at0 * (nt - dt)
                                    AS DOUBLE)
                               / CAST(nt * nt * (nt - 1) AS DOUBLE)
                               * 1e6) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS v
                FROM terms)
            SELECT tot.n1 AS n_grp1, tot.n0 AS n_grp0,
                   f.o1 AS o1_deaths,
                   round((CAST(f.o1 AS DOUBLE)
                          - CAST(f.e1 AS DOUBLE) / 1e6)
                         / sqrt(CAST(f.v AS DOUBLE) / 1e6), 6)
                       AS log_rank_z
            FROM f CROSS JOIN tot
        """,
        "cramer_von_mises": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events
                       WHERE event_type IN ('purchase', 'view')),
            c AS (SELECT cv,
                         CAST(sum(CASE WHEN event_type = 'purchase'
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS a,
                         CAST(sum(CASE WHEN event_type = 'view'
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS b
                  FROM s GROUP BY 1),
            t AS (SELECT CAST(sum(a) AS BIGINT) AS n,
                         CAST(sum(b) AS BIGINT) AS m FROM c),
            k AS (SELECT a, b, sum(a) OVER (ORDER BY cv) AS ca,
                         sum(b) OVER (ORDER BY cv) AS cb
                  FROM c),
            num AS (SELECT CAST(sum(
                        CAST(a + b AS HUGEINT)
                        * (ca * t.m - cb * t.n)
                        * (ca * t.m - cb * t.n)) AS HUGEINT) AS num
                    FROM k CROSS JOIN t)
            SELECT t.n AS n_purchase, t.m AS n_view,
                   round(CAST(num.num AS DOUBLE)
                         / CAST(CAST(t.n AS HUGEINT) * t.m
                                * (t.n + t.m) * (t.n + t.m)
                                AS DOUBLE), 6) AS cvm_t
            FROM num CROSS JOIN t
        """,
        "partial_corr": """
            WITH s AS (SELECT (epoch_ms(ts) // 3600000) % 24 AS hod,
                              ((epoch_ms(ts) // 86400000) + 3) % 7
                                  AS dow,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(cv) AS BIGINT) AS sx,
                         CAST(sum(cv * cv) AS BIGINT) AS sxx,
                         CAST(sum(hod) AS BIGINT) AS sy,
                         CAST(sum(hod * hod) AS BIGINT) AS syy,
                         CAST(sum(dow) AS BIGINT) AS sz,
                         CAST(sum(dow * dow) AS BIGINT) AS szz,
                         CAST(sum(cv * hod) AS BIGINT) AS sxy,
                         CAST(sum(cv * dow) AS BIGINT) AS sxz,
                         CAST(sum(hod * dow) AS BIGINT) AS syz
                  FROM s),
            r AS (SELECT n,
                    CAST(CAST(n AS HUGEINT) * sxy
                         - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                    / sqrt(CAST(CAST(n AS HUGEINT) * sxx
                                - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                           * CAST(CAST(n AS HUGEINT) * syy
                                  - CAST(sy AS HUGEINT) * sy
                                  AS DOUBLE)) AS rxy,
                    CAST(CAST(n AS HUGEINT) * sxz
                         - CAST(sx AS HUGEINT) * sz AS DOUBLE)
                    / sqrt(CAST(CAST(n AS HUGEINT) * sxx
                                - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                           * CAST(CAST(n AS HUGEINT) * szz
                                  - CAST(sz AS HUGEINT) * sz
                                  AS DOUBLE)) AS rxz,
                    CAST(CAST(n AS HUGEINT) * syz
                         - CAST(sy AS HUGEINT) * sz AS DOUBLE)
                    / sqrt(CAST(CAST(n AS HUGEINT) * syy
                                - CAST(sy AS HUGEINT) * sy AS DOUBLE)
                           * CAST(CAST(n AS HUGEINT) * szz
                                  - CAST(sz AS HUGEINT) * sz
                                  AS DOUBLE)) AS ryz
                  FROM m)
            SELECT n, round(rxy, 6) AS r_xy,
                   round((rxy - rxz * ryz)
                         / sqrt((1.0 - rxz * rxz)
                                * (1.0 - ryz * ryz)), 6) AS r_partial
            FROM r
        """,
    }
)

# Session-12 wave 15 (pipelines/stats3.py): circular two-sample test,
# nonparametric change point, variance ratio.
from .stats3 import (  # noqa: E402
    q_f_test,
    q_kuiper,
    q_pettitt,
)

QUERIES.update({
    "kuiper": q_kuiper,
    "pettitt": q_pettitt,
    "f_test": q_f_test,
})

ORACLE_SQL.update(
    {
        "kuiper": """
            WITH s AS (SELECT event_type,
                              (epoch_ms(ts) // 3600000) % 24 AS d
                       FROM events
                       WHERE event_type IN ('purchase', 'view')),
            c AS (SELECT d,
                         sum(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END) AS a,
                         sum(CASE WHEN event_type = 'view'
                                  THEN 1 ELSE 0 END) AS b
                  FROM s GROUP BY 1),
            dd AS (SELECT unnest(generate_series(0, 23)) AS d),
            g AS (SELECT dd.d, COALESCE(c.a, 0) AS a,
                         COALESCE(c.b, 0) AS b
                  FROM dd LEFT JOIN c USING (d)),
            t AS (SELECT CAST(sum(a) AS BIGINT) AS n,
                         CAST(sum(b) AS BIGINT) AS m FROM g),
            k AS (SELECT d, sum(a) OVER w AS ca, sum(b) OVER w AS cb
                  FROM g WINDOW w AS (ORDER BY d)),
            dv AS (SELECT CAST(ca * t.m - cb * t.n AS BIGINT) AS dvv
                   FROM k CROSS JOIN t)
            SELECT t.n AS n_purchase, t.m AS n_view,
                   CAST(max(dvv) - min(dvv) AS BIGINT) AS v_num,
                   round(CAST(max(dvv) - min(dvv) AS DOUBLE)
                         / CAST(t.n * t.m AS DOUBLE), 6) AS kuiper_v
            FROM dv CROSS JOIN t GROUP BY t.n, t.m
        """,
        "pettitt": _DENSE_GRID_CTE + """
            , rw AS (SELECT a.event_type, a.hr,
                            CAST(sum(CASE WHEN a.c > b.c THEN 1
                                          WHEN a.c < b.c THEN -1
                                          ELSE 0 END) AS BIGINT) AS rs
                     FROM d a JOIN d b ON b.event_type = a.event_type
                     GROUP BY 1, 2),
            u AS (SELECT event_type,
                         sum(rs) OVER (PARTITION BY event_type
                                       ORDER BY hr) AS u,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY hr) - 1 AS idx,
                         count(*) OVER (PARTITION BY event_type) AS nh
                  FROM rw),
            uu AS (SELECT event_type, idx, abs(u) AS au
                   FROM u WHERE idx < nh - 1),
            mx AS (SELECT event_type, max(au) AS k FROM uu GROUP BY 1)
            SELECT mx.event_type, CAST(mx.k AS BIGINT) AS k_stat,
                   CAST(min(uu.idx) AS BIGINT) AS t_hat
            FROM mx JOIN uu ON uu.event_type = mx.event_type
                           AND uu.au = mx.k
            GROUP BY 1, 2 ORDER BY 1
        """,
        "f_test": _CENT_CENSUS_CTE + """
            , g AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nn,
                           CAST(sum(n * cv) AS BIGINT) AS s,
                           CAST(sum(n * cv * cv) AS BIGINT) AS q
                    FROM cs GROUP BY 1),
            p AS (SELECT a.event_type AS ta, b.event_type AS tb,
                         a.nn AS n1, a.s AS s1, a.q AS q1,
                         b.nn AS n2, b.s AS s2, b.q AS q2
                  FROM g a JOIN g b ON a.event_type < b.event_type)
            SELECT ta AS type_a, tb AS type_b,
                   CAST(n1 - 1 AS BIGINT) AS df1,
                   CAST(n2 - 1 AS BIGINT) AS df2,
                   round(CAST((CAST(n1 AS HUGEINT) * q1
                               - CAST(s1 AS HUGEINT) * s1)
                              * n2 * (n2 - 1) AS DOUBLE)
                         / CAST((CAST(n2 AS HUGEINT) * q2
                                 - CAST(s2 AS HUGEINT) * s2)
                                * n1 * (n1 - 1) AS DOUBLE), 6) AS f_stat
            FROM p ORDER BY 1, 2
        """,
    }
)

# Session-12 wave 16 (pipelines/stats3.py): effect sizes, ordered
# alternatives.
from .stats3 import (  # noqa: E402
    q_cliffs_delta,
    q_jonckheere,
    q_page_trend,
)

QUERIES.update({
    "cliffs_delta": q_cliffs_delta,
    "page_trend": q_page_trend,
    "jonckheere": q_jonckheere,
})

ORACLE_SQL.update(
    {
        "cliffs_delta": _CENT_CENSUS_CTE + """
            , tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tt
                      FROM cs GROUP BY 1),
            pairs AS (SELECT a.event_type AS ta, a.tt AS na,
                             b.event_type AS tb, b.tt AS nb
                      FROM tot a JOIN tot b
                        ON a.event_type < b.event_type),
            sup AS (SELECT p.ta, p.tb, p.na, p.nb, v.cv,
                           COALESCE(ca.n, 0) AS an, COALESCE(cb.n, 0) AS bn
                    FROM pairs p
                    JOIN (SELECT DISTINCT cv FROM cs) v ON TRUE
                    LEFT JOIN cs ca ON ca.event_type = p.ta
                                   AND ca.cv = v.cv
                    LEFT JOIN cs cb ON cb.event_type = p.tb
                                   AND cb.cv = v.cv
                    WHERE ca.n IS NOT NULL OR cb.n IS NOT NULL),
            cums AS (SELECT ta, tb, na, nb, an, bn,
                            sum(bn) OVER w AS cb
                     FROM sup
                     WINDOW w AS (PARTITION BY ta, tb ORDER BY cv)),
            agg AS (SELECT ta, tb, na, nb,
                           CAST(sum(an * (cb - bn)) AS BIGINT) AS gt,
                           CAST(sum(an * bn) AS BIGINT) AS ties
                    FROM cums GROUP BY 1, 2, 3, 4)
            SELECT ta AS type_a, tb AS type_b,
                   round(CAST(gt - (na * nb - gt - ties) AS DOUBLE)
                         / CAST(na * nb AS DOUBLE), 6) AS cliffs_delta,
                   round(CAST(2 * gt + ties AS DOUBLE)
                         / CAST(2 * na * nb AS DOUBLE), 6) AS vd_a
            FROM agg ORDER BY 1, 2
        """,
        "page_trend": _DENSE_GRID_CTE + """
            , nd AS (SELECT hh // 24 AS n_days FROM hh),
            dw AS (SELECT d.event_type, (d.hr - b.lo) // 24 AS day,
                          (d.hr - b.lo) % 24 AS hod, d.c
                   FROM d CROSS JOIN bounds b CROSS JOIN nd
                   WHERE d.hr - b.lo < nd.n_days * 24),
            ranked AS (SELECT event_type, day, hod,
                              2 * (rank() OVER (PARTITION BY event_type,
                                                    day ORDER BY c) - 1)
                              + count(*) OVER (PARTITION BY event_type,
                                               day, c) + 1 AS r2
                       FROM dw),
            rd AS (SELECT event_type, hod,
                          CAST(sum(r2) AS BIGINT) AS r2d
                   FROM ranked GROUP BY 1, 2),
            l AS (SELECT event_type,
                         CAST(sum((hod + 1) * r2d) AS BIGINT) AS l2
                  FROM rd GROUP BY 1)
            SELECT event_type, l2 AS l2_stat,
                   round((CAST(l2 AS DOUBLE) / 2.0
                          - CAST(nd.n_days * 24 * 25 * 25 AS DOUBLE)
                            / 4.0)
                         / sqrt(CAST(nd.n_days * 24 * 24 * 25 * 25 * 23
                                     AS DOUBLE) / 144.0), 6) AS z
            FROM l CROSS JOIN nd ORDER BY 1
        """,
        "jonckheere": """
            WITH s AS (SELECT ((epoch_ms(ts) // 3600000) % 24) // 6
                                  AS part,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            cs AS (SELECT part, cv, count(*) AS n FROM s GROUP BY 1, 2),
            tot AS (SELECT part, CAST(sum(n) AS BIGINT) AS tt
                    FROM cs GROUP BY 1),
            pairs AS (SELECT a.part AS p1, b.part AS p2, b.tt AS n2
                      FROM tot a JOIN tot b ON a.part < b.part),
            sup AS (SELECT p.p1, p.p2, p.n2, v.cv,
                           COALESCE(ca.n, 0) AS an, COALESCE(cb.n, 0) AS bn
                    FROM pairs p
                    JOIN (SELECT DISTINCT cv FROM cs) v ON TRUE
                    LEFT JOIN cs ca ON ca.part = p.p1 AND ca.cv = v.cv
                    LEFT JOIN cs cb ON cb.part = p.p2 AND cb.cv = v.cv
                    WHERE ca.n IS NOT NULL OR cb.n IS NOT NULL),
            cums AS (SELECT p1, p2, n2, an, bn, sum(bn) OVER w AS cb
                     FROM sup
                     WINDOW w AS (PARTITION BY p1, p2 ORDER BY cv)),
            jt AS (SELECT CAST(sum(an * (2 * (n2 - cb) + bn)) AS BIGINT)
                              AS jt2
                   FROM cums),
            g AS (SELECT CAST(sum(tt) AS BIGINT) AS n,
                         CAST(sum(tt * tt) AS BIGINT) AS sn2,
                         CAST(sum(tt * tt * (2 * tt + 3)) AS BIGINT)
                             AS sn23
                  FROM tot)
            SELECT g.n, jt.jt2 AS jt2_stat,
                   round((CAST(jt.jt2 AS DOUBLE) / 2.0
                          - CAST(g.n * g.n - g.sn2 AS DOUBLE) / 4.0)
                         / sqrt(CAST(CAST(g.n AS HUGEINT) * g.n
                                     * (2 * g.n + 3) - g.sn23
                                     AS DOUBLE) / 72.0), 6) AS z
            FROM g CROSS JOIN jt
        """,
    }
)

# Session-12 wave 17 (pipelines/stats3.py): stratified association,
# dispersion test, proportion effect size.
from .stats3 import (  # noqa: E402
    q_ansari_bradley,
    q_cohens_h,
    q_mantel_haenszel,
)

QUERIES.update({
    "mantel_haenszel": q_mantel_haenszel,
    "ansari_bradley": q_ansari_bradley,
    "cohens_h": q_cohens_h,
})

ORACLE_SQL.update(
    {
        "mantel_haenszel": """
            WITH s AS (SELECT ((epoch_ms(ts) // 86400000) + 3) % 7
                                  AS dow,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS p,
                              CASE WHEN (epoch_ms(ts) // 3600000) % 24
                                        < 6
                                     OR (epoch_ms(ts) // 3600000) % 24
                                        >= 22
                                   THEN 1 ELSE 0 END AS ni
                       FROM events),
            c AS (SELECT dow,
                         CAST(sum(CASE WHEN p = 1 AND ni = 1
                                       THEN 1 ELSE 0 END) AS BIGINT)
                             AS a,
                         CAST(sum(CASE WHEN p = 1 AND ni = 0
                                       THEN 1 ELSE 0 END) AS BIGINT)
                             AS b,
                         CAST(sum(CASE WHEN p = 0 AND ni = 1
                                       THEN 1 ELSE 0 END) AS BIGINT)
                             AS cc,
                         CAST(sum(CASE WHEN p = 0 AND ni = 0
                                       THEN 1 ELSE 0 END) AS BIGINT)
                             AS d,
                         CAST(count(*) AS BIGINT) AS nt
                  FROM s GROUP BY 1),
            t AS (SELECT CAST(count(*) AS BIGINT) AS k,
                         CAST(sum(CAST(floor(CAST(a * d AS DOUBLE)
                                             / CAST(nt AS DOUBLE)
                                             * 1e6) AS BIGINT))
                              AS BIGINT) AS num,
                         CAST(sum(CAST(floor(CAST(b * cc AS DOUBLE)
                                             / CAST(nt AS DOUBLE)
                                             * 1e6) AS BIGINT))
                              AS BIGINT) AS den
                  FROM c)
            SELECT k AS k_strata,
                   round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
                       AS mh_or,
                   CAST(floor(ln(CAST(num AS DOUBLE)
                                 / CAST(den AS DOUBLE)) * 1e6)
                        AS BIGINT) / 1e6 AS log_mh_or
            FROM t
        """,
        "ansari_bradley": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events
                       WHERE event_type IN ('purchase', 'view')),
            c AS (SELECT cv,
                         CAST(sum(CASE WHEN event_type = 'purchase'
                                       THEN 1 ELSE 0 END) AS BIGINT)
                             AS a,
                         CAST(sum(CASE WHEN event_type = 'view'
                                       THEN 1 ELSE 0 END) AS BIGINT)
                             AS b
                  FROM s GROUP BY 1),
            t AS (SELECT CAST(sum(a) AS BIGINT) AS n,
                         CAST(sum(b) AS BIGINT) AS m FROM c),
            k AS (SELECT a, a + b AS w,
                         sum(a + b) OVER (ORDER BY cv) AS pos
                  FROM c),
            sc AS (SELECT a, w, pos, t.n + t.m AS nn,
                          (t.n + t.m + 1) // 2 AS half
                   FROM k CROSS JOIN t),
            blocks AS (SELECT a, w,
                (CASE WHEN pos <= half THEN pos * (pos + 1) // 2
                      ELSE half * (half + 1) // 2
                           + ((nn - half) + (nn + 1 - pos))
                             * (pos - half) // 2 END)
                - (CASE WHEN pos - w <= half
                        THEN (pos - w) * (pos - w + 1) // 2
                        ELSE half * (half + 1) // 2
                             + ((nn - half) + (nn + 1 - (pos - w)))
                               * ((pos - w) - half) // 2 END) AS sb
                FROM sc),
            ab AS (SELECT CAST(sum(a * CAST(floor(
                              CAST(sb AS DOUBLE) / CAST(w AS DOUBLE)
                              * 1e6) AS BIGINT)) AS BIGINT) AS ab2
                   FROM blocks)
            SELECT t.n AS n_purchase, t.m AS n_view,
                   round(CAST(ab.ab2 AS DOUBLE) / 1e6, 6) AS ab_stat,
                   round(CASE WHEN (t.n + t.m) % 2 = 0 THEN
                       (CAST(ab.ab2 AS DOUBLE) / 1e6
                        - CAST(t.n * (t.n + t.m + 2) AS DOUBLE) / 4.0)
                       / sqrt(CAST(CAST(t.n AS HUGEINT) * t.m
                                   * (t.n + t.m + 2) * (t.n + t.m - 2)
                                   AS DOUBLE)
                              / (48.0 * CAST(t.n + t.m - 1 AS DOUBLE)))
                   ELSE
                       (CAST(ab.ab2 AS DOUBLE) / 1e6
                        - CAST(t.n * (t.n + t.m + 1) * (t.n + t.m + 1)
                               AS DOUBLE)
                          / (4.0 * CAST(t.n + t.m AS DOUBLE)))
                       / sqrt(CAST(CAST(t.n AS HUGEINT) * t.m
                                   * (t.n + t.m + 1)
                                   * (3 + (t.n + t.m) * (t.n + t.m))
                                   AS DOUBLE)
                              / (48.0 * CAST(t.n + t.m AS DOUBLE)
                                 * CAST(t.n + t.m AS DOUBLE)))
                   END, 6) AS z
            FROM ab CROSS JOIN t
        """,
        "cohens_h": """
            WITH s AS (SELECT CASE WHEN ((epoch_ms(ts) // 86400000) + 3)
                                        % 7 >= 5
                                   THEN 1 ELSE 0 END AS w,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS p
                       FROM events),
            c AS (SELECT CAST(sum(CASE WHEN w = 1 AND p = 1
                                       THEN 1 ELSE 0 END) AS BIGINT)
                             AS pw,
                         CAST(sum(CASE WHEN w = 1 THEN 1 ELSE 0 END)
                              AS BIGINT) AS nw,
                         CAST(sum(CASE WHEN w = 0 AND p = 1
                                       THEN 1 ELSE 0 END) AS BIGINT)
                             AS pd,
                         CAST(sum(CASE WHEN w = 0 THEN 1 ELSE 0 END)
                              AS BIGINT) AS nd
                  FROM s)
            SELECT nw AS n_weekend, nd AS n_weekday,
                   round(2.0 * (CAST(CAST(floor(asin(sqrt(
                                  CAST(pw AS DOUBLE)
                                  / CAST(nw AS DOUBLE))) * 1e6)
                                  AS BIGINT) AS DOUBLE)
                                - CAST(CAST(floor(asin(sqrt(
                                  CAST(pd AS DOUBLE)
                                  / CAST(nd AS DOUBLE))) * 1e6)
                                  AS BIGINT) AS DOUBLE)) / 1e6, 6)
                       AS cohens_h
            FROM c
        """,
    }
)

# Session-12 wave 18 (pipelines/stats3.py): ordinal association family,
# intraclass correlation.
from .stats3 import (  # noqa: E402
    q_icc,
    q_ordinal_assoc,
)

QUERIES.update({
    "ordinal_assoc": q_ordinal_assoc,
    "icc": q_icc,
})

ORACLE_SQL.update(
    {
        "ordinal_assoc": """
            WITH s AS (SELECT (epoch_ms(ts) // 3600000) % 24 AS hod,
                              CAST(round(value * 100) AS BIGINT) // 5000
                                  AS vb
                       FROM events),
            cs AS (SELECT hod, vb, CAST(count(*) AS BIGINT) AS n
                   FROM s GROUP BY 1, 2),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cs),
            cd AS (SELECT
                CAST(sum(CASE WHEN b.hod > a.hod AND b.vb > a.vb
                              THEN a.n * b.n ELSE 0 END) AS BIGINT)
                    AS conc,
                CAST(sum(CASE WHEN b.hod > a.hod AND b.vb < a.vb
                              THEN a.n * b.n ELSE 0 END) AS BIGINT)
                    AS disc
                FROM cs a JOIN cs b ON TRUE),
            ties AS (SELECT
                (SELECT CAST(sum(rn * (rn - 1) / 2) AS BIGINT)
                 FROM (SELECT sum(n) AS rn FROM cs GROUP BY hod))
                    AS trow,
                (SELECT CAST(sum(cn * (cn - 1) / 2) AS BIGINT)
                 FROM (SELECT sum(n) AS cn FROM cs GROUP BY vb))
                    AS tcol,
                (SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) FROM cs)
                    AS tcell),
            mm AS (SELECT least(
                       (SELECT count(DISTINCT hod) FROM cs),
                       (SELECT count(DISTINCT vb) FROM cs)) AS m)
            SELECT t.nt AS n, cd.conc, cd.disc,
                   round(CAST(cd.conc - cd.disc AS DOUBLE)
                         / CAST(cd.conc + cd.disc AS DOUBLE), 6)
                       AS gamma,
                   round(CAST(cd.conc - cd.disc AS DOUBLE)
                         / CAST(cd.conc + cd.disc
                                + (ties.tcol - ties.tcell)
                                AS DOUBLE), 6) AS somers_dyx,
                   round(CAST(cd.conc - cd.disc AS DOUBLE)
                         / CAST(cd.conc + cd.disc
                                + (ties.trow - ties.tcell)
                                AS DOUBLE), 6) AS somers_dxy,
                   round(CAST(2 * mm.m * (cd.conc - cd.disc) AS DOUBLE)
                         / CAST(t.nt * t.nt * (mm.m - 1) AS DOUBLE), 6)
                       AS tau_c
            FROM cd CROSS JOIN t CROSS JOIN ties CROSS JOIN mm
        """,
        "icc": _DENSE_GRID_CTE + """
            , nd AS (SELECT hh // 24 AS n_days FROM hh),
            dc AS (SELECT d.event_type, (d.hr - b.lo) // 24 AS day,
                          CAST(sum(d.c) AS BIGINT) AS x
                   FROM d CROSS JOIN bounds b CROSS JOIN nd
                   WHERE (d.hr - b.lo) // 24 < nd.n_days
                   GROUP BY 1, 2),
            kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT)
                              AS k
                   FROM dc),
            vals AS (SELECT CAST(sum(x * x) AS BIGINT) AS ssall,
                            CAST(sum(x) AS BIGINT) AS tt
                     FROM dc),
            rs AS (SELECT day, CAST(sum(x) AS BIGINT) AS r
                   FROM dc GROUP BY 1),
            sr AS (SELECT CAST(sum(r * r) AS BIGINT) AS sr2 FROM rs),
            csum AS (SELECT event_type, CAST(sum(x) AS BIGINT) AS c
                     FROM dc GROUP BY 1),
            sc AS (SELECT CAST(sum(c * c) AS BIGINT) AS sc2 FROM csum),
            ms AS (SELECT
                (CAST(sr.sr2 AS DOUBLE) / CAST(kk.k AS DOUBLE)
                 - CAST(vals.tt * vals.tt AS DOUBLE)
                   / CAST(nd.n_days * kk.k AS DOUBLE))
                / CAST(nd.n_days - 1 AS DOUBLE) AS msr,
                (CAST(sc.sc2 AS DOUBLE) / CAST(nd.n_days AS DOUBLE)
                 - CAST(vals.tt * vals.tt AS DOUBLE)
                   / CAST(nd.n_days * kk.k AS DOUBLE))
                / CAST(kk.k - 1 AS DOUBLE) AS msc,
                ((CAST(vals.ssall AS DOUBLE)
                  - CAST(vals.tt * vals.tt AS DOUBLE)
                    / CAST(nd.n_days * kk.k AS DOUBLE))
                 - (CAST(sr.sr2 AS DOUBLE) / CAST(kk.k AS DOUBLE)
                    - CAST(vals.tt * vals.tt AS DOUBLE)
                      / CAST(nd.n_days * kk.k AS DOUBLE))
                 - (CAST(sc.sc2 AS DOUBLE) / CAST(nd.n_days AS DOUBLE)
                    - CAST(vals.tt * vals.tt AS DOUBLE)
                      / CAST(nd.n_days * kk.k AS DOUBLE)))
                / CAST((nd.n_days - 1) * (kk.k - 1) AS DOUBLE) AS mse,
                nd.n_days AS d, kk.k AS k
                FROM sr CROSS JOIN sc CROSS JOIN vals
                     CROSS JOIN nd CROSS JOIN kk)
            SELECT CAST(d AS BIGINT) AS n_days, CAST(k AS BIGINT)
                       AS k_raters,
                   round((msr - mse)
                         / (msr + CAST(k - 1 AS DOUBLE) * mse
                            + CAST(k AS DOUBLE) * (msc - mse)
                              / CAST(d AS DOUBLE)), 6) AS icc2_1
            FROM ms
        """,
    }
)


# Round-3: guaranteed-recall SimHash pairs (stages/dedup.py
# simhash_pairs_from_hashes — the pigeonhole (h+1)-block index).  The
# oracle is the DEFINITION itself: a quadratic self-join of the
# independently-generated simhash fixture on bit_count(xor) <= 3 — so a
# green row proves EXACT recall, not just agreement with a blocking
# heuristic (round 2's single-prefix oracle matched its own blind spot).
def q_simhash_pairs(sf_dir: str):
    from ..stages.dedup import simhash_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_dedup(ds, max_hamming=3, concurrency=(1, 4))


QUERIES.update({"simhash_pairs": q_simhash_pairs})

ORACLE_SQL.update(
    {
        "simhash_pairs": f"""
            WITH h AS (SELECT doc_id, simhash
                       FROM read_parquet(
                           '{_FIXTURE_DIR}/oracle_simhash.parquet')
                       WHERE corpus_key = {_CORPUS_KEY})
            SELECT x.doc_id AS a, y.doc_id AS b,
                   CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT)
                       AS hamming
            FROM h x JOIN h y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
        """,
    }
)


# Round-3 statistics wave (pipelines/stats4.py): lexical richness over
# the frequency-of-frequencies census + classical sequence tests over
# the dense hourly grid.
from .stats4 import (  # noqa: E402
    q_cochran_armitage,
    q_cox_stuart,
    q_durbin_watson,
    q_good_turing,
    q_guiraud_r,
    q_herdan_c,
    q_honore_h,
    q_kpss_level,
    q_ks_uniform_hod,
    q_moran_lag1,
    q_sichel_s,
    q_simpson_lexical,
    q_yule_k,
)

QUERIES.update({
    "yule_k": q_yule_k,
    "simpson_lexical": q_simpson_lexical,
    "good_turing": q_good_turing,
    "sichel_s": q_sichel_s,
    "herdan_c": q_herdan_c,
    "guiraud_r": q_guiraud_r,
    "honore_h": q_honore_h,
    "durbin_watson": q_durbin_watson,
    "moran_lag1": q_moran_lag1,
    "cox_stuart": q_cox_stuart,
    "kpss_level": q_kpss_level,
    "ks_uniform_hod": q_ks_uniform_hod,
    "cochran_armitage": q_cochran_armitage,
})

_FF_CTE = """
    WITH tok AS (SELECT lower(term) AS term
                 FROM (SELECT unnest(regexp_extract_all(text,
                              '[A-Za-z]+')) AS term
                       FROM documents)),
    cs AS (SELECT term, CAST(count(*) AS BIGINT) AS m FROM tok GROUP BY 1),
    agg AS (SELECT CAST(sum(m) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS v,
                   CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS v1,
                   CAST(sum(CASE WHEN m = 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS v2,
                   CAST(sum(m * m) AS BIGINT) AS s2
            FROM cs)
"""

ORACLE_SQL.update(
    {
        "yule_k": _FF_CTE + """
            SELECT n AS n_tokens, v AS vocab,
                   round(CASE WHEN n = 0 THEN 0.0
                              ELSE 1e4 * CAST(s2 - n AS DOUBLE)
                                   / CAST(CAST(n AS HUGEINT) * n
                                          AS DOUBLE) END, 6) AS yule_k
            FROM agg
        """,
        "simpson_lexical": _FF_CTE + """
            SELECT n AS n_tokens,
                   round(CASE WHEN n < 2 THEN 0.0
                              ELSE CAST(s2 - n AS DOUBLE)
                                   / CAST(CAST(n AS HUGEINT) * (n - 1)
                                          AS DOUBLE) END, 6) AS simpson_d
            FROM agg
        """,
        "good_turing": _FF_CTE + """
            SELECT n AS n_tokens, v1 AS n_hapax,
                   round(CASE WHEN n = 0 THEN 0.0
                              ELSE 1.0 - CAST(v1 AS DOUBLE)
                                         / CAST(n AS DOUBLE) END,
                         6) AS coverage
            FROM agg
        """,
        "sichel_s": _FF_CTE + """
            SELECT v AS vocab, v2 AS n_dis,
                   round(CASE WHEN v = 0 THEN 0.0
                              ELSE CAST(v2 AS DOUBLE)
                                   / CAST(v AS DOUBLE) END, 6) AS sichel_s
            FROM agg
        """,
        "herdan_c": _FF_CTE + """
            SELECT n AS n_tokens, v AS vocab,
                   round(CASE WHEN n <= 1 OR v <= 1 THEN 0.0
                              ELSE CAST(CAST(floor(ln(CAST(v AS DOUBLE))
                                                   * 1e6) AS BIGINT)
                                        AS DOUBLE)
                                   / CAST(CAST(floor(ln(CAST(n AS DOUBLE))
                                                     * 1e6) AS BIGINT)
                                          AS DOUBLE) END, 6) AS herdan_c
            FROM agg
        """,
        "guiraud_r": _FF_CTE + """
            SELECT n AS n_tokens, v AS vocab,
                   round(CASE WHEN n = 0 THEN 0.0
                              ELSE CAST(v AS DOUBLE)
                                   / sqrt(CAST(n AS DOUBLE)) END,
                         6) AS guiraud_r
            FROM agg
        """,
        "honore_h": _FF_CTE + """
            SELECT v AS vocab, v1 AS n_hapax,
                   round(CASE WHEN n <= 1 OR v = v1 THEN 0.0
                              ELSE 100.0
                                   * (CAST(floor(ln(CAST(n AS DOUBLE))
                                                 * 1e6) AS BIGINT) / 1e6)
                                   * CAST(v AS DOUBLE)
                                   / CAST(v - v1 AS DOUBLE) END,
                         6) AS honore_h
            FROM agg
        """,
        "durbin_watson": _DENSE_GRID_CTE + """
            , dif AS (SELECT event_type,
                             c - lag(c) OVER (PARTITION BY event_type
                                              ORDER BY hr) AS dd
                      FROM d),
            nm AS (SELECT event_type, CAST(sum(dd * dd) AS BIGINT) AS num
                   FROM dif WHERE dd IS NOT NULL GROUP BY 1),
            mm AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1,
                          CAST(sum(c * c) AS BIGINT) AS s2
                   FROM d GROUP BY 1)
            SELECT mm.event_type,
                   round(CASE WHEN hh.hh * mm.s2 - mm.s1 * mm.s1 = 0
                              THEN 0.0
                              ELSE CAST(hh.hh * COALESCE(nm.num, 0)
                                        AS DOUBLE)
                                   / CAST(hh.hh * mm.s2 - mm.s1 * mm.s1
                                          AS DOUBLE) END, 6) AS dw
            FROM mm LEFT JOIN nm USING (event_type) CROSS JOIN hh
            ORDER BY 1
        """,
        "moran_lag1": _DENSE_GRID_CTE + """
            , mm AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1
                     FROM d GROUP BY 1),
            dd AS (SELECT d.event_type, d.hr,
                          CAST(hh.hh * d.c - mm.s1 AS BIGINT) AS dv
                   FROM d JOIN mm USING (event_type) CROSS JOIN hh),
            lg AS (SELECT event_type, dv,
                          lag(dv) OVER (PARTITION BY event_type
                                        ORDER BY hr) AS pv
                   FROM dd),
            cr AS (SELECT event_type,
                          CAST(sum(CAST(dv AS HUGEINT) * pv) AS HUGEINT)
                              AS crs
                   FROM lg WHERE pv IS NOT NULL GROUP BY 1),
            dn AS (SELECT event_type,
                          CAST(sum(CAST(dv AS HUGEINT) * dv) AS HUGEINT)
                              AS den
                   FROM dd GROUP BY 1)
            SELECT dn.event_type,
                   round(CASE WHEN dn.den = 0 THEN 0.0
                              ELSE CAST(hh.hh * COALESCE(cr.crs, 0)
                                        AS DOUBLE)
                                   / CAST((hh.hh - 1) * dn.den
                                          AS DOUBLE) END, 6) AS moran_i
            FROM dn LEFT JOIN cr USING (event_type) CROSS JOIN hh
            ORDER BY 1
        """,
        "cox_stuart": _DENSE_GRID_CTE + """
            , p AS (SELECT a.event_type,
                           CAST(sum(CASE WHEN b.c > a.c THEN 1 ELSE 0 END)
                                AS BIGINT) AS up,
                           CAST(sum(CASE WHEN b.c < a.c THEN 1 ELSE 0 END)
                                AS BIGINT) AS dwn
                    FROM d a CROSS JOIN hh CROSS JOIN bounds bo
                    JOIN d b ON b.event_type = a.event_type
                            AND b.hr = a.hr + (hh.hh - hh.hh // 2)
                    WHERE a.hr - bo.lo < hh.hh // 2
                    GROUP BY 1)
            SELECT event_type, up AS n_up, dwn AS n_down,
                   round(CASE WHEN up + dwn = 0 THEN 0.0
                              ELSE (2.0 * CAST(up AS DOUBLE)
                                    - CAST(up + dwn AS DOUBLE))
                                   / sqrt(CAST(up + dwn AS DOUBLE)) END,
                         6) AS z
            FROM p ORDER BY 1
        """,
        "kpss_level": _DENSE_GRID_CTE + """
            , mm AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1
                     FROM d GROUP BY 1),
            dd AS (SELECT d.event_type, d.hr,
                          CAST(hh.hh * d.c - mm.s1 AS BIGINT) AS dv
                   FROM d JOIN mm USING (event_type) CROSS JOIN hh),
            cm AS (SELECT event_type,
                          CAST(sum(dv) OVER (PARTITION BY event_type
                                             ORDER BY hr) AS HUGEINT)
                              AS sv
                   FROM dd),
            nm AS (SELECT event_type, CAST(sum(sv * sv) AS HUGEINT) AS num
                   FROM cm GROUP BY 1),
            dn AS (SELECT event_type,
                          CAST(sum(CAST(dv AS HUGEINT) * dv) AS HUGEINT)
                              AS den
                   FROM dd GROUP BY 1)
            SELECT dn.event_type,
                   round(CASE WHEN dn.den = 0 THEN 0.0
                              ELSE CAST(nm.num AS DOUBLE)
                                   / CAST(hh.hh * dn.den AS DOUBLE) END,
                         6) AS kpss
            FROM dn JOIN nm USING (event_type) CROSS JOIN hh ORDER BY 1
        """,
        "ks_uniform_hod": """
            WITH s AS (SELECT event_type,
                              (epoch_ms(ts) // 3600000) % 24 AS hod
                       FROM events),
            cs AS (SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n
                   FROM s GROUP BY 1, 2),
            types AS (SELECT DISTINCT event_type FROM events),
            grid AS (SELECT t.event_type, h.hod, COALESCE(cs.n, 0) AS n
                     FROM types t
                     CROSS JOIN (SELECT unnest(generate_series(0, 23))
                                     AS hod) h
                     LEFT JOIN cs ON cs.event_type = t.event_type
                                 AND cs.hod = h.hod),
            cum AS (SELECT event_type, hod,
                           sum(n) OVER (PARTITION BY event_type
                                        ORDER BY hod) AS k,
                           sum(n) OVER (PARTITION BY event_type) AS tot
                    FROM grid),
            mx AS (SELECT event_type,
                          CAST(max(abs(24 * k - tot * (hod + 1)))
                               AS BIGINT) AS dmax,
                          CAST(max(tot) AS BIGINT) AS n
                   FROM cum GROUP BY 1)
            SELECT event_type, n,
                   round(CASE WHEN n = 0 THEN 0.0
                              ELSE CAST(dmax AS DOUBLE)
                                   / CAST(24 * n AS DOUBLE) END,
                         6) AS ks_d
            FROM mx ORDER BY 1
        """,
        "cochran_armitage": """
            WITH s AS (SELECT ((epoch_ms(ts) // 3600000) % 24) // 4
                                  AS part,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS p
                       FROM events),
            g AS (SELECT part, CAST(sum(p) AS BIGINT) AS r,
                         CAST(count(*) AS BIGINT) AS n
                  FROM s GROUP BY 1),
            agg AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                           CAST(sum(r) AS BIGINT) AS rr,
                           CAST(sum(part * r) AS BIGINT) AS sr,
                           CAST(sum(part * n) AS BIGINT) AS sn,
                           CAST(sum(part * part * n) AS BIGINT) AS s2n
                    FROM g),
            tv AS (SELECT nn, rr,
                          CAST(nn AS HUGEINT) * sr
                              - CAST(rr AS HUGEINT) * sn AS tp,
                          CAST(rr AS HUGEINT) * (nn - rr)
                              * (CAST(nn AS HUGEINT) * s2n
                                 - CAST(sn AS HUGEINT) * sn) AS vp
                   FROM agg)
            SELECT nn AS n_events, rr AS n_purchases,
                   round(CASE WHEN vp <= 0 THEN 0.0
                              ELSE CAST(tp AS DOUBLE)
                                   * sqrt(CAST(nn AS DOUBLE))
                                   / sqrt(CAST(vp AS DOUBLE)) END,
                         6) AS z
            FROM tv
        """,
    }
)


# Round-3: TPC-H Q13 (the one remaining numbered query; Q1 is
# pricing_summary).
from .relational import q_tpch_q13  # noqa: E402

QUERIES.update({"tpch_q13": q_tpch_q13})

ORACLE_SQL.update(
    {
        "tpch_q13": """
            WITH oc AS (SELECT c.c_custkey,
                               CAST(count(o.o_orderkey) AS BIGINT)
                                   AS c_count
                        FROM customer c
                        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                             AND o.o_orderpriority != '1-URGENT'
                        GROUP BY 1)
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM oc GROUP BY 1
            ORDER BY custdist DESC, c_count DESC
        """,
    }
)


# Round-3 wave 2 (pipelines/stats4.py): distribution comparison,
# normality, and the Misra-Gries exact heavy hitters.
from .stats4 import (  # noqa: E402
    q_anderson_darling,
    q_heavy_hitters,
    q_hodges_lehmann,
    q_jarque_bera,
)

QUERIES.update({
    "anderson_darling": q_anderson_darling,
    "hodges_lehmann": q_hodges_lehmann,
    "jarque_bera": q_jarque_bera,
    "heavy_hitters": q_heavy_hitters,
})

ORACLE_SQL.update(
    {
        "anderson_darling": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events
                       WHERE event_type IN ('purchase', 'view')),
            cs AS (SELECT cv,
                          CAST(sum(CASE WHEN event_type = 'purchase'
                                        THEN 1 ELSE 0 END) AS BIGINT) AS a,
                          CAST(sum(CASE WHEN event_type = 'view'
                                        THEN 1 ELSE 0 END) AS BIGINT) AS b
                   FROM s GROUP BY 1),
            tot AS (SELECT CAST(sum(a) AS BIGINT) AS n,
                           CAST(sum(b) AS BIGINT) AS m FROM cs),
            cum AS (SELECT cv, a, b,
                           sum(a) OVER (ORDER BY cv) AS ca,
                           sum(a + b) OVER (ORDER BY cv) AS cb
                    FROM cs),
            terms AS (SELECT CAST(sum(
                          (1000000 * CAST(cum.a + cum.b AS HUGEINT)
                           * (CAST(cum.ca AS HUGEINT) * (tot.n + tot.m)
                              - tot.n * cum.cb)
                           * (CAST(cum.ca AS HUGEINT) * (tot.n + tot.m)
                              - tot.n * cum.cb))
                          // (CAST(cum.cb AS HUGEINT)
                              * (tot.n + tot.m - cum.cb))) AS HUGEINT)
                          AS tt
                      FROM cum CROSS JOIN tot
                      WHERE cum.cb > 0 AND cum.cb < tot.n + tot.m)
            SELECT tot.n AS n_purchase, tot.m AS n_view,
                   round(CASE WHEN tot.n = 0 OR tot.m = 0 THEN 0.0
                              ELSE CAST(terms.tt AS DOUBLE)
                                   / CAST(CAST(tot.n AS HUGEINT) * tot.m
                                          * 1000000 AS DOUBLE) END,
                         6) AS ad_a2
            FROM terms CROSS JOIN tot
        """,
        "hodges_lehmann": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            cs AS (SELECT event_type, cv, CAST(count(*) AS BIGINT) AS c
                   FROM s GROUP BY 1, 2),
            tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
                    FROM cs GROUP BY 1),
            pr AS (SELECT a.event_type AS ta, b.event_type AS tb,
                          a.cv - b.cv AS d,
                          CAST(sum(CAST(a.c AS HUGEINT) * b.c) AS HUGEINT)
                              AS w
                   FROM cs a JOIN cs b ON a.event_type < b.event_type
                   GROUP BY 1, 2, 3),
            cum AS (SELECT ta, tb, d,
                           sum(w) OVER (PARTITION BY ta, tb ORDER BY d)
                               AS cw
                    FROM pr),
            kk AS (SELECT x.event_type AS ta, y.event_type AS tb,
                          (CAST(x.n AS HUGEINT) * y.n + 1) // 2 AS k
                   FROM tot x JOIN tot y
                        ON x.event_type < y.event_type)
            SELECT cum.ta AS type_a, cum.tb AS type_b,
                   CAST(min(cum.d) AS BIGINT) AS hl_cents,
                   round(CAST(min(cum.d) AS DOUBLE) / 100.0, 6) AS hl
            FROM cum JOIN kk ON kk.ta = cum.ta AND kk.tb = cum.tb
            WHERE cum.cw >= kk.k
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "jarque_bera": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            cs AS (SELECT event_type, cv, CAST(count(*) AS BIGINT) AS c
                   FROM s GROUP BY 1, 2),
            mo AS (SELECT event_type,
                          CAST(sum(c) AS BIGINT) AS n,
                          CAST(sum(CAST(c AS HUGEINT) * cv) AS HUGEINT)
                              AS s1,
                          CAST(sum(CAST(c AS HUGEINT) * cv * cv)
                               AS HUGEINT) AS s2,
                          CAST(sum(CAST(c AS HUGEINT) * cv * cv * cv)
                               AS HUGEINT) AS s3,
                          CAST(sum(CAST(c AS HUGEINT) * cv * cv * cv * cv)
                               AS HUGEINT) AS s4
                   FROM cs GROUP BY 1),
            f AS (SELECT event_type, n, CAST(n AS DOUBLE) AS fn,
                         CAST(s1 AS DOUBLE) AS f1,
                         CAST(s2 AS DOUBLE) AS f2,
                         CAST(s3 AS DOUBLE) AS f3,
                         CAST(s4 AS DOUBLE) AS f4
                  FROM mo),
            g AS (SELECT event_type, n, fn,
                         fn * f2 - f1 * f1 AS a2,
                         fn * fn * f3 - 3.0 * fn * f1 * f2
                             + 2.0 * f1 * f1 * f1 AS a3,
                         fn * fn * fn * f4 - 4.0 * fn * fn * f1 * f3
                             + 6.0 * fn * f1 * f1 * f2
                             - 3.0 * f1 * f1 * f1 * f1 AS a4
                  FROM f),
            h AS (SELECT event_type,
                         a3 / (a2 * sqrt(a2)) AS skew,
                         a4 / (a2 * a2) - 3.0 AS kurt
                  FROM g WHERE a2 > 0)
            SELECT g.event_type, g.n,
                   round(CASE WHEN g.a2 <= 0 THEN 0.0
                              ELSE g.fn * (h.skew * h.skew / 6.0
                                           + h.kurt * h.kurt / 24.0) END,
                         6) AS jb
            FROM g LEFT JOIN h USING (event_type) ORDER BY 1
        """,
        "heavy_hitters": """
            WITH tok AS (SELECT lower(term) AS term
                         FROM (SELECT unnest(regexp_extract_all(text,
                                      '[A-Za-z]+')) AS term
                               FROM documents)),
            cs AS (SELECT term, CAST(count(*) AS BIGINT) AS n
                   FROM tok GROUP BY 1),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cs)
            SELECT term, n FROM cs CROSS JOIN tot
            WHERE n * 64 > nn ORDER BY term
        """,
    }
)


# Round-3 wave 3 (pipelines/stats4.py): CCNet perplexity bucketing
# (composes the already-oracled unigram LM) + GE(2) inequality.
from .stats4 import q_ccnet_buckets, q_ge2_index  # noqa: E402

QUERIES.update({
    "ccnet_buckets": q_ccnet_buckets,
    "ge2_index": q_ge2_index,
})

ORACLE_SQL.update(
    {
        # the unigram LM subquery is the EXISTING oracled definition,
        # nested verbatim — the bucketing rides on a green base
        "ccnet_buckets": "WITH nl AS (" + ORACLE_SQL["unigram_logprob"]
        + """),
            bb AS (SELECT CAST(floor(nll * 100) AS BIGINT) AS b FROM nl),
            cs AS (SELECT b, CAST(count(*) AS BIGINT) AS c
                   FROM bb GROUP BY 1),
            tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cs),
            cum AS (SELECT b, sum(c) OVER (ORDER BY b) AS cum FROM cs),
            th AS (SELECT (SELECT min(b) FROM cum CROSS JOIN tot
                           WHERE 3 * cum >= tot.n) AS t1,
                          (SELECT min(b) FROM cum CROSS JOIN tot
                           WHERE 3 * cum >= 2 * tot.n) AS t2,
                          (SELECT max(b) FROM cs) AS tmax),
            cnts AS (SELECT
                CAST(sum(CASE WHEN b <= th.t1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS nh,
                CAST(sum(CASE WHEN b > th.t1 AND b <= th.t2
                              THEN 1 ELSE 0 END) AS BIGINT) AS nm,
                CAST(sum(CASE WHEN b > th.t2 THEN 1 ELSE 0 END)
                     AS BIGINT) AS nt
                FROM bb CROSS JOIN th)
            SELECT * FROM (
                SELECT 'head' AS bucket, cnts.nh AS n_docs,
                       th.t1 AS thr_centinll
                FROM cnts CROSS JOIN th
                UNION ALL
                SELECT 'middle', cnts.nm, th.t2 FROM cnts CROSS JOIN th
                UNION ALL
                SELECT 'tail', cnts.nt, th.tmax FROM cnts CROSS JOIN th)
            ORDER BY bucket
        """,
        "ge2_index": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(cv) AS BIGINT) AS s1,
                         CAST(sum(CAST(cv AS HUGEINT) * cv) AS HUGEINT)
                             AS s2
                  FROM s GROUP BY 1)
            SELECT event_type, n,
                   round(CASE WHEN s1 = 0 THEN 0.0
                              ELSE (CAST(n * s2 AS DOUBLE)
                                    / CAST(CAST(s1 AS HUGEINT) * s1
                                           AS DOUBLE) - 1.0) / 2.0 END,
                         6) AS ge2
            FROM g ORDER BY 1
        """,
    }
)


# Round-3 wave 4 (pipelines/stats4.py): G-test, Pielou evenness,
# Dixon gap statistics.
from .stats4 import q_dixon_q, q_g_test, q_pielou_j  # noqa: E402

QUERIES.update({
    "g_test": q_g_test,
    "pielou_j": q_pielou_j,
    "dixon_q": q_dixon_q,
})

ORACLE_SQL.update(
    {
        "g_test": """
            WITH s AS (SELECT event_type,
                              ((epoch_ms(ts) // 86400000) + 3) % 7 AS dow
                       FROM events),
            cs AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n
                   FROM s GROUP BY 1, 2),
            r AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS rn
                  FROM cs GROUP BY 1),
            c AS (SELECT dow, CAST(sum(n) AS BIGINT) AS cn
                  FROM cs GROUP BY 1),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cs),
            terms AS (SELECT CAST(sum(CAST(cs.n AS HUGEINT)
                          * CAST(floor(ln(CAST(cs.n * tot.nn AS DOUBLE)
                                          / CAST(r.rn * c.cn AS DOUBLE))
                                       * 1e6) AS BIGINT)) AS HUGEINT)
                          AS tt
                      FROM cs JOIN r USING (event_type)
                              JOIN c USING (dow) CROSS JOIN tot
                      WHERE cs.n > 0)
            SELECT tot.nn AS n,
                   round(2.0 * CAST(terms.tt AS DOUBLE) / 1e6, 6)
                       AS g_stat
            FROM terms CROSS JOIN tot
        """,
        "pielou_j": """
            WITH cs AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                        FROM events GROUP BY 1),
            kk AS (SELECT CAST(count(*) AS BIGINT) AS k,
                          CAST(sum(n) AS BIGINT) AS nn
                   FROM cs),
            tt AS (SELECT CAST(-sum(CAST(cs.n AS HUGEINT)
                           * CAST(floor(ln(CAST(cs.n AS DOUBLE)
                                           / CAST(kk.nn AS DOUBLE))
                                        * 1e6) AS BIGINT)) AS HUGEINT)
                          AS tot
                   FROM cs CROSS JOIN kk WHERE cs.n > 0)
            SELECT kk.k AS k_types, kk.nn AS n,
                   round(CASE WHEN kk.k <= 1 OR kk.nn = 0 THEN 0.0
                              ELSE CAST(tt.tot AS DOUBLE)
                                   / CAST(kk.nn
                                          * CAST(floor(ln(CAST(kk.k
                                                AS DOUBLE)) * 1e6)
                                                AS BIGINT)
                                          AS DOUBLE) END,
                         6) AS pielou_j
            FROM kk CROSS JOIN tt
        """,
        "dixon_q": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            cs AS (SELECT DISTINCT event_type, cv FROM s),
            r AS (SELECT event_type,
                         min(cv) AS v1, max(cv) AS vn,
                         CAST(count(*) AS BIGINT) AS nd
                  FROM cs GROUP BY 1),
            lo AS (SELECT cs.event_type, min(cs.cv) AS v2
                   FROM cs JOIN r USING (event_type)
                   WHERE cs.cv > r.v1 GROUP BY 1),
            hi AS (SELECT cs.event_type, max(cs.cv) AS vn1
                   FROM cs JOIN r USING (event_type)
                   WHERE cs.cv < r.vn GROUP BY 1)
            SELECT r.event_type,
                   round(CASE WHEN r.nd < 2 OR r.vn = r.v1 THEN 0.0
                              ELSE CAST(lo.v2 - r.v1 AS DOUBLE)
                                   / CAST(r.vn - r.v1 AS DOUBLE) END,
                         6) AS q_low,
                   round(CASE WHEN r.nd < 2 OR r.vn = r.v1 THEN 0.0
                              ELSE CAST(r.vn - hi.vn1 AS DOUBLE)
                                   / CAST(r.vn - r.v1 AS DOUBLE) END,
                         6) AS q_high
            FROM r LEFT JOIN lo USING (event_type)
                   LEFT JOIN hi USING (event_type)
            ORDER BY 1
        """,
    }
)


# Round-3 wave 5 (pipelines/stats4.py): uncertainty coefficient +
# Bowker symmetry.
from .stats4 import q_bowker, q_theil_u  # noqa: E402

QUERIES.update({
    "theil_u": q_theil_u,
    "bowker": q_bowker,
})

ORACLE_SQL.update(
    {
        "theil_u": """
            WITH s AS (SELECT event_type,
                              ((epoch_ms(ts) // 86400000) + 3) % 7 AS dow
                       FROM events),
            cs AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n
                   FROM s GROUP BY 1, 2),
            r AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS rn
                  FROM cs GROUP BY 1),
            c AS (SELECT dow, CAST(sum(n) AS BIGINT) AS cn
                  FROM cs GROUP BY 1),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cs),
            t1 AS (SELECT CAST(-sum(CAST(r.rn AS HUGEINT)
                        * CAST(floor(ln(CAST(r.rn AS DOUBLE)
                                        / CAST(tot.nn AS DOUBLE)) * 1e6)
                               AS BIGINT)) AS HUGEINT) AS v
                   FROM r CROSS JOIN tot WHERE r.rn > 0),
            t2 AS (SELECT CAST(-sum(CAST(cs.n AS HUGEINT)
                        * CAST(floor(ln(CAST(cs.n AS DOUBLE)
                                        / CAST(c.cn AS DOUBLE)) * 1e6)
                               AS BIGINT)) AS HUGEINT) AS v
                   FROM cs JOIN c USING (dow) WHERE cs.n > 0)
            SELECT tot.nn AS n,
                   round(CASE WHEN t1.v = 0 THEN 0.0
                              ELSE CAST(t1.v - t2.v AS DOUBLE)
                                   / CAST(t1.v AS DOUBLE) END,
                         6) AS theil_u
            FROM tot CROSS JOIN t1 CROSS JOIN t2
        """,
        "bowker": """
            WITH p AS (SELECT user_id, event_type,
                              epoch_ms(ts) // 86400000 AS day
                       FROM events),
            g AS (SELECT CAST((min(day) + max(day) + 1) // 2 AS BIGINT)
                             AS mid
                  FROM p),
            hc AS (SELECT user_id,
                          CASE WHEN p.day >= g.mid THEN 1 ELSE 0 END
                              AS half,
                          event_type, count(*) AS n
                   FROM p CROSS JOIN g GROUP BY 1, 2, 3),
            md AS (SELECT user_id, half, event_type,
                          row_number() OVER (PARTITION BY user_id, half
                                             ORDER BY n DESC, event_type)
                              AS rk
                   FROM hc),
            m AS (SELECT user_id, half, event_type FROM md WHERE rk = 1),
            pairs AS (SELECT e.event_type AS ta, l.event_type AS tb,
                             CAST(count(*) AS BIGINT) AS n
                      FROM m e JOIN m l ON l.user_id = e.user_id
                                       AND e.half = 0 AND l.half = 1
                      GROUP BY 1, 2),
            cells AS (SELECT x.ta AS a, x.tb AS b,
                             CAST(x.n AS BIGINT) AS nij,
                             CAST(COALESCE(y.n, 0) AS BIGINT) AS nji
                      FROM pairs x LEFT JOIN pairs y
                           ON y.ta = x.tb AND y.tb = x.ta
                      WHERE x.ta < x.tb
                      UNION ALL
                      SELECT y.tb AS a, y.ta AS b,
                             CAST(0 AS BIGINT) AS nij,
                             CAST(y.n AS BIGINT) AS nji
                      FROM pairs y LEFT JOIN pairs x
                           ON x.ta = y.tb AND x.tb = y.ta
                      WHERE y.ta > y.tb AND x.ta IS NULL),
            agg AS (SELECT CAST(count(*) AS BIGINT) AS df,
                           CAST(sum((1000000 * (nij - nji) * (nij - nji))
                                    // (nij + nji)) AS BIGINT) AS tot
                    FROM cells WHERE nij + nji > 0)
            SELECT (SELECT mid FROM g) AS mid_day,
                   COALESCE(agg.df, 0) AS df,
                   round(CAST(COALESCE(agg.tot, 0) AS DOUBLE) / 1e6, 6)
                       AS bowker_chi2
            FROM agg
        """,
    }
)


# Round-3 wave 6 (pipelines/stats4.py): richness estimation + cross-
# language vocabulary set geometry.
from .stats4 import (  # noqa: E402
    q_chao1,
    q_lang_vocab_overlap,
    q_whittaker_beta,
)

QUERIES.update({
    "chao1": q_chao1,
    "lang_vocab_overlap": q_lang_vocab_overlap,
    "whittaker_beta": q_whittaker_beta,
})

_LANG_VOCAB_CTE = """
    WITH tok AS (SELECT lang, lower(term) AS term
                 FROM (SELECT lang, unnest(regexp_extract_all(text,
                              '[A-Za-z]+')) AS term
                       FROM documents)),
    lt AS (SELECT DISTINCT lang, term FROM tok),
    lv AS (SELECT lang, CAST(count(*) AS BIGINT) AS v FROM lt GROUP BY 1)
"""

ORACLE_SQL.update(
    {
        "chao1": _FF_CTE + """
            SELECT v AS vocab, v1 AS n_hapax,
                   round(CASE WHEN v2 > 0
                              THEN CAST(v AS DOUBLE)
                                   + CAST(v1 * v1 AS DOUBLE)
                                     / CAST(2 * v2 AS DOUBLE)
                              ELSE CAST(v AS DOUBLE)
                                   + CAST(v1 * (v1 - 1) AS DOUBLE)
                                     / 2.0 END, 6) AS chao1
            FROM agg
        """,
        "lang_vocab_overlap": _LANG_VOCAB_CTE + """
            , pairs AS (SELECT a.lang AS la, b.lang AS lb,
                               CAST(count(*) AS BIGINT) AS inter
                        FROM lt a JOIN lt b ON a.term = b.term
                                           AND a.lang < b.lang
                        GROUP BY 1, 2),
            f AS (SELECT x.lang AS la, y.lang AS lb, x.v AS va, y.v AS vb,
                         COALESCE(p.inter, 0) AS inter
                  FROM lv x JOIN lv y ON x.lang < y.lang
                  LEFT JOIN pairs p ON p.la = x.lang AND p.lb = y.lang)
            SELECT la AS lang_a, lb AS lang_b,
                   inter AS n_inter, va + vb - inter AS n_union,
                   round(CASE WHEN va + vb - inter = 0 THEN 0.0
                              ELSE CAST(inter AS DOUBLE)
                                   / CAST(va + vb - inter AS DOUBLE) END,
                         6) AS jaccard,
                   round(CASE WHEN least(va, vb) = 0 THEN 0.0
                              ELSE CAST(inter AS DOUBLE)
                                   / CAST(least(va, vb) AS DOUBLE) END,
                         6) AS overlap,
                   round(CASE WHEN va + vb = 0 THEN 0.0
                              ELSE CAST(2 * inter AS DOUBLE)
                                   / CAST(va + vb AS DOUBLE) END,
                         6) AS dice
            FROM f ORDER BY 1, 2
        """,
        "whittaker_beta": _LANG_VOCAB_CTE + """
            , g AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS gamma
                    FROM lt),
            k AS (SELECT CAST(count(*) AS BIGINT) AS k,
                         CAST(sum(v) AS BIGINT) AS asum
                  FROM lv)
            SELECT k.k AS k_langs, g.gamma AS gamma_vocab,
                   round(CASE WHEN k.asum = 0 THEN 0.0
                              ELSE CAST(k.k * g.gamma AS DOUBLE)
                                   / CAST(k.asum AS DOUBLE) - 1.0 END,
                         6) AS whittaker_beta
            FROM k CROSS JOIN g
        """,
    }
)


# Round-3 wave 7 (pipelines/stats4.py): Hill diversity profile +
# classical richness/dominance indices.
from .stats4 import (  # noqa: E402
    q_hill_numbers,
    q_margalef,
    q_mcintosh_d,
)

QUERIES.update({
    "hill_numbers": q_hill_numbers,
    "mcintosh_d": q_mcintosh_d,
    "margalef": q_margalef,
})

ORACLE_SQL.update(
    {
        "hill_numbers": _FF_CTE + """
            , h AS (SELECT CAST(-sum(CAST(m AS HUGEINT)
                         * CAST(floor(ln(CAST(m AS DOUBLE)
                                         / CAST(agg.n AS DOUBLE)) * 1e6)
                                AS BIGINT)) AS HUGEINT) AS ht
                    FROM cs CROSS JOIN agg)
            SELECT agg.v AS hill_q0,
                   round(CASE WHEN agg.n = 0 THEN 0.0
                              ELSE CAST(h.ht AS DOUBLE)
                                   / CAST(agg.n AS DOUBLE) END,
                         6) AS h1_micronats,
                   round(CASE WHEN agg.s2 = 0 THEN 0.0
                              ELSE CAST(CAST(agg.n AS HUGEINT) * agg.n
                                        AS DOUBLE)
                                   / CAST(agg.s2 AS DOUBLE) END,
                         6) AS hill_q2
            FROM agg CROSS JOIN h
        """,
        "mcintosh_d": _FF_CTE + """
            SELECT n AS n_tokens,
                   round(CASE WHEN n <= 1 THEN 0.0
                              ELSE (CAST(n AS DOUBLE)
                                    - sqrt(CAST(s2 AS DOUBLE)))
                                   / (CAST(n AS DOUBLE)
                                      - sqrt(CAST(n AS DOUBLE))) END,
                         6) AS mcintosh_d
            FROM agg
        """,
        "margalef": _FF_CTE + """
            , mx AS (SELECT CAST(max(m) AS BIGINT) AS mx FROM cs)
            SELECT agg.v AS vocab, agg.n AS n_tokens,
                   round(CASE WHEN agg.n <= 1 THEN 0.0
                              ELSE CAST((agg.v - 1) * 1000000 AS DOUBLE)
                                   / CAST(CAST(floor(ln(CAST(agg.n
                                          AS DOUBLE)) * 1e6) AS BIGINT)
                                          AS DOUBLE) END,
                         6) AS margalef_r,
                   round(CASE WHEN agg.n = 0 THEN 0.0
                              ELSE CAST(mx.mx AS DOUBLE)
                                   / CAST(agg.n AS DOUBLE) END,
                         6) AS berger_parker
            FROM agg CROSS JOIN mx
        """,
    }
)


# Round-3 wave 8 (pipelines/stats4.py): ACE richness, lexical Gini,
# difference-sign runs, Bartels rank von Neumann.
from .stats4 import (  # noqa: E402
    q_ace_richness,
    q_bartels_rvn,
    q_lexical_gini,
    q_runs_updown,
)

QUERIES.update({
    "ace_richness": q_ace_richness,
    "lexical_gini": q_lexical_gini,
    "runs_updown": q_runs_updown,
    "bartels_rvn": q_bartels_rvn,
})

ORACLE_SQL.update(
    {
        "ace_richness": _FF_CTE + """
            , rr AS (SELECT
                CAST(sum(CASE WHEN m <= 10 THEN 1 ELSE 0 END) AS BIGINT)
                    AS s_rare,
                CAST(sum(CASE WHEN m > 10 THEN 1 ELSE 0 END) AS BIGINT)
                    AS s_abund,
                CAST(sum(CASE WHEN m <= 10 THEN m ELSE 0 END) AS BIGINT)
                    AS n_rare,
                CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS f1,
                CAST(sum(CASE WHEN m <= 10 THEN m * (m - 1) ELSE 0 END)
                     AS BIGINT) AS sumi
                FROM cs),
            st AS (SELECT *, 1.0 - CAST(f1 AS DOUBLE)
                              / CAST(n_rare AS DOUBLE) AS c
                   FROM rr
                   WHERE n_rare >= 2 AND n_rare != f1),
            g AS (SELECT *,
                         greatest(CAST(s_rare AS DOUBLE)
                                  * CAST(sumi AS DOUBLE)
                                  / (c * CAST(n_rare AS DOUBLE)
                                     * CAST(n_rare - 1 AS DOUBLE)) - 1.0,
                                  0.0) AS g2
                  FROM st)
            SELECT rr.s_rare, rr.s_abund,
                   round(COALESCE(CAST(g.s_abund AS DOUBLE)
                                  + CAST(g.s_rare AS DOUBLE) / g.c
                                  + CAST(g.f1 AS DOUBLE) / g.c * g.g2,
                                  CAST(rr.s_abund + rr.s_rare
                                       AS DOUBLE)), 6) AS ace
            FROM rr LEFT JOIN g ON true
        """,
        "lexical_gini": _FF_CTE + """
            , ffq AS (SELECT m, CAST(count(*) AS BIGINT) AS vm
                      FROM cs GROUP BY 1),
            w AS (SELECT m, vm,
                         COALESCE(sum(vm) OVER (ORDER BY m
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS a
                  FROM ffq),
            rs AS (SELECT CAST(sum(CAST(w.m AS HUGEINT) * w.vm
                                   * (2 * w.a + w.vm - agg.v))
                               AS HUGEINT) AS ranksum
                   FROM w CROSS JOIN agg)
            SELECT agg.v AS vocab, agg.n AS n_tokens,
                   round(CASE WHEN agg.v = 0 OR agg.n = 0 THEN 0.0
                              ELSE CAST(rs.ranksum AS DOUBLE)
                                   / CAST(CAST(agg.v AS HUGEINT) * agg.n
                                          AS DOUBLE) END,
                         6) AS lexical_gini
            FROM agg CROSS JOIN rs
        """,
        "runs_updown": _DENSE_GRID_CTE + """
            , dif AS (SELECT event_type, hr,
                             c - lag(c) OVER (PARTITION BY event_type
                                              ORDER BY hr) AS dd
                      FROM d),
            sg AS (SELECT event_type, hr,
                          CASE WHEN dd > 0 THEN 1 ELSE -1 END AS s
                   FROM dif WHERE dd IS NOT NULL AND dd != 0),
            ch AS (SELECT event_type, s,
                          lag(s) OVER (PARTITION BY event_type
                                       ORDER BY hr) AS ps
                   FROM sg),
            ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                          CAST(1 + sum(CASE WHEN ps IS NOT NULL
                                            AND s != ps
                                            THEN 1 ELSE 0 END)
                               AS BIGINT) AS r
                   FROM ch GROUP BY 1),
            tt AS (SELECT DISTINCT event_type FROM d)
            SELECT tt.event_type,
                   COALESCE(ag.n, 0) AS n_signs,
                   COALESCE(ag.r, 0) AS n_runs,
                   round(CASE WHEN COALESCE(ag.n, 0) = 0 THEN 0.0
                              ELSE (3.0 * CAST(ag.r AS DOUBLE)
                                    - CAST(2 * ag.n + 1 AS DOUBLE))
                                   / (3.0 * sqrt(CAST(16 * ag.n - 13
                                                      AS DOUBLE)
                                                 / 90.0)) END,
                         6) AS z
            FROM tt LEFT JOIN ag USING (event_type) ORDER BY 1
        """,
        "bartels_rvn": _DENSE_GRID_CTE + """
            , rk AS (SELECT event_type, hr,
                            2 * (rank() OVER (PARTITION BY event_type
                                              ORDER BY c) - 1)
                            + count(*) OVER (PARTITION BY event_type, c)
                            + 1 AS r2
                     FROM d),
            df AS (SELECT event_type,
                          r2 - lag(r2) OVER (PARTITION BY event_type
                                             ORDER BY hr) AS dd
                   FROM rk),
            nm AS (SELECT event_type,
                          CAST(sum(CAST(dd AS HUGEINT) * dd) AS HUGEINT)
                              AS num
                   FROM df WHERE dd IS NOT NULL GROUP BY 1),
            mm AS (SELECT event_type, CAST(sum(r2) AS BIGINT) AS s1,
                          CAST(sum(CAST(r2 AS HUGEINT) * r2) AS HUGEINT)
                              AS s2
                   FROM rk GROUP BY 1)
            SELECT mm.event_type,
                   round(CASE WHEN hh.hh * mm.s2
                                   - CAST(mm.s1 AS HUGEINT) * mm.s1 = 0
                              THEN 0.0
                              ELSE CAST(hh.hh * COALESCE(nm.num, 0)
                                        AS DOUBLE)
                                   / CAST(hh.hh * mm.s2
                                          - CAST(mm.s1 AS HUGEINT)
                                            * mm.s1 AS DOUBLE) END,
                         6) AS rvn
            FROM mm LEFT JOIN nm USING (event_type) CROSS JOIN hh
            ORDER BY 1
        """,
    }
)


# Round-3 wave 9 (pipelines/stats4.py): seasonal Mann-Kendall.
from .stats4 import q_seasonal_mk  # noqa: E402

QUERIES.update({"seasonal_mk": q_seasonal_mk})

ORACLE_SQL.update(
    {
        "seasonal_mk": _DENSE_GRID_CTE + """
            , s AS (SELECT a.event_type,
                           CAST(sum(CASE WHEN b.c > a.c THEN 1
                                         WHEN b.c < a.c THEN -1
                                         ELSE 0 END) AS BIGINT) AS s_stat
                    FROM d a JOIN d b ON b.event_type = a.event_type
                                     AND b.hr > a.hr
                                     AND (b.hr % 24) = (a.hr % 24)
                    GROUP BY 1),
            grp AS (SELECT event_type, hr % 24 AS hod,
                           CAST(count(*) AS BIGINT) AS nh
                    FROM d GROUP BY 1, 2),
            base AS (SELECT event_type,
                            CAST(sum(CASE WHEN nh >= 2
                                     THEN nh * (nh - 1) * (2 * nh + 5)
                                     ELSE 0 END) AS BIGINT) AS b
                     FROM grp GROUP BY 1),
            ties AS (SELECT event_type,
                            CAST(sum(t * (t - 1) * (2 * t + 5))
                                 AS BIGINT) AS tie_sum
                     FROM (SELECT event_type, hr % 24 AS hod, c,
                                  count(*) AS t
                           FROM d GROUP BY 1, 2, 3
                           HAVING count(*) >= 1)
                     GROUP BY 1),
            v AS (SELECT base.event_type, s.s_stat,
                         base.b - ties.tie_sum AS var_num
                  FROM base JOIN s USING (event_type)
                            JOIN ties USING (event_type))
            SELECT event_type, s_stat, var_num,
                   round(CASE WHEN s_stat > 0 THEN
                                (CAST(s_stat AS DOUBLE) - 1.0)
                                / sqrt(CAST(var_num AS DOUBLE) / 18.0)
                              WHEN s_stat < 0 THEN
                                (CAST(s_stat AS DOUBLE) + 1.0)
                                / sqrt(CAST(var_num AS DOUBLE) / 18.0)
                              ELSE 0.0 END, 6) AS z
            FROM v ORDER BY 1
        """,
    }
)

# ---------------------------------------------------------------------------
# Round-3 wave 10 (pipelines/stats5.py): serial/spatial autocorrelation
# counterpart, ecological dispersion indices, inequality and variance-
# homogeneity families over the established censuses.
from .stats5 import (  # noqa: E402
    q_dispersion_indices,
    q_geary_c,
    q_hoover_index,
    q_variance_homogeneity,
)

QUERIES.update({
    "geary_c": q_geary_c,
    "dispersion_indices": q_dispersion_indices,
    "hoover_index": q_hoover_index,
    "variance_homogeneity": q_variance_homogeneity,
})

ORACLE_SQL.update(
    {
        "geary_c": _DENSE_GRID_CTE + """
            , ag AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1,
                            CAST(sum(c * c) AS BIGINT) AS s2
                     FROM d GROUP BY 1),
            df AS (SELECT event_type,
                          c - lag(c) OVER (PARTITION BY event_type
                                           ORDER BY hr) AS dd
                   FROM d),
            sd AS (SELECT event_type,
                          CAST(sum(dd * dd) AS BIGINT) AS sd2
                   FROM df WHERE dd IS NOT NULL GROUP BY 1)
            SELECT ag.event_type,
                   round(CASE WHEN 2 * (hh.hh * ag.s2
                                        - ag.s1 * ag.s1) = 0 THEN 0.0
                              ELSE CAST(hh.hh * sd.sd2 AS DOUBLE)
                                   / CAST(2 * (hh.hh * ag.s2
                                               - ag.s1 * ag.s1)
                                          AS DOUBLE) END, 6) AS geary_c
            FROM ag JOIN sd USING (event_type) CROSS JOIN hh ORDER BY 1
        """,
        "dispersion_indices": _DENSE_GRID_CTE + """
            , ag AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1,
                            CAST(sum(c * c) AS BIGINT) AS s2
                     FROM d GROUP BY 1)
            SELECT event_type,
                   round(CASE WHEN s1 * s1 - s1 = 0 THEN 0.0
                              ELSE CAST(hh.hh * (s2 - s1) AS DOUBLE)
                                   / CAST(s1 * s1 - s1 AS DOUBLE)
                         END, 6) AS morisita,
                   round(CASE WHEN s1 = 0 THEN 0.0
                              ELSE CAST(hh.hh * (s2 - s1) AS DOUBLE)
                                   / CAST(s1 * s1 AS DOUBLE)
                         END, 6) AS patchiness,
                   round(CASE WHEN hh.hh * (hh.hh * s2 - s1 * s1
                                            - (hh.hh - 1) * s1) <= 0
                              THEN 0.0
                              ELSE CAST(s1 * s1 * (hh.hh - 1) AS DOUBLE)
                                   / CAST(hh.hh * (hh.hh * s2 - s1 * s1
                                          - (hh.hh - 1) * s1)
                                          AS DOUBLE) END, 6) AS nb_k
            FROM ag CROSS JOIN hh ORDER BY 1
        """,
        "hoover_index": """
            WITH u AS (SELECT user_id,
                              CAST(sum(CAST(round(value * 100) AS BIGINT))
                                   AS BIGINT) AS x
                       FROM events GROUP BY 1),
            sn AS (SELECT CAST(sum(x) AS BIGINT) AS s,
                          CAST(count(*) AS BIGINT) AS n FROM u)
            SELECT sn.n AS n_users,
                   round(CASE WHEN 2 * sn.n * sn.s = 0 THEN 0.0
                              ELSE CAST(sum(abs(sn.n * u.x - sn.s))
                                        AS DOUBLE)
                                   / CAST(2 * sn.n * sn.s AS DOUBLE)
                         END, 6) AS hoover
            FROM u CROSS JOIN sn GROUP BY sn.n, sn.s
        """,
        "variance_homogeneity": _DENSE_GRID_CTE + """
            , ag AS (SELECT event_type,
                            CAST(hh.hh * sum(c * c) - sum(c) * sum(c)
                                 AS BIGINT) AS nu
                     FROM d CROSS JOIN hh GROUP BY event_type, hh.hh),
            mx AS (SELECT max(nu) AS mx, min(nu) AS mn,
                          CAST(sum(nu) AS BIGINT) AS tot,
                          CAST(count(*) AS BIGINT) AS k FROM ag),
            mt AS (SELECT ag.event_type FROM ag CROSS JOIN mx
                   WHERE ag.nu = mx.mx ORDER BY ag.event_type LIMIT 1)
            SELECT mx.k AS k_groups, mt.event_type AS max_type,
                   round(CASE WHEN mx.mn = 0 THEN 0.0
                              ELSE CAST(mx.mx AS DOUBLE)
                                   / CAST(mx.mn AS DOUBLE) END, 6)
                       AS fmax,
                   round(CASE WHEN mx.tot = 0 THEN 0.0
                              ELSE CAST(mx.mx AS DOUBLE)
                                   / CAST(mx.tot AS DOUBLE) END, 6)
                       AS cochran_c
            FROM mx CROSS JOIN mt
        """,
    }
)

# Round-3 wave 11 (pipelines/stats5.py): Chatterjee's xi dependence
# coefficient, CUSUM-of-squares scan, records test, Buishand range.
from .stats5 import (  # noqa: E402
    q_buishand_range,
    q_chatterjee_xi,
    q_cusum_squares,
    q_records_count,
)

QUERIES.update({
    "chatterjee_xi": q_chatterjee_xi,
    "cusum_squares": q_cusum_squares,
    "records_count": q_records_count,
    "buishand_range": q_buishand_range,
})

ORACLE_SQL.update(
    {
        "chatterjee_xi": _DENSE_GRID_CTE + """
            , rk AS (SELECT event_type, hr,
                            rank() OVER (PARTITION BY event_type
                                         ORDER BY c) AS rnk,
                            count(*) OVER (PARTITION BY event_type, c)
                                AS eq
                     FROM d),
            rr AS (SELECT event_type, hr,
                          CAST(rnk - 1 + eq AS BIGINT) AS r,
                          CAST(hh.hh - (rnk - 1) AS BIGINT) AS l
                   FROM rk CROSS JOIN hh),
            df AS (SELECT event_type,
                          r - lag(r) OVER (PARTITION BY event_type
                                           ORDER BY hr) AS dr
                   FROM rr),
            nm AS (SELECT event_type, CAST(sum(abs(dr)) AS BIGINT) AS num
                   FROM df WHERE dr IS NOT NULL GROUP BY 1),
            dn AS (SELECT event_type,
                          CAST(sum(l * (hh.hh - l)) AS BIGINT) AS den
                   FROM rr CROSS JOIN hh GROUP BY 1)
            SELECT nm.event_type,
                   round(CASE WHEN 2 * dn.den = 0 THEN 0.0
                              ELSE 1.0 - CAST(hh.hh * nm.num AS DOUBLE)
                                         / CAST(2 * dn.den AS DOUBLE)
                         END, 6) AS xi
            FROM nm JOIN dn USING (event_type) CROSS JOIN hh ORDER BY 1
        """,
        "cusum_squares": _DENSE_GRID_CTE + """
            , cs2 AS (SELECT event_type, hr,
                             CAST(sum(c * c) OVER (
                                  PARTITION BY event_type ORDER BY hr)
                                  AS BIGINT) AS c2,
                             row_number() OVER (PARTITION BY event_type
                                                ORDER BY hr) AS t
                      FROM d),
            tot AS (SELECT event_type, CAST(max(c2) AS BIGINT) AS sh
                    FROM cs2 GROUP BY 1),
            dd AS (SELECT cs2.event_type, cs2.t,
                          abs(hh.hh * cs2.c2 - cs2.t * tot.sh) AS dv
                   FROM cs2 JOIN tot USING (event_type) CROSS JOIN hh
                   WHERE cs2.t < hh.hh),
            best AS (SELECT event_type, t, dv,
                            row_number() OVER (PARTITION BY event_type
                                               ORDER BY dv DESC, t ASC)
                                AS rn
                     FROM dd)
            SELECT b.event_type,
                   CAST(CASE WHEN tot.sh = 0 THEN 0 ELSE b.t END
                        AS BIGINT) AS at_pos,
                   round(CASE WHEN tot.sh = 0 THEN 0.0
                              ELSE CAST(b.dv AS DOUBLE)
                                   / CAST(hh.hh * tot.sh AS DOUBLE)
                         END, 6) AS stat
            FROM best b JOIN tot USING (event_type) CROSS JOIN hh
            WHERE b.rn = 1 ORDER BY 1
        """,
        "records_count": _DENSE_GRID_CTE + """
            , w AS (SELECT event_type, hr, c,
                           max(c) OVER (PARTITION BY event_type
                                        ORDER BY hr
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS pm,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY hr) AS t
                    FROM d)
            SELECT event_type,
                   CAST(sum(CASE WHEN pm IS NULL OR c > pm
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_records,
                   CAST(max(CASE WHEN pm IS NULL OR c > pm THEN t END)
                        AS BIGINT) AS last_record_pos
            FROM w GROUP BY 1 ORDER BY 1
        """,
        "buishand_range": _DENSE_GRID_CTE + """
            , ag AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1,
                            CAST(sum(c * c) AS BIGINT) AS s2
                     FROM d GROUP BY 1),
            cu AS (SELECT d.event_type,
                          CAST(hh.hh * sum(d.c) OVER (
                                   PARTITION BY d.event_type
                                   ORDER BY d.hr)
                               - (row_number() OVER (
                                      PARTITION BY d.event_type
                                      ORDER BY d.hr)) * ag.s1
                               AS BIGINT) AS a
                   FROM d JOIN ag USING (event_type) CROSS JOIN hh),
            rr AS (SELECT event_type,
                          CAST(greatest(max(a), 0) - least(min(a), 0)
                               AS BIGINT) AS rh
                   FROM cu GROUP BY 1)
            SELECT ag.event_type, rr.rh AS r_scaled,
                   round(CASE WHEN hh.hh * ag.s2 - ag.s1 * ag.s1 <= 0
                              THEN 0.0
                              ELSE (CAST(rr.rh AS DOUBLE)
                                    / CAST(hh.hh AS DOUBLE))
                                   / (sqrt(CAST(hh.hh * ag.s2
                                                - ag.s1 * ag.s1
                                                AS DOUBLE)
                                           / CAST(hh.hh * (hh.hh - 1)
                                                  AS DOUBLE))
                                      * sqrt(CAST(hh.hh AS DOUBLE)))
                         END, 6) AS q
            FROM ag JOIN rr USING (event_type) CROSS JOIN hh ORDER BY 1
        """,
    }
)

# Round-3 wave 12 (pipelines/stats5.py): distribution distances over the
# cent-value census (merged-support cumulative identities).
from .stats5 import q_emd_cents, q_energy_distance  # noqa: E402

QUERIES.update({
    "emd_cents": q_emd_cents,
    "energy_distance": q_energy_distance,
})

ORACLE_SQL.update(
    {
        "emd_cents": _CENT_CENSUS_CTE + """
            , tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tt
                      FROM cs GROUP BY 1),
            pairs AS (SELECT a.event_type AS ta, a.tt AS na,
                             b.event_type AS tb, b.tt AS nb
                      FROM tot a JOIN tot b
                        ON a.event_type < b.event_type),
            sup AS (SELECT p.ta, p.tb, p.na, p.nb, v.cv,
                           COALESCE(ca.n, 0) AS an, COALESCE(cb.n, 0) AS bn
                    FROM pairs p
                    JOIN (SELECT DISTINCT cv FROM cs) v ON TRUE
                    LEFT JOIN cs ca ON ca.event_type = p.ta
                                   AND ca.cv = v.cv
                    LEFT JOIN cs cb ON cb.event_type = p.tb
                                   AND cb.cv = v.cv
                    WHERE ca.n IS NOT NULL OR cb.n IS NOT NULL),
            cums AS (SELECT ta, tb, na, nb, cv,
                            sum(an) OVER w AS cca, sum(bn) OVER w AS ccb,
                            lead(cv) OVER w AS nxt
                     FROM sup
                     WINDOW w AS (PARTITION BY ta, tb ORDER BY cv)),
            agg AS (SELECT ta, tb, na, nb,
                           CAST(sum(CAST(abs(nb * cca - na * ccb)
                                         AS HUGEINT) * (nxt - cv))
                                AS HUGEINT) AS num
                    FROM cums WHERE nxt IS NOT NULL GROUP BY 1, 2, 3, 4)
            SELECT p.ta AS type_a, p.tb AS type_b,
                   round(CASE WHEN p.na * p.nb = 0 THEN 0.0
                              ELSE CAST(COALESCE(agg.num, 0) AS DOUBLE)
                                   / CAST(p.na * p.nb AS DOUBLE)
                         END, 6) AS w1_cents
            FROM pairs p LEFT JOIN agg ON agg.ta = p.ta
                                      AND agg.tb = p.tb
            ORDER BY 1, 2
        """,
        "energy_distance": _CENT_CENSUS_CTE + """
            , tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tt
                      FROM cs GROUP BY 1),
            pairs AS (SELECT a.event_type AS ta, a.tt AS na,
                             b.event_type AS tb, b.tt AS nb
                      FROM tot a JOIN tot b
                        ON a.event_type < b.event_type),
            sup AS (SELECT p.ta, p.tb, p.na, p.nb, v.cv,
                           COALESCE(ca.n, 0) AS an, COALESCE(cb.n, 0) AS bn
                    FROM pairs p
                    JOIN (SELECT DISTINCT cv FROM cs) v ON TRUE
                    LEFT JOIN cs ca ON ca.event_type = p.ta
                                   AND ca.cv = v.cv
                    LEFT JOIN cs cb ON cb.event_type = p.tb
                                   AND cb.cv = v.cv
                    WHERE ca.n IS NOT NULL OR cb.n IS NOT NULL),
            cums AS (SELECT ta, tb, na, nb, cv, an, bn,
                            sum(an) OVER w - an AS walt,
                            sum(bn) OVER w - bn AS wblt,
                            sum(an * cv) OVER w - an * cv AS salt,
                            sum(bn * cv) OVER w - bn * cv AS sblt
                     FROM sup
                     WINDOW w AS (PARTITION BY ta, tb ORDER BY cv)),
            agg AS (SELECT ta, tb, na, nb,
                           CAST(sum(CAST(bn AS HUGEINT)
                                    * (cv * walt - salt)
                                    + CAST(an AS HUGEINT)
                                      * (cv * wblt - sblt))
                                AS HUGEINT) AS gab,
                           CAST(sum(CAST(an AS HUGEINT)
                                    * (cv * walt - salt))
                                AS HUGEINT) AS gaa,
                           CAST(sum(CAST(bn AS HUGEINT)
                                    * (cv * wblt - sblt))
                                AS HUGEINT) AS gbb
                    FROM cums GROUP BY 1, 2, 3, 4)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN na = 0 OR nb = 0 THEN 0.0
                              ELSE CAST(2 * (gab * na * nb
                                        - gaa * CAST(nb AS HUGEINT) * nb
                                        - gbb * CAST(na AS HUGEINT) * na)
                                        AS DOUBLE)
                                   / CAST(CAST(na AS HUGEINT) * na
                                          * nb * nb AS DOUBLE)
                         END, 6) AS energy_cents
            FROM agg ORDER BY 1, 2
        """,
    }
)

# Round-3 wave 13 (pipelines/stats5.py): blocked / grouped variance
# homogeneity tests (Quade, mean-centered Levene, Bartlett).
from .stats5 import q_bartlett, q_levene_mean, q_quade_test  # noqa: E402

QUERIES.update({
    "quade_test": q_quade_test,
    "levene_mean": q_levene_mean,
    "bartlett": q_bartlett,
})

ORACLE_SQL.update(
    {
        "quade_test": _DENSE_GRID_CTE + """
            , rk AS (SELECT hr, event_type,
                            2 * (rank() OVER (PARTITION BY hr
                                              ORDER BY c) - 1)
                            + count(*) OVER (PARTITION BY hr, c) + 1
                                AS r2
                     FROM d),
            br AS (SELECT hr, max(c) - min(c) AS rng FROM d GROUP BY 1),
            qr AS (SELECT hr,
                          2 * (rank() OVER (ORDER BY rng) - 1)
                          + count(*) OVER (PARTITION BY rng) + 1 AS q2
                   FROM br),
            tk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT)
                       AS k FROM d),
            cells AS (SELECT rk.event_type,
                             CAST(qr.q2 * (rk.r2 - (tk.k + 1))
                                  AS BIGINT) AS s2
                      FROM rk JOIN qr USING (hr) CROSS JOIN tk),
            sj AS (SELECT event_type, CAST(sum(s2) AS BIGINT) AS sjv
                   FROM cells GROUP BY 1),
            ag AS (SELECT CAST(sum(CAST(sjv AS HUGEINT) * sjv)
                               AS HUGEINT) AS sum_sj2 FROM sj),
            a2 AS (SELECT CAST(sum(CAST(s2 AS HUGEINT) * s2)
                               AS HUGEINT) AS a2s
                   FROM cells)
            SELECT tk.k AS k_types, CAST(hh.hh AS BIGINT) AS n_blocks,
                   round(CASE WHEN hh.hh * a2.a2s - ag.sum_sj2 = 0
                              THEN 0.0
                              ELSE CAST((hh.hh - 1) * ag.sum_sj2
                                        AS DOUBLE)
                                   / CAST(hh.hh * a2.a2s - ag.sum_sj2
                                          AS DOUBLE) END, 6) AS t_stat
            FROM ag CROSS JOIN a2 CROSS JOIN hh CROSS JOIN tk
        """,
        "levene_mean": _DENSE_GRID_CTE + """
            , ag AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1
                     FROM d GROUP BY 1),
            z AS (SELECT d.event_type,
                         CAST(abs(hh.hh * d.c - ag.s1) AS BIGINT) AS zz
                  FROM d JOIN ag USING (event_type) CROSS JOIN hh),
            uj AS (SELECT event_type, CAST(sum(zz) AS BIGINT) AS u
                   FROM z GROUP BY 1),
            n2 AS (SELECT CAST(sum((CAST(hh.hh AS HUGEINT) * z.zz
                                    - uj.u)
                                   * (CAST(hh.hh AS HUGEINT) * z.zz
                                      - uj.u)) AS HUGEINT) AS num2
                   FROM z JOIN uj USING (event_type) CROSS JOIN hh),
            n1 AS (SELECT CAST(sum((tk.k * CAST(uj.u AS HUGEINT)
                                    - tu.u)
                                   * (tk.k * CAST(uj.u AS HUGEINT)
                                      - tu.u)) AS HUGEINT) AS num1,
                          max(tk.k) AS k
                   FROM uj
                   CROSS JOIN (SELECT CAST(sum(u) AS HUGEINT) AS u
                               FROM uj) tu
                   CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS k
                               FROM uj) tk)
            SELECT n1.k AS k_groups,
                   CAST(n1.k * hh.hh AS BIGINT) AS n,
                   round(CASE WHEN (n1.k - 1) * n1.k * n1.k * n2.num2
                                   = 0 THEN 0.0
                              ELSE CAST((n1.k * hh.hh - n1.k) * hh.hh
                                        * n1.num1 AS DOUBLE)
                                   / CAST((n1.k - 1) * n1.k * n1.k
                                          * n2.num2 AS DOUBLE)
                         END, 6) AS w_stat
            FROM n1 CROSS JOIN n2 CROSS JOIN hh
        """,
        "bartlett": _DENSE_GRID_CTE + """
            , ag AS (SELECT event_type,
                            CAST(hh.hh * sum(c * c) - sum(c) * sum(c)
                                 AS BIGINT) AS nu
                     FROM d CROSS JOIN hh GROUP BY event_type, hh.hh),
            st AS (SELECT CAST(count(*) AS BIGINT) AS k,
                          min(nu) AS mn,
                          CAST(sum(nu) AS BIGINT) AS tot,
                          CAST(sum(floor(ln(CAST(nu AS DOUBLE)
                                            / CAST(hh.hh * (hh.hh - 1)
                                                   AS DOUBLE)) * 1e6))
                               FILTER (WHERE nu > 0) AS BIGINT) AS sfl,
                          CAST(max(hh.hh) AS BIGINT) AS h
                   FROM ag CROSS JOIN hh)
            SELECT st.k AS k_groups, st.h AS n_per_group,
                   round(CASE WHEN st.mn <= 0 OR st.h < 2 OR st.k < 2
                              THEN 0.0
                              ELSE (CAST((st.h - 1)
                                    * (st.k
                                       * floor(ln(
                                           CAST(greatest(st.tot, 1)
                                                AS DOUBLE)
                                           / CAST(st.k * st.h
                                                  * (st.h - 1)
                                                  AS DOUBLE)) * 1e6)
                                       - st.sfl) AS DOUBLE) / 1e6)
                                   * CAST(3 * st.k * (st.h - 1)
                                          AS DOUBLE)
                                   / CAST(3 * st.k * (st.h - 1)
                                          + st.k + 1 AS DOUBLE)
                         END, 6) AS chi2
            FROM st
        """,
    }
)

# Round-3 wave 14 (pipelines/stats5.py): association / agreement /
# concordance (Goodman-Kruskal lambda, Scott pi + Gwet AC1, Lin CCC).
from .stats5 import q_agreement_coefs, q_gk_lambda, q_lins_ccc  # noqa: E402

QUERIES.update({
    "gk_lambda": q_gk_lambda,
    "agreement_coefs": q_agreement_coefs,
    "lins_ccc": q_lins_ccc,
})

ORACLE_SQL.update(
    {
        "gk_lambda": """
            WITH s AS (SELECT event_type,
                              ((epoch_ms(ts) // 86400000) + 3) % 7
                                  AS dow,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            rmax AS (SELECT event_type, max(n) AS m FROM s GROUP BY 1),
            cmax AS (SELECT dow, max(n) AS m FROM s GROUP BY 1),
            rtot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS t
                     FROM s GROUP BY 1),
            ctot AS (SELECT dow, CAST(sum(n) AS BIGINT) AS t
                     FROM s GROUP BY 1),
            agg AS (SELECT
                      (SELECT CAST(sum(n) AS BIGINT) FROM s) AS n,
                      (SELECT CAST(sum(m) AS BIGINT) FROM rmax) AS srm,
                      (SELECT CAST(sum(m) AS BIGINT) FROM cmax) AS scm,
                      (SELECT CAST(max(t) AS BIGINT) FROM ctot) AS mct,
                      (SELECT CAST(max(t) AS BIGINT) FROM rtot) AS mrt)
            SELECT n,
                   round(CASE WHEN n = mct THEN 0.0
                              ELSE CAST(srm - mct AS DOUBLE)
                                   / CAST(n - mct AS DOUBLE) END, 6)
                       AS lambda_c_given_r,
                   round(CASE WHEN n = mrt THEN 0.0
                              ELSE CAST(scm - mrt AS DOUBLE)
                                   / CAST(n - mrt AS DOUBLE) END, 6)
                       AS lambda_r_given_c,
                   round(CASE WHEN 2 * n - mct - mrt = 0 THEN 0.0
                              ELSE CAST(srm + scm - mct - mrt AS DOUBLE)
                                   / CAST(2 * n - mct - mrt AS DOUBLE)
                         END, 6) AS lambda_sym
            FROM agg
        """,
        "agreement_coefs": _DENSE_GRID_CTE + """
            , tots AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1
                       FROM d GROUP BY 1),
            bits AS (SELECT d.event_type, d.hr,
                            CASE WHEN d.c * hh.hh > t.s1
                                 THEN 1 ELSE 0 END AS b
                     FROM d JOIN tots t USING (event_type) CROSS JOIN hh),
            p AS (SELECT x.event_type AS ta, y.event_type AS tb,
                         CAST(sum(CASE WHEN x.b = y.b THEN 1 ELSE 0 END)
                              AS HUGEINT) AS agree,
                         CAST(sum(x.b) + sum(y.b) AS HUGEINT) AS q1
                  FROM bits x JOIN bits y ON y.hr = x.hr
                                         AND x.event_type < y.event_type
                  GROUP BY 1, 2)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN 4 * hh.hh * hh.hh - q1 * q1
                                   - (2 * hh.hh - q1) * (2 * hh.hh - q1)
                                   = 0 THEN 0.0
                              ELSE CAST(4 * hh.hh * agree - q1 * q1
                                        - (2 * hh.hh - q1)
                                          * (2 * hh.hh - q1) AS DOUBLE)
                                   / CAST(4 * hh.hh * hh.hh - q1 * q1
                                          - (2 * hh.hh - q1)
                                            * (2 * hh.hh - q1)
                                          AS DOUBLE) END, 6) AS scott_pi,
                   round(CASE WHEN 4 * hh.hh * hh.hh
                                   - 2 * q1 * (2 * hh.hh - q1) = 0
                              THEN 0.0
                              ELSE CAST(4 * hh.hh * agree
                                        - 2 * q1 * (2 * hh.hh - q1)
                                        AS DOUBLE)
                                   / CAST(4 * hh.hh * hh.hh
                                          - 2 * q1 * (2 * hh.hh - q1)
                                          AS DOUBLE) END, 6) AS gwet_ac1
            FROM p CROSS JOIN hh ORDER BY 1, 2
        """,
        "lins_ccc": _DENSE_GRID_CTE + """
            , p AS (SELECT x.event_type AS ta, y.event_type AS tb,
                           CAST(sum(CAST(x.c AS HUGEINT) * y.c)
                                AS HUGEINT) AS sxy,
                           CAST(sum(CAST(x.c AS HUGEINT) * x.c)
                                AS HUGEINT) AS sxx,
                           CAST(sum(CAST(y.c AS HUGEINT) * y.c)
                                AS HUGEINT) AS syy,
                           CAST(sum(x.c) AS HUGEINT) AS sx,
                           CAST(sum(y.c) AS HUGEINT) AS sy
                    FROM d x JOIN d y ON y.hr = x.hr
                                     AND x.event_type < y.event_type
                    GROUP BY 1, 2)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN hh.hh * sxx - sx * sx
                                   + hh.hh * syy - sy * sy
                                   + (sx - sy) * (sx - sy) = 0 THEN 0.0
                              ELSE CAST(2 * (hh.hh * sxy - sx * sy)
                                        AS DOUBLE)
                                   / CAST(hh.hh * sxx - sx * sx
                                          + hh.hh * syy - sy * sy
                                          + (sx - sy) * (sx - sy)
                                          AS DOUBLE) END, 6) AS ccc
            FROM p CROSS JOIN hh ORDER BY 1, 2
        """,
    }
)

# Round-3 wave 15 (pipelines/stats5.py): two-sample distribution tests
# between type pairs over the cent-value census (merged-support
# cumulative identities; doubled midranks for the rank test).
from .stats5 import (  # noqa: E402
    q_cucconi,
    q_cvm_two_sample,
    q_ks_two_sample,
    q_kuiper_two_sample,
)

QUERIES.update({
    "ks_two_sample": q_ks_two_sample,
    "kuiper_two_sample": q_kuiper_two_sample,
    "cvm_two_sample": q_cvm_two_sample,
    "cucconi": q_cucconi,
})

# Shared pair-support CTE: per type pair, the merged cent support with
# inclusive cumulative counts (cca/ccb) and the strictly-below pooled
# count (wlt) for doubled midranks.
_PAIR_CUMS_CTE = _CENT_CENSUS_CTE + """
            , tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tt
                      FROM cs GROUP BY 1),
            pairs AS (SELECT a.event_type AS ta, a.tt AS na,
                             b.event_type AS tb, b.tt AS nb
                      FROM tot a JOIN tot b
                        ON a.event_type < b.event_type),
            sup AS (SELECT p.ta, p.tb, p.na, p.nb, v.cv,
                           COALESCE(ca.n, 0) AS an, COALESCE(cb.n, 0) AS bn
                    FROM pairs p
                    JOIN (SELECT DISTINCT cv FROM cs) v ON TRUE
                    LEFT JOIN cs ca ON ca.event_type = p.ta
                                   AND ca.cv = v.cv
                    LEFT JOIN cs cb ON cb.event_type = p.tb
                                   AND cb.cv = v.cv
                    WHERE ca.n IS NOT NULL OR cb.n IS NOT NULL),
            cums AS (SELECT ta, tb, na, nb, cv, an, bn,
                            sum(an) OVER w AS cca, sum(bn) OVER w AS ccb,
                            sum(an + bn) OVER w - (an + bn) AS wlt
                     FROM sup
                     WINDOW w AS (PARTITION BY ta, tb ORDER BY cv))
"""

ORACLE_SQL.update(
    {
        "ks_two_sample": _PAIR_CUMS_CTE + """
            , dif AS (SELECT ta, tb, na, nb, cv,
                             abs(nb * cca - na * ccb) AS ad
                      FROM cums),
            mx AS (SELECT ta, tb, na, nb, max(ad) AS m
                   FROM dif GROUP BY 1, 2, 3, 4),
            loc AS (SELECT d.ta, d.tb, d.na, d.nb, m.m,
                           min(d.cv) AS at_cv
                    FROM dif d JOIN mx m ON m.ta = d.ta AND m.tb = d.tb
                                        AND d.ad = m.m
                    GROUP BY 1, 2, 3, 4, 5)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN na * nb = 0 THEN 0.0
                              ELSE CAST(m AS DOUBLE)
                                   / CAST(na * nb AS DOUBLE) END,
                         6) AS d_stat,
                   at_cv
            FROM loc ORDER BY 1, 2
        """,
        "kuiper_two_sample": _PAIR_CUMS_CTE + """
            , dif AS (SELECT ta, tb, na, nb,
                             nb * cca - na * ccb AS df
                      FROM cums),
            ag AS (SELECT ta, tb, na, nb,
                          greatest(max(df), 0) AS dp,
                          greatest(max(-df), 0) AS dm
                   FROM dif GROUP BY 1, 2, 3, 4)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN na * nb = 0 THEN 0.0
                              ELSE CAST(dp + dm AS DOUBLE)
                                   / CAST(na * nb AS DOUBLE) END,
                         6) AS kuiper_v
            FROM ag ORDER BY 1, 2
        """,
        "cvm_two_sample": _PAIR_CUMS_CTE + """
            , ag AS (SELECT ta, tb, na, nb,
                            CAST(sum(CAST(an + bn AS HUGEINT)
                                     * (nb * cca - na * ccb)
                                     * (nb * cca - na * ccb))
                                 AS HUGEINT) AS num
                     FROM cums GROUP BY 1, 2, 3, 4)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN na = 0 OR nb = 0 THEN 0.0
                              ELSE CAST(num AS DOUBLE)
                                   / CAST(CAST(na + nb AS HUGEINT)
                                          * (na + nb) * na * nb
                                          AS DOUBLE) END, 6) AS cvm_t
            FROM ag ORDER BY 1, 2
        """,
        "cucconi": _PAIR_CUMS_CTE + """
            , dd AS (SELECT ta, tb, na, nb, an,
                            2 * wlt + (an + bn) + 1 AS d
                     FROM cums),
            ag AS (SELECT ta, tb, na, nb,
                          CAST(sum(CAST(an AS HUGEINT) * d)
                               AS HUGEINT) AS s1d,
                          CAST(sum(CAST(an AS HUGEINT) * d * d)
                               AS HUGEINT) AS s2d
                   FROM dd GROUP BY 1, 2, 3, 4),
            st AS (SELECT ta, tb, na, nb, na + nb AS nn, s1d, s2d
                   FROM ag),
            uv AS (SELECT ta, tb, na, nb, nn,
                          6 * s2d - 4 * CAST(na AS HUGEINT)
                            * (nn + 1) * (2 * nn + 1) AS num_u,
                          6 * (4 * CAST(nn + 1 AS HUGEINT) * (nn + 1) * na
                               - 4 * (nn + 1) * s1d + s2d)
                            - 4 * CAST(na AS HUGEINT)
                              * (nn + 1) * (2 * nn + 1) AS num_v,
                          16 * CAST(na AS HUGEINT) * nb * (nn + 1)
                            * (2 * nn + 1) * (8 * nn + 11) AS big_d
                   FROM st),
            fl AS (SELECT ta, tb, na, nb, nn,
                          CAST(num_u AS DOUBLE)
                            / sqrt(CAST(big_d AS DOUBLE) / 5.0) AS u,
                          CAST(num_v AS DOUBLE)
                            / sqrt(CAST(big_d AS DOUBLE) / 5.0) AS v,
                          CAST(2 * (CAST(nn AS HUGEINT) * nn - 4)
                               AS DOUBLE)
                            / CAST((2 * CAST(nn AS HUGEINT) + 1)
                                   * (8 * nn + 11) AS DOUBLE)
                            - 1.0 AS rho
                   FROM uv)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN na = 0 OR nb = 0 OR nn < 3 THEN 0.0
                              ELSE (u * u + v * v - 2.0 * rho * u * v)
                                   / (2.0 * (1.0 - rho * rho)) END,
                         6) AS cucconi_c
            FROM fl ORDER BY 1, 2
        """,
    }
)

# Round-3 wave 16 (pipelines/stats5.py): contingency-table effect sizes
# over the (type, day-of-week) census (pico-floored per-cell terms).
from .stats5 import q_cramers_v_dow, q_gk_tau, q_yule_coefs  # noqa: E402

QUERIES.update({
    "cramers_v_dow": q_cramers_v_dow,
    "gk_tau": q_gk_tau,
    "yule_coefs": q_yule_coefs,
})

_TYPE_DOW_CTE = """
            WITH c AS (SELECT event_type AS et,
                              ((epoch_ms(ts) // 86400000) + 3) % 7 AS dow,
                              count(*) AS n
                       FROM events GROUP BY 1, 2),
            rt AS (SELECT et, CAST(sum(n) AS BIGINT) AS r
                   FROM c GROUP BY 1),
            ct AS (SELECT dow, CAST(sum(n) AS BIGINT) AS cc
                   FROM c GROUP BY 1),
            tt AS (SELECT CAST(sum(n) AS BIGINT) AS n,
                          (SELECT count(*) FROM rt) AS r_cnt,
                          (SELECT count(*) FROM ct) AS c_cnt
                   FROM c)
"""

ORACLE_SQL.update(
    {
        "cramers_v_dow": _TYPE_DOW_CTE + """
            , cells AS (SELECT rt.r, ct.cc, COALESCE(c.n, 0) AS cell
                        FROM rt CROSS JOIN ct
                        LEFT JOIN c ON c.et = rt.et AND c.dow = ct.dow),
            terms AS (SELECT (CAST(tt.n * cell - r * cc AS HUGEINT)
                              * (tt.n * cell - r * cc)
                              * 1000000000000)
                             // (CAST(tt.n AS HUGEINT) * r * cc) AS t
                      FROM cells CROSS JOIN tt),
            ag AS (SELECT CAST(sum(t) AS HUGEINT) AS chi2_pico
                   FROM terms)
            SELECT tt.n,
                   round(CAST(chi2_pico AS DOUBLE) / 1e12, 6) AS chi2,
                   round(CASE WHEN tt.n * least(tt.r_cnt - 1,
                                                tt.c_cnt - 1) = 0
                              THEN 0.0
                              ELSE sqrt(CAST(chi2_pico AS DOUBLE)
                                        / (1e12 * CAST(tt.n
                                           * least(tt.r_cnt - 1,
                                                   tt.c_cnt - 1)
                                           AS DOUBLE))) END,
                         6) AS cramers_v,
                   round(CASE WHEN tt.n = 0
                                   OR (tt.r_cnt - 1) * (tt.c_cnt - 1) = 0
                              THEN 0.0
                              ELSE sqrt(CAST(chi2_pico AS DOUBLE)
                                        / (1e12 * CAST(tt.n AS DOUBLE)
                                           * sqrt(CAST((tt.r_cnt - 1)
                                                  * (tt.c_cnt - 1)
                                                  AS DOUBLE)))) END,
                         6) AS tschuprow_t,
                   round(sqrt(CAST(chi2_pico AS DOUBLE)
                              / CAST(chi2_pico
                                     + 1000000000000 *
                                       CAST(tt.n AS HUGEINT)
                                     AS DOUBLE)), 6) AS pearson_c
            FROM ag CROSS JOIN tt
        """,
        "gk_tau": _TYPE_DOW_CTE + """
            , srr AS (SELECT CAST(sum(CAST(r AS HUGEINT) * r)
                                  AS HUGEINT) AS srr FROM rt),
            scc AS (SELECT CAST(sum(CAST(cc AS HUGEINT) * cc)
                                AS HUGEINT) AS scc FROM ct),
            us AS (SELECT CAST(sum((1000000000000 *
                                    CAST(s2 AS HUGEINT)) // r)
                               AS HUGEINT) AS u_sum
                   FROM (SELECT rt.r,
                                (SELECT COALESCE(sum(CAST(c.n AS HUGEINT)
                                                     * c.n), 0)
                                 FROM c WHERE c.et = rt.et) AS s2
                         FROM rt WHERE rt.r > 0)),
            ts AS (SELECT CAST(sum((1000000000000 *
                                    CAST(s2 AS HUGEINT)) // cc)
                               AS HUGEINT) AS t_sum
                   FROM (SELECT ct.cc,
                                (SELECT COALESCE(sum(CAST(c.n AS HUGEINT)
                                                     * c.n), 0)
                                 FROM c WHERE c.dow = ct.dow) AS s2
                         FROM ct WHERE ct.cc > 0))
            SELECT tt.n,
                   round(CASE WHEN CAST(tt.n AS HUGEINT) * tt.n
                                   - scc.scc = 0 THEN 0.0
                              ELSE CAST(tt.n * us.u_sum
                                        - 1000000000000 * scc.scc
                                        AS DOUBLE)
                                   / CAST(1000000000000 *
                                          (CAST(tt.n AS HUGEINT) * tt.n
                                           - scc.scc) AS DOUBLE) END,
                         6) AS tau_c_given_r,
                   round(CASE WHEN CAST(tt.n AS HUGEINT) * tt.n
                                   - srr.srr = 0 THEN 0.0
                              ELSE CAST(tt.n * ts.t_sum
                                        - 1000000000000 * srr.srr
                                        AS DOUBLE)
                                   / CAST(1000000000000 *
                                          (CAST(tt.n AS HUGEINT) * tt.n
                                           - srr.srr) AS DOUBLE) END,
                         6) AS tau_r_given_c
            FROM tt CROSS JOIN srr CROSS JOIN scc
                    CROSS JOIN us CROSS JOIN ts
        """,
        "yule_coefs": """
            WITH f AS (SELECT CASE WHEN ((epoch_ms(ts) // 86400000) + 3)
                                        % 7 >= 5
                                   THEN 1 ELSE 0 END AS we,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS pu
                       FROM events),
            ag AS (SELECT CAST(sum(we * pu) AS BIGINT) AS a,
                          CAST(sum(we * (1 - pu)) AS BIGINT) AS b,
                          CAST(sum((1 - we) * pu) AS BIGINT) AS c,
                          CAST(sum((1 - we) * (1 - pu)) AS BIGINT) AS d
                   FROM f)
            SELECT round(CASE WHEN a * d + b * c = 0 THEN 0.0
                              ELSE CAST(a * d - b * c AS DOUBLE)
                                   / CAST(a * d + b * c AS DOUBLE) END,
                         6) AS yule_q,
                   round(CASE WHEN a * d + b * c = 0 THEN 0.0
                              ELSE (sqrt(CAST(a * d AS DOUBLE))
                                    - sqrt(CAST(b * c AS DOUBLE)))
                                   / (sqrt(CAST(a * d AS DOUBLE))
                                      + sqrt(CAST(b * c AS DOUBLE)))
                         END, 6) AS yule_y
            FROM ag
        """,
    }
)

# Round-3 wave 17 (pipelines/stats5.py): multi-rater agreement over the
# dense hourly grid (types rate hours by mean-binarization / quintiles).
from .stats5 import (  # noqa: E402
    q_fleiss_kappa,
    q_kripp_alpha,
    q_weighted_kappa,
)

QUERIES.update({
    "fleiss_kappa": q_fleiss_kappa,
    "kripp_alpha": q_kripp_alpha,
    "weighted_kappa": q_weighted_kappa,
})

_RATER_BITS_CTE = _DENSE_GRID_CTE + """
            , st AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s
                     FROM d GROUP BY 1),
            bits AS (SELECT d.hr,
                            CASE WHEN d.c * hh.hh > st.s
                                 THEN 1 ELSE 0 END AS bit
                     FROM d JOIN st USING (event_type) CROSS JOIN hh),
            u AS (SELECT hr, CAST(sum(bit) AS BIGINT) AS n1,
                         CAST(count(*) AS BIGINT) AS nr
                  FROM bits GROUP BY 1),
            ag AS (SELECT CAST(sum(CAST(n1 AS HUGEINT) * n1
                                   + CAST(nr - n1 AS HUGEINT)
                                     * (nr - n1)) AS HUGEINT) AS sq,
                          CAST(sum(n1) AS BIGINT) AS c1,
                          max(nr) AS nr,
                          CAST(count(*) AS BIGINT) AS h
                   FROM u)
"""

ORACLE_SQL.update(
    {
        "fleiss_kappa": _RATER_BITS_CTE + """
            , ag2 AS (SELECT nr, h,
                             sq - CAST(h AS HUGEINT) * nr AS a_sum,
                             CAST(c1 AS HUGEINT) * c1
                               + CAST(h * nr - c1 AS HUGEINT)
                                 * (h * nr - c1) AS b_sum
                      FROM ag)
            SELECT nr AS n_raters,
                   round(CASE WHEN nr < 2
                                   OR (nr - 1) * (CAST(h AS HUGEINT)
                                                  * h * nr * nr - b_sum)
                                      = 0 THEN 0.0
                              ELSE CAST(a_sum * h * nr
                                        - b_sum * (nr - 1) AS DOUBLE)
                                   / CAST((nr - 1)
                                          * (CAST(h AS HUGEINT)
                                             * h * nr * nr - b_sum)
                                          AS DOUBLE) END,
                         6) AS fleiss_kappa
            FROM ag2
        """,
        "kripp_alpha": _RATER_BITS_CTE + """
            , dg AS (SELECT CAST(sum(CAST(n1 AS HUGEINT) * (nr - n1))
                                 AS HUGEINT) AS disc
                     FROM u)
            SELECT round(CASE WHEN ag.nr < 2
                                   OR (ag.nr - 1)
                                      * CAST(ag.c1 AS HUGEINT)
                                      * (ag.h * ag.nr - ag.c1) = 0
                              THEN 0.0
                              ELSE 1.0 - CAST((CAST(ag.h AS HUGEINT)
                                               * ag.nr - 1) * dg.disc
                                              AS DOUBLE)
                                   / CAST((ag.nr - 1)
                                          * CAST(ag.c1 AS HUGEINT)
                                          * (ag.h * ag.nr - ag.c1)
                                          AS DOUBLE) END,
                         6) AS kripp_alpha
            FROM ag CROSS JOIN dg
        """,
        "weighted_kappa": _DENSE_GRID_CTE + """
            , b AS (SELECT event_type, hr,
                           CAST(ntile(5) OVER (PARTITION BY event_type
                                               ORDER BY c, hr)
                                AS BIGINT) AS q
                    FROM d),
            j AS (SELECT x.event_type AS ta, y.event_type AS tb,
                         x.q AS qa, y.q AS qb,
                         CAST(count(*) AS BIGINT) AS o
                  FROM b x JOIN b y ON y.hr = x.hr
                                   AND x.event_type < y.event_type
                  GROUP BY 1, 2, 3, 4),
            ra AS (SELECT ta, tb, qa, CAST(sum(o) AS BIGINT) AS r
                   FROM j GROUP BY 1, 2, 3),
            cb AS (SELECT ta, tb, qb, CAST(sum(o) AS BIGINT) AS cc
                   FROM j GROUP BY 1, 2, 3),
            obs AS (SELECT ta, tb,
                           CAST(sum(abs(qa - qb) * o) AS HUGEINT) AS ol,
                           CAST(sum((qa - qb) * (qa - qb) * o)
                                AS HUGEINT) AS oq
                    FROM j GROUP BY 1, 2),
            ex AS (SELECT r.ta, r.tb,
                          CAST(sum(abs(r.qa - c.qb)
                                   * CAST(r.r AS HUGEINT) * c.cc)
                               AS HUGEINT) AS el,
                          CAST(sum((r.qa - c.qb) * (r.qa - c.qb)
                                   * CAST(r.r AS HUGEINT) * c.cc)
                               AS HUGEINT) AS eq
                   FROM ra r JOIN cb c ON c.ta = r.ta AND c.tb = r.tb
                   GROUP BY 1, 2)
            SELECT obs.ta AS type_a, obs.tb AS type_b,
                   round(CASE WHEN ex.el = 0 THEN 0.0
                              ELSE 1.0 - CAST(hh.hh * obs.ol AS DOUBLE)
                                   / CAST(ex.el AS DOUBLE) END,
                         6) AS kappa_lin,
                   round(CASE WHEN ex.eq = 0 THEN 0.0
                              ELSE 1.0 - CAST(hh.hh * obs.oq AS DOUBLE)
                                   / CAST(ex.eq AS DOUBLE) END,
                         6) AS kappa_quad
            FROM obs JOIN ex ON ex.ta = obs.ta AND ex.tb = obs.tb
                     CROSS JOIN hh
            ORDER BY 1, 2
        """,
    }
)

# Round-3 wave 18 (pipelines/stats5.py): signal-complexity family over
# the dense hourly grid (Hjorth, SampEn, Katz FD, mean crossings).
from .stats5 import (  # noqa: E402
    q_hjorth_params,
    q_katz_fd,
    q_mean_crossings,
    q_sample_entropy,
)

QUERIES.update({
    "hjorth_params": q_hjorth_params,
    "sample_entropy": q_sample_entropy,
    "katz_fd": q_katz_fd,
    "mean_crossings": q_mean_crossings,
})

ORACLE_SQL.update(
    {
        "hjorth_params": _DENSE_GRID_CTE + """
            , dd AS (SELECT event_type, hr, c,
                            lead(c) OVER w - c AS dx,
                            lead(c, 2) OVER w - 2 * lead(c) OVER w
                              + c AS ddx
                     FROM d
                     WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
            ag AS (SELECT event_type,
                          CAST(sum(CAST(c AS HUGEINT) * c)
                               AS HUGEINT) AS s2,
                          CAST(sum(c) AS HUGEINT) AS s1,
                          CAST(sum(CASE WHEN dx IS NULL THEN 0
                                        ELSE CAST(dx AS HUGEINT) * dx
                                   END) AS HUGEINT) AS s2d1,
                          CAST(sum(COALESCE(dx, 0)) AS HUGEINT) AS s1d1,
                          CAST(sum(CASE WHEN ddx IS NULL THEN 0
                                        ELSE CAST(ddx AS HUGEINT) * ddx
                                   END) AS HUGEINT) AS s2d2,
                          CAST(sum(COALESCE(ddx, 0)) AS HUGEINT) AS s1d2
                   FROM dd GROUP BY 1),
            nu AS (SELECT event_type, hh.hh AS h,
                          hh.hh * s2 - s1 * s1 AS nu0,
                          (hh.hh - 1) * s2d1 - s1d1 * s1d1 AS nu1,
                          (hh.hh - 2) * s2d2 - s1d2 * s1d2 AS nu2
                   FROM ag CROSS JOIN hh)
            SELECT event_type,
                   round(CAST(nu0 AS DOUBLE)
                         / CAST(CAST(h AS HUGEINT) * h AS DOUBLE),
                         6) AS activity,
                   round(CASE WHEN nu0 = 0 THEN 0.0
                              ELSE sqrt(CAST(nu1 * h * h AS DOUBLE)
                                        / CAST(nu0 * (h - 1) * (h - 1)
                                               AS DOUBLE)) END,
                         6) AS mobility,
                   round(CASE WHEN nu0 = 0 OR nu1 = 0 THEN 0.0
                              ELSE sqrt(CAST(nu2 * (h - 1) * (h - 1)
                                             AS DOUBLE)
                                        / CAST(nu1 * (h - 2) * (h - 2)
                                               AS DOUBLE))
                                   / sqrt(CAST(nu1 * h * h AS DOUBLE)
                                          / CAST(nu0 * (h - 1) * (h - 1)
                                                 AS DOUBLE)) END,
                         6) AS complexity
            FROM nu ORDER BY 1
        """,
        "sample_entropy": _DENSE_GRID_CTE + """
            , dif AS (SELECT event_type,
                             abs(lead(c) OVER w - c) AS ad
                      FROM d
                      WINDOW w AS (PARTITION BY event_type
                                   ORDER BY hr)),
            rt AS (SELECT event_type,
                          CAST(quantile_disc(ad, 0.5) AS BIGINT) AS r
                   FROM dif WHERE ad IS NOT NULL GROUP BY 1),
            tpl AS (SELECT event_type, hr, c AS c0,
                           lead(c) OVER w AS c1,
                           lead(c, 2) OVER w AS c2
                    FROM d
                    WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
            t3 AS (SELECT * FROM tpl WHERE c2 IS NOT NULL),
            j AS (SELECT a.event_type,
                         CASE WHEN abs(a.c0 - b.c0) <= rt.r
                                   AND abs(a.c1 - b.c1) <= rt.r
                              THEN 1 ELSE 0 END AS mb,
                         CASE WHEN abs(a.c0 - b.c0) <= rt.r
                                   AND abs(a.c1 - b.c1) <= rt.r
                                   AND abs(a.c2 - b.c2) <= rt.r
                              THEN 1 ELSE 0 END AS ma
                  FROM t3 a
                  JOIN t3 b ON b.event_type = a.event_type
                           AND b.hr > a.hr
                  JOIN rt ON rt.event_type = a.event_type),
            ag AS (SELECT event_type, CAST(sum(mb) AS BIGINT) AS b,
                          CAST(sum(ma) AS BIGINT) AS a
                   FROM j GROUP BY 1)
            SELECT rt.event_type, rt.r AS r_tol, ag.b AS b_cnt,
                   ag.a AS a_cnt,
                   round(CASE WHEN ag.a = 0 OR ag.b = 0 THEN 0.0
                              ELSE (CAST(floor(1e6 * ln(CAST(ag.b
                                              AS DOUBLE))) AS BIGINT)
                                    - CAST(floor(1e6 * ln(CAST(ag.a
                                              AS DOUBLE))) AS BIGINT))
                                   / 1e6 END, 6) AS sampen
            FROM rt JOIN ag USING (event_type) ORDER BY 1
        """,
        "katz_fd": _DENSE_GRID_CTE + """
            , dd AS (SELECT event_type, c,
                            first_value(c) OVER w AS c0,
                            lead(c) OVER w - c AS dx
                     FROM d
                     WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
            ag AS (SELECT event_type,
                          CAST(sum(abs(COALESCE(dx, 0))) AS BIGINT)
                            AS l,
                          CAST(max(abs(c - c0)) AS BIGINT) AS ext
                   FROM dd GROUP BY 1),
            ln3 AS (SELECT ag.event_type, ag.l, ag.ext,
                           CAST(floor(1e6 * ln(CAST(hh.hh - 1
                                    AS DOUBLE))) AS BIGINT) AS ln_n,
                           CASE WHEN ag.ext = 0 THEN 0
                                ELSE CAST(floor(1e6 * ln(CAST(ag.ext
                                     AS DOUBLE))) AS BIGINT) END AS ln_d,
                           CASE WHEN ag.l = 0 THEN 0
                                ELSE CAST(floor(1e6 * ln(CAST(ag.l
                                     AS DOUBLE))) AS BIGINT) END AS ln_l
                    FROM ag CROSS JOIN hh WHERE hh.hh >= 2)
            SELECT event_type,
                   round(CASE WHEN l = 0 OR ext = 0
                                   OR ln_n + ln_d - ln_l = 0 THEN 0.0
                              ELSE CAST(ln_n AS DOUBLE)
                                   / CAST(ln_n + ln_d - ln_l
                                          AS DOUBLE) END,
                         6) AS katz_fd
            FROM ln3 ORDER BY 1
        """,
        "mean_crossings": _DENSE_GRID_CTE + """
            , st AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1
                     FROM d GROUP BY 1),
            sg AS (SELECT d.event_type, d.hr,
                          sign(hh.hh * d.c - st.s1) AS s
                   FROM d JOIN st USING (event_type) CROSS JOIN hh),
            pr AS (SELECT event_type, s,
                          lead(s) OVER (PARTITION BY event_type
                                        ORDER BY hr) AS s2
                   FROM sg),
            ag AS (SELECT event_type,
                          CAST(sum(CASE WHEN s * s2 < 0
                                        THEN 1 ELSE 0 END)
                               AS BIGINT) AS cr
                   FROM pr WHERE s2 IS NOT NULL GROUP BY 1)
            SELECT ag.event_type, ag.cr AS crossings,
                   round(CASE WHEN hh.hh < 2 THEN 0.0
                              ELSE CAST(ag.cr AS DOUBLE)
                                   / CAST(hh.hh - 1 AS DOUBLE) END,
                         6) AS rate
            FROM ag CROSS JOIN hh ORDER BY 1
        """,
    }
)

# Round-3 wave 19 (pipelines/stats5.py): robust scale estimators over
# the cent-value census.
from .stats5 import q_gini_mean_diff, q_qn_scale, q_robust_spread  # noqa: E402

QUERIES.update({
    "gini_mean_diff": q_gini_mean_diff,
    "robust_spread": q_robust_spread,
    "qn_scale": q_qn_scale,
})

ORACLE_SQL.update(
    {
        "gini_mean_diff": _CENT_CENSUS_CTE + """
            , cums AS (SELECT event_type, cv, n,
                              sum(n) OVER w - n AS walt,
                              sum(n * cv) OVER w - n * cv AS salt
                       FROM cs
                       WINDOW w AS (PARTITION BY event_type
                                    ORDER BY cv)),
            ag AS (SELECT event_type,
                          CAST(sum(CAST(n AS HUGEINT)
                                   * (cv * walt - salt))
                               AS HUGEINT) AS gaa
                   FROM cums GROUP BY 1),
            tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nn,
                           CAST(sum(n * cv) AS HUGEINT) AS s1
                    FROM cs GROUP BY 1)
            SELECT tot.event_type,
                   round(CASE WHEN nn < 2 THEN 0.0
                              ELSE CAST(2 * gaa AS DOUBLE)
                                   / CAST(CAST(nn AS HUGEINT)
                                          * (nn - 1) AS DOUBLE) END,
                         6) AS gmd_cents,
                   round(CASE WHEN nn < 2 OR s1 = 0 THEN 0.0
                              ELSE CAST(2 * gaa AS DOUBLE)
                                   / CAST((nn - 1) * s1 AS DOUBLE) END,
                         6) AS gmd_rel
            FROM tot JOIN ag USING (event_type) ORDER BY 1
        """,
        "robust_spread": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            m AS (SELECT event_type,
                         CAST(quantile_disc(cv, 0.5) AS BIGINT) AS med,
                         CAST(quantile_disc(cv, 0.25) AS BIGINT) AS q1,
                         CAST(quantile_disc(cv, 0.75) AS BIGINT) AS q3
                  FROM s GROUP BY 1),
            md AS (SELECT s.event_type,
                          CAST(quantile_disc(abs(s.cv - m.med), 0.5)
                               AS BIGINT) AS mad
                   FROM s JOIN m USING (event_type) GROUP BY 1)
            SELECT m.event_type, m.med AS med_cents, md.mad AS mad_cents,
                   m.q1 AS q1_cents, m.q3 AS q3_cents,
                   m.q3 - m.q1 AS iqr_cents,
                   round(CASE WHEN m.q3 + m.q1 = 0 THEN 0.0
                              ELSE CAST(m.q3 - m.q1 AS DOUBLE)
                                   / CAST(m.q3 + m.q1 AS DOUBLE) END,
                         6) AS qcd
            FROM m JOIN md USING (event_type) ORDER BY 1
        """,
        "qn_scale": _CENT_CENSUS_CTE + """
            , z AS (SELECT event_type,
                           CAST(sum(n * (n - 1) / 2) AS HUGEINT) AS w0
                    FROM cs GROUP BY 1),
            pj AS (SELECT a.event_type, b.cv - a.cv AS dif,
                          CAST(a.n AS HUGEINT) * b.n AS w
                   FROM cs a JOIN cs b ON b.event_type = a.event_type
                                      AND b.cv > a.cv),
            allw AS (SELECT event_type, dif,
                            CAST(sum(w) AS HUGEINT) AS w
                     FROM pj GROUP BY 1, 2
                     UNION ALL
                     SELECT event_type, 0 AS dif, w0 AS w
                     FROM z WHERE w0 > 0),
            cum AS (SELECT event_type, dif,
                           sum(w) OVER (PARTITION BY event_type
                                        ORDER BY dif) AS cw
                    FROM allw),
            nn AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n
                   FROM cs GROUP BY 1),
            kk AS (SELECT event_type, n,
                          CAST(n // 2 + 1 AS HUGEINT) * (n // 2) / 2
                            AS k
                   FROM nn),
            sel AS (SELECT c.event_type, min(c.dif) AS qn
                    FROM cum c JOIN kk ON kk.event_type = c.event_type
                                      AND c.cw >= kk.k
                    GROUP BY 1)
            SELECT kk.event_type, kk.n,
                   CASE WHEN kk.n < 2 THEN 0
                        ELSE COALESCE(sel.qn, 0) END AS qn_cents
            FROM kk LEFT JOIN sel USING (event_type) ORDER BY 1
        """,
    }
)

# Round-3 wave 20 (pipelines/stats5.py): vocabulary richness estimators
# over the freq-of-freq census.
from .stats5 import (  # noqa: E402
    q_brillouin_index,
    q_jackknife_richness,
    q_menhinick_dugast,
)

QUERIES.update({
    "jackknife_richness": q_jackknife_richness,
    "menhinick_dugast": q_menhinick_dugast,
    "brillouin_index": q_brillouin_index,
})

ORACLE_SQL.update(
    {
        "jackknife_richness": _FF_CTE + """
            SELECT v AS vocab,
                   round(CASE WHEN n < 2 THEN CAST(v AS DOUBLE)
                              ELSE CAST(v AS DOUBLE)
                                   + CAST(v1 * (n - 1) AS DOUBLE)
                                     / CAST(n AS DOUBLE) END,
                         6) AS jack1,
                   round(CASE WHEN n < 2 THEN CAST(v AS DOUBLE)
                              ELSE CAST(v AS DOUBLE)
                                   + CAST(v1 * (2 * n - 3) AS DOUBLE)
                                     / CAST(n AS DOUBLE)
                                   - CAST(v2 * (n - 2) * (n - 2)
                                          AS DOUBLE)
                                     / CAST(n * (n - 1) AS DOUBLE) END,
                         6) AS jack2
            FROM agg
        """,
        "menhinick_dugast": _FF_CTE + """
            , lns AS (SELECT n, v,
                             CAST(floor(1e6 * ln(CAST(n AS DOUBLE)))
                                  AS BIGINT) AS ln_n,
                             CAST(floor(1e6 * ln(CAST(greatest(v, 1)
                                      AS DOUBLE))) AS BIGINT) AS ln_v
                      FROM agg)
            SELECT v AS vocab,
                   round(CASE WHEN n = 0 THEN 0.0
                              ELSE CAST(v AS DOUBLE)
                                   / sqrt(CAST(n AS DOUBLE)) END,
                         6) AS menhinick,
                   round(CASE WHEN n < 2 OR v < 2 OR v = n
                                   OR ln_n = ln_v THEN 0.0
                              ELSE CAST(ln_n * ln_n AS DOUBLE)
                                   / CAST(1000000 * (ln_n - ln_v)
                                          AS DOUBLE) END,
                         6) AS dugast_uber
            FROM lns
        """,
        "brillouin_index": _FF_CTE + """
            , ls AS (SELECT i,
                            CAST(floor(1e6 * ln(CAST(i AS DOUBLE)))
                                 AS BIGINT) AS l
                     FROM (SELECT unnest(generate_series(2,
                                  (SELECT n FROM agg))) AS i)),
            lfc AS (SELECT i, CAST(sum(l) OVER (ORDER BY i)
                                   AS HUGEINT) AS lf
                    FROM ls),
            lfn AS (SELECT lf FROM lfc
                    WHERE i = (SELECT n FROM agg)),
            st AS (SELECT CAST(COALESCE(sum(lfc.lf), 0) AS HUGEINT) AS s
                   FROM cs JOIN lfc ON lfc.i = cs.m)
            SELECT agg.n AS n_tokens,
                   round(CASE WHEN agg.n < 2 THEN 0.0
                              ELSE CAST(lfn.lf - st.s AS DOUBLE)
                                   / CAST(1000000 *
                                          CAST(agg.n AS HUGEINT)
                                          AS DOUBLE) END,
                         6) AS brillouin
            FROM agg CROSS JOIN lfn CROSS JOIN st
        """,
    }
)

# Round-3 wave 21 (pipelines/stats5.py): bivariate dependence between
# aligned hourly type pairs (Hoeffding D, Blomqvist beta, dCor).
from .stats5 import q_blomqvist_beta, q_dcor, q_hoeffding_d  # noqa: E402

QUERIES.update({
    "hoeffding_d": q_hoeffding_d,
    "blomqvist_beta": q_blomqvist_beta,
    "dcor": q_dcor,
})

_PAIR_HOURS_CTE = _DENSE_GRID_CTE + """
            , p AS (SELECT a.event_type AS ta, b.event_type AS tb,
                           a.hr, a.c AS x, b.c AS y
                    FROM d a JOIN d b ON b.hr = a.hr
                                     AND a.event_type < b.event_type)
"""

ORACLE_SQL.update(
    {
        "hoeffding_d": _PAIR_HOURS_CTE + """
            , rk AS (SELECT ta, tb, hr,
                            2 * (rank() OVER (PARTITION BY ta, tb
                                              ORDER BY x) - 1)
                              + count(*) OVER (PARTITION BY ta, tb, x)
                              + 1 AS r2,
                            2 * (rank() OVER (PARTITION BY ta, tb
                                              ORDER BY y) - 1)
                              + count(*) OVER (PARTITION BY ta, tb, y)
                              + 1 AS s2
                     FROM p),
            qc AS (SELECT a.ta, a.tb, a.hr,
                          4 + CAST(sum(CASE
                                WHEN b.x < a.x AND b.y < a.y THEN 4
                                WHEN b.x = a.x AND b.y < a.y
                                     AND b.hr <> a.hr THEN 2
                                WHEN b.x < a.x AND b.y = a.y THEN 2
                                WHEN b.x = a.x AND b.y = a.y
                                     AND b.hr <> a.hr THEN 1
                                ELSE 0 END) AS BIGINT) AS q4
                   FROM p a JOIN p b ON b.ta = a.ta AND b.tb = a.tb
                   GROUP BY 1, 2, 3),
            ag AS (SELECT rk.ta, rk.tb,
                          CAST(sum(CAST(q.q4 - 4 AS HUGEINT)
                                   * (q.q4 - 8)) AS HUGEINT) AS a1,
                          CAST(sum(CAST(rk.r2 - 2 AS HUGEINT)
                                   * (rk.r2 - 4) * (rk.s2 - 2)
                                   * (rk.s2 - 4)) AS HUGEINT) AS a2,
                          CAST(sum(CAST(rk.r2 - 4 AS HUGEINT)
                                   * (rk.s2 - 4) * (q.q4 - 4))
                               AS HUGEINT) AS a3
                   FROM rk JOIN qc q ON q.ta = rk.ta AND q.tb = rk.tb
                                    AND q.hr = rk.hr
                   GROUP BY 1, 2)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN hh.hh < 5 THEN 0.0
                              ELSE CAST(30 * ((hh.hh - 2) * (hh.hh - 3)
                                              * a1 + a2
                                              - 2 * (hh.hh - 2) * a3)
                                        AS DOUBLE)
                                   / CAST(16 * CAST(hh.hh AS HUGEINT)
                                          * (hh.hh - 1) * (hh.hh - 2)
                                          * (hh.hh - 3) * (hh.hh - 4)
                                          AS DOUBLE) END,
                         6) AS hoeffding_d
            FROM ag CROSS JOIN hh ORDER BY 1, 2
        """,
        "blomqvist_beta": _PAIR_HOURS_CTE + """
            , md AS (SELECT event_type,
                            CAST(quantile_disc(c, 0.5) AS BIGINT) AS med
                     FROM d GROUP BY 1),
            ag AS (SELECT p.ta, p.tb,
                          CAST(sum(CASE WHEN (p.x > ma.med
                                              AND p.y > mb.med)
                                             OR (p.x < ma.med
                                                 AND p.y < mb.med)
                                        THEN 1 ELSE 0 END)
                               AS BIGINT) AS n1,
                          CAST(sum(CASE WHEN (p.x > ma.med
                                              AND p.y < mb.med)
                                             OR (p.x < ma.med
                                                 AND p.y > mb.med)
                                        THEN 1 ELSE 0 END)
                               AS BIGINT) AS n2
                   FROM p JOIN md ma ON ma.event_type = p.ta
                          JOIN md mb ON mb.event_type = p.tb
                   GROUP BY 1, 2)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN n1 + n2 = 0 THEN 0.0
                              ELSE CAST(n1 - n2 AS DOUBLE)
                                   / CAST(n1 + n2 AS DOUBLE) END,
                         6) AS blomqvist_beta
            FROM ag ORDER BY 1, 2
        """,
        "dcor": _PAIR_HOURS_CTE + """
            , per_i AS (SELECT a.ta, a.tb, a.hr,
                               CAST(sum(abs(a.x - b.x)) AS BIGINT)
                                 AS ra,
                               CAST(sum(abs(a.y - b.y)) AS BIGINT)
                                 AS rb,
                               CAST(sum(abs(a.x - b.x)
                                        * abs(a.y - b.y)) AS BIGINT)
                                 AS pab,
                               CAST(sum(abs(a.x - b.x)
                                        * abs(a.x - b.x)) AS BIGINT)
                                 AS paa,
                               CAST(sum(abs(a.y - b.y)
                                        * abs(a.y - b.y)) AS BIGINT)
                                 AS pbb
                        FROM p a JOIN p b ON b.ta = a.ta
                                         AND b.tb = a.tb
                        GROUP BY 1, 2, 3),
            ag AS (SELECT ta, tb,
                          CAST(sum(pab) AS HUGEINT) AS pp,
                          CAST(sum(paa) AS HUGEINT) AS px,
                          CAST(sum(pbb) AS HUGEINT) AS py,
                          CAST(sum(ra) AS HUGEINT) AS sa,
                          CAST(sum(rb) AS HUGEINT) AS sb,
                          CAST(sum(CAST(ra AS HUGEINT) * rb)
                               AS HUGEINT) AS qab,
                          CAST(sum(CAST(ra AS HUGEINT) * ra)
                               AS HUGEINT) AS qaa,
                          CAST(sum(CAST(rb AS HUGEINT) * rb)
                               AS HUGEINT) AS qbb
                   FROM per_i GROUP BY 1, 2),
            fin AS (SELECT ta, tb,
                           CAST(hh.hh AS HUGEINT) * hh.hh * pp
                             + sa * sb - 2 * hh.hh * qab AS nc,
                           CAST(hh.hh AS HUGEINT) * hh.hh * px
                             + sa * sa - 2 * hh.hh * qaa AS vx,
                           CAST(hh.hh AS HUGEINT) * hh.hh * py
                             + sb * sb - 2 * hh.hh * qbb AS vy
                    FROM ag CROSS JOIN hh)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN vx <= 0 OR vy <= 0 OR nc <= 0
                              THEN 0.0
                              ELSE sqrt(CAST(nc AS DOUBLE)
                                        / sqrt(CAST(vx AS DOUBLE)
                                               * CAST(vy AS DOUBLE)))
                         END, 6) AS dcor
            FROM fin ORDER BY 1, 2
        """,
    }
)

# Round-3 wave 22 (pipelines/stats5.py): homogeneity / records /
# long-memory extras over the dense hourly grid.
from .stats5 import q_foster_stuart, q_rs_hurst, q_snht  # noqa: E402

QUERIES.update({
    "snht": q_snht,
    "foster_stuart": q_foster_stuart,
    "rs_hurst": q_rs_hurst,
})

ORACLE_SQL.update(
    {
        "snht": _DENSE_GRID_CTE + """
            , base AS (SELECT event_type, hr, c,
                              row_number() OVER (PARTITION BY event_type
                                                 ORDER BY hr) AS k,
                              sum(c) OVER (PARTITION BY event_type
                                           ORDER BY hr) AS cum
                       FROM d),
            st AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1,
                          CAST(sum(c * c) AS BIGINT) AS s2
                   FROM d GROUP BY 1),
            dk AS (SELECT b.event_type, b.k,
                          CAST(hh.hh * b.cum - b.k * st.s1
                               AS HUGEINT) AS dv
                   FROM base b JOIN st USING (event_type)
                        CROSS JOIN hh
                   WHERE b.k < hh.hh),
            uk AS (SELECT dk.event_type, dk.k, dk.dv,
                          CAST(dv * dv AS DOUBLE)
                            / CAST(dk.k * (hh.hh - dk.k) AS DOUBLE)
                            AS u
                   FROM dk CROSS JOIN hh),
            best AS (SELECT event_type, k, dv,
                            row_number() OVER (PARTITION BY event_type
                                               ORDER BY u DESC, k ASC)
                                AS rn
                     FROM uk)
            SELECT b.event_type,
                   CAST(CASE WHEN hh.hh * st.s2 - st.s1 * st.s1 = 0
                             THEN 0 ELSE b.k END AS BIGINT) AS at_k,
                   round(CASE WHEN hh.hh * st.s2 - st.s1 * st.s1 = 0
                              THEN 0.0
                              ELSE CAST(b.dv * b.dv * hh.hh AS DOUBLE)
                                   / CAST(CAST(hh.hh * st.s2
                                               - st.s1 * st.s1
                                               AS HUGEINT)
                                          * b.k * (hh.hh - b.k)
                                          AS DOUBLE) END,
                         6) AS t_max
            FROM best b JOIN st USING (event_type) CROSS JOIN hh
            WHERE b.rn = 1 ORDER BY 1
        """,
        "foster_stuart": _DENSE_GRID_CTE + """
            , w AS (SELECT event_type, hr, c,
                           max(c) OVER (PARTITION BY event_type
                                        ORDER BY hr
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS pm,
                           min(c) OVER (PARTITION BY event_type
                                        ORDER BY hr
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS pn
                    FROM d),
            ag AS (SELECT event_type,
                          CAST(sum(CASE WHEN pm IS NOT NULL AND c > pm
                                        THEN 1 ELSE 0 END)
                               AS BIGINT) AS n_upper,
                          CAST(sum(CASE WHEN pn IS NOT NULL AND c < pn
                                        THEN 1 ELSE 0 END)
                               AS BIGINT) AS n_lower
                   FROM w GROUP BY 1)
            SELECT event_type, n_upper, n_lower,
                   n_upper - n_lower AS fs_d,
                   n_upper + n_lower AS fs_s
            FROM ag ORDER BY 1
        """,
        "rs_hurst": _DENSE_GRID_CTE + """
            , base AS (SELECT event_type, c,
                              row_number() OVER (PARTITION BY event_type
                                                 ORDER BY hr) - 1 AS t
                       FROM d),
            win AS (SELECT b.event_type, ws.w, b.t // ws.w AS j,
                           b.t % ws.w AS i, b.c
                    FROM base b
                    CROSS JOIN (VALUES (64), (256)) AS ws(w)
                    CROSS JOIN hh
                    WHERE b.t // ws.w < hh.hh // ws.w),
            ws1 AS (SELECT event_type, w, j,
                           CAST(sum(c) AS BIGINT) AS s1,
                           CAST(sum(c * c) AS BIGINT) AS s2
                    FROM win GROUP BY 1, 2, 3),
            pre AS (SELECT event_type, w, j, i,
                           sum(c) OVER (PARTITION BY event_type, w, j
                                        ORDER BY i) AS cum
                    FROM win),
            dev AS (SELECT p.event_type, p.w, p.j,
                           CAST(max(p.w * p.cum - (p.i + 1) * s.s1)
                                AS BIGINT) AS mx,
                           CAST(min(p.w * p.cum - (p.i + 1) * s.s1)
                                AS BIGINT) AS mn
                    FROM pre p JOIN ws1 s ON s.event_type = p.event_type
                                         AND s.w = p.w AND s.j = p.j
                    GROUP BY 1, 2, 3),
            d2 AS (SELECT dev.event_type, dev.w,
                          dev.mx - dev.mn AS rng,
                          CAST(dev.w AS HUGEINT) * s.s2
                            - CAST(s.s1 AS HUGEINT) * s.s1 AS nu
                   FROM dev JOIN ws1 s ON s.event_type = dev.event_type
                                      AND s.w = dev.w AND s.j = dev.j),
            rsw AS (SELECT event_type, w,
                           CASE WHEN nu > 0 AND rng > 0
                                THEN CAST(floor(1e6 *
                                     ((CAST(rng AS DOUBLE)
                                       / CAST(w AS DOUBLE))
                                      / sqrt(CAST(nu AS DOUBLE)
                                             / CAST(w * (w - 1)
                                                    AS DOUBLE))))
                                     AS BIGINT)
                                ELSE NULL END AS rsm
                    FROM d2),
            ag AS (SELECT event_type, w,
                          CAST(COALESCE(sum(rsm), 0) AS HUGEINT) AS s,
                          CAST(count(rsm) AS BIGINT) AS n
                   FROM rsw GROUP BY 1, 2),
            pv AS (SELECT a64.event_type, a64.s AS s64, a64.n AS n64,
                          a256.s AS s256, a256.n AS n256
                   FROM ag a64 JOIN ag a256
                     ON a256.event_type = a64.event_type
                    AND a64.w = 64 AND a256.w = 256)
            SELECT event_type,
                   round(CASE WHEN n64 = 0 THEN 0.0
                              ELSE CAST(s64 AS DOUBLE)
                                   / CAST(1000000 * n64 AS DOUBLE) END,
                         6) AS rs64,
                   round(CASE WHEN n256 = 0 THEN 0.0
                              ELSE CAST(s256 AS DOUBLE)
                                   / CAST(1000000 * n256 AS DOUBLE) END,
                         6) AS rs256,
                   round(CASE WHEN s64 <= 0 OR s256 <= 0 THEN 0.0
                              ELSE CAST(CAST(floor(1e6 *
                                        ln(CAST(s256 * n64 AS DOUBLE)))
                                        AS BIGINT)
                                        - CAST(floor(1e6 *
                                          ln(CAST(s64 * n256
                                                  AS DOUBLE)))
                                          AS BIGINT) AS DOUBLE)
                                   / CAST(1386294 AS DOUBLE) END,
                         6) AS hurst_rs
            FROM pv ORDER BY 1
        """,
    }
)

# Round-3 wave 23 (pipelines/stats5.py): two-sample score tests with
# exact permutation-moment standardization.
from .stats5 import (  # noqa: E402
    q_fligner_policello,
    q_mood_squared_ranks,
    q_savage_scores,
)

QUERIES.update({
    "mood_squared_ranks": q_mood_squared_ranks,
    "savage_scores": q_savage_scores,
    "fligner_policello": q_fligner_policello,
})

ORACLE_SQL.update(
    {
        "mood_squared_ranks": _PAIR_CUMS_CTE + """
            , sc AS (SELECT ta, tb, na, nb, an,
                            an + bn AS tv,
                            CAST(2 * wlt + (an + bn) + 1
                                 - (na + nb + 1) AS BIGINT) AS dev
                     FROM cums),
            ag AS (SELECT ta, tb, na, nb,
                          CAST(sum(CAST(an AS HUGEINT)
                                   * (dev * dev)) AS HUGEINT) AS t,
                          CAST(sum(CAST(tv AS HUGEINT)
                                   * (dev * dev)) AS HUGEINT) AS s1,
                          CAST(sum(CAST(tv AS HUGEINT)
                                   * (CAST(dev * dev AS HUGEINT)
                                      * (dev * dev))) AS HUGEINT) AS s2
                   FROM sc GROUP BY 1, 2, 3, 4)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN na + nb < 2
                                   OR CAST(na AS HUGEINT) * nb
                                      * ((na + nb) * s2 - s1 * s1)
                                      <= 0 THEN 0.0
                              ELSE CAST((na + nb) * t - na * s1
                                        AS DOUBLE)
                                   / sqrt(CAST(CAST(na AS HUGEINT) * nb
                                               * ((na + nb) * s2
                                                  - s1 * s1) AS DOUBLE)
                                          / CAST(na + nb - 1
                                                 AS DOUBLE)) END,
                         6) AS mood_z
            FROM ag ORDER BY 1, 2
        """,
        "savage_scores": _PAIR_CUMS_CTE + """
            , hsr AS (SELECT ta, tb,
                             unnest(generate_series(1, na + nb)) AS k
                      FROM pairs),
            hsc AS (SELECT h.ta, h.tb, h.k,
                           sum(100000000 // (p.na + p.nb - h.k + 1))
                               OVER (PARTITION BY h.ta, h.tb
                                     ORDER BY h.k) AS hs
                    FROM hsr h JOIN pairs p ON p.ta = h.ta
                                           AND p.tb = h.tb),
            blk AS (SELECT c.ta, c.tb, c.na, c.nb, c.an,
                           c.an + c.bn AS tv,
                           (COALESCE(hi.hs, 0) - COALESCE(lo.hs, 0))
                             // (c.an + c.bn) AS sv
                    FROM cums c
                    LEFT JOIN hsc hi ON hi.ta = c.ta AND hi.tb = c.tb
                                    AND hi.k = c.wlt + c.an + c.bn
                    LEFT JOIN hsc lo ON lo.ta = c.ta AND lo.tb = c.tb
                                    AND lo.k = c.wlt
                    WHERE c.an + c.bn > 0),
            ag AS (SELECT ta, tb, na, nb,
                          CAST(sum(CAST(an AS HUGEINT) * sv)
                               AS HUGEINT) AS t,
                          CAST(sum(CAST(tv AS HUGEINT) * sv)
                               AS HUGEINT) AS s1,
                          CAST(sum(CAST(tv AS HUGEINT) * sv * sv)
                               AS HUGEINT) AS s2
                   FROM blk GROUP BY 1, 2, 3, 4)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN na + nb < 2
                                   OR CAST(na AS HUGEINT) * nb
                                      * ((na + nb) * s2 - s1 * s1)
                                      <= 0 THEN 0.0
                              ELSE CAST((na + nb) * t - na * s1
                                        AS DOUBLE)
                                   / sqrt(CAST(CAST(na AS HUGEINT) * nb
                                               * ((na + nb) * s2
                                                  - s1 * s1) AS DOUBLE)
                                          / CAST(na + nb - 1
                                                 AS DOUBLE)) END,
                         6) AS savage_z
            FROM ag ORDER BY 1, 2
        """,
        "fligner_policello": _PAIR_CUMS_CTE + """
            , pq AS (SELECT ta, tb, na, nb, an, bn,
                            2 * ccb - bn AS p,
                            2 * cca - an AS q
                     FROM cums),
            ag AS (SELECT ta, tb, na, nb,
                          CAST(sum(CAST(an AS HUGEINT) * p)
                               AS HUGEINT) AS sp,
                          CAST(sum(CAST(bn AS HUGEINT) * q)
                               AS HUGEINT) AS sq,
                          CAST(sum(CAST(an AS HUGEINT) * p * p)
                               AS HUGEINT) AS spp,
                          CAST(sum(CAST(bn AS HUGEINT) * q * q)
                               AS HUGEINT) AS sqq
                   FROM pq GROUP BY 1, 2, 3, 4)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN na = 0 OR nb = 0
                                   OR nb * (na * spp - sp * sp)
                                      + na * (nb * sqq - sq * sq)
                                      + sp * sq <= 0 THEN 0.0
                              ELSE CAST(sp - sq AS DOUBLE)
                                   / (2.0 * sqrt(
                                        CAST(nb * (na * spp - sp * sp)
                                             + na * (nb * sqq
                                                     - sq * sq)
                                             + sp * sq AS DOUBLE)
                                        / CAST(na * nb AS DOUBLE)))
                         END, 6) AS fp_z
            FROM ag ORDER BY 1, 2
        """,
    }
)

# Round-3 wave 24 (pipelines/stats5.py): k-sample AD + contingency
# goodness-of-fit variants.
from .stats5 import (  # noqa: E402
    q_ad_ksample,
    q_freeman_tukey,
    q_neyman_chi2,
)

QUERIES.update({
    "ad_ksample": q_ad_ksample,
    "freeman_tukey": q_freeman_tukey,
    "neyman_chi2": q_neyman_chi2,
})

ORACLE_SQL.update(
    {
        "ad_ksample": _CENT_CENSUS_CTE + """
            , sup5 AS (SELECT t.event_type, v.cv,
                              COALESCE(cs.n, 0) AS f
                       FROM (SELECT DISTINCT event_type FROM cs) t
                       CROSS JOIN (SELECT DISTINCT cv FROM cs) v
                       LEFT JOIN cs ON cs.event_type = t.event_type
                                   AND cs.cv = v.cv),
            pl AS (SELECT cv, CAST(sum(n) AS BIGINT) AS l
                   FROM cs GROUP BY 1),
            pcm AS (SELECT cv, l,
                           CAST(2 * sum(l) OVER (ORDER BY cv) - l
                                AS BIGINT) AS db
                    FROM pl),
            tt AS (SELECT CAST(sum(n) AS BIGINT) AS n,
                          count(DISTINCT event_type) AS k
                   FROM cs),
            ti AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS ni
                   FROM cs GROUP BY 1),
            cm AS (SELECT s.event_type, s.cv,
                          CAST(2 * sum(s.f) OVER (PARTITION BY
                               s.event_type ORDER BY s.cv) - s.f
                               AS BIGINT) AS m2
                   FROM sup5 s),
            terms AS (SELECT (1000000000000
                              * CAST(p.l AS HUGEINT)
                              * (tt.n * cm.m2 - ti.ni * p.db)
                              * (tt.n * cm.m2 - ti.ni * p.db))
                             // (CAST(ti.ni AS HUGEINT) * tt.n
                                 * (CAST(p.db AS HUGEINT)
                                    * (2 * tt.n - p.db)
                                    - tt.n * p.l)) AS t
                      FROM cm
                      JOIN pcm p ON p.cv = cm.cv
                      JOIN ti ON ti.event_type = cm.event_type
                      CROSS JOIN tt
                      WHERE p.l > 0 AND ti.ni > 0
                        AND CAST(p.db AS HUGEINT) * (2 * tt.n - p.db)
                            - tt.n * p.l > 0),
            ag AS (SELECT CAST(sum(t) AS HUGEINT) AS s FROM terms)
            SELECT tt.k AS k_samples, tt.n AS n_pooled,
                   round(CASE WHEN tt.n < 2 THEN 0.0
                              ELSE CAST((tt.n - 1) * ag.s AS DOUBLE)
                                   / CAST(tt.n *
                                          CAST(1000000000000
                                               AS HUGEINT)
                                          AS DOUBLE) END,
                         6) AS a2_akn
            FROM tt CROSS JOIN ag
        """,
        "freeman_tukey": _TYPE_DOW_CTE + """
            , cells AS (SELECT rt.r, ct.cc, COALESCE(c.n, 0) AS cell
                        FROM rt CROSS JOIN ct
                        LEFT JOIN c ON c.et = rt.et AND c.dow = ct.dow),
            ag AS (SELECT CAST(sum(CAST(floor(1e6 * sqrt(
                               CAST(cell * r * cc * tt.n AS DOUBLE)))
                               AS BIGINT)) AS HUGEINT) AS s
                   FROM cells CROSS JOIN tt)
            SELECT tt.n,
                   round(CASE WHEN tt.n = 0 THEN 0.0
                              ELSE 8.0 * CAST(tt.n AS DOUBLE)
                                   - CAST(8 * ag.s AS DOUBLE)
                                     / CAST(1000000 *
                                            CAST(tt.n AS HUGEINT)
                                            AS DOUBLE) END,
                         6) AS freeman_tukey
            FROM ag CROSS JOIN tt
        """,
        "neyman_chi2": _TYPE_DOW_CTE + """
            , cells AS (SELECT rt.r, ct.cc, c.n AS cell
                        FROM rt CROSS JOIN ct
                        JOIN c ON c.et = rt.et AND c.dow = ct.dow
                        WHERE c.n > 0),
            ag AS (SELECT CAST(sum((1000000000000
                               * CAST(tt.n * cell - r * cc AS HUGEINT)
                               * (tt.n * cell - r * cc))
                               // (CAST(tt.n AS HUGEINT) * tt.n
                                   * cell)) AS HUGEINT) AS s
                   FROM cells CROSS JOIN tt)
            SELECT tt.n,
                   round(CASE WHEN tt.n = 0 THEN 0.0
                              ELSE CAST(ag.s AS DOUBLE) / 1e12 END,
                         6) AS neyman_chi2
            FROM ag CROSS JOIN tt
        """,
    }
)

# Round-3 wave 25 (pipelines/stats5.py): Lepage combined test + robust
# location estimators.
from .stats5 import (  # noqa: E402
    q_lepage,
    q_location_estimates,
    q_trimmed_means,
)

QUERIES.update({
    "lepage": q_lepage,
    "location_estimates": q_location_estimates,
    "trimmed_means": q_trimmed_means,
})

ORACLE_SQL.update(
    {
        "lepage": _PAIR_CUMS_CTE + """
            , sc AS (SELECT ta, tb, na, nb, an, an + bn AS tv,
                            CAST(2 * wlt + (an + bn) + 1
                                 AS BIGINT) AS d,
                            least(CAST(2 * wlt + (an + bn) + 1
                                       AS BIGINT),
                                  2 * (na + nb + 1)
                                  - (2 * wlt + (an + bn) + 1)) AS ab
                     FROM cums),
            ag AS (SELECT ta, tb, na, nb,
                          CAST(sum(CAST(an AS HUGEINT) * d)
                               AS HUGEINT) AS tw,
                          CAST(sum(CAST(tv AS HUGEINT) * d)
                               AS HUGEINT) AS s1w,
                          CAST(sum(CAST(tv AS HUGEINT) * d * d)
                               AS HUGEINT) AS s2w,
                          CAST(sum(CAST(an AS HUGEINT) * ab)
                               AS HUGEINT) AS tab,
                          CAST(sum(CAST(tv AS HUGEINT) * ab)
                               AS HUGEINT) AS s1ab,
                          CAST(sum(CAST(tv AS HUGEINT) * ab * ab)
                               AS HUGEINT) AS s2ab
                   FROM sc GROUP BY 1, 2, 3, 4),
            zz AS (SELECT ta, tb,
                          CASE WHEN na + nb < 2
                                    OR CAST(na AS HUGEINT) * nb
                                       * ((na + nb) * s2w - s1w * s1w)
                                       <= 0 THEN 0.0
                               ELSE CAST((na + nb) * tw - na * s1w
                                         AS DOUBLE)
                                    / sqrt(CAST(CAST(na AS HUGEINT)
                                                * nb * ((na + nb) * s2w
                                                        - s1w * s1w)
                                                AS DOUBLE)
                                           / CAST(na + nb - 1
                                                  AS DOUBLE)) END
                              AS zw,
                          CASE WHEN na + nb < 2
                                    OR CAST(na AS HUGEINT) * nb
                                       * ((na + nb) * s2ab
                                          - s1ab * s1ab)
                                       <= 0 THEN 0.0
                               ELSE CAST((na + nb) * tab - na * s1ab
                                         AS DOUBLE)
                                    / sqrt(CAST(CAST(na AS HUGEINT)
                                                * nb
                                                * ((na + nb) * s2ab
                                                   - s1ab * s1ab)
                                                AS DOUBLE)
                                           / CAST(na + nb - 1
                                                  AS DOUBLE)) END
                              AS zab
                   FROM ag)
            SELECT ta AS type_a, tb AS type_b,
                   round(zw * zw + zab * zab, 6) AS lepage_l
            FROM zz ORDER BY 1, 2
        """,
        "location_estimates": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            r AS (SELECT event_type, cv,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY cv) AS rn
                  FROM s),
            nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                   FROM s GROUP BY 1),
            px AS (SELECT r.event_type,
                          max(CASE WHEN rn = (n + 1) // 2
                                   THEN cv END) AS med,
                          max(CASE WHEN rn = (n + 3) // 4
                                   THEN cv END) AS q1,
                          max(CASE WHEN rn = (3 * n + 3) // 4
                                   THEN cv END) AS q3,
                          max(CASE WHEN rn = (n + 2) // 3
                                   THEN cv END) AS x33,
                          max(CASE WHEN rn = (2 * n + 2) // 3
                                   THEN cv END) AS x66
                   FROM r JOIN nn USING (event_type) GROUP BY 1)
            SELECT event_type,
                   round(CAST(q1 + 2 * med + q3 AS DOUBLE) / 4.0,
                         6) AS trimean,
                   round(CAST(3 * x33 + 4 * med + 3 * x66 AS DOUBLE)
                         / 10.0, 6) AS gastwirth,
                   round(CAST(q1 + q3 AS DOUBLE) / 2.0, 6) AS midhinge
            FROM px ORDER BY 1
        """,
        "trimmed_means": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            r AS (SELECT event_type, cv,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY cv) AS rn
                  FROM s),
            nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                   FROM s GROUP BY 1),
            tr AS (SELECT r.event_type,
                          CAST(sum(CASE WHEN rn > n // 10
                                             AND rn <= n - n // 10
                                        THEN cv ELSE 0 END)
                               AS HUGEINT) AS trim,
                          max(CASE WHEN rn = n // 10 + 1
                                   THEN cv END) AS xlo,
                          max(CASE WHEN rn = n - n // 10
                                   THEN cv END) AS xhi
                   FROM r JOIN nn USING (event_type) GROUP BY 1)
            SELECT tr.event_type,
                   round(CASE WHEN n - 2 * (n // 10) <= 0 THEN 0.0
                              ELSE CAST(trim AS DOUBLE)
                                   / CAST(n - 2 * (n // 10)
                                          AS DOUBLE) END,
                         6) AS trimmed_mean,
                   round(CASE WHEN n = 0 THEN 0.0
                              ELSE CAST(trim + (n // 10) * xlo
                                        + (n // 10) * xhi AS DOUBLE)
                                   / CAST(n AS DOUBLE) END,
                         6) AS winsor_mean
            FROM tr JOIN nn USING (event_type) ORDER BY 1
        """,
    }
)

# Round-3 wave 26 (pipelines/stats5.py): Benford digits, weekly
# harmonic, lagged cross-correlation.
from .stats5 import (  # noqa: E402
    _BENFORD_P,
    _FC168,
    _FS168,
    q_benford_first_digit,
    q_cross_corr_lags,
    q_weekly_harmonic,
)

QUERIES.update({
    "benford_first_digit": q_benford_first_digit,
    "weekly_harmonic": q_weekly_harmonic,
    "cross_corr_lags": q_cross_corr_lags,
})

_BENFORD_VALUES = ", ".join(
    f"({d + 1}, {p})" for d, p in enumerate(_BENFORD_P))
_W168_VALUES = ", ".join(
    f"({d}, {c}, {s})"
    for d, (c, s) in enumerate(zip(_FC168, _FS168)))

ORACLE_SQL.update(
    {
        "benford_first_digit": f"""
            WITH s AS (SELECT CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            dg AS (SELECT CAST(substr(CAST(cv AS VARCHAR), 1, 1)
                               AS BIGINT) AS d
                   FROM s WHERE cv > 0),
            oc AS (SELECT d, CAST(count(*) AS BIGINT) AS o
                   FROM dg GROUP BY 1),
            bp AS (SELECT * FROM (VALUES {_BENFORD_VALUES})
                   AS t(d, p)),
            tt AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM oc),
            terms AS (SELECT bp.d, COALESCE(oc.o, 0) AS o, bp.p,
                             1000000 * COALESCE(oc.o, 0)
                               - tt.n * bp.p AS diff
                      FROM bp LEFT JOIN oc ON oc.d = bp.d
                              CROSS JOIN tt),
            ag AS (SELECT CAST(sum((1000000000000
                               * CAST(diff AS HUGEINT) * diff)
                               // (1000000 * CAST(tt.n AS HUGEINT)
                                   * p)) AS HUGEINT) AS chi2_pico
                   FROM terms CROSS JOIN tt WHERE tt.n > 0),
            mx AS (SELECT d, abs(diff) AS dev,
                          row_number() OVER (ORDER BY abs(diff) DESC,
                                             d ASC) AS rn
                   FROM terms)
            SELECT tt.n,
                   round(CASE WHEN tt.n = 0 THEN 0.0
                              ELSE CAST(ag.chi2_pico AS DOUBLE)
                                   / CAST(1000000000000 AS DOUBLE)
                              END,
                         6) AS benford_chi2,
                   mx.d AS max_dev_digit,
                   round(CASE WHEN tt.n = 0 THEN 0.0
                              ELSE CAST(mx.dev AS DOUBLE)
                                   / CAST(1000000 *
                                          CAST(tt.n AS HUGEINT)
                                          AS DOUBLE) END,
                         6) AS max_dev
            FROM tt CROSS JOIN ag JOIN mx ON mx.rn = 1
        """,
        "weekly_harmonic": f"""
            WITH c AS (SELECT event_type,
                              (epoch_ms(ts) // 3600000) % 168 AS d,
                              CAST(count(*) AS BIGINT) AS t
                       FROM events GROUP BY 1, 2),
            w AS (SELECT * FROM (VALUES {_W168_VALUES})
                  AS t(d, fc, fs)),
            ag AS (SELECT c.event_type,
                          CAST(sum(c.t * w.fc) AS HUGEINT) AS a,
                          CAST(sum(c.t * w.fs) AS HUGEINT) AS b,
                          CAST(sum(c.t) AS BIGINT) AS n
                   FROM c JOIN w ON w.d = c.d GROUP BY 1)
            SELECT event_type, n,
                   round(CASE WHEN n = 0 THEN 0.0
                              ELSE sqrt(CAST(a * a + b * b AS DOUBLE))
                                   / CAST(1000000 *
                                          CAST(n AS HUGEINT)
                                          AS DOUBLE) END,
                         6) AS amp_ratio
            FROM ag ORDER BY 1
        """,
        "cross_corr_lags": _DENSE_GRID_CTE + """
            , lg AS (SELECT * FROM (VALUES (0), (1), (2), (3))
                     AS l(k)),
            j AS (SELECT a.event_type AS ta, b.event_type AS tb,
                         l.k, a.c AS x, b.c AS y
                  FROM d a JOIN lg l ON TRUE
                  JOIN d b ON b.hr = a.hr + l.k
                          AND a.event_type < b.event_type),
            ag AS (SELECT ta, tb, k,
                          CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(x) AS BIGINT) AS sx,
                          CAST(sum(y) AS BIGINT) AS sy,
                          CAST(sum(CAST(x AS HUGEINT) * x)
                               AS HUGEINT) AS sxx,
                          CAST(sum(CAST(y AS HUGEINT) * y)
                               AS HUGEINT) AS syy,
                          CAST(sum(CAST(x AS HUGEINT) * y)
                               AS HUGEINT) AS sxy
                   FROM j GROUP BY 1, 2, 3)
            SELECT ta AS type_a, tb AS type_b, k AS lag,
                   round(CASE WHEN n < 2
                                   OR n * sxx - CAST(sx AS HUGEINT)
                                      * sx <= 0
                                   OR n * syy - CAST(sy AS HUGEINT)
                                      * sy <= 0 THEN 0.0
                              ELSE CAST(n * sxy - CAST(sx AS HUGEINT)
                                        * sy AS DOUBLE)
                                   / sqrt(CAST(n * sxx
                                               - CAST(sx AS HUGEINT)
                                                 * sx AS DOUBLE)
                                          * CAST(n * syy
                                                 - CAST(sy AS HUGEINT)
                                                   * sy AS DOUBLE))
                         END, 6) AS ccf
            FROM ag ORDER BY 1, 2, 3
        """,
    }
)

# Round-3 wave 27 (pipelines/stats5.py): token-length profile,
# Page-Hinkley detector, activity concentration.
from .stats5 import (  # noqa: E402
    q_activity_gini,
    q_page_hinkley,
    q_word_length_stats,
)

QUERIES.update({
    "word_length_stats": q_word_length_stats,
    "page_hinkley": q_page_hinkley,
    "activity_gini": q_activity_gini,
})

ORACLE_SQL.update(
    {
        "word_length_stats": """
            WITH tok AS (SELECT length(t) AS l
                         FROM (SELECT unnest(regexp_extract_all(text,
                                      '[A-Za-z]+')) AS t
                               FROM documents)),
            cs AS (SELECT l, CAST(count(*) AS BIGINT) AS c
                   FROM tok GROUP BY 1),
            ag AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                          CAST(sum(l * c) AS BIGINT) AS s1,
                          CAST(sum(CAST(l AS HUGEINT) * l * c)
                               AS HUGEINT) AS s2,
                          CAST(sum(c * CAST(floor(1e6 *
                               ln(CAST(c AS DOUBLE))) AS BIGINT))
                               AS HUGEINT) AS s_ln
                   FROM cs)
            SELECT n AS n_tokens,
                   round(CASE WHEN n = 0 THEN 0.0
                              ELSE CAST(s1 AS DOUBLE)
                                   / CAST(n AS DOUBLE) END,
                         6) AS mean_len,
                   round(CASE WHEN n = 0 THEN 0.0
                              ELSE CAST(n * s2 - CAST(s1 AS HUGEINT)
                                        * s1 AS DOUBLE)
                                   / CAST(CAST(n AS HUGEINT) * n
                                          AS DOUBLE) END,
                         6) AS var_len,
                   round(CASE WHEN n < 2 THEN 0.0
                              ELSE CAST(n * CAST(floor(1e6 *
                                        ln(CAST(n AS DOUBLE)))
                                        AS BIGINT) - s_ln AS DOUBLE)
                                   / CAST(1000000 *
                                          CAST(n AS HUGEINT)
                                          AS DOUBLE) END,
                         6) AS len_entropy
            FROM ag
        """,
        "page_hinkley": _DENSE_GRID_CTE + """
            , st AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1
                     FROM d GROUP BY 1),
            hs AS (SELECT d.event_type,
                          row_number() OVER w AS k,
                          CAST(hh.hh * sum(d.c) OVER w2
                               - row_number() OVER w * st.s1
                               AS BIGINT) AS v
                   FROM d JOIN st USING (event_type) CROSS JOIN hh
                   WINDOW w AS (PARTITION BY d.event_type
                                ORDER BY d.hr),
                          w2 AS (PARTITION BY d.event_type
                                 ORDER BY d.hr)),
            gp AS (SELECT event_type, k,
                          v - least(0, COALESCE(min(v) OVER (
                                PARTITION BY event_type ORDER BY k
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0)) AS gap
                   FROM hs),
            best AS (SELECT event_type, k, gap,
                            row_number() OVER (PARTITION BY event_type
                                               ORDER BY gap DESC,
                                                        k ASC) AS rn
                     FROM gp)
            SELECT b.event_type,
                   round(CAST(b.gap AS DOUBLE)
                         / CAST(hh.hh AS DOUBLE), 6) AS ph_stat,
                   CAST(b.k AS BIGINT) AS at_k
            FROM best b CROSS JOIN hh WHERE b.rn = 1 ORDER BY 1
        """,
        "activity_gini": _DENSE_GRID_CTE + """
            , r AS (SELECT event_type, c,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY c) AS i
                    FROM d),
            ag AS (SELECT r.event_type,
                          CAST(sum((2 * r.i - hh.hh - 1) * r.c)
                               AS HUGEINT) AS gaa,
                          CAST(sum(r.c) AS BIGINT) AS s1
                   FROM r CROSS JOIN hh GROUP BY 1)
            SELECT ag.event_type,
                   round(CASE WHEN s1 = 0 THEN 0.0
                              ELSE CAST(gaa AS DOUBLE)
                                   / CAST(hh.hh *
                                          CAST(s1 AS HUGEINT)
                                          AS DOUBLE) END,
                         6) AS activity_gini
            FROM ag CROSS JOIN hh ORDER BY 1
        """,
    }
)

# Round-3 wave 28 (pipelines/stats5.py): mode stats, generalized ESD,
# Tukey quick test.
from .stats5 import (  # noqa: E402
    q_generalized_esd,
    q_mode_stats,
    q_tukey_quick,
)

QUERIES.update({
    "mode_stats": q_mode_stats,
    "generalized_esd": q_generalized_esd,
    "tukey_quick": q_tukey_quick,
})

ORACLE_SQL.update(
    {
        "mode_stats": _CENT_CENSUS_CTE + """
            , mx AS (SELECT event_type, cv, n,
                            row_number() OVER (PARTITION BY event_type
                                               ORDER BY n DESC, cv ASC)
                                AS rn
                     FROM cs),
            tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nn,
                           CAST(sum(n * cv) AS HUGEINT) AS s1,
                           CAST(sum(CAST(cv AS HUGEINT) * cv * n)
                                AS HUGEINT) AS s2
                    FROM cs GROUP BY 1),
            md AS (SELECT event_type,
                          CAST(quantile_disc(cv, 0.5) AS BIGINT) AS med
                   FROM s GROUP BY 1)
            SELECT mx.event_type, mx.cv AS mode_cents,
                   mx.n AS mode_count,
                   round(CASE WHEN tot.nn < 2
                                   OR tot.nn * tot.s2
                                      - tot.s1 * tot.s1 <= 0 THEN 0.0
                              ELSE 3.0 * CAST(tot.s1 - tot.nn * md.med
                                              AS DOUBLE)
                                   / (CAST(tot.nn AS DOUBLE)
                                      * sqrt(CAST(tot.nn * tot.s2
                                                  - tot.s1 * tot.s1
                                                  AS DOUBLE)
                                             / CAST(CAST(tot.nn
                                                    AS HUGEINT)
                                                    * (tot.nn - 1)
                                                    AS DOUBLE))) END,
                         6) AS pearson_skew2
            FROM mx JOIN tot USING (event_type)
                    JOIN md USING (event_type)
            WHERE mx.rn = 1 ORDER BY 1
        """,
        "generalized_esd": _CENT_CENSUS_CTE + """
            , s0 AS (SELECT event_type, cv, CAST(n AS BIGINT) AS n
                     FROM cs),
            t0 AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
                          CAST(sum(n * cv) AS HUGEINT) AS s1,
                          CAST(sum(CAST(cv AS HUGEINT) * cv * n)
                               AS HUGEINT) AS s2
                   FROM s0 GROUP BY 1),
            e1 AS (SELECT s.event_type, s.cv,
                          abs(t.n * s.cv - t.s1) AS dev,
                          row_number() OVER (PARTITION BY s.event_type
                                ORDER BY abs(t.n * s.cv - t.s1) DESC,
                                         s.cv ASC) AS rn
                   FROM s0 s JOIN t0 t USING (event_type)
                   WHERE s.n > 0),
            r1 AS (SELECT e.event_type, e.cv AS at_cv, e.dev,
                          t.n, t.s1, t.s2
                   FROM e1 e JOIN t0 t USING (event_type)
                   WHERE e.rn = 1),
            s1t AS (SELECT s.event_type, s.cv,
                           s.n - CASE WHEN s.cv = r.at_cv
                                      THEN 1 ELSE 0 END AS n
                    FROM s0 s JOIN r1 r USING (event_type)),
            t1 AS (SELECT event_type, n - 1 AS n, s1 - at_cv AS s1,
                          s2 - CAST(at_cv AS HUGEINT) * at_cv AS s2
                   FROM r1),
            e2 AS (SELECT s.event_type, s.cv,
                          abs(t.n * s.cv - t.s1) AS dev,
                          row_number() OVER (PARTITION BY s.event_type
                                ORDER BY abs(t.n * s.cv - t.s1) DESC,
                                         s.cv ASC) AS rn
                   FROM s1t s JOIN t1 t USING (event_type)
                   WHERE s.n > 0),
            r2 AS (SELECT e.event_type, e.cv AS at_cv, e.dev,
                          t.n, t.s1, t.s2
                   FROM e2 e JOIN t1 t USING (event_type)
                   WHERE e.rn = 1),
            s2t AS (SELECT s.event_type, s.cv,
                           s.n - CASE WHEN s.cv = r.at_cv
                                      THEN 1 ELSE 0 END AS n
                    FROM s1t s JOIN r2 r USING (event_type)),
            t2 AS (SELECT event_type, n - 1 AS n, s1 - at_cv AS s1,
                          s2 - CAST(at_cv AS HUGEINT) * at_cv AS s2
                   FROM r2),
            e3 AS (SELECT s.event_type, s.cv,
                          abs(t.n * s.cv - t.s1) AS dev,
                          row_number() OVER (PARTITION BY s.event_type
                                ORDER BY abs(t.n * s.cv - t.s1) DESC,
                                         s.cv ASC) AS rn
                   FROM s2t s JOIN t2 t USING (event_type)
                   WHERE s.n > 0),
            r3 AS (SELECT e.event_type, e.cv AS at_cv, e.dev,
                          t.n, t.s1, t.s2
                   FROM e3 e JOIN t2 t USING (event_type)
                   WHERE e.rn = 1),
            uni AS (SELECT event_type, 1 AS round, at_cv, dev, n, s1,
                           s2 FROM r1
                    UNION ALL
                    SELECT event_type, 2, at_cv, dev, n, s1, s2
                    FROM r2
                    UNION ALL
                    SELECT event_type, 3, at_cv, dev, n, s1, s2
                    FROM r3)
            SELECT event_type, CAST(round AS BIGINT) AS round,
                   CASE WHEN n < 3 OR n * s2 - s1 * s1 <= 0
                        THEN 0 ELSE at_cv END AS at_cv,
                   round(CASE WHEN n < 3 OR n * s2 - s1 * s1 <= 0
                              THEN 0.0
                              ELSE CAST(dev AS DOUBLE)
                                   * sqrt(CAST(n - 1 AS DOUBLE)
                                          / CAST(n * (n * s2 - s1 * s1)
                                                 AS DOUBLE)) END,
                         6) AS r_stat
            FROM uni ORDER BY 1, 2
        """,
        "tukey_quick": _CENT_CENSUS_CTE + """
            , ext AS (SELECT event_type, min(cv) AS mn, max(cv) AS mx
                      FROM cs GROUP BY 1),
            j1 AS (SELECT ea.event_type AS ta, eb.event_type AS tb,
                          ea.mn AS amn, ea.mx AS amx,
                          eb.mn AS bmn, eb.mx AS bmx
                   FROM ext ea JOIN ext eb
                     ON ea.event_type < eb.event_type),
            ag AS (SELECT j.ta, j.tb,
                          CAST(sum(CASE WHEN c.event_type = j.ta
                                             AND c.cv > j.bmx
                                        THEN c.n ELSE 0 END)
                               + sum(CASE WHEN c.event_type = j.tb
                                               AND c.cv < j.amn
                                          THEN c.n ELSE 0 END)
                               AS BIGINT) AS t_ab,
                          CAST(sum(CASE WHEN c.event_type = j.tb
                                             AND c.cv > j.amx
                                        THEN c.n ELSE 0 END)
                               + sum(CASE WHEN c.event_type = j.ta
                                               AND c.cv < j.bmn
                                          THEN c.n ELSE 0 END)
                               AS BIGINT) AS t_ba
                   FROM j1 j JOIN cs c
                     ON c.event_type = j.ta OR c.event_type = j.tb
                   GROUP BY 1, 2)
            SELECT ta AS type_a, tb AS type_b, t_ab, t_ba
            FROM ag ORDER BY 1, 2
        """,
    }
)

# Round-3 wave 29 (pipelines/stats5.py): proportion / dispersion /
# circular quick tests.
from .stats5 import (  # noqa: E402
    q_coef_variation,
    q_poisson_dispersion,
    q_rayleigh_test,
    q_two_prop_z,
)

QUERIES.update({
    "two_prop_z": q_two_prop_z,
    "poisson_dispersion": q_poisson_dispersion,
    "coef_variation": q_coef_variation,
    "rayleigh_test": q_rayleigh_test,
})

ORACLE_SQL.update(
    {
        "two_prop_z": """
            WITH f AS (SELECT CASE WHEN ((epoch_ms(ts) // 86400000) + 3)
                                        % 7 >= 5
                                   THEN 1 ELSE 0 END AS we,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS pu
                       FROM events),
            ag AS (SELECT CAST(sum(we * pu) AS BIGINT) AS x1,
                          CAST(sum(we) AS BIGINT) AS n1,
                          CAST(sum((1 - we) * pu) AS BIGINT) AS x2,
                          CAST(sum(1 - we) AS BIGINT) AS n2
                   FROM f)
            SELECT n1 AS n_weekend, n2 AS n_weekday,
                   round(CASE WHEN n1 = 0 OR n2 = 0
                                   OR CAST(x1 + x2 AS HUGEINT)
                                      * (n1 + n2 - x1 - x2)
                                      * n1 * n2 = 0 THEN 0.0
                              ELSE CAST(x1 * n2 - x2 * n1 AS DOUBLE)
                                   / sqrt(CAST(CAST(x1 + x2 AS HUGEINT)
                                               * (n1 + n2 - x1 - x2)
                                               * n1 * n2 AS DOUBLE)
                                          / CAST(n1 + n2 AS DOUBLE))
                         END, 6) AS prop_z
            FROM ag
        """,
        "poisson_dispersion": _DENSE_GRID_CTE + """
            , ag AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s1,
                            CAST(sum(CAST(c AS HUGEINT) * c)
                                 AS HUGEINT) AS s2
                     FROM d GROUP BY 1)
            SELECT ag.event_type,
                   round(CASE WHEN s1 = 0 THEN 0.0
                              ELSE CAST(hh.hh * s2
                                        - CAST(s1 AS HUGEINT) * s1
                                        AS DOUBLE)
                                   / CAST(s1 AS DOUBLE) END,
                         6) AS disp_chi2,
                   round(CASE WHEN s1 = 0 THEN 0.0
                              ELSE CAST(hh.hh * s2
                                        - CAST(s1 AS HUGEINT) * s1
                                        AS DOUBLE)
                                   / CAST(hh.hh *
                                          CAST(s1 AS HUGEINT)
                                          AS DOUBLE) END,
                         6) AS vmr
            FROM ag CROSS JOIN hh ORDER BY 1
        """,
        "coef_variation": _CENT_CENSUS_CTE + """
            , tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nn,
                             CAST(sum(n * cv) AS HUGEINT) AS s1,
                             CAST(sum(CAST(cv AS HUGEINT) * cv * n)
                                  AS HUGEINT) AS s2
                      FROM cs GROUP BY 1),
            qs AS (SELECT event_type,
                          CAST(quantile_disc(cv, 0.5) AS BIGINT)
                            AS med,
                          CAST(quantile_disc(cv, 0.25) AS BIGINT)
                            AS q1,
                          CAST(quantile_disc(cv, 0.75) AS BIGINT)
                            AS q3
                   FROM s GROUP BY 1)
            SELECT tot.event_type,
                   round(CASE WHEN tot.nn < 2 OR tot.s1 = 0
                                   OR tot.nn * tot.s2
                                      - tot.s1 * tot.s1 <= 0 THEN 0.0
                              ELSE CAST(tot.nn AS DOUBLE)
                                   * sqrt(CAST(tot.nn * tot.s2
                                               - tot.s1 * tot.s1
                                               AS DOUBLE)
                                          / CAST(CAST(tot.nn
                                                 AS HUGEINT)
                                                 * (tot.nn - 1)
                                                 AS DOUBLE))
                                   / CAST(tot.s1 AS DOUBLE) END,
                         6) AS cv,
                   round(CASE WHEN qs.med = 0 THEN 0.0
                              ELSE CAST(qs.q3 - qs.q1 AS DOUBLE)
                                   / CAST(qs.med AS DOUBLE) END,
                         6) AS cv_quartile
            FROM tot JOIN qs USING (event_type) ORDER BY 1
        """,
    }
)

ORACLE_SQL["rayleigh_test"] = f"""
            WITH c AS (SELECT event_type,
                              (epoch_ms(ts) // 3600000) % 24 AS d,
                              CAST(count(*) AS BIGINT) AS t
                       FROM events GROUP BY 1, 2),
            w AS (SELECT * FROM {_TRIG24_VALUES} AS t(d, fc, fs)),
            ag AS (SELECT c.event_type,
                          CAST(sum(c.t * w.fc) AS HUGEINT) AS a,
                          CAST(sum(c.t * w.fs) AS HUGEINT) AS b,
                          CAST(sum(c.t) AS BIGINT) AS n
                   FROM c JOIN w ON w.d = c.d GROUP BY 1)
            SELECT event_type,
                   round(CASE WHEN n = 0 THEN 0.0
                              ELSE CAST(a * a + b * b AS DOUBLE)
                                   / CAST(1000000000000 *
                                          CAST(n AS HUGEINT)
                                          AS DOUBLE) END,
                         6) AS rayleigh_z,
                   round(CASE WHEN n = 0 THEN 0.0
                              ELSE 1.0 - sqrt(CAST(a * a + b * b
                                                   AS DOUBLE))
                                   / CAST(1000000 *
                                          CAST(n AS HUGEINT)
                                          AS DOUBLE) END,
                         6) AS circ_var
            FROM ag ORDER BY 1
        """

# Round-3 wave 30 (pipelines/stats5.py): concentration / inequality
# analytics.
from .stats5 import (  # noqa: E402
    q_lorenz_points,
    q_topk_user_share,
    q_user_hhi,
)

QUERIES.update({
    "lorenz_points": q_lorenz_points,
    "user_hhi": q_user_hhi,
    "topk_user_share": q_topk_user_share,
})

ORACLE_SQL.update(
    {
        "lorenz_points": _CENT_CENSUS_CTE + """
            , r AS (SELECT event_type, cv,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY cv) AS rn
                    FROM (SELECT event_type, cv FROM s)),
            nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(cv) AS HUGEINT) AS s1
                   FROM s GROUP BY 1),
            ps AS (SELECT * FROM (VALUES (10), (20), (30), (40), (50),
                                         (60), (70), (80), (90))
                   AS t(p)),
            ag AS (SELECT r.event_type, ps.p,
                          CAST(sum(CASE WHEN r.rn <=
                                    (ps.p * nn.n + 99) // 100
                                        THEN r.cv ELSE 0 END)
                               AS HUGEINT) AS bot
                   FROM r JOIN nn USING (event_type) CROSS JOIN ps
                   GROUP BY 1, 2)
            SELECT ag.event_type, CAST(ag.p AS BIGINT) AS p_pct,
                   round(CASE WHEN nn.s1 = 0 THEN 0.0
                              ELSE CAST(ag.bot AS DOUBLE)
                                   / CAST(nn.s1 AS DOUBLE) END,
                         6) AS lorenz
            FROM ag JOIN nn USING (event_type) ORDER BY 1, 2
        """,
        "user_hhi": """
            WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            ag AS (SELECT CAST(sum(n) AS BIGINT) AS s1,
                          CAST(sum(CAST(n AS HUGEINT) * n)
                               AS HUGEINT) AS s2,
                          CAST(count(*) AS BIGINT) AS us
                   FROM u)
            SELECT us AS n_users,
                   round(CASE WHEN s1 = 0 THEN 0.0
                              ELSE CAST(s2 AS DOUBLE)
                                   / CAST(CAST(s1 AS HUGEINT) * s1
                                          AS DOUBLE) END,
                         6) AS hhi,
                   round(CASE WHEN s2 = 0 THEN 0.0
                              ELSE CAST(CAST(s1 AS HUGEINT) * s1
                                        AS DOUBLE)
                                   / CAST(s2 AS DOUBLE) END,
                         6) AS effective_users
            FROM ag
        """,
        "topk_user_share": """
            WITH u AS (SELECT CAST(user_id AS BIGINT) AS user_id,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            tk AS (SELECT n FROM u
                   ORDER BY n DESC, user_id ASC LIMIT 10),
            ag AS (SELECT (SELECT CAST(sum(n) AS BIGINT) FROM u)
                              AS n_events,
                          CAST(sum(n) AS BIGINT) AS topk_sum
                   FROM tk)
            SELECT n_events, topk_sum,
                   round(CASE WHEN n_events = 0 THEN 0.0
                              ELSE CAST(topk_sum AS DOUBLE)
                                   / CAST(n_events AS DOUBLE) END,
                         6) AS topk_share
            FROM ag
        """,
    }
)

# Round-3 wave 31 (pipelines/stats5.py): temporal user-behavior
# analytics (sessions, burstiness, memory coefficient).
from .stats5 import (  # noqa: E402
    q_interevent_burstiness,
    q_interevent_memory,
    q_session_stats,
)

QUERIES.update({
    "session_stats": q_session_stats,
    "interevent_burstiness": q_interevent_burstiness,
    "interevent_memory": q_interevent_memory,
})

_USER_GAPS_CTE = """
            WITH e AS (SELECT CAST(user_id AS BIGINT) AS u,
                              epoch_ms(ts) AS tms, event_id
                       FROM events),
            base AS (SELECT u, tms, event_id,
                            tms - lag(tms) OVER (PARTITION BY u
                                  ORDER BY tms, event_id) AS gap,
                            (tms - lag(tms) OVER (PARTITION BY u
                                  ORDER BY tms, event_id)) // 1000
                                AS gap_s
                     FROM e)
"""

ORACLE_SQL.update(
    {
        "session_stats": _USER_GAPS_CTE + """
            , ag AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
                            CAST(count(DISTINCT u) AS BIGINT)
                                AS n_users,
                            CAST(sum(CASE WHEN gap > 1800000
                                          THEN 1 ELSE 0 END)
                                 AS BIGINT) AS brk,
                            CAST(sum(CASE WHEN gap IS NOT NULL
                                               AND gap <= 1800000
                                          THEN gap ELSE 0 END)
                                 AS BIGINT) AS in_ms
                     FROM base)
            SELECT n_users + brk AS n_sessions,
                   round(CASE WHEN n_users + brk = 0 THEN 0.0
                              ELSE CAST(n_events AS DOUBLE)
                                   / CAST(n_users + brk AS DOUBLE)
                         END, 6) AS avg_events,
                   round(CASE WHEN n_users + brk = 0 THEN 0.0
                              ELSE CAST(in_ms AS DOUBLE)
                                   / CAST(1000 * (n_users + brk)
                                          AS DOUBLE) END,
                         6) AS avg_duration_s
            FROM ag
        """,
        "interevent_burstiness": _USER_GAPS_CTE + """
            , ag AS (SELECT CAST(count(gap_s) AS BIGINT) AS n,
                            CAST(sum(gap_s) AS BIGINT) AS s1,
                            CAST(sum(CAST(gap_s AS HUGEINT) * gap_s)
                                 AS HUGEINT) AS s2
                     FROM base WHERE gap_s IS NOT NULL)
            SELECT n AS n_gaps,
                   round(CASE WHEN n = 0
                                   OR (n * s2 - CAST(s1 AS HUGEINT)
                                       * s1 <= 0 AND s1 = 0)
                              THEN 0.0
                              ELSE (sqrt(CAST(n * s2
                                    - CAST(s1 AS HUGEINT) * s1
                                    AS DOUBLE)) - CAST(s1 AS DOUBLE))
                                   / (sqrt(CAST(n * s2
                                      - CAST(s1 AS HUGEINT) * s1
                                      AS DOUBLE))
                                      + CAST(s1 AS DOUBLE)) END,
                         6) AS burstiness
            FROM ag
        """,
        "interevent_memory": _USER_GAPS_CTE + """
            , pr AS (SELECT u, gap_s AS gx,
                            lead(gap_s) OVER (PARTITION BY u
                                  ORDER BY tms, event_id) AS gy
                     FROM base),
            ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(gx) AS BIGINT) AS sx,
                          CAST(sum(gy) AS BIGINT) AS sy,
                          CAST(sum(CAST(gx AS HUGEINT) * gx)
                               AS HUGEINT) AS sxx,
                          CAST(sum(CAST(gy AS HUGEINT) * gy)
                               AS HUGEINT) AS syy,
                          CAST(sum(CAST(gx AS HUGEINT) * gy)
                               AS HUGEINT) AS sxy
                   FROM pr WHERE gx IS NOT NULL AND gy IS NOT NULL)
            SELECT n AS n_pairs,
                   round(CASE WHEN n < 2
                                   OR n * sxx - CAST(sx AS HUGEINT)
                                      * sx <= 0
                                   OR n * syy - CAST(sy AS HUGEINT)
                                      * sy <= 0 THEN 0.0
                              ELSE CAST(n * sxy - CAST(sx AS HUGEINT)
                                        * sy AS DOUBLE)
                                   / sqrt(CAST(n * sxx
                                          - CAST(sx AS HUGEINT) * sx
                                          AS DOUBLE)
                                          * CAST(n * syy
                                            - CAST(sy AS HUGEINT) * sy
                                            AS DOUBLE)) END,
                         6) AS memory_coef
            FROM ag
        """,
    }
)

# Round-3 wave 32 (pipelines/stats5.py): gap / lifetime / per-user
# count distributions.
from .stats5 import (  # noqa: E402
    q_events_per_user,
    q_gap_quantiles,
    q_user_lifetimes,
)

QUERIES.update({
    "gap_quantiles": q_gap_quantiles,
    "user_lifetimes": q_user_lifetimes,
    "events_per_user": q_events_per_user,
})

ORACLE_SQL.update(
    {
        "gap_quantiles": _USER_GAPS_CTE + """
            , gs AS (SELECT gap_s FROM base WHERE gap_s IS NOT NULL)
            SELECT CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(COALESCE(quantile_disc(gap_s, 0.5), 0)
                        AS BIGINT) AS med_gap_s,
                   CAST(COALESCE(quantile_disc(gap_s, 0.9), 0)
                        AS BIGINT) AS p90_gap_s,
                   CAST(COALESCE(quantile_disc(gap_s, 0.99), 0)
                        AS BIGINT) AS p99_gap_s,
                   CAST(COALESCE(max(gap_s), 0) AS BIGINT) AS max_gap_s
            FROM gs
        """,
        "user_lifetimes": """
            WITH u AS (SELECT user_id,
                              (max(epoch_ms(ts)) - min(epoch_ms(ts)))
                                // 1000 AS span_s,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            ag AS (SELECT CAST(count(*) AS BIGINT) AS users,
                          CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                               AS BIGINT) AS single,
                          CAST(sum(span_s) AS BIGINT) AS span
                   FROM u)
            SELECT users AS n_users,
                   round(CASE WHEN users = 0 THEN 0.0
                              ELSE CAST(single AS DOUBLE)
                                   / CAST(users AS DOUBLE) END,
                         6) AS single_share,
                   round(CASE WHEN users = 0 THEN 0.0
                              ELSE CAST(span AS DOUBLE)
                                   / CAST(users AS DOUBLE) END,
                         6) AS avg_span_s
            FROM ag
        """,
        "events_per_user": """
            WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            ag AS (SELECT CAST(count(*) AS BIGINT) AS u,
                          CAST(sum(n) AS BIGINT) AS s1,
                          CAST(sum(CAST(n AS HUGEINT) * n)
                               AS HUGEINT) AS s2
                   FROM u)
            SELECT u AS n_users,
                   round(CASE WHEN u = 0 THEN 0.0
                              ELSE CAST(s1 AS DOUBLE)
                                   / CAST(u AS DOUBLE) END,
                         6) AS mean_events,
                   round(CASE WHEN u = 0 THEN 0.0
                              ELSE CAST(u * s2 - CAST(s1 AS HUGEINT)
                                        * s1 AS DOUBLE)
                                   / CAST(CAST(u AS HUGEINT) * u
                                          AS DOUBLE) END,
                         6) AS var_events,
                   round(CASE WHEN s1 = 0 THEN 0.0
                              ELSE CAST(u * s2 - CAST(s1 AS HUGEINT)
                                        * s1 AS DOUBLE)
                                   / CAST(u * CAST(s1 AS HUGEINT)
                                          AS DOUBLE) END,
                         6) AS vmr_events
            FROM ag
        """,
    }
)

# Round-3 wave 33 (pipelines/stats5.py): corpus composition analytics.
from .stats5 import (  # noqa: E402
    q_doc_tokens_by_lang,
    q_lang_entropy,
    q_source_concentration,
)

QUERIES.update({
    "doc_tokens_by_lang": q_doc_tokens_by_lang,
    "source_concentration": q_source_concentration,
    "lang_entropy": q_lang_entropy,
})

ORACLE_SQL.update(
    {
        "doc_tokens_by_lang": """
            WITH dt AS (SELECT lang,
                               CAST(length(regexp_extract_all(text,
                                    '[A-Za-z]+')) AS BIGINT) AS tok
                        FROM documents),
            ag AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                          CAST(sum(tok) AS BIGINT) AS s1,
                          CAST(quantile_disc(tok, 0.5) AS BIGINT)
                              AS med,
                          CAST(quantile_disc(tok, 0.9) AS BIGINT)
                              AS p90
                   FROM dt GROUP BY 1)
            SELECT lang, n_docs,
                   round(CASE WHEN n_docs = 0 THEN 0.0
                              ELSE CAST(s1 AS DOUBLE)
                                   / CAST(n_docs AS DOUBLE) END,
                         6) AS mean_tokens,
                   med AS med_tokens, p90 AS p90_tokens
            FROM ag ORDER BY 1
        """,
        "source_concentration": """
            WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                       FROM documents GROUP BY 1),
            tt AS (SELECT CAST(sum(n) AS BIGINT) AS n,
                          CAST(sum(CAST(n AS HUGEINT) * n)
                               AS HUGEINT) AS s2,
                          CAST(count(*) AS BIGINT) AS k
                   FROM c),
            top AS (SELECT source, n,
                           row_number() OVER (ORDER BY n DESC,
                                              source ASC) AS rn
                    FROM c)
            SELECT tt.k AS n_sources,
                   round(CASE WHEN tt.n = 0 THEN 0.0
                              ELSE CAST(tt.s2 AS DOUBLE)
                                   / CAST(CAST(tt.n AS HUGEINT) * tt.n
                                          AS DOUBLE) END,
                         6) AS hhi,
                   top.source AS top_source,
                   round(CASE WHEN tt.n = 0 THEN 0.0
                              ELSE CAST(top.n AS DOUBLE)
                                   / CAST(tt.n AS DOUBLE) END,
                         6) AS top_share
            FROM tt CROSS JOIN top WHERE top.rn = 1
        """,
        "lang_entropy": """
            WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
                       FROM documents GROUP BY 1),
            ag AS (SELECT CAST(sum(n) AS BIGINT) AS n,
                          CAST(count(*) AS BIGINT) AS k,
                          CAST(sum(n * CAST(floor(1e6 *
                               ln(CAST(n AS DOUBLE))) AS BIGINT))
                               AS HUGEINT) AS s_ln
                   FROM c)
            SELECT k AS n_langs,
                   round(CASE WHEN n < 2 THEN 0.0
                              ELSE CAST(n * CAST(floor(1e6 *
                                        ln(CAST(n AS DOUBLE)))
                                        AS BIGINT) - s_ln AS DOUBLE)
                                   / CAST(1000000 *
                                          CAST(n AS HUGEINT)
                                          AS DOUBLE) END,
                         6) AS lang_entropy
            FROM ag
        """,
    }
)

# Round-3 wave 34 (pipelines/stats5.py): threshold exceedances +
# calendar profiles.
from .stats5 import (  # noqa: E402
    q_mean_excess,
    q_peak_hour_share,
    q_weekend_lift,
)

QUERIES.update({
    "mean_excess": q_mean_excess,
    "peak_hour_share": q_peak_hour_share,
    "weekend_lift": q_weekend_lift,
})

ORACLE_SQL.update(
    {
        "mean_excess": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            th AS (SELECT event_type,
                          CAST(quantile_disc(cv, 0.95) AS BIGINT) AS u
                   FROM s GROUP BY 1),
            ag AS (SELECT s.event_type, th.u,
                          CAST(sum(CASE WHEN s.cv > th.u
                                        THEN 1 ELSE 0 END)
                               AS BIGINT) AS cnt,
                          CAST(sum(CASE WHEN s.cv > th.u
                                        THEN s.cv - th.u ELSE 0 END)
                               AS HUGEINT) AS tot
                   FROM s JOIN th USING (event_type) GROUP BY 1, 2)
            SELECT event_type, u AS threshold, cnt AS n_exceed,
                   round(CASE WHEN cnt = 0 THEN 0.0
                              ELSE CAST(tot AS DOUBLE)
                                   / CAST(cnt AS DOUBLE) END,
                         6) AS mean_excess
            FROM ag ORDER BY 1
        """,
        "peak_hour_share": """
            WITH c AS (SELECT event_type,
                              (epoch_ms(ts) // 3600000) % 24 AS d,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            tt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
                   FROM c GROUP BY 1),
            top AS (SELECT event_type, d, n,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY n DESC, d ASC)
                               AS rn
                    FROM c)
            SELECT top.event_type, CAST(top.d AS BIGINT) AS peak_hod,
                   round(CASE WHEN tt.tot = 0 THEN 0.0
                              ELSE CAST(top.n AS DOUBLE)
                                   / CAST(tt.tot AS DOUBLE) END,
                         6) AS peak_share
            FROM top JOIN tt USING (event_type)
            WHERE top.rn = 1 ORDER BY 1
        """,
        "weekend_lift": """
            WITH e AS (SELECT event_type,
                              epoch_ms(ts) // 3600000 AS hr
                       FROM events),
            bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM e),
            hours AS (SELECT unnest(generate_series(lo, hi)) AS hr
                      FROM bounds),
            hcal AS (SELECT CAST(sum(CASE WHEN ((hr // 24) + 3) % 7
                                               >= 5
                                          THEN 1 ELSE 0 END)
                                 AS BIGINT) AS we_h,
                            CAST(sum(CASE WHEN ((hr // 24) + 3) % 7
                                               >= 5
                                          THEN 0 ELSE 1 END)
                                 AS BIGINT) AS wd_h
                     FROM hours),
            ag AS (SELECT event_type,
                          CAST(sum(CASE WHEN ((hr // 24) + 3) % 7 >= 5
                                        THEN 1 ELSE 0 END)
                               AS BIGINT) AS a,
                          CAST(sum(CASE WHEN ((hr // 24) + 3) % 7 >= 5
                                        THEN 0 ELSE 1 END)
                               AS BIGINT) AS b
                   FROM e GROUP BY 1)
            SELECT ag.event_type,
                   round(CASE WHEN ag.b * hcal.we_h = 0 THEN 0.0
                              ELSE CAST(ag.a * hcal.wd_h AS DOUBLE)
                                   / CAST(ag.b * hcal.we_h AS DOUBLE)
                         END, 6) AS weekend_lift
            FROM ag CROSS JOIN hcal ORDER BY 1
        """,
    }
)

# Round-3 wave 35 (pipelines/stats5.py): OLS trend + Granger causality.
from .stats5 import q_granger_1lag, q_ols_trend  # noqa: E402

QUERIES.update({
    "ols_trend": q_ols_trend,
    "granger_1lag": q_granger_1lag,
})

ORACLE_SQL.update(
    {
        "ols_trend": _DENSE_GRID_CTE + """
            , base AS (SELECT event_type, c,
                              row_number() OVER (PARTITION BY
                                   event_type ORDER BY hr) - 1 AS t
                       FROM d),
            ag AS (SELECT event_type,
                          CAST(sum(c) AS HUGEINT) AS sy,
                          CAST(sum(CAST(c AS HUGEINT) * c)
                               AS HUGEINT) AS syy,
                          CAST(sum(CAST(t AS HUGEINT) * c)
                               AS HUGEINT) AS sty,
                          CAST(sum(t) AS HUGEINT) AS st,
                          CAST(sum(CAST(t AS HUGEINT) * t)
                               AS HUGEINT) AS stt
                   FROM base GROUP BY 1)
            SELECT ag.event_type,
                   round(CASE WHEN hh.hh * stt - st * st = 0 THEN 0.0
                              ELSE CAST(hh.hh * sty - st * sy
                                        AS DOUBLE)
                                   / CAST(hh.hh * stt - st * st
                                          AS DOUBLE) END,
                         6) AS slope_per_hour,
                   round(CASE WHEN hh.hh * stt - st * st = 0
                                   OR hh.hh * syy - sy * sy = 0
                              THEN 0.0
                              ELSE CAST((hh.hh * sty - st * sy)
                                        * (hh.hh * sty - st * sy)
                                        AS DOUBLE)
                                   / CAST((hh.hh * stt - st * st)
                                          * (hh.hh * syy - sy * sy)
                                          AS DOUBLE) END,
                         6) AS r2
            FROM ag CROSS JOIN hh ORDER BY 1
        """,
        "granger_1lag": _DENSE_GRID_CTE + """
            , j AS (SELECT ce.event_type AS cause,
                           ef.event_type AS effect,
                           efc.c AS y, ef.c AS x1, ce.c AS x2
                    FROM d ef
                    JOIN d efc ON efc.event_type = ef.event_type
                              AND efc.hr = ef.hr + 1
                    JOIN d ce ON ce.hr = ef.hr
                             AND ce.event_type <> ef.event_type),
            ag AS (SELECT cause, effect,
                          CAST(count(*) AS HUGEINT) AS n,
                          CAST(sum(y) AS HUGEINT) AS sy,
                          CAST(sum(x1) AS HUGEINT) AS s1,
                          CAST(sum(x2) AS HUGEINT) AS s2,
                          CAST(sum(CAST(y AS HUGEINT) * y)
                               AS HUGEINT) AS syy,
                          CAST(sum(CAST(x1 AS HUGEINT) * x1)
                               AS HUGEINT) AS s11,
                          CAST(sum(CAST(x2 AS HUGEINT) * x2)
                               AS HUGEINT) AS s22,
                          CAST(sum(CAST(x1 AS HUGEINT) * x2)
                               AS HUGEINT) AS s12,
                          CAST(sum(CAST(y AS HUGEINT) * x1)
                               AS HUGEINT) AS sy1,
                          CAST(sum(CAST(y AS HUGEINT) * x2)
                               AS HUGEINT) AS sy2
                   FROM j GROUP BY 1, 2),
            cf AS (SELECT cause, effect, n, sy, syy, s1, s11, sy1,
                          s11 * s22 - s12 * s12 AS c11,
                          -(s1 * s22 - s12 * s2) AS c12,
                          s1 * s12 - s11 * s2 AS c13,
                          n * s22 - s2 * s2 AS c22,
                          -(n * s12 - s1 * s2) AS c23,
                          n * s11 - s1 * s1 AS c33,
                          sy2
                   FROM ag),
            dt AS (SELECT cause, effect, n,
                          n * c11 + s1 * c12 + s2 * c13 AS d3u,
                          syy * (n * c11 + s1 * c12 + s2 * c13)
                            - (sy * sy * c11 + sy1 * sy1 * c22
                               + sy2 * sy2 * c33
                               + 2 * sy * sy1 * c12
                               + 2 * sy * sy2 * c13
                               + 2 * sy1 * sy2 * c23) AS d4u,
                          n * s11 - s1 * s1 AS d2r,
                          syy * (n * s11 - s1 * s1)
                            - (sy * sy * s11 - 2 * sy * sy1 * s1
                               + sy1 * sy1 * n) AS d3r
                   FROM (SELECT cf.*, ag.s2, ag.s12
                         FROM cf JOIN ag USING (cause, effect))),
            fin AS (SELECT cause, effect,
                           (d3r * d3u - d4u * d2r) * (n - 3) AS num,
                           d2r * d4u AS den
                    FROM dt)
            SELECT cause, effect,
                   round(CASE WHEN den <= 0 OR num < 0 THEN 0.0
                              ELSE CAST(num AS DOUBLE)
                                   / CAST(den AS DOUBLE) END,
                         6) AS f_stat
            FROM fin ORDER BY 1, 2
        """,
    }
)

# Round-3 wave 36 (pipelines/stats5.py): effect sizes, profile
# divergence, run lengths.
from .stats5 import (  # noqa: E402
    q_effect_sizes,
    q_kl_vs_pooled,
    q_longest_run,
)

QUERIES.update({
    "effect_sizes": q_effect_sizes,
    "kl_vs_pooled": q_kl_vs_pooled,
    "longest_run": q_longest_run,
})

ORACLE_SQL.update(
    {
        "effect_sizes": _CENT_CENSUS_CTE + """
            , tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nn,
                             CAST(sum(n * cv) AS HUGEINT) AS s1,
                             CAST(sum(CAST(cv AS HUGEINT) * cv * n)
                                  AS HUGEINT) AS s2
                      FROM cs GROUP BY 1),
            pr AS (SELECT a.event_type AS ta, b.event_type AS tb,
                          a.nn AS n1, b.nn AS n2,
                          a.s1 AS s1a, b.s1 AS s1b,
                          a.nn * a.s2 - a.s1 * a.s1 AS nua,
                          b.nn * b.s2 - b.s1 * b.s1 AS nub,
                          a.s1 * b.nn - b.s1 * a.nn AS md_num
                   FROM tot a JOIN tot b
                     ON a.event_type < b.event_type),
            fl AS (SELECT ta, tb, n1, n2, md_num, nua,
                          CAST(nua * n2 + nub * n1 AS DOUBLE)
                            / CAST(CAST(n1 AS HUGEINT) * n2
                                   * (n1 + n2 - 2) AS DOUBLE) AS pool
                   FROM pr WHERE n1 >= 2 AND n2 >= 2),
            dd AS (SELECT ta, tb, n1, n2, md_num, nua, pool,
                          CASE WHEN pool <= 0.0 THEN 0.0
                               ELSE CAST(md_num AS DOUBLE)
                                    / (CAST(CAST(n1 AS HUGEINT) * n2
                                            AS DOUBLE) * sqrt(pool))
                          END AS d
                   FROM fl)
            SELECT ta AS type_a, tb AS type_b,
                   round(d, 6) AS cohens_d,
                   round(d * (1.0 - 3.0 / CAST(4 * (n1 + n2) - 9
                                               AS DOUBLE)),
                         6) AS hedges_g,
                   round(CASE WHEN nua <= 0 THEN 0.0
                              ELSE CAST(md_num AS DOUBLE)
                                   / (CAST(CAST(n1 AS HUGEINT) * n2
                                           AS DOUBLE)
                                      * sqrt(CAST(nua AS DOUBLE)
                                             / CAST(CAST(n1 AS
                                                    HUGEINT)
                                                    * (n1 - 1)
                                                    AS DOUBLE)))
                         END, 6) AS glass_delta
            FROM dd ORDER BY 1, 2
        """,
        "kl_vs_pooled": """
            WITH c AS (SELECT event_type,
                              (epoch_ms(ts) // 3600000) % 24 AS d,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            p AS (SELECT d, CAST(sum(n) AS BIGINT) AS m
                  FROM c GROUP BY 1),
            mm AS (SELECT CAST(sum(n) AS BIGINT) AS big_m FROM c),
            tt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nt
                   FROM c GROUP BY 1),
            terms AS (SELECT c.event_type,
                             CAST(c.n AS HUGEINT)
                             * (CAST(floor(1e6 * ln(CAST(c.n * mm.big_m
                                      AS DOUBLE))) AS BIGINT)
                                - CAST(floor(1e6 * ln(CAST(tt.nt * p.m
                                       AS DOUBLE))) AS BIGINT)) AS t
                      FROM c JOIN p USING (d)
                             JOIN tt USING (event_type)
                             CROSS JOIN mm
                      WHERE c.n > 0),
            ag AS (SELECT event_type, CAST(sum(t) AS HUGEINT) AS acc
                   FROM terms GROUP BY 1)
            SELECT tt.event_type,
                   round(CASE WHEN tt.nt = 0 THEN 0.0
                              ELSE CAST(ag.acc AS DOUBLE)
                                   / CAST(1000000 *
                                          CAST(tt.nt AS HUGEINT)
                                          AS DOUBLE) END,
                         6) AS kl_bits_e
            FROM tt JOIN ag USING (event_type) ORDER BY 1
        """,
        "longest_run": _DENSE_GRID_CTE + """
            , md AS (SELECT event_type,
                            CAST(quantile_disc(c, 0.5) AS BIGINT)
                                AS med
                     FROM d GROUP BY 1),
            ab AS (SELECT d.event_type, d.hr,
                          CASE WHEN d.c > md.med THEN 1 ELSE 0 END
                              AS a
                   FROM d JOIN md USING (event_type)),
            isl AS (SELECT event_type, hr, a,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY hr)
                             - row_number() OVER (PARTITION BY
                                   event_type, a ORDER BY hr) AS grp
                    FROM ab),
            runs AS (SELECT event_type, grp,
                            CAST(count(*) AS BIGINT) AS len
                     FROM isl WHERE a = 1 GROUP BY 1, 2),
            mx AS (SELECT event_type, max(len) AS longest,
                          CAST(count(*) AS BIGINT) AS nr
                   FROM runs GROUP BY 1)
            SELECT md.event_type,
                   CAST(COALESCE(mx.longest, 0) AS BIGINT)
                       AS longest_run,
                   CAST(COALESCE(mx.nr, 0) AS BIGINT) AS n_runs
            FROM md LEFT JOIN mx USING (event_type) ORDER BY 1
        """,
    }
)

# Round-3 wave 37 (pipelines/stats5.py): pairwise overlap / homogeneity.
from .stats5 import (  # noqa: E402
    q_active_hours_jaccard,
    q_chi2_homogeneity,
    q_tv_overlap,
)

QUERIES.update({
    "tv_overlap": q_tv_overlap,
    "chi2_homogeneity": q_chi2_homogeneity,
    "active_hours_jaccard": q_active_hours_jaccard,
})

ORACLE_SQL.update(
    {
        "tv_overlap": _PAIR_CUMS_CTE + """
            , ag AS (SELECT ta, tb, na, nb,
                            CAST(sum(abs(nb * an - na * bn))
                                 AS HUGEINT) AS num
                     FROM cums GROUP BY 1, 2, 3, 4)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN na * nb = 0 THEN 0.0
                              ELSE CAST(num AS DOUBLE)
                                   / CAST(2 * CAST(na AS HUGEINT) * nb
                                          AS DOUBLE) END,
                         6) AS tv_dist,
                   round(CASE WHEN na * nb = 0 THEN 1.0
                              ELSE 1.0 - CAST(num AS DOUBLE)
                                   / CAST(2 * CAST(na AS HUGEINT) * nb
                                          AS DOUBLE) END,
                         6) AS overlap
            FROM ag ORDER BY 1, 2
        """,
        "chi2_homogeneity": _PAIR_CUMS_CTE + """
            , terms AS (SELECT ta, tb, na, nb,
                               (1000000000000
                                * CAST(nb * an - na * bn AS HUGEINT)
                                * (nb * an - na * bn))
                               // (CAST(na AS HUGEINT) * nb
                                   * (an + bn)) AS t
                        FROM cums WHERE an + bn > 0),
            ag AS (SELECT ta, tb, na, nb,
                          CAST(sum(t) AS HUGEINT) AS acc
                   FROM terms GROUP BY 1, 2, 3, 4)
            SELECT ta AS type_a, tb AS type_b,
                   round(CASE WHEN na = 0 OR nb = 0 THEN 0.0
                              ELSE CAST(acc AS DOUBLE) / 1e12 END,
                         6) AS chi2
            FROM ag ORDER BY 1, 2
        """,
        "active_hours_jaccard": _DENSE_GRID_CTE + """
            , j AS (SELECT a.event_type AS ta, b.event_type AS tb,
                           CAST(sum(CASE WHEN a.c > 0 AND b.c > 0
                                         THEN 1 ELSE 0 END)
                                AS BIGINT) AS inter,
                           CAST(sum(CASE WHEN a.c > 0 OR b.c > 0
                                         THEN 1 ELSE 0 END)
                                AS BIGINT) AS uni
                    FROM d a JOIN d b ON b.hr = a.hr
                                     AND a.event_type < b.event_type
                    GROUP BY 1, 2)
            SELECT ta AS type_a, tb AS type_b, inter AS n_both,
                   round(CASE WHEN uni = 0 THEN 0.0
                              ELSE CAST(inter AS DOUBLE)
                                   / CAST(uni AS DOUBLE) END,
                         6) AS jaccard
            FROM j ORDER BY 1, 2
        """,
    }
)

# Round-3 wave 38 (pipelines/stats5.py): classical ANOVA + shape
# diagnostics.
from .stats5 import (  # noqa: E402
    q_anova_f,
    q_dow_uniformity,
    q_quantile_skew,
)

QUERIES.update({
    "anova_f": q_anova_f,
    "dow_uniformity": q_dow_uniformity,
    "quantile_skew": q_quantile_skew,
})

ORACLE_SQL.update(
    {
        "anova_f": _CENT_CENSUS_CTE + """
            , g AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS ni,
                           CAST(sum(n * cv) AS HUGEINT) AS s1i,
                           CAST(sum(CAST(cv AS HUGEINT) * cv * n)
                                AS HUGEINT) AS s2i
                    FROM cs GROUP BY 1),
            ag AS (SELECT CAST(count(*) AS BIGINT) AS k,
                          CAST(sum(ni) AS BIGINT) AS n,
                          CAST(sum(s1i) AS HUGEINT) AS s1,
                          CAST(sum(s2i) AS HUGEINT) AS s2,
                          CAST(sum((1000000000000 * s1i * s1i) // ni)
                               AS HUGEINT) AS t_sum
                   FROM g WHERE ni > 0),
            ss AS (SELECT k, n,
                          t_sum - (1000000000000 * s1 * s1) // n
                              AS ssb,
                          1000000000000 * s2 - t_sum AS ssw
                   FROM ag)
            SELECT k AS k_groups,
                   round(CASE WHEN k < 2 OR n <= k OR ssw <= 0
                              THEN 0.0
                              ELSE CAST(ssb * (n - k) AS DOUBLE)
                                   / CAST(ssw * (k - 1) AS DOUBLE)
                         END, 6) AS anova_f,
                   round(CASE WHEN ssb + ssw <= 0 THEN 0.0
                              ELSE CAST(ssb AS DOUBLE)
                                   / CAST(ssb + ssw AS DOUBLE) END,
                         6) AS eta_sq
            FROM ss
        """,
        "dow_uniformity": """
            WITH c AS (SELECT event_type,
                              ((epoch_ms(ts) // 86400000) + 3) % 7
                                  AS dow,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            ag AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
                          CAST(sum(CAST(n AS HUGEINT) * n)
                               AS HUGEINT) AS s2
                   FROM c GROUP BY 1)
            SELECT event_type,
                   round(CASE WHEN n = 0 THEN 0.0
                              ELSE CAST(7 * s2 - CAST(n AS HUGEINT)
                                        * n AS DOUBLE)
                                   / CAST(n AS DOUBLE) END,
                         6) AS chi2_uniform
            FROM ag ORDER BY 1
        """,
        "quantile_skew": """
            WITH s AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            r AS (SELECT event_type, cv,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY cv) AS rn
                  FROM s),
            nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                   FROM s GROUP BY 1),
            px AS (SELECT r.event_type,
                          max(CASE WHEN rn = (n + 1) // 2
                                   THEN cv END) AS med,
                          max(CASE WHEN rn = (n + 3) // 4
                                   THEN cv END) AS q1,
                          max(CASE WHEN rn = (3 * n + 3) // 4
                                   THEN cv END) AS q3,
                          max(CASE WHEN rn = (n + 9) // 10
                                   THEN cv END) AS p10,
                          max(CASE WHEN rn = (9 * n + 9) // 10
                                   THEN cv END) AS p90
                   FROM r JOIN nn USING (event_type) GROUP BY 1)
            SELECT event_type,
                   round(CASE WHEN q3 = q1 THEN 0.0
                              ELSE CAST(q3 + q1 - 2 * med AS DOUBLE)
                                   / CAST(q3 - q1 AS DOUBLE) END,
                         6) AS bowley_skew,
                   round(CASE WHEN p90 = p10 THEN 0.0
                              ELSE CAST(p90 + p10 - 2 * med AS DOUBLE)
                                   / CAST(p90 - p10 AS DOUBLE) END,
                         6) AS kelly_skew
            FROM px ORDER BY 1
        """,
    }
)

# Round-3 wave 39 (pipelines/stats5.py): outlier censuses + uniform GOF.
from .stats5 import q_ks_uniform_value, q_outlier_counts  # noqa: E402

QUERIES.update({
    "outlier_counts": q_outlier_counts,
    "ks_uniform_value": q_ks_uniform_value,
})

ORACLE_SQL.update(
    {
        "outlier_counts": _CENT_CENSUS_CTE + """
            , r AS (SELECT event_type, cv,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY cv) AS rn
                    FROM s),
            nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                   FROM s GROUP BY 1),
            px AS (SELECT r.event_type,
                          max(CASE WHEN rn = (n + 1) // 2
                                   THEN cv END) AS med,
                          max(CASE WHEN rn = (n + 3) // 4
                                   THEN cv END) AS q1,
                          max(CASE WHEN rn = (3 * n + 3) // 4
                                   THEN cv END) AS q3
                   FROM r JOIN nn USING (event_type) GROUP BY 1),
            md AS (SELECT s.event_type,
                          CAST(quantile_disc(abs(s.cv - px.med), 0.5)
                               AS BIGINT) AS mad
                   FROM s JOIN px USING (event_type) GROUP BY 1),
            ag AS (SELECT s.event_type,
                          CAST(sum(CASE WHEN 2 * s.cv
                                             < 5 * px.q1 - 3 * px.q3
                                        THEN 1 ELSE 0 END)
                               AS BIGINT) AS iqr_low,
                          CAST(sum(CASE WHEN 2 * s.cv
                                             > 5 * px.q3 - 3 * px.q1
                                        THEN 1 ELSE 0 END)
                               AS BIGINT) AS iqr_high,
                          CAST(sum(CASE WHEN abs(s.cv - px.med)
                                             > 3 * md.mad
                                        THEN 1 ELSE 0 END)
                               AS BIGINT) AS robust_z_cnt
                   FROM s JOIN px USING (event_type)
                          JOIN md USING (event_type)
                   GROUP BY 1)
            SELECT event_type, iqr_low, iqr_high, robust_z_cnt
            FROM ag ORDER BY 1
        """,
        "ks_uniform_value": _CENT_CENSUS_CTE + """
            , ext AS (SELECT event_type, min(cv) AS lo, max(cv) AS hi,
                             CAST(sum(n) AS BIGINT) AS nn
                      FROM cs GROUP BY 1),
            cm AS (SELECT cs.event_type, cs.cv,
                          sum(cs.n) OVER (PARTITION BY cs.event_type
                                          ORDER BY cs.cv) AS cum
                   FROM cs),
            dev AS (SELECT cm.event_type, cm.cv,
                           abs(cm.cum * (e.hi - e.lo)
                               - e.nn * (cm.cv - e.lo)) AS dv
                    FROM cm JOIN ext e USING (event_type)
                    WHERE e.hi > e.lo),
            best AS (SELECT event_type, cv, dv,
                            row_number() OVER (PARTITION BY event_type
                                               ORDER BY dv DESC,
                                                        cv ASC) AS rn
                     FROM dev)
            SELECT e.event_type,
                   round(CASE WHEN e.hi = e.lo OR e.nn = 0 THEN 0.0
                              ELSE CAST(b.dv AS DOUBLE)
                                   / CAST(e.nn *
                                          CAST(e.hi - e.lo AS HUGEINT)
                                          AS DOUBLE) END,
                         6) AS d_stat,
                   CAST(CASE WHEN e.hi = e.lo THEN e.lo
                             ELSE b.cv END AS BIGINT) AS at_cv
            FROM ext e LEFT JOIN best b ON b.event_type = e.event_type
                                       AND b.rn = 1
            ORDER BY 1
        """,
    }
)

# Round-3 wave 40 (pipelines/stats5.py): value-mass concentration.
from .stats5 import q_half_value_point, q_user_gini  # noqa: E402

QUERIES.update({
    "half_value_point": q_half_value_point,
    "user_gini": q_user_gini,
})

ORACLE_SQL.update(
    {
        "half_value_point": _CENT_CENSUS_CTE + """
            , cm AS (SELECT event_type, cv,
                            sum(n * cv) OVER w AS mass,
                            sum(n) OVER w AS cnt
                     FROM cs
                     WINDOW w AS (PARTITION BY event_type
                                  ORDER BY cv)),
            tot AS (SELECT event_type,
                           CAST(sum(n * cv) AS HUGEINT) AS sv,
                           CAST(sum(n) AS BIGINT) AS n
                    FROM cs GROUP BY 1),
            hit AS (SELECT cm.event_type, cm.cv, cm.cnt,
                           row_number() OVER (PARTITION BY
                                cm.event_type ORDER BY cm.cv) AS rn
                    FROM cm JOIN tot USING (event_type)
                    WHERE 2 * cm.mass >= tot.sv)
            SELECT h.event_type, h.cv AS half_value_cv,
                   round(CASE WHEN t.n = 0 THEN 0.0
                              ELSE CAST(h.cnt AS DOUBLE)
                                   / CAST(t.n AS DOUBLE) END,
                         6) AS events_below
            FROM hit h JOIN tot t USING (event_type)
            WHERE h.rn = 1 ORDER BY 1
        """,
        "user_gini": """
            WITH uu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1),
            cc AS (SELECT c, CAST(count(*) AS BIGINT) AS u
                   FROM uu GROUP BY 1),
            cm AS (SELECT c, u,
                          sum(u) OVER w - u AS wlt,
                          sum(u * c) OVER w - u * c AS slt
                   FROM cc WINDOW w AS (ORDER BY c)),
            ag AS (SELECT CAST(sum(CAST(u AS HUGEINT)
                                   * (c * wlt - slt)) AS HUGEINT)
                              AS gaa,
                          CAST(sum(u) AS BIGINT) AS users,
                          CAST(sum(u * c) AS HUGEINT) AS s1
                   FROM cm)
            SELECT users AS n_users,
                   round(CASE WHEN users * s1 = 0 THEN 0.0
                              ELSE CAST(gaa AS DOUBLE)
                                   / CAST(users * s1 AS DOUBLE) END,
                         6) AS user_gini
            FROM ag
        """,
    }
)

# Round-3 wave 41 (pipelines/stats5.py): longitudinal product
# analytics.
from .stats5 import (  # noqa: E402
    q_returning_share,
    q_stickiness,
    q_value_trend,
)

QUERIES.update({
    "value_trend": q_value_trend,
    "returning_share": q_returning_share,
    "stickiness": q_stickiness,
})

ORACLE_SQL.update(
    {
        "value_trend": """
            WITH e AS (SELECT event_type,
                              epoch_ms(ts) // 86400000 AS day,
                              CAST(round(value * 100) AS BIGINT) AS cv
                       FROM events),
            ag AS (SELECT event_type,
                          CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(day) AS HUGEINT) AS sd,
                          CAST(sum(cv) AS HUGEINT) AS sv,
                          CAST(sum(CAST(day AS HUGEINT) * day)
                               AS HUGEINT) AS sdd,
                          CAST(sum(CAST(cv AS HUGEINT) * cv)
                               AS HUGEINT) AS svv,
                          CAST(sum(CAST(day AS HUGEINT) * cv)
                               AS HUGEINT) AS sdv
                   FROM e GROUP BY 1)
            SELECT event_type,
                   round(CASE WHEN n * sdd - sd * sd = 0 THEN 0.0
                              ELSE CAST(n * sdv - sd * sv AS DOUBLE)
                                   / CAST(n * sdd - sd * sd
                                          AS DOUBLE) END,
                         6) AS slope_cents_day,
                   round(CASE WHEN n * sdd - sd * sd = 0
                                   OR n * svv - sv * sv = 0 THEN 0.0
                              ELSE CAST((n * sdv - sd * sv)
                                        * (n * sdv - sd * sv)
                                        AS DOUBLE)
                                   / CAST((n * sdd - sd * sd)
                                          * (n * svv - sv * sv)
                                          AS DOUBLE) END,
                         6) AS r2
            FROM ag ORDER BY 1
        """,
        "returning_share": """
            WITH ud AS (SELECT user_id,
                               epoch_ms(ts) // 86400000 AS day,
                               CAST(count(*) AS BIGINT) AS n
                        FROM events GROUP BY 1, 2),
            fd AS (SELECT user_id, min(day) AS d0 FROM ud GROUP BY 1),
            ag AS (SELECT CAST(sum(ud.n) AS BIGINT) AS total,
                          CAST(sum(CASE WHEN ud.day = fd.d0
                                        THEN ud.n ELSE 0 END)
                               AS BIGINT) AS first
                   FROM ud JOIN fd USING (user_id))
            SELECT total AS n_events,
                   round(CASE WHEN total = 0 THEN 0.0
                              ELSE CAST(total - first AS DOUBLE)
                                   / CAST(total AS DOUBLE) END,
                         6) AS returning_share
            FROM ag
        """,
        "stickiness": """
            WITH ud AS (SELECT DISTINCT user_id,
                               epoch_ms(ts) // 86400000 AS day
                        FROM events),
            uw AS (SELECT DISTINCT user_id, day // 7 AS wk FROM ud),
            ag AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ud)
                              AS s_dau,
                          (SELECT CAST(count(*) AS BIGINT) FROM uw)
                              AS s_wau,
                          (SELECT CAST(count(DISTINCT day) AS BIGINT)
                           FROM ud) AS n_days,
                          (SELECT CAST(count(DISTINCT wk) AS BIGINT)
                           FROM uw) AS n_weeks)
            SELECT s_dau AS sum_dau, s_wau AS sum_wau,
                   round(CASE WHEN s_wau * n_days = 0 THEN 0.0
                              ELSE CAST(s_dau * n_weeks AS DOUBLE)
                                   / CAST(s_wau * n_days AS DOUBLE)
                         END, 6) AS stickiness
            FROM ag
        """,
    }
)
