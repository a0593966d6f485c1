"""Corpus-curation operators (stages/curation.py) vs independent pure-Python
references: repetition stats, decontamination, stratified sampling, weighted
mixing, normalization, chunking, sequence packing.  Multi-block inputs
throughout — block structure must never change any result."""

from __future__ import annotations

import math
import re
import unicodedata
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from prom_tsdb_copyer_ray.stages.curation import (
    _flat_tokens,
    add_normalized_text,
    add_repetition_stats,
    chunk_docs,
    decontaminate,
    lehmer_rank,
    mix_sources,
    normalize_text_batch,
    pack_sequences,
    repetition_stats_batch,
    stratified_sample,
)

TOK_RE = re.compile(r"[ \t\r\n]+")


def ref_tokens(text: str) -> list[str]:
    t = text.strip(" \t\r\n")
    return TOK_RE.split(t) if t else []


DOCS = [
    (0, "a b c a b c a b", "en", "src0"),
    (1, "", "en", "src1"),
    (2, "   \t\n  ", "de", "src2"),
    (3, "x", "de", "src3"),
    (4, "the the the the the", "en", "src4"),
    (5, "one two three four five six seven", "fr", "src5"),
    (6, "one two three four nine ten", "fr", "src6"),
    (7, "a b c a b c a b", "zh", "src7"),  # exact dup of 0
    (8, "tab\tsep\ttokens  double  space", "en", "src8"),
    (9, "unique solitary words here only", "de", "src9"),
] + [(10 + i, f"filler w{i} w{i+1} w{i+2} pad pad", "en", f"src{i % 10}") for i in range(40)]


def docs_table():
    return pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "text": pa.array([d[1] for d in DOCS], pa.string()),
        "lang": pa.array([d[2] for d in DOCS], pa.string()),
        "source": pa.array([d[3] for d in DOCS], pa.string()),
    })


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data

    # many tiny blocks: every operator must be block-structure invariant
    return ray.data.from_arrow(docs_table()).repartition(7)


def test_flat_tokens_blank_rows():
    flat, row_idx, n = _flat_tokens(pa.array(["a  b", "", " \t ", "c"]))
    assert n == 4
    assert flat.to_pylist() == ["a", "b", "c"]
    assert row_idx.tolist() == [0, 0, 3]


def test_repetition_stats_matches_reference():
    batch = docs_table()
    out = repetition_stats_batch(batch)
    got = {r["doc_id"]: r for r in out.to_pylist()}
    for doc_id, text, _, _ in DOCS:
        toks = ref_tokens(text)
        grams = Counter(zip(toks, toks[1:]))
        r = got[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["n_distinct_tokens"] == len(set(toks))
        assert r["max_gram2_count"] == (max(grams.values()) if grams else 0)


def test_repetition_block_invariance(docs_ds):
    a = add_repetition_stats(docs_ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = pa.Table.from_pandas(
        repetition_stats_batch(docs_table()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ).to_pandas()
    assert a.equals(b)


def test_decontaminate_matches_reference(docs_ds):
    n = 3
    bench_mod = 5
    grams = {}
    for doc_id, text, _, _ in DOCS:
        toks = ref_tokens(text)
        grams[doc_id] = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    bench = set(g for d, gs in grams.items() if d % bench_mod == 0 for g in gs)
    want = {
        d: sum(1 for g in gs if g in bench)
        for d, gs in grams.items()
        if d % bench_mod != 0 and any(g in bench for g in gs)
    }
    out = decontaminate(docs_ds, bench_mod=bench_mod, n=n).to_pandas()
    got = dict(zip(out["doc_id"], out["n_hit_grams"]))
    assert got == want
    assert want  # the fixture must actually exercise hits


def test_stratified_sample_reference(docs_ds):
    out = stratified_sample(docs_ds, ["lang"], k=3).to_pandas()
    by_lang = {}
    for doc_id, _, lang, _ in DOCS:
        by_lang.setdefault(lang, []).append(doc_id)
    for lang, ids in by_lang.items():
        want = sorted(ids, key=lambda i: (int(lehmer_rank(np.array([i]))[0]), i))[:3]
        got = sorted(out[out["lang"] == lang]["doc_id"].tolist(),
                     key=lambda i: (int(lehmer_rank(np.array([i]))[0]), i))
        assert got == want, lang
    assert (out.groupby("lang").size() <= 3).all()


def test_mix_sources_reference(docs_ds):
    def w10(sources):
        nums = np.array([int(s[3:]) for s in sources.to_pylist()], np.int64)
        return np.where(nums % 2 == 0, 8, 3)

    out = mix_sources(docs_ds, w10).to_pandas()
    kept = set(out["doc_id"])
    for doc_id, _, _, src in DOCS:
        w = 8 if int(src[3:]) % 2 == 0 else 3
        expect = (doc_id * 48271) % 2147483647 * 10 < w * 2147483647
        assert (doc_id in kept) == expect


def test_normalize_text_unicode():
    # NFD 'e'+combining-acute must normalize to NFC 'é'; case + blanks collapse
    raw = ["Heĺlo\t WORLD", "  A  B ", "", "Ü̈"]
    out = normalize_text_batch(pa.table({
        "doc_id": pa.array(range(len(raw)), pa.int64()),
        "text": pa.array(raw, pa.string()),
    }))
    for r, got in zip(raw, out["norm_text"].to_pylist()):
        want = re.sub(r"[ \t\r\n]+", " ", unicodedata.normalize("NFC", r).lower()).strip(" ")
        assert got == want
    assert out["n_chars_norm"].to_pylist() == [
        len(s) for s in out["norm_text"].to_pylist()
    ]


def test_chunk_docs_roundtrip(docs_ds):
    size = 4
    out = chunk_docs(docs_ds, size).to_pandas()
    texts = {d[0]: d[1] for d in DOCS}
    for doc_id, text in texts.items():
        chunks = out[out["doc_id"] == doc_id].sort_values("chunk_idx")
        assert len(chunks) == math.ceil(len(text) / size)
        assert "".join(chunks["chunk_text"]) == text
        assert chunks["chunk_idx"].tolist() == list(range(len(chunks)))


def test_pack_sequences_reference(docs_ds):
    seq_len = 8
    out = pack_sequences(docs_ds, seq_len).to_pandas().sort_values("seq_id").reset_index(drop=True)
    want = {}
    acc = 0
    for doc_id, text, _, _ in sorted(DOCS):
        ntok = len(ref_tokens(text))
        sid = acc // seq_len
        nd, nt = want.get(sid, (0, 0))
        want[sid] = (nd + 1, nt + ntok)
        acc += ntok
    assert dict(zip(out["seq_id"], zip(out["n_docs"], out["n_tokens"]))) == want
    # every doc lands in exactly one sequence
    assert out["n_docs"].sum() == len(DOCS)
    assert out["n_tokens"].sum() == acc


def test_pack_sequences_block_invariance(ray_session):
    import ray.data

    t = docs_table()
    a = pack_sequences(ray.data.from_arrow(t).repartition(13), 8).to_pandas()
    b = pack_sequences(ray.data.from_arrow(t), 8).to_pandas()
    a = a.sort_values("seq_id").reset_index(drop=True)
    b = b.sort_values("seq_id").reset_index(drop=True)
    assert a.equals(b)


def test_duplicate_gram_stats_reference(docs_ds):
    from prom_tsdb_copyer_ray.stages.curation import duplicate_gram_stats

    out = (
        duplicate_gram_stats(docs_ds, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # independent reference: per-doc distinct 3-gram sets, df over docs
    gram_sets = {}
    for doc_id, text, _, _ in DOCS:
        tk = ref_tokens(text)
        gram_sets[doc_id] = {tuple(tk[i:i + 3]) for i in range(len(tk) - 2)}
    df = Counter(g for s in gram_sets.values() for g in s)
    want = {
        d: (len(s), sum(1 for g in s if df[g] > 1))
        for d, s in gram_sets.items() if s
    }
    got = dict(zip(out["doc_id"], zip(out["n_grams"], out["n_dup_grams"])))
    assert got == want
    # docs 0 and 7 are exact dups: every gram duplicated
    assert got[0] == (got[0][0], got[0][0])
    # short/blank docs (1, 2, 3) emit nothing
    assert {1, 2, 3}.isdisjoint(got)


def test_duplicate_gram_stats_block_invariance(ray_session):
    import ray.data

    from prom_tsdb_copyer_ray.stages.curation import duplicate_gram_stats

    t = docs_table()
    a = duplicate_gram_stats(ray.data.from_arrow(t).repartition(13), n=2).to_pandas()
    b = duplicate_gram_stats(ray.data.from_arrow(t), n=2).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_global_shuffle_order(ray_session):
    import ray.data

    from prom_tsdb_copyer_ray.stages.curation import global_shuffle_order, lehmer_rank

    ids = np.arange(1000, dtype=np.int64) * 7 + 3
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    out = (
        global_shuffle_order(ray.data.from_arrow(t).repartition(11))
        .to_pandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    assert len(out) == len(ids)
    # positions are a contiguous permutation
    assert out["pos"].tolist() == list(range(len(ids)))
    # pos order == rank order, ranks match the Lehmer formula
    assert (np.diff(out["rank"].to_numpy()) > 0).all()
    np.testing.assert_array_equal(
        np.sort(out["rank"].to_numpy()), np.sort(lehmer_rank(ids))
    )
    # deterministic across block structures
    again = (
        global_shuffle_order(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    assert out.equals(again)


def test_quantile_threshold_filter_reference(docs_ds):
    from prom_tsdb_copyer_ray.stages.curation import quantile_threshold_filter

    out = (
        quantile_threshold_filter(docs_ds, "lang", q=0.5)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    # independent reference: quantile_disc(0.5) per lang, then filter
    by_lang: dict[str, list[int]] = {}
    for _, text, lang, _ in DOCS:
        by_lang.setdefault(lang, []).append(len(ref_tokens(text)))
    want = {}
    for lang, toks in by_lang.items():
        s = sorted(toks)
        thr = s[math.ceil(0.5 * len(s)) - 1]
        kept = [t for t in toks if t >= thr]
        want[lang] = (thr, len(kept), sum(kept))
    got = {
        r["lang"]: (r["p50"], r["n_kept"], r["sum_tokens_kept"])
        for _, r in out.iterrows()
    }
    assert got == want


def test_time_weighted_avg_locf(ray_session):
    """TWA per aligned window: held durations to next sample / window end,
    duplicate timestamps, singleton windows, block-layout invariance."""
    import ray.data

    from prom_tsdb_copyer_ray.stages.windowed import time_weighted_avg

    W = 100
    t = pa.table({
        "k": ["a"] * 5 + ["b"],
        "tms": pa.array([0, 40, 40, 90, 130, 250], pa.int64()),
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50, 7], pa.int64()),
    })
    # key a, window 0: durs 40,(40->40)=0,(40->90)=50,(90->100)=10
    #   twa = (10*40 + 20*0 + 30*50 + 40*10)/100 = 23.0
    # key a, window 100: single sample held 130->200: twa = 50
    # key b, window 200: twa = 7
    for nparts in (1, 3):
        out = (
            time_weighted_avg(
                ray.data.from_arrow(t).repartition(nparts),
                ["k"], "tms", ["id"], "v", W,
            ).to_pandas().sort_values(["k", "window_start"]).reset_index(drop=True)
        )
        assert out[["k", "window_start", "n_samples"]].values.tolist() == [
            ["a", 0, 4], ["a", 100, 1], ["b", 200, 1],
        ]
        np.testing.assert_allclose(out["twa"].values, [23.0, 50.0, 7.0])


def test_profile_columns(ray_session):
    """Null/non-null/exact-distinct per column vs pandas; cross-batch
    duplicate values must not inflate the distinct count."""
    import ray.data

    from prom_tsdb_copyer_ray.stages.curation import profile_columns

    t = pa.table({
        "a": pa.array([1, 1, 2, None, 3, 3, 3, None], pa.int64()),
        "b": pa.array(["x", "x", "x", "x", None, "y", "y", "z"]),
    })
    for nparts in (1, 4):  # 4 -> the same value appears in several blocks
        out = (
            profile_columns(ray.data.from_arrow(t).repartition(nparts),
                            ["a", "b"])
            .to_pandas().set_index("column")
        )
        assert out.loc["a"].tolist() == [6, 2, 3]
        assert out.loc["b"].tolist() == [7, 1, 3]


def test_dup_span_stats(ray_session):
    """Spans shared across docs are counted for every holder; intra-doc
    repeats alone don't count; short docs emit nothing; multi-block."""
    import ray.data

    from prom_tsdb_copyer_ray.stages.curation import dup_span_stats

    shared = "X" * 40  # one full shared window at offset 0
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            shared + "a" * 8,          # windows at 0,8: [X*40], [X*32+a*8]
            shared,                    # window at 0: [X*40] -> shared with 1
            "y" * 48,                  # two windows, unique to doc 3...
            "short",                   # < 40 chars -> no windows
        ]),
    })
    out = (
        dup_span_stats(ray.data.from_arrow(t).repartition(3))
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert 4 not in out.index
    assert out.loc[1, "n_windows"] == 2 and out.loc[1, "n_dup"] == 1
    assert out.loc[2, "n_windows"] == 1 and out.loc[2, "n_dup"] == 1
    # doc 3: 'y'*48 windows at 0 and 8 are BOTH 'y'*40 — identical string,
    # but only one distinct doc holds it -> not a cross-doc dup
    assert out.loc[3, "n_windows"] == 2 and out.loc[3, "n_dup"] == 0
