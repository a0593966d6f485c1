"""Tests for the persisted inverted keyword index (read skip) and the
term-parity drift operator (sequential reference, multi-block)."""

from __future__ import annotations

import math
import os
import re
import shutil

import numpy as np
import pyarrow as pa
import pytest

DOCS = [
    (1, "alpha beta gamma delta"),
    (2, "beta beta gamma"),
    (3, "alpha zulu"),
    (4, "gamma delta epsilon"),
    (5, "zulu zulu alpha"),
    (6, ""),
    (7, "Alpha BETA"),  # case folding
    (8, "epsilon"),
]


def _docs_table():
    return pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "text": pa.array([d[1] for d in DOCS], pa.string()),
    })


def _expected_matches(terms):
    word_re = re.compile(r"[A-Za-z]+")
    out = {}
    for doc_id, text in DOCS:
        hits = {w.lower() for w in word_re.findall(text)} & set(terms)
        if hits:
            out[doc_id] = len(hits)
    return out


def test_text_index_search_and_read_skip(ray_session, tmp_path):
    import ray

    from prom_tsdb_copyer_ray.functions.hashing import poly_hash_column
    from prom_tsdb_copyer_ray.stages.textstats import (
        TEXT_INDEX_BUCKETS,
        build_text_index,
        text_index_search,
    )

    idx = str(tmp_path / "kwidx")
    build_text_index(ray.data.from_arrow(_docs_table()).repartition(3), idx)

    terms = ["alpha", "epsilon"]
    out = text_index_search(idx, terms).to_pandas()
    got = dict(zip(out["doc_id"], out["n_matched"]))
    assert got == _expected_matches(terms)

    # read skip: delete every bucket the query terms do NOT hash into;
    # the same search still returns identical results
    qb = set(
        (poly_hash_column(pa.array(terms, pa.string()), fold63=False)
         % np.uint64(TEXT_INDEX_BUCKETS)).astype(np.int64).tolist()
    )
    removed = 0
    postings = os.path.join(idx, "postings")
    for name in os.listdir(postings):
        b = int(name.split("=")[1])
        if b not in qb:
            shutil.rmtree(os.path.join(postings, name))
            removed += 1
    assert removed > 0  # the corpus vocabulary spans other buckets
    out2 = text_index_search(idx, terms).to_pandas()
    got2 = dict(zip(out2["doc_id"], out2["n_matched"]))
    assert got2 == got


def test_text_index_search_no_hits(ray_session, tmp_path):
    import ray

    from prom_tsdb_copyer_ray.stages.textstats import (
        build_text_index,
        text_index_search,
    )

    idx = str(tmp_path / "kwidx2")
    build_text_index(ray.data.from_arrow(_docs_table()), idx)
    out = text_index_search(idx, ["nosuchterm"]).to_pandas()
    assert len(out) == 0


def _drift_reference(ids, texts, min_df):
    word_re = re.compile(r"[A-Za-z]+")
    df = {}
    for doc_id, text in zip(ids, texts):
        for t in {w.lower() for w in word_re.findall(text or "")}:
            e, o = df.get(t, (0, 0))
            if doc_id % 2 == 0:
                df[t] = (e + 1, o)
            else:
                df[t] = (e, o + 1)
    out = {}
    for t, (e, o) in df.items():
        if e + o >= min_df:
            drift = math.floor(math.log(e + 1) * 1e6) - math.floor(
                math.log(o + 1) * 1e6
            )
            out[t] = (e, o, drift)
    return out


@pytest.mark.parametrize("blocks", [1, 5])
def test_term_parity_drift_vs_reference(ray_session, blocks):
    import ray

    from prom_tsdb_copyer_ray.stages.textstats import term_parity_drift

    rng = np.random.default_rng(3)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]
    # skew: 'aa' mostly in even docs, 'bb' mostly in odd docs
    ids = np.arange(400, dtype=np.int64)
    texts = []
    for i in ids:
        words = set(rng.choice(vocab[2:], rng.integers(0, 4)).tolist())
        if i % 2 == 0 and rng.random() < 0.8:
            words.add("aa")
        if i % 2 == 1 and rng.random() < 0.8:
            words.add("bb")
        texts.append(" ".join(sorted(words)))
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())})

    out = term_parity_drift(
        ray.data.from_arrow(t).repartition(blocks), min_df=10
    ).to_pandas()
    got = {
        r.term: (r.df_even, r.df_odd, r.drift_micro)
        for r in out.itertuples()
    }
    want = _drift_reference(ids.tolist(), texts, 10)
    assert got == want
    assert got["aa"][2] > 0 > got["bb"][2]  # the injected drift shows


def test_phrase_search_vs_reference(ray_session, tmp_path):
    import ray

    from prom_tsdb_copyer_ray.stages.textstats import (
        build_text_index,
        phrase_search,
    )

    docs = [
        (1, "sort merge sort merge join"),   # back-to-back: starts at 0, 2
        (2, "merge sort"),                    # reversed: no match
        (3, "sort x merge"),                  # gap: no match
        (4, "a sort merge b sort merge"),     # starts at 1, 4
        (5, ""),
    ]
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
    })
    idx = str(tmp_path / "pidx")
    build_text_index(ray.data.from_arrow(t).repartition(2), idx)
    out = phrase_search(idx, ["sort", "merge"]).to_pandas()
    got = dict(zip(out["doc_id"], out["n_matches"]))
    assert got == {1: 2, 4: 2}

    # 3-term phrase incl. a repeated term
    out3 = phrase_search(idx, ["sort", "merge", "sort"]).to_pandas()
    got3 = dict(zip(out3["doc_id"], out3["n_matches"]))
    assert got3 == {1: 1}  # only "sort merge sort" at position 0
