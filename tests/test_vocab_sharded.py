"""Round-3 scale hardening: the TF-IDF / unigram / bigram LM vocabulary
must never exceed the driver broadcast cap — beyond it the idf/count
model attaches shuffle-side (`_co_lookup` co-partitioned join) and the
driver holds ZERO vocabulary rows.  These tests force the sharded path
with a tiny cap on a high-cardinality fixture and prove (a) value parity
with the broadcast path and (b) the driver-held row bound."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


CAP = 100  # forced broadcast cap: far below the fixture's vocabulary


def _letters(i: int) -> str:
    """Letter-only encoding (the [a-z]+ tokenizer keeps it whole)."""
    s = ""
    while True:
        s += chr(ord("a") + i % 26)
        i //= 26
        if i == 0:
            return s


def _mk_docs(tmp_path, n=240, uniq_per_doc=25, seed=11):
    """High-cardinality corpus: ~n*uniq/2 distinct terms (>> CAP), plus
    shared stopwords so idf varies and docs overlap."""
    rng = np.random.default_rng(seed)
    common = ["the", "and", "data", "ray", "rollup"]
    texts = []
    for i in range(n):
        ws = ["t" + _letters(i) + "x" + _letters(j)
              for j in range(int(rng.integers(
                  uniq_per_doc // 2, uniq_per_doc)))]
        ws += list(rng.choice(common, 4))
        # a few cross-doc shared rare terms
        ws.append("shared" + _letters(i % 7))
        rng.shuffle(ws)
        texts.append(" ".join(ws))
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    path = os.path.join(str(tmp_path), "documents.parquet")
    pq.write_table(t, path)
    return path


def _read(path):
    import ray.data

    return ray.data.read_parquet(path)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


def test_tfidf_topk_sharded_matches_broadcast(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.stages import textstats

    path = _mk_docs(tmp_path)
    bc = textstats.tfidf_topk(_read(path), k=3).to_pandas()
    assert textstats.LAST_RUN_INFO["path"] == "broadcast"
    n_vocab = textstats.LAST_RUN_INFO["driver_vocab_rows"]
    assert n_vocab > CAP  # the fixture really is high-cardinality

    sh = textstats.tfidf_topk(
        _read(path), k=3, max_broadcast_terms=CAP).to_pandas()
    assert textstats.LAST_RUN_INFO["path"] == "sharded"
    assert textstats.LAST_RUN_INFO["driver_vocab_rows"] <= CAP
    assert textstats.LAST_RUN_INFO["driver_vocab_rows"] == 0

    a, b = _sorted(bc), _sorted(sh)
    pd.testing.assert_frame_equal(a, b)  # integer scores: exact


def test_unigram_logprob_sharded_matches_broadcast(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.stages import textstats

    path = _mk_docs(tmp_path, seed=12)
    bc = textstats.unigram_logprob(_read(path)).to_pandas()
    assert textstats.LAST_RUN_INFO["path"] == "broadcast"
    assert textstats.LAST_RUN_INFO["driver_vocab_rows"] > CAP

    sh = textstats.unigram_logprob(
        _read(path), max_broadcast_terms=CAP).to_pandas()
    assert textstats.LAST_RUN_INFO["path"] == "sharded"
    assert textstats.LAST_RUN_INFO["driver_vocab_rows"] == 0

    a = _sorted(bc).set_index("doc_id")["nll"]
    b = _sorted(sh).set_index("doc_id")["nll"]
    assert list(a.index) == list(b.index)
    # both paths round to 6 dp; partial-sum re-association can flip the
    # last rounded digit on boundary values
    assert np.allclose(a.to_numpy(), b.to_numpy(), atol=2e-6, rtol=0)


def test_bigram_logprob_sharded_matches_broadcast(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.stages import textstats

    path = _mk_docs(tmp_path, seed=13)
    bc = textstats.bigram_logprob(_read(path)).to_pandas()
    assert textstats.LAST_RUN_INFO["path"] == "broadcast"
    assert textstats.LAST_RUN_INFO["driver_vocab_rows"] > CAP

    sh = textstats.bigram_logprob(
        _read(path), max_broadcast_pairs=CAP).to_pandas()
    assert textstats.LAST_RUN_INFO["path"] == "sharded"
    assert textstats.LAST_RUN_INFO["driver_vocab_rows"] == 0

    a = _sorted(bc).set_index("doc_id")["nll2"]
    b = _sorted(sh).set_index("doc_id")["nll2"]
    assert list(a.index) == list(b.index)
    assert np.allclose(a.to_numpy(), b.to_numpy(), atol=2e-6, rtol=0)


def test_tfidf_sharded_ties_and_empty_docs(ray_session, tmp_path):
    """Tie order (score desc, term asc) and empty/token-free docs must
    survive the escalation unchanged."""
    from prom_tsdb_copyer_ray.stages import textstats

    texts = ["b a b a c", "", "   ", "zz zz yy", "a a a b c d"]
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    path = os.path.join(str(tmp_path), "documents.parquet")
    pq.write_table(t, path)
    bc = textstats.tfidf_topk(_read(path), k=2).to_pandas()
    sh = textstats.tfidf_topk(
        _read(path), k=2, max_broadcast_terms=0).to_pandas()
    pd.testing.assert_frame_equal(_sorted(bc), _sorted(sh))
