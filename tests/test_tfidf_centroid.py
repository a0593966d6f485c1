"""tfidf_topk (stages/textstats.py) and centroid_topk (stages/similarity.py)
vs brute-force pure-Python references on multi-block inputs."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from prom_tsdb_copyer_ray.stages.similarity import centroid_topk
from prom_tsdb_copyer_ray.stages.textstats import tfidf_topk

TEXTS = [
    "alpha beta beta gamma",
    "alpha alpha delta",
    "",
    "GAMMA gamma gamma epsilon-zeta",  # punctuation splits; case folds
    "unique words only here",
    "beta delta epsilon zeta eta theta",
] + [f"common filler w{i} beta" for i in range(20)]


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data

    t = pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    })
    return ray.data.from_arrow(t).repartition(5)


def test_tfidf_topk_reference(docs_ds):
    word_re = re.compile(r"[a-z]+")
    toks = {i: word_re.findall(t.lower()) for i, t in enumerate(TEXTS)}
    df = Counter()
    for ts in toks.values():
        df.update(set(ts))
    n = len(TEXTS)
    want = {}
    for i, ts in toks.items():
        tf = Counter(ts)
        scored = sorted(
            ((t, c, c * ((n * 1000) // df[t])) for t, c in tf.items()),
            key=lambda x: (-x[2], x[0]),
        )[:3]
        for t, c, s in scored:
            want[(i, t)] = (c, s)
    out = tfidf_topk(docs_ds, k=3).to_pandas()
    got = {(r.doc_id, r.term): (r.tf, r.score) for r in out.itertuples()}
    assert got == want
    # empty doc contributes no rows
    assert not any(d == 2 for d, _ in got)


def test_centroid_topk_reference(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    n, dim = 120, 8
    labels = rng.integers(0, 3, n)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    ds = ray.data.from_arrow(t).repartition(6)
    out = centroid_topk(ds, k=4).to_pandas()

    m = vecs.astype(np.float64)
    for lab in np.unique(labels):
        idx = np.flatnonzero(labels == lab)
        c = m[idx].mean(axis=0)
        cos = (m[idx] @ c) / (np.linalg.norm(m[idx], axis=1) * np.linalg.norm(c))
        order = sorted(zip(-cos, idx))[:4]
        want_ids = [int(i) for _, i in order]
        sub = out[out["label"] == lab].sort_values("cosine", ascending=False)
        assert sub["vec_id"].tolist() == want_ids
        np.testing.assert_allclose(
            sub["cosine"].to_numpy(),
            np.round(sorted(cos, reverse=True)[:4], 6), atol=1e-6)
        assert len(sub) == 4


def test_pca_top_component_partition_invariant(ray_session):
    """Int64 scatter accumulation is associative: identical component
    across block layouts; matches direct numpy power iteration; the
    component captures the dominant direction of a stretched cloud."""
    import ray.data

    from prom_tsdb_copyer_ray.stages.similarity import pca_top_component

    rng = np.random.default_rng(137)
    n, d = 600, 8
    base = rng.normal(size=(n, d))
    base[:, 2] *= 9.0  # dominant axis
    t = pa.table({"embedding": pa.array([r.tolist() for r in base],
                                        pa.list_(pa.float64()))})
    v1, e1, n1 = pca_top_component(ray.data.from_arrow(t))
    v2, e2, n2 = pca_top_component(ray.data.from_arrow(t).repartition(7))
    assert n1 == n2 == n
    assert np.array_equal(v1, v2) and e1 == e2  # bit-identical
    # reference: same spec, straight numpy
    q = np.rint(base * 1000.0).astype(np.int64)
    mean = q.sum(axis=0).astype(np.float64) / n
    cov = (q.T @ q / n - np.outer(mean, mean)) / 1e6
    w = np.ones(d) / np.sqrt(d)
    for _ in range(64):
        w = cov @ w
        w /= np.linalg.norm(w)
    if w[int(np.argmax(np.abs(w)))] < 0:
        w = -w
    assert np.allclose(v1, w, atol=0) and abs(int(np.argmax(np.abs(v1)))) == 2
