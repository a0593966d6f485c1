"""Curation flagship pipeline (pipelines/curate.py): end-to-end kept-set vs a
pure-Python reference, duplicate handling, resumable shard checkpoints."""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from prom_tsdb_copyer_ray.pipelines.curate import (
    curate_summary,
    load_manifest,
    run_curate,
)

TOK = re.compile(r"[ \t\r\n]+")


def _ref_norm(text: str) -> str:
    import unicodedata

    return re.sub(r"[ \t\r\n]+", " ", unicodedata.normalize("NFC", text).lower()).strip(" ")


def _ref_kept(docs, min_tokens=5, distinct_mult=3):
    """Pure-Python oracle: normalize -> filter -> min-id dedup."""
    seen = {}
    for doc_id, text, lang, source in sorted(docs):
        t = _ref_norm(text)
        toks = TOK.split(t) if t else []
        if len(toks) < min_tokens or len(set(toks)) * distinct_mult < len(toks):
            continue
        if t not in seen:
            seen[t] = (doc_id, lang, len(toks))
    return {v[0]: (v[1], v[2]) for v in seen.values()}


DOCS = [
    (0, "Alpha beta GAMMA delta epsilon zeta", "en", "src0"),
    (1, "alpha  beta gamma\tdelta epsilon zeta", "en", "src1"),  # dup of 0 after norm
    (2, "the the the the the the the the", "en", "src2"),        # fails distinct
    (3, "short text", "de", "src3"),                              # fails min_tokens
    (4, "", "de", "src4"),
    (5, "one two three four five six seven eight", "de", "src5"),
    (6, "uno dos tres cuatro cinco seis", "es", "src6"),
    (7, "Alpha beta gamma delta epsilon zeta", "fr", "src7"),     # dup of 0 too
] + [
    (10 + i, f"doc {i} unique words qqq w{i} w{i+1} w{i+2} filler", "en", f"src{i%4}")
    for i in range(30)
]


def _docs_table():
    return pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "text": pa.array([d[1] for d in DOCS], pa.string()),
        "lang": pa.array([d[2] for d in DOCS], pa.string()),
        "source": pa.array([d[3] for d in DOCS], pa.string()),
    })


@pytest.fixture()
def docs_parquet(tmp_path):
    p = str(tmp_path / "docs.parquet")
    pq.write_table(_docs_table(), p)
    return p


def _read_out(out_dir):
    import pandas as pd

    frames = []
    droot = os.path.join(out_dir, "docs")
    for name in sorted(os.listdir(droot)):
        sdir = os.path.join(droot, name)
        for f in sorted(os.listdir(sdir)):
            if f.endswith(".parquet"):
                df = pq.read_table(os.path.join(sdir, f)).to_pandas()
                df["shard"] = int(name.split("=", 1)[1])
                frames.append(df)
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


def test_run_curate_end_to_end(ray_session, docs_parquet, tmp_path):
    out = str(tmp_path / "out")
    m = run_curate(docs_parquet, out, num_shards=4, min_tokens=5)
    assert m["status"] == "complete"
    got = _read_out(out)
    want = _ref_kept(DOCS)
    assert sorted(got["doc_id"]) == sorted(want)
    for r in got.itertuples():
        lang, ntok = want[r.doc_id]
        assert (r.lang, r.n_tokens) == (lang, ntok)
    # duplicates resolved to the min id: 0 kept, 1 and 7 dropped
    assert 0 in set(got["doc_id"]) and 1 not in set(got["doc_id"]) and 7 not in set(got["doc_id"])
    # manifest row counts match the data
    assert sum(e["n_docs"] for e in m["shards"].values()) == len(got)
    assert len(m["shards"]) == 4


def test_run_curate_resume_redoes_only_missing_shard(ray_session, docs_parquet, tmp_path):
    out = str(tmp_path / "out")
    run_curate(docs_parquet, out, num_shards=4, min_tokens=5)
    before = _read_out(out)

    # simulate a crash that lost shard 2: data gone, manifest row absent
    import shutil

    m = load_manifest(out)
    del m["shards"]["2"]
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(m, f)
    shutil.rmtree(os.path.join(out, "docs", "shard=2"))
    mtimes = {}
    for name in os.listdir(os.path.join(out, "docs")):
        sdir = os.path.join(out, "docs", name)
        for fn in os.listdir(sdir):
            p = os.path.join(sdir, fn)
            mtimes[p] = os.stat(p).st_mtime_ns

    m2 = run_curate(docs_parquet, out, num_shards=4, min_tokens=5)
    after = _read_out(out)
    assert sorted(after["doc_id"]) == sorted(before["doc_id"])
    # untouched shards were not rewritten
    for p, t in mtimes.items():
        assert os.stat(p).st_mtime_ns == t, p
    assert m2["status"] == "complete" and len(m2["shards"]) == 4
    # third run: nothing to do, short-circuit
    m3 = run_curate(docs_parquet, out, num_shards=4, min_tokens=5)
    assert m3["status"] == "complete"


def test_curate_summary_matches_reference(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_docs_table()).repartition(5)
    out = curate_summary(ds, min_tokens=5).to_pandas()
    want = {}
    for doc_id, (lang, ntok) in _ref_kept(DOCS).items():
        n, s = want.get(lang, (0, 0))
        want[lang] = (n + 1, s + ntok)
    got = {r.lang: (r.n_docs, r.sum_tokens) for r in out.itertuples()}
    assert got == want


def test_resume_does_not_resurrect_cross_shard_dups(ray_session, tmp_path):
    """Regression: dedup winners are GLOBAL — resuming a lost shard whose
    doc's smaller-id twin lives in a COMMITTED shard must not keep the
    twin's duplicate (the winner pass must see the full corpus, not just
    the missing shards)."""
    import shutil

    # fmix64 % 4: doc 0 -> shard 0, doc 3 -> shard 2 (cross-shard dup pair)
    dup_text = "alpha beta gamma delta epsilon zeta"
    docs = pa.table({
        "doc_id": pa.array([0, 3, 4, 5], pa.int64()),
        "text": pa.array([
            dup_text, dup_text,
            "one two three four five six seven",
            "uno dos tres cuatro cinco seis siete",
        ]),
        "lang": pa.array(["en", "en", "de", "es"]),
        "source": pa.array(["s0", "s1", "s2", "s3"]),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)
    out = str(tmp_path / "out")
    run_curate(src, out, num_shards=4, min_tokens=5)
    before = _read_out(out)
    assert 0 in set(before["doc_id"]) and 3 not in set(before["doc_id"])

    # crash that lost shard 2 (where doc 3 would live if it were kept)
    m = load_manifest(out)
    del m["shards"]["2"]
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(m, f)
    shutil.rmtree(os.path.join(out, "docs", "shard=2"), ignore_errors=True)

    run_curate(src, out, num_shards=4, min_tokens=5)
    after = _read_out(out)
    assert sorted(after["doc_id"]) == sorted(before["doc_id"])
    assert 3 not in set(after["doc_id"])  # the dup stays dead


def test_curate_input_growth_invalidates(ray_session, tmp_path):
    """A grown input triggers a full recompute (global dedup means any new
    doc can change any shard); the result equals a from-scratch run, and
    an unchanged re-run is a pure skip."""
    import pandas as pd

    docs1 = _docs_table()
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    pq.write_table(docs1, str(src_dir / "a.parquet"))
    out = str(tmp_path / "out")
    run_curate(str(src_dir), out, num_shards=4, min_tokens=5)
    n_before = len(_read_out(out))

    # new file: 20 fresh docs + a smaller-id-beating dup does not exist, but
    # growth alone must invalidate
    extra = pa.table({
        "doc_id": pa.array([100 + i for i in range(20)], pa.int64()),
        "text": pa.array([
            f"fresh document {i} with plenty of distinct tokens here {i * 7}"
            for i in range(20)
        ]),
        "lang": pa.array(["en"] * 20),
        "source": pa.array(["sx"] * 20),
    })
    pq.write_table(extra, str(src_dir / "b.parquet"))
    run_curate(str(src_dir), out, num_shards=4, min_tokens=5)
    got = _read_out(out)
    assert len(got) == n_before + 20

    ref = str(tmp_path / "ref")
    run_curate(str(src_dir), ref, num_shards=4, min_tokens=5)
    want = _read_out(ref)
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])

    # unchanged third run: manifest byte-stable
    before_m = json.load(open(os.path.join(out, "manifest.json")))
    run_curate(str(src_dir), out, num_shards=4, min_tokens=5)
    assert json.load(open(os.path.join(out, "manifest.json"))) == before_m
