"""Second-wave fixture-oracle generator (session 7): expected outputs for
``bpe_encode`` and ``approx_overlap``, computed by independent from-the-spec
single-process references (same corpus_key protocol as
gen_oracle_fixtures.py — kept separate so regenerating these never touches
the earlier fixture parquets).

Run from /root/repo:  python tests/fixtures/gen_oracle_fixtures2.py
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_oracle_fixtures import (  # noqa: E402
    _fmix64_int,
    _normalize_rows,
    bpe_reference,
    embedding_corpus_key,
    kmeans_reference,
)

HERE = os.path.dirname(os.path.abspath(__file__))
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# extra corpora (e.g. the 10x sf1 replica) — same hook as
# gen_oracle_fixtures.py; the round-4 sf1 sweep caught that this file and
# gen_oracle_fixtures3.py were missing it (their oracles returned 0 rows)
SF_DIRS += [d for d in os.environ.get("GRAFT_EXTRA_SF_DIRS", "").split(",") if d]

THETA_K = 256


def bpe_encode_reference(texts: list, merges: list) -> list:
    """Per-doc subword counts under the trained merges (spec:
    textstats.BPEEncoder)."""
    word_re = re.compile(r"[A-Za-z]+")
    pairs = [(a, b) for a, b, _ in merges]
    cache: dict = {}

    def enc_len(word: str) -> int:
        if word in cache:
            return cache[word]
        symbols = tuple(word)
        for a, b in pairs:
            out, i = [], 0
            while i < len(symbols):
                if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            symbols = tuple(out)
        cache[word] = len(symbols)
        return cache[word]

    return [
        sum(enc_len(w.lower()) for w in word_re.findall(t or ""))
        for t in texts
    ]


def theta_overlap_reference(users_by_type: dict, k: int = THETA_K) -> list:
    """Pairwise theta-sketch intersection estimates (spec:
    sketch.theta_sketch_per_key / theta_intersection_estimate)."""
    two64 = float(2**64)
    sketches = {}
    for et, users in users_by_type.items():
        hs = sorted({_fmix64_int(int(u)) for u in set(users)})[:k]
        sketches[et] = hs
    out = []
    types = sorted(sketches)
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            ha, hb = sketches[ta], sketches[tb]
            th_a = (float(max(ha)) + 1.0) / two64 if len(ha) >= k else 1.0
            th_b = (float(max(hb)) + 1.0) / two64 if len(hb) >= k else 1.0
            theta = min(th_a, th_b)
            lim = int(min(theta * two64, two64 - 1))
            common = set(ha) & set(hb)
            d = sum(1 for h in common if h < lim)
            out.append((ta, tb, round(d / theta, 4)))
    return out


def weighted_sample_reference(ids, weights, k=100):
    """A-ES bottom-k (spec: queries.q_weighted_sample)."""
    ids = np.asarray(ids, np.int64)
    w = np.maximum(np.asarray(weights, np.int64), 1).astype(np.float64)
    u = (np.array([_fmix64_int(int(i)) for i in ids], np.float64) + 1.0) / float(2**64)
    es = np.round((-np.log(u) / w) * 1e12) / 1e12
    order = np.lexsort((ids, es))[:k]
    return sorted((int(ids[i]), int(weights[i])) for i in order)


def audio_loudness_reference(doc_id: int, text: str,
                             frame_ms: int = 500, duration_ms: int = 3000):
    """Integer loudness profile (spec: multimodal.AudioLoudness)."""
    import hashlib

    payload = (text or "").encode("utf-8")
    kind = "image" if doc_id % 2 else "audio"

    def energy(frame_idx):
        suffix = b"" if frame_idx is None else int(frame_idx).to_bytes(4, "little")
        d = hashlib.blake2b(payload + suffix, digest_size=32).digest()
        s = np.frombuffer(d, dtype=np.uint16).astype(np.int64)
        return int((s * s).sum())

    if kind == "audio":
        nf = max(duration_ms // frame_ms, 1)
        es = [energy(f) for f in range(nf)]
        return kind, nf, sum(es) // nf, max(es)
    e = energy(None)
    return kind, 0, e, e


def pq_codes_reference(ids, vecs, n_sub=4, k=8):
    """Per-subspace kmeans codebooks + encode census (spec:
    similarity.pq_code_counts)."""
    dim = vecs.shape[1]
    w = dim // n_sub
    out = []
    for s in range(n_sub):
        sub = np.asarray(vecs[:, s * w:(s + 1) * w], np.float64)
        C, _ = kmeans_reference(ids, sub, k=k)
        assign = np.argmax(_normalize_rows(sub) @ C.T, axis=1)
        counts = np.bincount(assign, minlength=k)
        for c in range(k):
            if counts[c]:
                out.append((s, c, int(counts[c])))
    return out


def main() -> None:
    enc_rows = {"corpus_key": [], "doc_id": [], "n_bpe": []}
    ov_rows = {"corpus_key": [], "ta": [], "tb": [], "est_overlap": []}
    ws_rows = {"corpus_key": [], "doc_id": [], "n_chars": []}
    au_rows = {"corpus_key": [], "media_id": [], "kind": [], "n_frames": [],
               "energy_mean": [], "energy_max": []}
    pq_rows = {"corpus_key": [], "subspace": [], "code": [], "n_vecs": []}

    for sf in SF_DIRS:
        t = pq.read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text", "n_chars"])
        key = int(sum(t["n_chars"].to_pylist()))
        ids = t["doc_id"].to_pylist()
        texts = [x or "" for x in t["text"].to_pylist()]
        for d, nc in weighted_sample_reference(ids, t["n_chars"].to_pylist()):
            ws_rows["corpus_key"].append(key)
            ws_rows["doc_id"].append(d)
            ws_rows["n_chars"].append(nc)
        for d, tx in zip(ids, texts):
            kind, nf, em, ex = audio_loudness_reference(d, tx)
            au_rows["corpus_key"].append(key)
            au_rows["media_id"].append(d)
            au_rows["kind"].append(kind)
            au_rows["n_frames"].append(nf)
            au_rows["energy_mean"].append(em)
            au_rows["energy_max"].append(ex)
        merges = bpe_reference(texts, k=8)
        for d, n in zip(ids, bpe_encode_reference(texts, merges)):
            enc_rows["corpus_key"].append(key)
            enc_rows["doc_id"].append(d)
            enc_rows["n_bpe"].append(n)
        print(f"{sf}: bpe_encode {len(ids)} docs", file=sys.stderr)

        ev = pq.read_table(f"{sf}/events.parquet",
                           columns=["event_id", "event_type", "user_id"])
        ekey = int(sum(ev["event_id"].to_pylist()))
        by_type: dict = {}
        for et, uid in zip(ev["event_type"].to_pylist(),
                           ev["user_id"].to_pylist()):
            by_type.setdefault(et, []).append(uid)
        for ta, tb, est in theta_overlap_reference(by_type):
            ov_rows["corpus_key"].append(ekey)
            ov_rows["ta"].append(ta)
            ov_rows["tb"].append(tb)
            ov_rows["est_overlap"].append(est)
        print(f"{sf}: theta_overlap {len(by_type)} types", file=sys.stderr)

    pq.write_table(
        pa.table({
            "corpus_key": pa.array(enc_rows["corpus_key"], pa.int64()),
            "doc_id": pa.array(enc_rows["doc_id"], pa.int64()),
            "n_bpe": pa.array(enc_rows["n_bpe"], pa.int64()),
        }),
        os.path.join(HERE, "oracle_bpe_encode.parquet"),
    )
    pq.write_table(
        pa.table({
            "corpus_key": pa.array(ws_rows["corpus_key"], pa.int64()),
            "doc_id": pa.array(ws_rows["doc_id"], pa.int64()),
            "n_chars": pa.array(ws_rows["n_chars"], pa.int64()),
        }),
        os.path.join(HERE, "oracle_weighted_sample.parquet"),
    )
    pq.write_table(
        pa.table({
            "corpus_key": pa.array(ov_rows["corpus_key"], pa.int64()),
            "ta": pa.array(ov_rows["ta"], pa.string()),
            "tb": pa.array(ov_rows["tb"], pa.string()),
            "est_overlap": pa.array(ov_rows["est_overlap"], pa.float64()),
        }),
        os.path.join(HERE, "oracle_theta_overlap.parquet"),
    )
    for sf in SF_DIRS:
        import pyarrow.parquet as _pq

        et = _pq.read_table(f"{sf}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
        evecs = np.stack([np.asarray(v, np.float64)
                          for v in et["embedding"].to_pylist()])
        eids = et["vec_id"].to_numpy().astype(np.int64)
        ekey = embedding_corpus_key(evecs)
        for s_, c_, n_ in pq_codes_reference(eids, evecs):
            pq_rows["corpus_key"].append(ekey)
            pq_rows["subspace"].append(s_)
            pq_rows["code"].append(c_)
            pq_rows["n_vecs"].append(n_)
        print(f"{sf}: pq_codes", file=sys.stderr)

    pq.write_table(
        pa.table({
            "corpus_key": pa.array(pq_rows["corpus_key"], pa.int64()),
            "subspace": pa.array(pq_rows["subspace"], pa.int64()),
            "code": pa.array(pq_rows["code"], pa.int64()),
            "n_vecs": pa.array(pq_rows["n_vecs"], pa.int64()),
        }),
        os.path.join(HERE, "oracle_pq_codes.parquet"),
    )
    pq.write_table(
        pa.table({
            "corpus_key": pa.array(au_rows["corpus_key"], pa.int64()),
            "media_id": pa.array(au_rows["media_id"], pa.int64()),
            "kind": pa.array(au_rows["kind"], pa.string()),
            "n_frames": pa.array(au_rows["n_frames"], pa.int64()),
            "energy_mean": pa.array(au_rows["energy_mean"], pa.int64()),
            "energy_max": pa.array(au_rows["energy_max"], pa.int64()),
        }),
        os.path.join(HERE, "oracle_audio_loudness.parquet"),
    )
    print("fixtures written", file=sys.stderr)


if __name__ == "__main__":
    main()
