"""Generate DuckDB-oracle fixture parquet for the non-SQL-expressible queries.

The driver's correctness gate compares each ``queries()`` entry against a
DuckDB SQL string.  Hash-pipeline outputs (fingerprint, simhash, lang-id,
MinHash/Jaccard pairs) have no tractable pure-SQL expression, so — per the
round-1 verdict's suggestion — this script PRECOMPUTES the expected outputs
with a from-the-spec reference implementation (plain-Python Horner loops and
set arithmetic; only the MinHash permutation table uses NumPy because the
spec *defines* the permutations as draws from ``RandomState(7)``), and the
oracle SQL reads the fixture (``oracle = fixture join``).

Each fixture row is tagged with ``corpus_key = SUM(n_chars)`` of its source
documents table, so ONE static parquet path serves every sf dir the driver
might use: ``... WHERE corpus_key = (SELECT SUM(n_chars) FROM documents)``.

Run from the repo root (regenerates all fixtures, deterministic):

    python tests/fixtures/gen_oracle_fixtures.py
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# extra corpora (e.g. the 10x sf1 replica from scripts/make_sf1.py): the
# corpus_key tagging makes fixtures additive across any number of dirs
SF_DIRS += [d for d in os.environ.get("GRAFT_EXTRA_SF_DIRS", "").split(",") if d]
OUT_DIR = os.path.dirname(os.path.abspath(__file__))

MASK64 = (1 << 64) - 1
B = 1000003
SEED = 0x9E3779B97F4A7C15
NGRAM = 5
NUM_PERM = 128
NUM_BANDS = 32
JACCARD_THRESHOLD = 0.5  # what q_ngram_jaccard_pairs uses


# --- spec reference implementations (plain Python) --------------------------

def poly_hash(data: bytes) -> int:
    acc = 0
    for x in data:
        acc = (acc * B + x + SEED) & MASK64
    return acc


def fingerprint(text: str) -> int:
    return poly_hash(text.encode("utf-8")) & ((1 << 63) - 1)


def shingle_hashes(text: str, n: int = NGRAM) -> list[int]:
    b = text.encode("utf-8")
    if len(b) == 0:
        return []
    if len(b) <= n:
        return [poly_hash(b)]
    return [poly_hash(b[i : i + n]) for i in range(len(b) - n + 1)]


def simhash(shingles: list[int]) -> int:
    if not shingles:
        return 0
    out = 0
    for p in range(64):
        ones = sum((s >> p) & 1 for s in shingles)
        if 2 * ones - len(shingles) > 0:
            out |= 1 << p
    # int64 two's complement
    return out - (1 << 64) if out >= (1 << 63) else out


STOPWORDS = {
    "en": frozenset("the of and to a in is that it for on with as at by this".split()),
    "de": frozenset("der die das und ist nicht ein eine mit von zu im den für auf".split()),
    "es": frozenset("el la los las de que y en un una es por con para del no".split()),
    "fr": frozenset("le la les de des et un une est dans pour que qui sur pas".split()),
}
WORD_RE = re.compile(r"[a-zäöüßáéíóúàèìòùâêîôûçñ]+", re.IGNORECASE)


def lang_id(text: str) -> str:
    if not text:
        return "und"
    head = text[:4000]
    n_cjk = sum(1 for ch in head if "一" <= ch <= "鿿")
    if n_cjk >= max(4, 0.05 * min(len(text), 4000)):
        return "zh"
    words = WORD_RE.findall(head.lower())
    if not words:
        return "und"
    best_lang, best_hits = "und", 0
    for lang in sorted(STOPWORDS):
        hits = sum(1 for w in words if w in STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "und"


def minhash_perms():
    """The spec's permutation table: draws from RandomState(7), a then b."""
    rng = np.random.RandomState(7)
    a = (rng.randint(1, 2**62, size=NUM_PERM).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.randint(0, 2**62, size=NUM_PERM).astype(np.uint64)
    return a, b


def minhash_signature(shingles: list[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not shingles:
        return np.full(NUM_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    s = np.array(shingles, dtype=np.uint64)
    with np.errstate(over="ignore"):
        m = s[:, None] * a[None, :] + b[None, :]
    return m.min(axis=0)


def band_keys(sig: np.ndarray) -> list[bytes]:
    import hashlib

    r = NUM_PERM // NUM_BANDS
    return [
        hashlib.blake2b(sig[i * r : (i + 1) * r].tobytes(), digest_size=8).digest()
        for i in range(NUM_BANDS)
    ]


def lsh_candidate_pairs(ids: list[int], sigs: list[np.ndarray]) -> set[tuple[int, int]]:
    buckets: dict[tuple[int, bytes], list[int]] = {}
    for did, sig in zip(ids, sigs):
        for band, key in enumerate(band_keys(sig)):
            buckets.setdefault((band, key), []).append(did)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


# --- embedding near-dup LSH (spec: stages/dedup.embedding_neardup_pairs) ---

EMB_THRESHOLD = 0.45   # what q_embedding_neardup uses
EMB_PLANES = 4
EMB_TABLES = 4
EMB_SEED = 7


def embedding_corpus_key(vecs: np.ndarray) -> int:
    """Order-independent int key over the embeddings table (the two 500-row
    sf dirs differ only in values, so COUNT(*) cannot key them)."""
    return int(
        np.floor(np.abs(vecs[:, 0].astype(np.float64)) * 1000).astype(np.int64).sum()
    )


def embedding_neardup_reference(ids: np.ndarray, vecs: np.ndarray):
    """From-the-spec multi-table hyperplane LSH + exact cosine verify.

    Buckets at fixture scale are far below the engine's max_bucket=4096, so
    the median-split path never triggers; the reference is buckets + exact
    within-bucket cosine + cross-table max-dedup."""
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    best: dict[tuple[int, int], float] = {}
    for t in range(EMB_TABLES):
        rng = np.random.RandomState((EMB_SEED * 1_000_003 + t) % (2**31))
        planes = rng.randn(unit.shape[1], EMB_PLANES)
        signs = (vecs @ planes) > 0
        bucket = signs @ (np.int64(1) << np.arange(EMB_PLANES, dtype=np.int64))
        for bk in np.unique(bucket):
            m = bucket == bk
            bids = ids[m]
            order = np.argsort(bids)
            bids, u = bids[order], unit[m][order]
            sim = u @ u.T
            ri, ci = np.nonzero(sim >= EMB_THRESHOLD)
            keep = ci > ri
            for i, j in zip(ri[keep], ci[keep]):
                k = (int(bids[i]), int(bids[j]))
                s = float(sim[i, j])
                if s > best.get(k, -2.0):
                    best[k] = s
    return best


# --- IVF top-k (spec: stages/similarity.train_centroids / ivf_topk) --------

IVF_CENTROIDS = 16
IVF_NPROBE = 4
IVF_SEED = 7
IVF_SAMPLE = 4096
ANN_K = 10
N_ANN_QUERIES = 5


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def ivf_reference(ids: np.ndarray, vecs: np.ndarray):
    """From-the-spec IVF: Lloyd k-means on the first ``IVF_SAMPLE`` vectors
    (file order — the engine's ``ds.limit()`` sample), probe the nprobe
    nearest cells per query, exact cosine top-k within the probed cells."""
    rng = np.random.RandomState(IVF_SEED)
    X = _normalize_rows(np.asarray(vecs[:IVF_SAMPLE], dtype=np.float64))
    idx = rng.choice(len(X), size=min(IVF_CENTROIDS, len(X)), replace=False)
    C = X[idx].copy()
    for _ in range(10):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize_rows(C)

    unit = _normalize_rows(np.asarray(vecs, dtype=np.float64))
    cells = np.argmax(unit @ C.T, axis=1)
    q_order = np.argsort(ids[ids < N_ANN_QUERIES])
    q_unit = unit[ids < N_ANN_QUERIES][q_order]
    probes = np.argsort(-(q_unit @ C.T), axis=1)[:, :IVF_NPROBE]
    rows = []
    for qi in range(len(q_unit)):
        mask = np.isin(cells, probes[qi])
        sims = q_unit[qi] @ unit[mask].T
        sub_ids = ids[mask]
        order = np.lexsort((sub_ids, -sims))[: min(ANN_K, len(sub_ids))]
        for rank, j in enumerate(order):
            rows.append((qi, int(sub_ids[j]), rank))
    return rows


# --- k-means (spec: stages/similarity.kmeans_fit) ---------------------------

KMEANS_K = 8
KMEANS_ITERS = 5
KMEANS_SCALE = 1e6


def kmeans_reference(ids: np.ndarray, vecs: np.ndarray,
                     k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                     scale: float = KMEANS_SCALE):
    """From-the-spec deterministic Lloyd: init = k smallest-id vectors,
    per-cluster sums over int64-quantized vectors (exact => order-free),
    centroid = int_sum / (scale * n), full-matrix renormalize per
    iteration — the identical op sequence as the engine, so results are
    bit-equal regardless of Ray's batching."""
    order = np.argsort(ids)
    first = vecs[order[:k]]
    q0 = np.rint(np.asarray(first, np.float64) * scale)
    C = _normalize_rows(q0 / scale)
    unit = _normalize_rows(np.asarray(vecs, np.float64))
    qm = np.rint(np.asarray(vecs, np.float64) * scale).astype(np.int64)
    counts = np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        assign = np.argmax(unit @ C.T, axis=1)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        for c in range(k):
            m = assign == c
            if m.any():
                C[c] = qm[m].sum(axis=0).astype(np.float64) / (scale * m.sum())
        C = _normalize_rows(C)
    return C, counts


# --- integer PageRank (spec: stages/graph.pagerank_int) ---------------------

PR_ITERS = 5
PR_SCALE = 10**9


def star_edges_reference(ids, keys):
    """group_star_edges: (min_id, other) per group with >= 2 members."""
    groups: dict = {}
    for i, k in zip(ids, keys):
        groups.setdefault(k, []).append(i)
    edges = []
    for members in groups.values():
        ms = sorted(members)
        edges.extend((ms[0], m) for m in ms[1:])
    return edges


def pagerank_reference(all_ids, edges, iters=PR_ITERS, scale=PR_SCALE):
    """Sequential integer PageRank with the exact spec arithmetic
    (floor(0.85*m) // deg per incident edge, teleport floor(0.15*scale));
    undirected: each edge counts both directions."""
    nodes = sorted(all_ids)
    idx = {n: i for i, n in enumerate(nodes)}
    deg = [0] * len(nodes)
    dir_edges = []
    for a, b in edges:
        dir_edges.append((a, b))
        dir_edges.append((b, a))
    for s, _ in dir_edges:
        deg[idx[s]] += 1
    mass = [scale] * len(nodes)
    teleport = int(0.15 * scale)
    for _ in range(iters):
        recv = [0] * len(nodes)
        for s, d in dir_edges:
            si = idx[s]
            recv[idx[d]] += (mass[si] * 85 // 100) // max(deg[si], 1)
        mass = [teleport + r for r in recv]
    return nodes, mass


# --- HyperLogLog approx distinct (spec: stages/sketch.py) -------------------

HLL_P = 12


def _fmix64_int(x: int) -> int:
    MASK = (1 << 64) - 1
    x &= MASK
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & MASK
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & MASK
    x ^= x >> 33
    return x


def hll_reference(values: list[int], p: int = HLL_P) -> float:
    """Plain-Python HLL (bit_length-based ranks, sequential math)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    MASK = (1 << 64) - 1
    for v in values:
        h = _fmix64_int(int(v))
        idx = h >> (64 - p)
        rest = (h << p) & MASK
        lz = (64 - p) if rest == 0 else min(64 - rest.bit_length(), 64 - p)
        regs[idx] = max(regs[idx], lz + 1)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.float64(2.0) ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return float(e)


# --- bottom-k quantile sketch (spec: stages/sketch.approx_quantiles) --------

AQ_K = 512
AQ_QS = (0.5, 0.9, 0.99)


def _mix64_single_int(x: int) -> int:
    MASK = (1 << 64) - 1
    x &= MASK
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & MASK
    x ^= x >> 33
    return x


def approx_quantiles_reference(values: list[float], ids: list[int],
                               qs=AQ_QS, k: int = AQ_K) -> list[float]:
    import struct

    ranked = []
    for v, i in zip(values, ids):
        vbits = struct.unpack("<Q", struct.pack("<d", float(v)))[0]
        ranked.append((_fmix64_int(vbits ^ _mix64_single_int(int(i))), float(v)))
    ranked.sort()
    sample = sorted(v for _, v in ranked[:k])
    out = []
    for q in qs:
        idx = max(int(np.ceil(q * len(sample))) - 1, 0)
        out.append(sample[idx])
    return out


# --- media features (spec: stages/multimodal.MediaFeatureExtractor) --------

MEDIA_FEATURE_DIM = 16


def compression_ratio_reference(text: str):
    """zlib level-6 ratio — zlib IS the spec (like blake2b for media)."""
    import zlib

    raw = (text or "").encode("utf-8")
    nb = len(raw)
    cb = len(zlib.compress(raw, 6)) if raw else 0
    ratio = round(cb / nb, 6) if nb else 0.0
    return nb, cb, ratio


def media_features_reference(doc_id: int, text: str):
    import hashlib

    payload = (text or "").encode("utf-8")
    d = hashlib.blake2b(payload or b"", digest_size=MEDIA_FEATURE_DIM * 2).digest()
    feat = (np.frombuffer(d, dtype=np.uint16).astype(np.float64) / 65535.0).tolist()
    kind = "image" if doc_id % 3 else "video"
    return kind, feat


def pca_reference(vecs: np.ndarray, scale: float = 1000.0, iters: int = 64):
    """Top principal component (spec: similarity.pca_top_component)."""
    q = np.rint(vecs * scale).astype(np.int64)
    n = len(q)
    S = q.T @ q
    mean = q.sum(axis=0).astype(np.float64) / n
    cov = (S.astype(np.float64) / n - np.outer(mean, mean)) / (scale * scale)
    d = cov.shape[0]
    v = np.ones(d, np.float64) / np.sqrt(d)
    for _ in range(iters):
        v = cov @ v
        v = v / np.linalg.norm(v)
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    return v, float(v @ cov @ v)


def bpe_reference(texts: list, k: int = 8):
    """First-k BPE merges (spec: textstats.bpe_train)."""
    import re
    from collections import Counter

    word_re = re.compile(r"[A-Za-z]+")
    wc = Counter()
    for t in texts:
        wc.update(w.lower() for w in word_re.findall(t or ""))

    def apply(symbols, merges):
        for a, b in merges:
            out, i = [], 0
            while i < len(symbols):
                if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            symbols = tuple(out)
        return symbols

    merges, counts = [], []
    for _ in range(k):
        pc_ = Counter()
        for w, n in wc.items():
            syms = apply(tuple(w), merges)
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += n
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append(best[0])
        counts.append(best[1])
    return [(a, b, n) for (a, b), n in zip(merges, counts)]


def media_resize_reference(doc_id: int, text: str,
                           target=(64, 64)):
    """Image-resize stub (spec: stages/multimodal.ResizeMedia)."""
    import hashlib

    payload = (text or "").encode("utf-8")
    kind = "image" if doc_id % 3 else "video"
    in_w = 320 + (doc_id % 5) * 64
    in_h = 240 + (doc_id % 3) * 80
    if kind == "image":
        w, h = target
        suffix = int(w).to_bytes(4, "little") + int(h).to_bytes(4, "little")
    else:
        w, h = in_w, in_h
        suffix = b""
    d = hashlib.blake2b(payload + suffix, digest_size=8).digest()
    return kind, w, h, int.from_bytes(d, "little") >> 1


def frame_features_reference(doc_id: int, text: str,
                             duration_ms: int = 3000, every_ms: int = 1000):
    """Frame-sample + mean-pool (spec: multimodal.sample_frame_features)."""
    import hashlib

    def feat(b: bytes) -> np.ndarray:
        d = hashlib.blake2b(b or b"", digest_size=MEDIA_FEATURE_DIM * 2).digest()
        return np.frombuffer(d, dtype=np.uint16).astype(np.float64) / 65535.0

    payload = (text or "").encode("utf-8")
    if doc_id % 3:  # image: whole-payload feature, 0 frames
        return 0, feat(payload).tolist()
    ts = list(range(0, duration_ms, every_ms))
    feats = np.stack([feat(payload + t.to_bytes(4, "little")) for t in ts])
    return len(ts), feats.mean(axis=0).tolist()


def main() -> None:
    a_perm, b_perm = minhash_perms()
    rows = {
        "fingerprint": {"corpus_key": [], "doc_id": [], "fingerprint": []},
        "simhash": {"corpus_key": [], "doc_id": [], "simhash": []},
        "lang_id": {"corpus_key": [], "doc_id": [], "pred_lang": []},
        "minhash_pairs": {"corpus_key": [], "a": [], "b": []},
        "ngram_jaccard": {"corpus_key": [], "a": [], "b": [], "jaccard": []},
        "embedding_neardup": {"corpus_key": [], "a": [], "b": [], "cosine": []},
        "ivf_topk": {"corpus_key": [], "query_idx": [], "vec_id": [], "rank": []},
        "kmeans": {"corpus_key": [], "cluster": [], "n_vecs": [], "c0": []},
        "media_features": {"corpus_key": [], "media_id": [], "kind": [], "embedding": []},
        "compression": {"corpus_key": [], "doc_id": [], "n_bytes": [],
                        "c_bytes": [], "ratio": []},
        "frame_features": {"corpus_key": [], "media_id": [], "n_frames": [],
                           "embedding": []},
        "media_resize": {"corpus_key": [], "media_id": [], "kind": [],
                         "out_w": [], "out_h": [], "thumb_hash": []},
        "pca_top": {"corpus_key": [], "dim": [], "component": [],
                    "eigenvalue": []},
        "bpe_merges": {"corpus_key": [], "merge_idx": [], "left": [],
                       "right": [], "n": []},
        "pagerank": {"corpus_key": [], "node": [], "rank": []},
        "approx_users": {"corpus_key": [], "event_type": [], "approx_users": []},
        "approx_quantiles": {"corpus_key": [], "event_type": [],
                             "p50": [], "p90": [], "p99": []},
    }
    for sf in SF_DIRS:
        ev = pq.read_table(
            f"{sf}/events.parquet",
            columns=["event_id", "event_type", "user_id", "value"],
        )
        ekey2 = int(sum(ev["event_id"].to_pylist()))
        by_type: dict[str, list[int]] = {}
        vals_by_type: dict[str, list] = {}
        for et, uid, eid, val in zip(
            ev["event_type"].to_pylist(), ev["user_id"].to_pylist(),
            ev["event_id"].to_pylist(), ev["value"].to_pylist(),
        ):
            by_type.setdefault(et, []).append(uid)
            vals_by_type.setdefault(et, []).append((val, eid))
        for et in sorted(by_type):
            rows["approx_users"]["corpus_key"].append(ekey2)
            rows["approx_users"]["event_type"].append(et)
            rows["approx_users"]["approx_users"].append(hll_reference(by_type[et]))
            vv = [v for v, _ in vals_by_type[et]]
            ii = [i for _, i in vals_by_type[et]]
            p50, p90, p99 = approx_quantiles_reference(vv, ii)
            rows["approx_quantiles"]["corpus_key"].append(ekey2)
            rows["approx_quantiles"]["event_type"].append(et)
            rows["approx_quantiles"]["p50"].append(p50)
            rows["approx_quantiles"]["p90"].append(p90)
            rows["approx_quantiles"]["p99"].append(p99)
    for sf in SF_DIRS:
        et = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        evecs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in et["embedding"].to_pylist()]
        )
        eids = et["vec_id"].to_numpy().astype(np.int64)
        ekey = embedding_corpus_key(evecs)
        for (x, y), s in sorted(embedding_neardup_reference(eids, evecs).items()):
            rows["embedding_neardup"]["corpus_key"].append(ekey)
            rows["embedding_neardup"]["a"].append(x)
            rows["embedding_neardup"]["b"].append(y)
            rows["embedding_neardup"]["cosine"].append(s)
        for qi, vid, rank in ivf_reference(eids, evecs):
            rows["ivf_topk"]["corpus_key"].append(ekey)
            rows["ivf_topk"]["query_idx"].append(qi)
            rows["ivf_topk"]["vec_id"].append(vid)
            rows["ivf_topk"]["rank"].append(rank)
        pca_v, pca_eig = pca_reference(evecs)
        for di, comp in enumerate(pca_v):
            rows["pca_top"]["corpus_key"].append(ekey)
            rows["pca_top"]["dim"].append(di)
            rows["pca_top"]["component"].append(round(float(comp), 6))
            rows["pca_top"]["eigenvalue"].append(round(pca_eig, 6))
        km_C, km_n = kmeans_reference(eids, evecs)
        for c in range(KMEANS_K):
            if km_n[c] > 0:
                rows["kmeans"]["corpus_key"].append(ekey)
                rows["kmeans"]["cluster"].append(c)
                rows["kmeans"]["n_vecs"].append(int(km_n[c]))
                rows["kmeans"]["c0"].append(round(float(km_C[c, 0]), 6))
    for sf in SF_DIRS:
        dt = pq.read_table(
            f"{sf}/documents.parquet",
            columns=["doc_id", "lang", "source", "n_chars"],
        )
        dkey = int(sum(dt["n_chars"].to_pylist()))
        dids = dt["doc_id"].to_pylist()
        e1 = star_edges_reference(
            dids, list(zip(dt["lang"].to_pylist(), dt["n_chars"].to_pylist()))
        )
        e2 = star_edges_reference(
            dids, list(zip(dt["source"].to_pylist(), dt["n_chars"].to_pylist()))
        )
        pr_nodes, pr_mass = pagerank_reference(dids, e1 + e2)
        for n, m in zip(pr_nodes, pr_mass):
            rows["pagerank"]["corpus_key"].append(dkey)
            rows["pagerank"]["node"].append(n)
            rows["pagerank"]["rank"].append(m)

    for sf in SF_DIRS:
        t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text", "n_chars"])
        key = int(sum(t["n_chars"].to_pylist()))
        ids = t["doc_id"].to_pylist()
        texts = [x or "" for x in t["text"].to_pylist()]
        print(f"{sf}: {len(ids)} docs, corpus_key={key}", file=sys.stderr)

        shingles = [shingle_hashes(x) for x in texts]
        sigs = [minhash_signature(s, a_perm, b_perm) for s in shingles]
        sh_sets = {d: set(s) for d, s in zip(ids, shingles)}

        for i, (d, x) in enumerate(zip(ids, texts)):
            rows["fingerprint"]["corpus_key"].append(key)
            rows["fingerprint"]["doc_id"].append(d)
            rows["fingerprint"]["fingerprint"].append(fingerprint(x))
            rows["simhash"]["corpus_key"].append(key)
            rows["simhash"]["doc_id"].append(d)
            rows["simhash"]["simhash"].append(simhash(shingles[i]))
            rows["lang_id"]["corpus_key"].append(key)
            rows["lang_id"]["doc_id"].append(d)
            rows["lang_id"]["pred_lang"].append(lang_id(x))
            kind, feat = media_features_reference(d, x)
            rows["media_features"]["corpus_key"].append(key)
            rows["media_features"]["media_id"].append(d)
            rows["media_features"]["kind"].append(kind)
            rows["media_features"]["embedding"].append(feat)
            nb, cb, ratio = compression_ratio_reference(x)
            rows["compression"]["corpus_key"].append(key)
            rows["compression"]["doc_id"].append(d)
            rows["compression"]["n_bytes"].append(nb)
            rows["compression"]["c_bytes"].append(cb)
            rows["compression"]["ratio"].append(ratio)
            nf, emb = frame_features_reference(d, x)
            rows["frame_features"]["corpus_key"].append(key)
            rows["frame_features"]["media_id"].append(d)
            rows["frame_features"]["n_frames"].append(nf)
            rows["frame_features"]["embedding"].append(emb)
            rkind, rw, rh, rth = media_resize_reference(d, x)
            rows["media_resize"]["corpus_key"].append(key)
            rows["media_resize"]["media_id"].append(d)
            rows["media_resize"]["kind"].append(rkind)
            rows["media_resize"]["out_w"].append(rw)
            rows["media_resize"]["out_h"].append(rh)
            rows["media_resize"]["thumb_hash"].append(rth)

        for mi, (ml, mr, mn) in enumerate(bpe_reference(texts)):
            rows["bpe_merges"]["corpus_key"].append(key)
            rows["bpe_merges"]["merge_idx"].append(mi)
            rows["bpe_merges"]["left"].append(ml)
            rows["bpe_merges"]["right"].append(mr)
            rows["bpe_merges"]["n"].append(mn)

        pairs = lsh_candidate_pairs(ids, sigs)
        for x, y in sorted(pairs):
            rows["minhash_pairs"]["corpus_key"].append(key)
            rows["minhash_pairs"]["a"].append(x)
            rows["minhash_pairs"]["b"].append(y)
            sa, sb = sh_sets[x], sh_sets[y]
            if not sa and not sb:
                j = 1.0
            else:
                inter = len(sa & sb)
                j = inter / (len(sa) + len(sb) - inter)
            if j >= JACCARD_THRESHOLD:
                rows["ngram_jaccard"]["corpus_key"].append(key)
                rows["ngram_jaccard"]["a"].append(x)
                rows["ngram_jaccard"]["b"].append(y)
                rows["ngram_jaccard"]["jaccard"].append(j)

    schemas = {
        "fingerprint": pa.schema(
            [("corpus_key", pa.int64()), ("doc_id", pa.int64()), ("fingerprint", pa.int64())]
        ),
        "simhash": pa.schema(
            [("corpus_key", pa.int64()), ("doc_id", pa.int64()), ("simhash", pa.int64())]
        ),
        "lang_id": pa.schema(
            [("corpus_key", pa.int64()), ("doc_id", pa.int64()), ("pred_lang", pa.string())]
        ),
        "minhash_pairs": pa.schema(
            [("corpus_key", pa.int64()), ("a", pa.int64()), ("b", pa.int64())]
        ),
        "ngram_jaccard": pa.schema(
            [("corpus_key", pa.int64()), ("a", pa.int64()), ("b", pa.int64()),
             ("jaccard", pa.float64())]
        ),
        "embedding_neardup": pa.schema(
            [("corpus_key", pa.int64()), ("a", pa.int64()), ("b", pa.int64()),
             ("cosine", pa.float64())]
        ),
        "ivf_topk": pa.schema(
            [("corpus_key", pa.int64()), ("query_idx", pa.int64()),
             ("vec_id", pa.int64()), ("rank", pa.int64())]
        ),
        "media_features": pa.schema(
            [("corpus_key", pa.int64()), ("media_id", pa.int64()),
             ("kind", pa.string()), ("embedding", pa.list_(pa.float64()))]
        ),
        "compression": pa.schema(
            [("corpus_key", pa.int64()), ("doc_id", pa.int64()),
             ("n_bytes", pa.int64()), ("c_bytes", pa.int64()),
             ("ratio", pa.float64())]
        ),
        "frame_features": pa.schema(
            [("corpus_key", pa.int64()), ("media_id", pa.int64()),
             ("n_frames", pa.int64()), ("embedding", pa.list_(pa.float64()))]
        ),
        "pagerank": pa.schema(
            [("corpus_key", pa.int64()), ("node", pa.int64()),
             ("rank", pa.int64())]
        ),
        "kmeans": pa.schema(
            [("corpus_key", pa.int64()), ("cluster", pa.int64()),
             ("n_vecs", pa.int64()), ("c0", pa.float64())]
        ),
        "approx_users": pa.schema(
            [("corpus_key", pa.int64()), ("event_type", pa.string()),
             ("approx_users", pa.float64())]
        ),
        "approx_quantiles": pa.schema(
            [("corpus_key", pa.int64()), ("event_type", pa.string()),
             ("p50", pa.float64()), ("p90", pa.float64()), ("p99", pa.float64())]
        ),
        "media_resize": pa.schema(
            [("corpus_key", pa.int64()), ("media_id", pa.int64()),
             ("kind", pa.string()), ("out_w", pa.int32()),
             ("out_h", pa.int32()), ("thumb_hash", pa.int64())]
        ),
        "pca_top": pa.schema(
            [("corpus_key", pa.int64()), ("dim", pa.int64()),
             ("component", pa.float64()), ("eigenvalue", pa.float64())]
        ),
        "bpe_merges": pa.schema(
            [("corpus_key", pa.int64()), ("merge_idx", pa.int64()),
             ("left", pa.string()), ("right", pa.string()),
             ("n", pa.int64())]
        ),
    }
    for name, cols in rows.items():
        path = os.path.join(OUT_DIR, f"oracle_{name}.parquet")
        pq.write_table(pa.table(cols, schema=schemas[name]), path)
        print(f"wrote {path}: {len(cols['corpus_key'])} rows", file=sys.stderr)


if __name__ == "__main__":
    main()
