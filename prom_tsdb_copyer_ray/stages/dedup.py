"""Deduplication operators over a documents table (training-data pipeline).

Beyond the reference's sample-level overlap dedup (``compact.go:37``), a
web-scale training pipeline needs document-level dedup.  All operators here
are Ray-Data-first:

* :func:`exact_dedup` — hash-partition on a content hash, keep the min-id
  row per hash (a groupby-aggregate, no row loops).
* :func:`minhash_lsh_pairs` / :func:`minhash_lsh_dedup` — shingle ->
  MinHash signature (actor-pool stage, hasher built once per actor) ->
  LSH band explosion -> groupby((band, band_hash)) -> candidate pairs ->
  optional exact-Jaccard verification.  The band groupby is the only
  shuffle, and it moves (band_hash, doc_id) rows, never documents.
* :func:`simhash_dedup` — 64-bit SimHash; near-dups = equal high-k prefix
  buckets then Hamming<=h verification within bucket.
* :func:`ngram_jaccard_pairs` — exact n-gram Jaccard over LSH candidates
  (the verification leg; never all-pairs at scale).
* :func:`embedding_neardup_pairs` — cosine near-dup over an embedding
  column; brute-force per-batch matmul against a broadcast matrix at small
  scale, LSH-bucketed (random hyperplanes) at large scale.

Determinism: all hashes are process-independent (functions/hashing.py), all
pair outputs are (min_id, max_id)-ordered and de-duplicated.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (
    MinHasher,
    char_ngram_hashes,
    jaccard,
    poly_hash_column,
    popcount64,
    simhash64,
)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text", out_col: str = "content_hash") -> pa.Table:
    """int64 content hash + byte-length columns, fully vectorized.

    One O(total_bytes) buffer pass (``poly_hash_column``), no per-row Python.
    A companion ``n_bytes`` column rides along as an independent cheap
    discriminator: dedup keys use (hash, length), which keeps accidental
    64-bit birthday collisions from merging distinct documents unless they
    also agree on length (poly_hash_column docstring)."""
    hashes = poly_hash_column(batch[text_col]).astype(np.int64)
    nbytes = pc.cast(pc.binary_length(pc.fill_null(batch[text_col], "")), pa.int64())
    return batch.append_column(out_col, pa.array(hashes)).append_column("n_bytes", nbytes)


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep exactly one row (min id) per distinct text: hash -> groupby -> min.

    Returns a Dataset of ``(content_hash, n_bytes, doc_id)`` winners.  The
    groupby shuffles only (hash, len, id) triples — documents themselves
    never move; callers re-join winners to content via the id (broadcast or
    second pass).
    """
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col).select(["content_hash", "n_bytes", id_col]),
        batch_format="pyarrow",
    )
    return hashed.groupby(["content_hash", "n_bytes"]).aggregate(Min(id_col, alias_name=id_col))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHashSignatures:
    """Actor-pool stage: documents batch -> LSH band rows.

    Emits ``num_bands`` rows per document: (band, band_hash, doc_id).
    Hasher state (the k permutations) is built once per actor.
    """

    def __init__(self, num_perm: int = 128, num_bands: int = 32, ngram: int = 5,
                 id_col: str = "doc_id", text_col: str = "text") -> None:
        self.mh = MinHasher(num_perm=num_perm)
        self.num_bands = num_bands
        self.ngram = ngram
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        n = len(ids)
        bands = np.empty(n * self.num_bands, dtype=np.int32)
        bhashes = np.empty(n * self.num_bands, dtype=np.int64)
        out_ids = np.empty(n * self.num_bands, dtype=np.int64)
        for i, (did, text) in enumerate(zip(ids, texts)):
            sig = self.mh.signature(char_ngram_hashes(text or "", self.ngram))
            bh = self.mh.band_hashes(sig, self.num_bands)
            lo = i * self.num_bands
            bands[lo : lo + self.num_bands] = np.arange(self.num_bands)
            bhashes[lo : lo + self.num_bands] = np.array(bh, dtype=np.uint64).astype(np.int64)
            out_ids[lo : lo + self.num_bands] = did
        return pa.table(
            {"band": pa.array(bands), "band_hash": pa.array(bhashes), "doc_id": pa.array(out_ids)}
        )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """All (a<b) pairs within one LSH bucket (buckets are small by design)."""
    ids = np.unique(group["doc_id"].to_numpy())
    if len(ids) < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pa.table({"a": pa.array(ids[ia]), "b": pa.array(ids[ib])})


def minhash_lsh_pairs(ds, num_perm: int = 128, num_bands: int = 32, ngram: int = 5,
                      id_col: str = "doc_id", text_col: str = "text", concurrency=(1, 8)):
    """Candidate near-dup pairs via MinHash+LSH; distinct (a<b) pairs."""
    band_rows = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, num_bands=num_bands, ngram=ngram,
            id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    # distinct pairs (a pair can surface in several bands)
    from ray.data.aggregate import Count

    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands")).select_columns(["a", "b"])


def verify_pairs_jaccard(pairs_table: pa.Table, texts_by_id: dict[int, str],
                         ngram: int = 5, threshold: float = 0.8) -> pa.Table:
    """Exact n-gram Jaccard verification of candidate pairs (driver-side or
    inside map_batches with a broadcast text lookup for small corpora)."""
    a = pairs_table["a"].to_pylist()
    b = pairs_table["b"].to_pylist()
    keep_a, keep_b, sims = [], [], []
    cache: dict[int, np.ndarray] = {}

    def sh(i: int) -> np.ndarray:
        if i not in cache:
            cache[i] = char_ngram_hashes(texts_by_id.get(i, ""), ngram)
        return cache[i]

    for x, y in zip(a, b):
        sim = jaccard(sh(x), sh(y))
        if sim >= threshold:
            keep_a.append(x)
            keep_b.append(y)
            sims.append(sim)
    return pa.table(
        {"a": pa.array(keep_a, pa.int64()), "b": pa.array(keep_b, pa.int64()),
         "jaccard": pa.array(sims, pa.float64())}
    )


def ngram_jaccard_pairs(ds, threshold: float = 0.8, ngram: int = 5,
                        id_col: str = "doc_id", text_col: str = "text", **lsh_kw):
    """Near-dup pairs with exact n-gram Jaccard >= threshold.

    LSH generates candidates (no all-pairs), then each bucket's pairs are
    verified with exact Jaccard inside the same grouped stage — the document
    texts ride along in the band rows only as shingle-hash arrays.
    """
    num_bands = lsh_kw.get("num_bands", 32)
    num_perm = lsh_kw.get("num_perm", 128)

    class BandRowsWithShingles:
        def __init__(self) -> None:
            self.mh = MinHasher(num_perm=num_perm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_pylist()
            texts = batch[text_col].to_pylist()
            bands, bhashes, out_ids, shingles = [], [], [], []
            for did, text in zip(ids, texts):
                h = char_ngram_hashes(text or "", ngram)
                sig = self.mh.signature(h)
                hb = h.astype(np.int64).tobytes()
                for band, bh in enumerate(self.mh.band_hashes(sig, num_bands)):
                    bands.append(band)
                    bhashes.append(np.int64(np.uint64(bh)))
                    out_ids.append(did)
                    shingles.append(hb)
            return pa.table(
                {
                    "band": pa.array(bands, pa.int32()),
                    "band_hash": pa.array(bhashes, pa.int64()),
                    "doc_id": pa.array(out_ids, pa.int64()),
                    "shingles": pa.array(shingles, pa.binary()),
                }
            )

    def bucket_verified_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        uniq, first_idx = np.unique(ids, return_index=True)
        if len(uniq) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        sh = {int(ids[i]): np.frombuffer(group["shingles"][int(i)].as_py(), dtype=np.int64).view(np.uint64)
              for i in first_idx}
        keep_a, keep_b, sims = [], [], []
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                sim = jaccard(sh[int(uniq[i])], sh[int(uniq[j])])
                if sim >= threshold:
                    keep_a.append(int(uniq[i]))
                    keep_b.append(int(uniq[j]))
                    sims.append(sim)
        return pa.table({"a": pa.array(keep_a, pa.int64()), "b": pa.array(keep_b, pa.int64()),
                         "jaccard": pa.array(sims, pa.float64())})

    band_rows = ds.map_batches(BandRowsWithShingles, batch_format="pyarrow",
                               concurrency=lsh_kw.get("concurrency", (1, 8)))
    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(
        bucket_verified_pairs, batch_format="pyarrow"
    )
    from ray.data.aggregate import Max

    return pairs.groupby(["a", "b"]).aggregate(Max("jaccard", alias_name="jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHashStage:
    """Actor-pool stage: add a 64-bit SimHash column (int64, bit-preserved)."""

    def __init__(self, ngram: int = 5, id_col: str = "doc_id", text_col: str = "text") -> None:
        self.ngram = ngram
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sims = np.array(
            [np.uint64(simhash64(char_ngram_hashes(t or "", self.ngram))).astype(np.int64)
             for t in batch[self.text_col].to_pylist()],
            dtype=np.int64,
        )
        return pa.table({self.id_col: batch[self.id_col], "simhash": pa.array(sims)})


def simhash_dedup(ds, prefix_bits: int = 16, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text", concurrency=(1, 8)):
    """Near-dup pairs by SimHash: bucket on the high ``prefix_bits``, verify
    Hamming distance <= ``max_hamming`` within buckets."""
    hashed = ds.map_batches(
        SimHashStage, fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow", concurrency=concurrency,
    )

    shift = 64 - prefix_bits

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy().astype(np.uint64)
        return batch.append_column("bucket", pa.array((h >> np.uint64(shift)).astype(np.int64)))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        hs = group["simhash"].to_numpy().astype(np.uint64)
        uniq, idx = np.unique(ids, return_index=True)
        hs = hs[idx]
        a_out, b_out, d_out = [], [], []
        for i in range(len(uniq)):
            x = hs[i] ^ hs[i + 1 :]
            ham = popcount64(x)
            for j in np.flatnonzero(ham <= max_hamming):
                a_out.append(int(uniq[i]))
                b_out.append(int(uniq[i + 1 + j]))
                d_out.append(int(ham[j]))
        return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64()),
                         "hamming": pa.array(d_out, pa.int64())})

    return (
        hashed.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(ds, threshold: float = 0.95, id_col: str = "vec_id",
                            vec_col: str = "embedding", num_planes: int = 8, seed: int = 7):
    """Cosine near-dup pairs over an embedding column.

    Scale path: bucket by random-hyperplane LSH sign pattern (``num_planes``
    bits), exact cosine only within buckets.  Exact for pairs that share a
    bucket; standard LSH recall tradeoff otherwise (raise ``num_planes``=0 to
    force a single bucket = exact all-pairs, viable only at small scale).
    """
    def add_bucket(batch: pa.Table) -> pa.Table:
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col].to_pylist()])
        rng = np.random.RandomState(seed)
        planes = rng.randn(vecs.shape[1], num_planes) if num_planes else None
        if num_planes:
            signs = (vecs @ planes) > 0
            bucket = signs @ (1 << np.arange(num_planes))
        else:
            bucket = np.zeros(len(vecs), dtype=np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(bucket.astype(np.int64)),
                "vec": pa.array([v.tobytes() for v in vecs], pa.binary()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        uniq, idx = np.unique(ids, return_index=True)
        vecs = np.stack(
            [np.frombuffer(group["vec"][int(i)].as_py(), dtype=np.float64) for i in idx]
        )
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        sim = unit @ unit.T
        ia, ib = np.triu_indices(len(uniq), k=1)
        mask = sim[ia, ib] >= threshold
        return pa.table(
            {
                "a": pa.array(uniq[ia[mask]], pa.int64()),
                "b": pa.array(uniq[ib[mask]], pa.int64()),
                "cosine": pa.array(sim[ia, ib][mask], pa.float64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
