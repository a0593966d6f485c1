"""FP-rate-bounded Bloom sizing for the ngram-escalation prefilter
(round-3 ADVICE item 4 / round-4 verdict item 4).

The escalation path (`_shingle_rows_sharded`) prunes documents against a
Bloom filter of candidate-pair ids before computing + shipping shingle
payloads.  A fixed-size bitmap lets the FP rate grow with the candidate
count, making non-candidate docs do work for nothing; the sizing must
scale with the candidate count so the FP rate stays bounded at any
escalation scale.
"""

import numpy as np
import pyarrow as pa
import pytest

from prom_tsdb_copyer_ray.stages.dedup import _bloom_bits_for


def test_floor_cap_and_power_of_two():
    assert _bloom_bits_for(None) == 1 << 24
    assert _bloom_bits_for(0) == 1 << 24
    assert _bloom_bits_for(100) == 1 << 24
    # cap: never ships more than a 128 MB bitmap
    assert _bloom_bits_for(10**9) == 1 << 30
    for n in (10_000, 1_000_000, 20_000_000, 10**9):
        bits = _bloom_bits_for(n)
        assert bits & (bits - 1) == 0, "build_bloom requires power of two"


def test_bits_scale_with_candidate_count():
    """At two escalation scales an order of magnitude apart, the bitmap
    grows so that bits-per-id stays >= 20 (4 hashes -> theoretical FP
    ~0.1%) — the round-4 fixed 1<<24 would be 0.4 bits/id at 20M pairs."""
    for n_cand in (2_000_000, 20_000_000):  # 2M and 20M candidate pairs
        bits = _bloom_bits_for(n_cand)
        n_ids = 2 * n_cand  # <= 2 distinct ids per pair
        assert bits >= 20 * n_ids, (n_cand, bits)
        assert bits <= 80 * n_ids  # not absurdly oversized either
    assert _bloom_bits_for(20_000_000) > _bloom_bits_for(2_000_000)
    # the old fixed bitmap is demonstrably under-sized at the big scale
    assert (1 << 24) / (2 * 20_000_000) < 1


@pytest.mark.parametrize("n_ids", [5_000, 50_000])
def test_empirical_fp_rate_bounded_at_two_scales(ray_session, n_ids):
    """Build the actual filter over candidate ids at two scales and probe
    with disjoint non-member ids: measured FP rate must stay < 1% at both
    (with the sizing, FP is scale-independent; without it, it grows)."""
    import ray.data

    from prom_tsdb_copyer_ray.stages.joins import bloom_mask, build_bloom

    n_pairs = n_ids // 2
    ids = np.arange(n_ids, dtype=np.int64)
    cand = ray.data.from_arrow(pa.table({
        "a": pa.array(ids[:n_pairs]),
        "b": pa.array(ids[n_pairs:]),
    }))
    bits = _bloom_bits_for(n_pairs)
    words = (build_bloom(cand, "a", num_bits=bits)
             | build_bloom(cand, "b", num_bits=bits))
    probes = pa.array(np.arange(n_ids, n_ids + 100_000, dtype=np.int64))
    fp = float(np.mean(bloom_mask(probes, words)))
    assert fp < 0.01, (n_ids, bits, fp)
    # members are always present (no false negatives)
    assert bool(np.all(bloom_mask(pa.array(ids), words)))
