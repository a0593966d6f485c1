"""Codec round-trip property tests (FIXTURES.md F3 corpus)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from prom_tsdb_copyer_ray.codec import (
    decode_chunk,
    decode_timestamps,
    decode_values,
    encode_chunk,
    encode_timestamps,
    encode_values,
)

BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z


def roundtrip_ts(ts):
    ts = np.asarray(ts, dtype=np.int64)
    buf = encode_timestamps(ts)
    out = decode_timestamps(buf, len(ts))
    np.testing.assert_array_equal(out, ts)
    return buf


def roundtrip_vals(vals):
    vals = np.asarray(vals, dtype=np.float64)
    buf = encode_values(vals)
    out = decode_values(buf, len(vals))
    # bitwise equality (NaN payloads, -0.0)
    np.testing.assert_array_equal(out.view(np.uint64), vals.view(np.uint64))
    return buf


# --- F3 corpus cases -------------------------------------------------------

def test_empty():
    assert encode_timestamps(np.array([], dtype=np.int64)) == b""
    assert encode_values(np.array([], dtype=np.float64)) == b""
    assert len(decode_timestamps(b"", 0)) == 0
    assert len(decode_values(b"", 0)) == 0


def test_single_sample():
    roundtrip_ts([BASE_MS])
    roundtrip_vals([3.25])


def test_regular_cadence_compresses():
    # 15 s scrape cadence (README.md:62 scenario): after the first two deltas
    # every dod == 0 -> ~1 bit/sample
    ts = BASE_MS + 15_000 * np.arange(500, dtype=np.int64)
    buf = roundtrip_ts(ts)
    assert len(buf) < 8 + 4 + 500 // 8 + 8  # ~first + delta + 1bit/sample


def test_constant_values_compress():
    vals = np.full(500, 42.5)
    buf = roundtrip_vals(vals)
    assert len(buf) < 8 + 500 // 8 + 8


def test_irregular_cadence():
    rng = np.random.RandomState(7)
    deltas = rng.randint(1, 300_000, size=400)
    ts = BASE_MS + np.cumsum(deltas)
    roundtrip_ts(ts.astype(np.int64))


def test_large_deltas():
    roundtrip_ts([0, 1, 2**40, 2**40 + 5, 2**41])


def test_negative_and_zero_ts():
    roundtrip_ts([-1000, -5, 0, 3, 1000])


def test_special_floats():
    roundtrip_vals([0.0, -0.0, math.inf, -math.inf, math.nan, 1e-300, -1e300])
    # NaN with a payload
    payload_nan = np.array([0x7FF8_0000_DEAD_BEEF], dtype=np.uint64).view(np.float64)
    roundtrip_vals(np.concatenate([payload_nan, np.array([1.0]), payload_nan]))


def test_ramp_and_split_boundary():
    ts = BASE_MS + 60_000 * np.arange(121, dtype=np.int64)
    vals = np.linspace(0, 1, 121)
    tb, vb = encode_chunk(ts, vals)
    t2, v2 = decode_chunk(tb, vb, 121)
    np.testing.assert_array_equal(t2, ts)
    np.testing.assert_array_equal(v2.view(np.uint64), vals.view(np.uint64))


def test_length_mismatch_raises():
    with pytest.raises(ValueError):
        encode_chunk(np.array([1, 2]), np.array([1.0]))


# --- hypothesis properties -------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**52), max_value=2**52),
        min_size=0,
        max_size=300,
    )
)
def test_ts_roundtrip_property(deltas):
    ts = np.cumsum(np.asarray([BASE_MS] + deltas, dtype=np.int64))
    roundtrip_ts(ts)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=300,
    )
)
def test_vals_roundtrip_property(vals):
    roundtrip_vals(np.asarray(vals, dtype=np.float64))
