"""Window alignment tests (FIXTURES.md F4; oracle = copyer.go:36-56 loop)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from prom_tsdb_copyer_ray.windows import (
    MS_1D,
    MS_1H,
    MS_5M,
    aligned_windows,
    window_start,
    window_start_np,
    ts_to_ms,
)


def oracle_windows(from_ms, to_ms, d_ms):
    """Direct transliteration of the reference loop semantics (test oracle)."""
    if d_ms == 0:
        return [(from_ms, to_ms)]
    start = d_ms * (from_ms // d_ms)
    end = start + d_ms - 1
    out = []
    while start <= to_ms:
        out.append((max(start, from_ms), min(end, to_ms)))
        start += d_ms
        end += d_ms
    return out


CASES = [
    (0, MS_1D - 1, MS_1D),            # exactly one aligned window
    (0, MS_1D, MS_1D),                # `to` lands on a window start -> 2 windows
    (500, 10_000, 3_600),             # from mid-window
    (7_200_000, 7_200_000, MS_1H),    # from == to -> single degenerate window
    (1_000, 999_999, 0),              # d == 0 -> single [from, to]
    (MS_1H - 1, MS_1H + 1, MS_1H),    # straddle boundary
    (1_704_067_200_000, 1_704_067_200_000 + 3 * MS_5M + 7, MS_5M),
]


@pytest.mark.parametrize("from_ms,to_ms,d_ms", CASES)
def test_matches_reference_loop(from_ms, to_ms, d_ms):
    assert aligned_windows(from_ms, to_ms, d_ms) == oracle_windows(from_ms, to_ms, d_ms)


def test_windows_tile_exactly():
    # property: clamped windows tile [from, to] with no gaps/overlaps
    from_ms, to_ms, d = 123_456, 999_999, 7_000
    ws = aligned_windows(from_ms, to_ms, d)
    assert ws[0][0] == from_ms and ws[-1][1] == to_ms
    for (s1, e1), (s2, _) in zip(ws, ws[1:]):
        assert s2 == e1 + 1
        assert e1 >= s1


def test_to_on_window_start_inclusive():
    # copyer.go:46 loop condition is `start <= to`: a `to` exactly on a window
    # start yields one extra single-ms window
    ws = aligned_windows(0, MS_1H, MS_1H)
    assert ws == [(0, MS_1H - 1), (MS_1H, MS_1H)]


def test_window_start_vectorized_matches_scalar():
    ts = np.array([0, 1, MS_5M - 1, MS_5M, MS_5M + 1, 10 * MS_5M + 17, 1_704_067_200_123])
    expected = (ts // MS_5M) * MS_5M
    np.testing.assert_array_equal(window_start_np(ts, MS_5M), expected)
    got = window_start(pa.array(ts), MS_5M)
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_window_start_rejects_nonpositive():
    with pytest.raises(ValueError):
        window_start(pa.array([1]), 0)


def test_ts_to_ms_units():
    t_us = pa.array([1_704_067_200_123_456], type=pa.timestamp("us"))
    assert ts_to_ms(t_us).to_pylist() == [1_704_067_200_123]
    t_ms = pa.array([5], type=pa.timestamp("ms"))
    assert ts_to_ms(t_ms).to_pylist() == [5]
