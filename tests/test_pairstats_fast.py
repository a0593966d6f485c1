"""Exactness + scale tests for the O(H log H) pair-statistics kernels
(`functions/pairstats.py`) that replaced the O(H^2) driver-side
comparison matrices (round-3 verdict item 3: H ~ 26k hours made the
H x H matrices ~0.7-5.4 GB per pair and the folds minutes-slow).

Two layers:
- randomized parity of every kernel against the quadratic definition
  (heavy ties included — the SAS rank conventions live on ties);
- a 26k-hour synthetic-grid budget test: the named pair family
  (hoeffding, dcor, mann_kendall, pettitt) each complete in <= 2 s,
  and sample_entropy stays memory-bounded (no H x H materialization).
"""
from __future__ import annotations

import time

import numpy as np
import pytest

from prom_tsdb_copyer_ray.functions.pairstats import (
    abs_dist_row_sums,
    abs_prod_pair_sum,
    bivariate_rank_counts,
    concordance_s,
    count_smaller_left,
    exact_dot,
    rank_lt_eq,
    sign_row_sums,
)


def test_kernels_match_quadratic_definitions():
    rng = np.random.default_rng(0)
    for trial in range(150):
        n = int(rng.integers(1, 600))
        lohi = int(rng.integers(2, 9))  # few distinct values -> many ties
        x = rng.integers(0, lohi, n).astype(np.int64)
        y = rng.integers(0, lohi, n).astype(np.int64)

        ref = np.array([int((y[:i] < y[i]).sum()) for i in range(n)],
                       np.int64)
        assert np.array_equal(count_smaller_left(y), ref)

        lt, eq = rank_lt_eq(x)
        assert np.array_equal(lt, (x[:, None] > x[None, :]).sum(1))
        assert np.array_equal(eq, (x[:, None] == x[None, :]).sum(1))

        assert np.array_equal(
            sign_row_sums(x), np.sign(x[:, None] - x[None, :]).sum(1))

        assert concordance_s(x) == int(
            np.triu(np.sign(x[None, :] - x[:, None]), 1).sum())

        lx = x[:, None] > x[None, :]
        ly = y[:, None] > y[None, :]
        ex = x[:, None] == x[None, :]
        ey = y[:, None] == y[None, :]
        c_ll, c_el, c_le, c_ee = bivariate_rank_counts(x, y)
        assert np.array_equal(c_ll, (lx & ly).sum(1))
        assert np.array_equal(c_el, (ex & ly).sum(1))
        assert np.array_equal(c_le, (lx & ey).sum(1))
        assert np.array_equal(c_ee, (ex & ey).sum(1) - 1)

        a = np.abs(x[:, None] - x[None, :])
        b = np.abs(y[:, None] - y[None, :])
        assert abs_prod_pair_sum(x, y) == int(np.triu(a * b, 1).sum())
        assert abs_prod_pair_sum(x, x) == int(np.triu(a * a, 1).sum())
        assert np.array_equal(abs_dist_row_sums(x), a.sum(1))


def test_exact_dot_large_values_and_fallback():
    rng = np.random.default_rng(1)
    # chunked int64 path
    u = rng.integers(0, 1 << 30, 500).astype(np.int64)
    v = rng.integers(0, 1 << 30, 500).astype(np.int64)
    assert exact_dot(u, v) == sum(int(a) * int(b) for a, b in zip(u, v))
    # bignum fallback path (products ~2^60-2^62; the sum needs bignums)
    u = rng.integers(1 << 29, 1 << 31, 400).astype(np.int64)
    v = rng.integers(1 << 29, 1 << 31, 400).astype(np.int64)
    assert exact_dot(u, v) == sum(int(a) * int(b) for a, b in zip(u, v))


def test_abs_prod_pair_sum_bignum_fallback():
    """Values beyond the count bound route to the exact object-dtype
    quadratic — still bit-exact."""
    rng = np.random.default_rng(2)
    x = rng.integers(1 << 22, 1 << 28, 250).astype(np.int64)
    y = rng.integers(1 << 22, 1 << 28, 250).astype(np.int64)
    a = np.abs(x[:, None].astype(object) - x[None, :].astype(object))
    b = np.abs(y[:, None].astype(object) - y[None, :].astype(object))
    assert abs_prod_pair_sum(x, y) == int(np.triu(a * b, 1).sum())


def _synthetic_grid(monkeypatch, h: int, n_types: int = 3, vmax: int = 500):
    import prom_tsdb_copyer_ray.pipelines.stats3 as s3
    import prom_tsdb_copyer_ray.pipelines.stats5 as s5

    rng = np.random.default_rng(7)
    series = {f"t{i}": rng.integers(0, vmax, h).astype(np.int64)
              for i in range(n_types)}
    fake = lambda sf: (series, h)  # noqa: E731
    monkeypatch.setattr(s3, "dense_hour_counts", fake)
    monkeypatch.setattr(s5, "dense_hour_counts", fake)
    return series, h


@pytest.mark.scale
def test_pair_family_under_budget_at_26k_hours(monkeypatch):
    """Round-3 verdict done-bar: the pair family <= 2 s each at a
    synthetic 26k-hour (3-year) grid.  Measured ~0.02-0.5 s on an idle
    32-cpu host — the 2 s bound leaves 4-40x load headroom."""
    import prom_tsdb_copyer_ray.pipelines.stats3 as s3
    import prom_tsdb_copyer_ray.pipelines.stats5 as s5

    _synthetic_grid(monkeypatch, 26280)
    for fn in (s5.q_hoeffding_d, s5.q_dcor,
               s3.q_mann_kendall, s3.q_pettitt):
        t0 = time.perf_counter()
        out = fn("unused-sf-dir")
        dt = time.perf_counter() - t0
        assert out.num_rows > 0
        assert dt <= 2.0, f"{fn.__name__} took {dt:.2f}s at H=26280"


@pytest.mark.scale
def test_sample_entropy_bounded_memory_at_26k_hours(monkeypatch):
    """SampEn keeps exact O(H^2) pair counting but must never
    materialize H x H (the old triu_indices path allocated ~5 GB at
    H=26k); with one type this completes in a few seconds in ~100 MB
    of block buffers."""
    import prom_tsdb_copyer_ray.pipelines.stats5 as s5

    _synthetic_grid(monkeypatch, 26280, n_types=1)
    out = s5.q_sample_entropy("unused-sf-dir").to_pandas()
    assert len(out) == 1
    assert out.loc[0, "b_cnt"] > 0


def test_pair_queries_bit_identical_on_grid(monkeypatch):
    """The fast kernels must reproduce the quadratic formulations
    bit-for-bit on a small grid — same floats, not approximately."""
    import prom_tsdb_copyer_ray.pipelines.stats3 as s3
    import prom_tsdb_copyer_ray.pipelines.stats5 as s5

    series, h = _synthetic_grid(monkeypatch, 240, n_types=4, vmax=6)
    n = h

    # quadratic Hoeffding reference (the pre-round-4 formulation)
    def brute_hoeffding(x, y):
        xl = (x[:, None] > x[None, :]).sum(1)
        xe = (x[:, None] == x[None, :]).sum(1)
        yl = (y[:, None] > y[None, :]).sum(1)
        ye = (y[:, None] == y[None, :]).sum(1)
        r2 = 2 * xl + xe + 1
        s2 = 2 * yl + ye + 1
        lx = x[:, None] > x[None, :]
        ly = y[:, None] > y[None, :]
        ex = x[:, None] == x[None, :]
        ey = y[:, None] == y[None, :]
        c_ll = (lx & ly).sum(1)
        c_el = (ex & ly).sum(1)
        c_le = (lx & ey).sum(1)
        c_ee = (ex & ey).sum(1) - 1
        q4 = 4 + 4 * c_ll + 2 * (c_el + c_le) + c_ee
        a1 = sum(int(q) * (int(q) - 4) for q in (q4 - 4))
        a2 = sum((int(r) - 2) * (int(r) - 4) * (int(s) - 2) * (int(s) - 4)
                 for r, s in zip(r2, s2))
        a3 = sum((int(r) - 4) * (int(s) - 4) * (int(q) - 4)
                 for r, s, q in zip(r2, s2, q4))
        num = 30 * ((n - 2) * (n - 3) * a1 + a2 - 2 * (n - 2) * a3)
        den = 16 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
        return round(float(num) / float(den), 6)

    got = s5.q_hoeffding_d("x").to_pandas()
    types = sorted(series)
    k = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            assert got.loc[k, "hoeffding_d"] == brute_hoeffding(
                series[ta], series[tb]), (ta, tb)
            k += 1

    # quadratic dcor reference
    def brute_dstats(x, y):
        a = np.abs(x[:, None] - x[None, :]).astype(object)
        b = np.abs(y[:, None] - y[None, :]).astype(object)
        p = int((a * b).sum())
        ra = a.sum(1)
        rb = b.sum(1)
        q = sum(int(u) * int(v) for u, v in zip(ra, rb))
        return n * n * p + int(ra.sum()) * int(rb.sum()) - 2 * n * q

    import math
    got = s5.q_dcor("x").to_pandas()
    k = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            x, y = series[ta], series[tb]
            nc = brute_dstats(x, y)
            vx = brute_dstats(x, x)
            vy = brute_dstats(y, y)
            ref = (0.0 if vx <= 0 or vy <= 0 or nc <= 0 else
                   math.sqrt(float(nc) / math.sqrt(float(vx) * float(vy))))
            assert got.loc[k, "dcor"] == round(ref, 6), (ta, tb)
            k += 1

    # mann-kendall S + pettitt K bit-parity
    got = s3.q_mann_kendall("x").to_pandas().set_index("event_type")
    for et, c in series.items():
        s_ref = int(np.triu(np.sign(c[None, :] - c[:, None]), 1).sum())
        assert int(got.loc[et, "s_stat"]) == s_ref
    got = s3.q_pettitt("x").to_pandas().set_index("event_type")
    for et, c in series.items():
        sgn = np.sign(c[:, None] - c[None, :]).astype(np.int64)
        u = np.cumsum(sgn.sum(1))[:-1]
        assert int(got.loc[et, "k_stat"]) == int(np.max(np.abs(u)))
