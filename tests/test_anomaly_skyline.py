"""Unit tests for the session-7 operators: rolling k-sigma outliers,
Pareto skyline, and the decile/histogram/PMI query kernels — each against
an independent sequential reference, with multi-block invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _sigma_reference(keys, order, vals, window, k):
    """Sequential per-key rolling mean/var outlier rule (pure Python)."""
    rows = sorted(range(len(keys)), key=lambda i: (keys[i], order[i]))
    flags = [False] * len(keys)
    hist: dict = {}
    for i in rows:
        buf = hist.setdefault(keys[i], [])
        buf.append(vals[i])
        frame = buf[-window:]
        n = len(frame)
        s = sum(frame)
        q = sum(v * v for v in frame)
        dev = vals[i] * n - s
        flags[i] = dev * dev > k * k * (n * q - s * s)
    return flags


@pytest.mark.parametrize("blocks", [1, 7])
def test_rolling_sigma_vs_reference(ray_session, blocks):
    import ray

    from prom_tsdb_copyer_ray.stages.windowed import rolling_sigma_outliers

    rng = np.random.default_rng(11)
    n = 3000
    keys = rng.integers(0, 40, n)
    order = rng.permutation(n).astype(np.int64)  # unique → total order
    vals = rng.integers(-500, 500, n).astype(np.int64)
    # inject blatant spikes so both paths flag something
    spike = rng.choice(n, 60, replace=False)
    vals[spike] += 50_000

    t = pa.table({"k": pa.array(keys), "o": pa.array(order), "v": pa.array(vals)})
    out = (
        rolling_sigma_outliers(
            ray.data.from_arrow(t).repartition(blocks), ["k"], ["o"], "v",
            window=16, k=3,
        )
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    ref = _sigma_reference(keys.tolist(), order.tolist(), vals.tolist(), 16, 3)
    ref_sorted = [
        ref[i] for i in sorted(range(n), key=lambda i: (keys[i], order[i]))
    ]
    assert out["is_anomaly"].tolist() == ref_sorted
    assert out["is_anomaly"].sum() > 0  # the spikes fired


def test_rolling_sigma_edge_cases(ray_session):
    import ray

    from prom_tsdb_copyer_ray.stages.windowed import rolling_sigma_outliers

    # singleton frame: never anomalous; constant series: never anomalous
    t = pa.table({
        "k": pa.array([1, 2, 2, 2, 3, 3], pa.int64()),
        "o": pa.array([0, 0, 1, 2, 0, 1], pa.int64()),
        "v": pa.array([99, 5, 5, 5, 0, 1000], pa.int64()),
    })
    out = (
        rolling_sigma_outliers(ray.data.from_arrow(t), ["k"], ["o"], "v",
                               window=4, k=3)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    # window=4 < k*k+1: max frame z-score sqrt(3) < 3, nothing CAN flag
    assert out["is_anomaly"].tolist() == [False] * 6


def _skyline_reference(pts):
    out = []
    for a in pts:
        dominated = any(
            b[0] >= a[0] and b[1] >= a[1] and (b[0] > a[0] or b[1] > a[1])
            for b in pts
        )
        if not dominated:
            out.append(a)
    return sorted(out)


@pytest.mark.parametrize("blocks", [1, 9])
def test_pareto_skyline_vs_bruteforce(ray_session, blocks):
    import ray

    from prom_tsdb_copyer_ray.stages.keyed import pareto_skyline

    rng = np.random.default_rng(7)
    x = rng.integers(0, 60, 800).astype(np.int64)
    y = rng.integers(0, 60, 800).astype(np.int64)
    t = pa.table({"id": pa.array(np.arange(800)), "x": pa.array(x), "y": pa.array(y)})
    out = (
        pareto_skyline(ray.data.from_arrow(t).repartition(blocks), "x", "y")
        .to_pandas()
    )
    got = sorted(zip(out["x"].tolist(), out["y"].tolist()))
    want = _skyline_reference(list(zip(x.tolist(), y.tolist())))
    assert got == want


def test_pareto_skyline_duplicates_survive(ray_session):
    import ray

    from prom_tsdb_copyer_ray.stages.keyed import pareto_skyline

    # two coordinate-equal frontier points: neither strictly dominates the
    # other, so BOTH survive (SQL NOT-EXISTS semantics)
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "x": pa.array([10, 10, 5, 1], pa.int64()),
        "y": pa.array([10, 10, 5, 20], pa.int64()),
    })
    out = pareto_skyline(ray.data.from_arrow(t), "x", "y").to_pandas()
    got = sorted(zip(out["x"].tolist(), out["y"].tolist()))
    assert got == [(1, 20), (10, 10), (10, 10)]


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _points(draw, max_n=120):
    n = draw(st.integers(0, max_n))
    xs = draw(st.lists(st.integers(-30, 30), min_size=n, max_size=n))
    ys = draw(st.lists(st.integers(-30, 30), min_size=n, max_size=n))
    return xs, ys


def _sky_tbl(xs, ys):
    return pa.table({
        "x": pa.array(xs, pa.int64()),
        "y": pa.array(ys, pa.int64()),
    })


@settings(max_examples=120, deadline=None)
@given(_points())
def test_skyline_kernel_matches_bruteforce(pts):
    from prom_tsdb_copyer_ray.stages.keyed import skyline_table

    xs, ys = pts
    out = skyline_table(_sky_tbl(xs, ys), "x", "y")
    got = sorted(zip(out["x"].to_pylist(), out["y"].to_pylist()))
    want = _skyline_reference(list(zip(xs, ys)))
    assert got == want


@settings(max_examples=120, deadline=None)
@given(_points(), st.integers(0, 120))
def test_skyline_semilattice(pts, cut):
    """sky(A ∪ B) == sky(sky(A) ∪ sky(B)) — the property the distributed
    local-frontier combiner relies on, for ANY split point."""
    from prom_tsdb_copyer_ray.stages.keyed import skyline_table

    xs, ys = pts
    cut = min(cut, len(xs))
    whole = skyline_table(_sky_tbl(xs, ys), "x", "y")
    a = skyline_table(_sky_tbl(xs[:cut], ys[:cut]), "x", "y")
    b = skyline_table(_sky_tbl(xs[cut:], ys[cut:]), "x", "y")
    merged = skyline_table(pa.concat_tables([a, b]), "x", "y")
    assert sorted(zip(whole["x"].to_pylist(), whole["y"].to_pylist())) == \
        sorted(zip(merged["x"].to_pylist(), merged["y"].to_pylist()))
