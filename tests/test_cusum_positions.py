"""Unit tests: CUSUM change-point extrema and generalized global positions."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _cusum_reference(keys, order, vals):
    out = {}
    bykey: dict = {}
    rows = sorted(range(len(keys)), key=lambda i: (keys[i], order[i]))
    for i in rows:
        bykey.setdefault(keys[i], []).append(vals[i])
    for k, vs in bykey.items():
        n = len(vs)
        s_n = sum(vs)
        s = 0
        best = 0
        for i, v in enumerate(vs, start=1):
            s += v
            best = max(best, abs(n * s - i * s_n))
        out[k] = (best, n)
    return out


@pytest.mark.parametrize("blocks", [1, 6])
def test_cusum_vs_reference(ray_session, blocks):
    import ray

    from prom_tsdb_copyer_ray.stages.keyed import cusum_extrema

    rng = np.random.default_rng(5)
    n = 2000
    keys = rng.integers(0, 25, n)
    order = rng.permutation(n).astype(np.int64)
    vals = rng.integers(-100, 100, n).astype(np.int64)
    # give key 0 a level shift so the statistic is meaningfully large
    shift = (keys == 0) & (order > np.median(order))
    vals[shift] += 500

    t = pa.table({"k": pa.array(keys), "o": pa.array(order), "v": pa.array(vals)})
    out = (
        cusum_extrema(ray.data.from_arrow(t).repartition(blocks),
                      ["k"], ["o"], "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = _cusum_reference(keys.tolist(), order.tolist(), vals.tolist())
    got = {r.k: (r.cusum_max, r.n_points) for r in out.itertuples()}
    assert got == want
    # shifted key's normalized statistic dominates a stable key's
    g0 = got[0][0] / (got[0][1] ** 2)
    others = [got[k][0] / (got[k][1] ** 2) for k in got if k != 0]
    assert g0 > np.median(others)


def test_cusum_single_point_key(ray_session):
    import ray

    from prom_tsdb_copyer_ray.stages.keyed import cusum_extrema

    t = pa.table({
        "k": pa.array([1, 2, 2], pa.int64()),
        "o": pa.array([0, 0, 1], pa.int64()),
        "v": pa.array([42, 10, 20], pa.int64()),
    })
    out = cusum_extrema(ray.data.from_arrow(t), ["k"], ["o"], "v").to_pandas()
    got = {r.k: (r.cusum_max, r.n_points) for r in out.itertuples()}
    # n=1: D_1 = 1*42 - 1*42 = 0
    assert got[1] == (0, 1)
    # n=2, v=[10,20]: D_1 = |2*10 - 1*30| = 10, D_2 = 0
    assert got[2] == (10, 2)


@pytest.mark.parametrize("blocks", [1, 8])
def test_global_positions(ray_session, blocks):
    import ray

    from prom_tsdb_copyer_ray.stages.curation import global_positions

    rng = np.random.default_rng(9)
    keys = rng.permutation(5000).astype(np.int64) - 2500  # unique, negatives too
    t = pa.table({"id": pa.array(np.arange(5000)), "key": pa.array(keys)})
    out = (
        global_positions(ray.data.from_arrow(t).repartition(blocks), "key")
        .to_pandas()
    )
    out = out.sort_values("key").reset_index(drop=True)
    assert out["pos"].tolist() == list(range(5000))
