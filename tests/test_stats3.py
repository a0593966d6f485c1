"""Brute-force cross-checks for the session-12 hourly-count-grid
statistics (stats3.py): naive scalar loops over the dense series must
reproduce the census-path results exactly (ints) / to tolerance (z)."""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _rand_events(tmp_path, seed=31, n=4000):
    rng = np.random.default_rng(seed)
    # bursty: half the mass in a few hot hours, plus empty hours in-grid
    hot = rng.integers(0, 30, n // 2) * 24
    cold = rng.integers(0, 30 * 24, n - n // 2)
    hrs = np.concatenate([hot, cold])
    ts = hrs * 3_600_000 + rng.integers(0, 3_600_000, n)
    et = np.array(["click", "view", "error"])[rng.integers(0, 3, n)]
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(np.ones(n, np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    return et, hrs


def _dense(et, hrs):
    lo, hi = int(hrs.min()), int(hrs.max())
    out = {}
    for ty in np.unique(et):
        c = np.zeros(hi - lo + 1, np.int64)
        for h in hrs[et == ty]:
            c[int(h) - lo] += 1
        out[str(ty)] = c
    return out


def test_mann_kendall_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_mann_kendall

    et, hrs = _rand_events(tmp_path)
    got = q_mann_kendall(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    assert set(got["event_type"]) == set(dense)
    for _, r in got.iterrows():
        c = dense[r["event_type"]]
        n = len(c)
        s = sum(int(np.sign(c[j] - c[i]))
                for i in range(n) for j in range(i + 1, n))
        tie = sum(int(t) * (t - 1) * (2 * t + 5)
                  for t in np.unique(c, return_counts=True)[1])
        var_num = n * (n - 1) * (2 * n + 5) - tie
        assert int(r["s_stat"]) == s
        assert int(r["var_num"]) == var_num
        zref = ((s - 1) if s > 0 else (s + 1) if s < 0 else 0) \
            / math.sqrt(var_num / 18.0) if s != 0 else 0.0
        assert r["z"] == pytest.approx(zref, abs=1e-5)


def test_turning_points_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_turning_points

    et, hrs = _rand_events(tmp_path)
    got = q_turning_points(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]]
        t = sum(1 for i in range(1, len(c) - 1)
                if (c[i - 1] < c[i] > c[i + 1])
                or (c[i - 1] > c[i] < c[i + 1]))
        assert int(r["t_points"]) == t
        assert int(r["n_hours"]) == len(c)
        h = len(c)
        zref = (t - 2.0 * (h - 2) / 3.0) / math.sqrt((16.0 * h - 29.0) / 90.0)
        assert r["z"] == pytest.approx(zref, abs=1e-5)


def test_allan_variance_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_allan_variance

    et, hrs = _rand_events(tmp_path)
    got = q_allan_variance(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    assert len(got) == 3 * len(dense)
    for _, r in got.iterrows():
        c = dense[r["event_type"]]
        tau = int(r["tau"])
        m = len(c) // tau
        # naive: Allan variance over window MEANS (float reference)
        y = [c[i * tau:(i + 1) * tau].mean() for i in range(m)]
        ref = sum((y[i + 1] - y[i]) ** 2 for i in range(m - 1)) / (2 * (m - 1))
        assert int(r["m_windows"]) == m
        assert r["avar"] == pytest.approx(ref, abs=5e-7)  # query rounds to 6dp
