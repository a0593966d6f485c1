"""Sliding-window aggregate and as-of join operator tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_sliding_window_sum(ray_session):
    import ray.data

    from prom_tsdb_copyer_ray.stages.windowed import sliding_window_sum

    t = pa.table(
        {
            "k": ["a"] * 5 + ["b"] * 2,
            "window_start": [0, 300_000, 600_000, 3_600_000, 3_900_000, 0, 3_600_000],
            "n": [1, 2, 3, 4, 5, 10, 20],
        }
    )
    out = (
        sliding_window_sum(ray.data.from_arrow(t), ["k"], value_col="n", trail_ms=3_600_000)
        .to_pandas()
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    # trailing 1h (inclusive): at 3_600_000 window 0 has fallen out; at
    # 3_900_000 window 300_000 has fallen out too
    assert out[out["k"] == "a"]["sliding_sum"].tolist() == [1, 3, 6, 2 + 3 + 4, 3 + 4 + 5]
    assert out[out["k"] == "b"]["sliding_sum"].tolist() == [10, 20]


def test_asof_join(ray_session):
    import ray.data

    from prom_tsdb_copyer_ray.stages.windowed import asof_join

    left = pa.table(
        {
            "user_id": [1, 1, 1, 2, 3],
            "ts_ms": [100, 250, 50, 500, 10],
            "event_id": [10, 11, 12, 20, 30],
        }
    )
    right = pa.table(
        {
            "user_id": [1, 1, 2],
            "ts_ms": [100, 200, 400],
            "value": [1.5, 2.5, 9.0],
        }
    )
    out = (
        asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right), ["user_id"],
            left_ts="ts_ms", right_ts="ts_ms", right_value_cols=["value"],
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event 12 (ts 50 < first error) and user 3 (no right rows) drop out
    assert out["event_id"].tolist() == [10, 11, 20]
    assert out["_r_ts"].tolist() == [100, 200, 400]  # ties: ts<=ts matches
    np.testing.assert_allclose(out["value_right"].tolist(), [1.5, 2.5, 9.0])


def test_range_join_matches_bruteforce(ray_session):
    """range_join == nested-loop interval join on a synthetic corpus with
    multi-match, boundary-inclusive, bucket-spanning and no-match cases."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from prom_tsdb_copyer_ray.stages.windowed import range_join

    rng = np.random.RandomState(5)
    n_l, n_r = 500, 60
    BUCKET = 3_600_000
    lkey = rng.randint(0, 12, n_l).astype(np.int64)
    lts = rng.randint(0, 24 * BUCKET, n_l).astype(np.int64)
    left = pa.table({"user_id": pa.array(lkey), "event_id": pa.array(np.arange(n_l)),
                     "ts_ms": pa.array(lts)})
    rkey = rng.randint(0, 12, n_r).astype(np.int64)
    rs = rng.randint(0, 24 * BUCKET, n_r).astype(np.int64)
    # interval lengths from zero to multi-bucket
    re_ = rs + rng.randint(0, 3 * BUCKET, n_r)
    right = pa.table({"user_id": pa.array(rkey), "s": pa.array(rs), "e": pa.array(re_),
                      "iid": pa.array(np.arange(n_r))})
    # force exact boundary matches
    lts[0] = rs[0]; lkey[0] = rkey[0]
    lts[1] = re_[1]; lkey[1] = rkey[1]
    left = pa.table({"user_id": pa.array(lkey), "event_id": pa.array(np.arange(n_l)),
                     "ts_ms": pa.array(lts)})

    got = range_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        key_col="user_id", left_ts="ts_ms", right_start="s", right_end="e",
        right_id_col="iid", bucket_ms=BUCKET,
    ).to_pandas()

    want_rows = []
    for i in range(n_l):
        for j in range(n_r):
            if lkey[i] == rkey[j] and rs[j] <= lts[i] <= re_[j]:
                want_rows.append((int(lkey[i]), i, int(lts[i]), j))
    want = pd.DataFrame(want_rows, columns=["user_id", "event_id", "ts_ms", "iid_right"])
    key = ["user_id", "event_id", "iid_right"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w) > 50
    pd.testing.assert_frame_equal(g[sorted(g.columns)], w[sorted(w.columns)], check_dtype=False)


def test_counter_increase_fuzz(ray_session):
    """counter_increase vs a per-key pandas reference: resets, duplicate
    windows, single-sample keys, multi-block input."""
    import pandas as pd
    import ray.data

    from prom_tsdb_copyer_ray.stages.windowed import counter_increase

    rng = np.random.default_rng(7)
    n, wms = 600, 300_000
    keys = rng.integers(0, 25, n)  # some keys get 1 sample, some many
    ts = rng.integers(0, 40, n).astype(np.int64) * 60_000 + rng.integers(0, 60_000, n)
    order = rng.permutation(n).astype(np.int64)
    # counter-ish values with injected resets
    vals = np.cumsum(rng.random(n) * 10.0)
    reset_mask = rng.random(n) < 0.15
    vals[reset_mask] = rng.random(reset_mask.sum()) * 5.0
    t = pa.table({
        "k": pa.array([f"s{k}" for k in keys]),
        "tms": pa.array(ts, pa.int64()),
        "oid": pa.array(order, pa.int64()),
        "value": pa.array(vals, pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(7)
    got = (
        counter_increase(ds, ["k"], "tms", ["oid"], "value", wms)
        .to_pandas()
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )

    df = t.to_pandas().sort_values(["k", "tms", "oid"]).reset_index(drop=True)
    df["prev"] = df.groupby("k")["value"].shift(1)
    df = df[df["prev"].notna()].copy()
    df["adj"] = np.where(df["value"] >= df["prev"], df["value"] - df["prev"], df["value"])
    df["window_start"] = (df["tms"] // wms) * wms
    want = (
        df.groupby(["k", "window_start"], as_index=False)
        .agg(n_deltas=("adj", "size"), increase=("adj", "sum"))
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == want["k"].tolist()
    assert got["window_start"].tolist() == want["window_start"].tolist()
    assert got["n_deltas"].tolist() == want["n_deltas"].tolist()
    np.testing.assert_allclose(got["increase"], want["increase"], rtol=1e-9)


def test_merge_intervals_islands(ray_session):
    """Transitive overlaps merge (a covers b which touches c), touching
    endpoints merge, gaps split; multi-block invariance."""
    import ray.data

    from prom_tsdb_copyer_ray.stages.windowed import merge_intervals

    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 1, 2, 2], pa.int64()),
        "s": pa.array([0, 5, 10, 10, 40, 0, 100], pa.int64()),
        "e": pa.array([20, 8, 30, 12, 50, 1, 101], pa.int64()),
    })
    # k=1: [0,20]+[5,8]+[10,30]+[10,12] -> [0,30] (4); [40,50] (1)
    # k=2: [0,1] and [100,101] separate
    for nparts in (1, 4):
        out = (
            merge_intervals(
                ray.data.from_arrow(t).repartition(nparts), ["k"], "s", "e"
            ).to_pandas().sort_values(["k", "start"]).reset_index(drop=True)
        )
        assert out.values.tolist() == [
            [1, 0, 30, 4], [1, 40, 50, 1], [2, 0, 1, 1], [2, 100, 101, 1],
        ]


def test_merge_intervals_touching(ray_session):
    """s == running max end merges (SQL s > pm starts new)."""
    import ray.data

    from prom_tsdb_copyer_ray.stages.windowed import merge_intervals

    t = pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "s": pa.array([0, 10, 21], pa.int64()),
        "e": pa.array([10, 20, 30], pa.int64()),
    })
    out = (
        merge_intervals(ray.data.from_arrow(t), ["k"], "s", "e")
        .to_pandas().sort_values("start").values.tolist()
    )
    assert out == [[1, 0, 20, 2], [1, 21, 30, 1]]


def test_rolling_quantile_vs_pandas(ray_session):
    """Moving median over ROWS frames with total (order, value) ordering;
    partial leading windows; multi-block invariance; fuzz vs pandas."""
    import ray.data

    from prom_tsdb_copyer_ray.stages.windowed import rolling_quantile

    rng = np.random.default_rng(59)
    n = 3000
    t = pa.table({
        "k": pa.array(rng.integers(0, 40, n).astype(np.int64)),
        "o": pa.array(rng.integers(0, 200, n).astype(np.int64)),
        "v": pa.array(rng.integers(-500, 500, n).astype(np.int64)),
    })
    out = (
        rolling_quantile(ray.data.from_arrow(t).repartition(9),
                         ["k"], "o", "v", window=5, q=0.5, out_col="m")
        .to_pandas().sort_values(["k", "o", "v", "m"]).reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["k", "o", "v"])
    want = (
        df.groupby("k")["v"].rolling(5, min_periods=1).median()
        .reset_index(level=0, drop=True)
    )
    df["m"] = want
    df = df.sort_values(["k", "o", "v", "m"]).reset_index(drop=True)
    assert np.allclose(out["m"].values, df["m"].values)
    assert (out[["k", "o", "v"]].values == df[["k", "o", "v"]].values).all()


def test_watermark_window_counts_vs_reference(ray_session):
    """Dataflow-style watermark replay: late events (ts < running max before
    arrival - lateness) dropped, survivors counted per tumbling window;
    multi-block invariance vs a sequential reference."""
    import ray.data

    from prom_tsdb_copyer_ray.stages.windowed import watermark_window_counts

    rng = np.random.default_rng(127)
    n = 2000
    # arrival ids 0..n-1; event times mostly increasing with jitter and a
    # few extreme stragglers
    tms = np.cumsum(rng.integers(0, 100, n)).astype(np.int64)
    jitter = rng.integers(-300, 300, n)
    tms = tms + jitter
    tms[rng.random(n) < 0.02] -= 5000  # deep stragglers, definitely late
    keys = np.array([f"k{x}" for x in rng.integers(0, 3, n)])
    t = pa.table({
        "aid": pa.array(np.arange(n, dtype=np.int64)),
        "tms": pa.array(tms, pa.int64()),
        "k": pa.array(keys),
    })
    out = (
        watermark_window_counts(ray.data.from_arrow(t).repartition(11),
                                "aid", "tms", ["k"],
                                window_ms=500, lateness_ms=400)
        .to_pandas().set_index(["k", "window_start"])["n"]
    )
    want: dict[tuple[str, int], int] = {}
    wm = None
    for i in range(n):
        if wm is None or tms[i] >= wm - 400:
            w = (int(tms[i]) // 500) * 500
            want[(keys[i], w)] = want.get((keys[i], w), 0) + 1
        wm = int(tms[i]) if wm is None else max(wm, int(tms[i]))
    assert out.to_dict() == want


def test_sliding_distinct_vs_bruteforce(ray_session):
    """Exact trailing-window distinct count at every present day; sparse
    activity with gaps; multi-block invariance."""
    import ray.data

    from prom_tsdb_copyer_ray.stages.windowed import sliding_distinct

    rng = np.random.default_rng(131)
    n = 3000
    t = pa.table({
        "u": pa.array(rng.integers(0, 80, n).astype(np.int64)),
        "day": pa.array(rng.choice(
            np.r_[np.arange(0, 20), np.arange(40, 55)], n).astype(np.int64)),
    })
    out = sliding_distinct(
        ray.data.from_arrow(t).repartition(9), "u", "day", window=7
    ).to_pandas().set_index("d0")["n_active"]
    df = t.to_pandas().drop_duplicates()
    days = sorted(df["day"].unique())
    for d0 in days:
        want = df[(df["day"] >= d0 - 6) & (df["day"] <= d0)]["u"].nunique()
        assert out[d0] == want, d0
    assert set(out.index) == set(days)


class TestLTTB:
    def _mk(self, n, seed):
        rng = np.random.RandomState(seed)
        x = np.cumsum(rng.randint(1, 5, size=n)).astype(np.int64) * 300000
        y = rng.randint(-10_000, 10_000, size=n).astype(np.int64)
        return x, y

    def test_short_series_passthrough(self):
        from prom_tsdb_copyer_ray.stages.windowed import lttb_indices

        x, y = self._mk(7, 0)
        assert lttb_indices(x, y, 50).tolist() == list(range(7))

    def test_properties(self):
        from prom_tsdb_copyer_ray.stages.windowed import lttb_indices

        for seed in range(5):
            x, y = self._mk(500, seed)
            idx = lttb_indices(x, y, 50)
            assert len(idx) == 50
            assert idx[0] == 0 and idx[-1] == 499
            assert np.all(np.diff(idx) > 0), "selected indices must ascend"

    def test_matches_scalar_reference(self):
        """Engine kernel == the independent fixture-generator reference."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "genfix3",
            os.path.join(os.path.dirname(__file__), "fixtures",
                         "gen_oracle_fixtures3.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        from prom_tsdb_copyer_ray.stages.windowed import lttb_indices

        for seed in range(8):
            for n, k in [(5, 3), (10, 3), (100, 10), (257, 50), (1000, 50)]:
                x, y = self._mk(n, seed)
                got = lttb_indices(x, y, k).tolist()
                want = mod.lttb_reference(x.tolist(), y.tolist(), k)
                assert got == want, (n, k, seed)


class TestHoltLinear:
    def test_matches_scalar_reference(self):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "genfix3b",
            os.path.join(os.path.dirname(__file__), "fixtures",
                         "gen_oracle_fixtures3.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        from prom_tsdb_copyer_ray.stages.windowed import holt_linear

        rng = np.random.RandomState(3)
        for n in (2, 5, 100, 1000):
            y = rng.randint(-10_000, 10_000, size=n).astype(np.int64)
            got = holt_linear(y, 0.3, 0.1)
            want = mod.holt_reference(y.tolist(), 0.3, 0.1)
            assert got == want, n

    def test_constant_series(self):
        from prom_tsdb_copyer_ray.stages.windowed import holt_linear

        y = np.full(50, 700, dtype=np.int64)
        level, trend = holt_linear(y, 0.3, 0.1)
        assert level == 700.0 and trend == 0.0

    def test_too_short(self):
        import pytest as _pytest

        from prom_tsdb_copyer_ray.stages.windowed import holt_linear

        with _pytest.raises(ValueError):
            holt_linear(np.array([1.0]), 0.3, 0.1)


class TestExtrapolatedRate:
    def _run(self, ray_session, rows):
        import ray.data

        from prom_tsdb_copyer_ray.stages.windowed import extrapolated_rate

        t = pa.table({
            "k": pa.array([r[0] for r in rows], pa.string()),
            "tms": pa.array([r[1] for r in rows], pa.int64()),
            "oid": pa.array(list(range(len(rows))), pa.int64()),
            "cv": pa.array([r[2] for r in rows], pa.int64()),
        })
        ds = ray.data.from_arrow(t).repartition(2)
        out = extrapolated_rate(ds, ["k"], "tms", ["oid"], "cv", 300_000)
        return out.to_pandas().sort_values(["k", "window_start"]).reset_index(drop=True)

    def test_dense_window_extrapolates_to_edges(self, ray_session):
        # 4 samples at 60s spacing inside [0, 300s): gaps to both edges
        # (60s, 60s) are under the 1.1*avg(60s)=66s threshold -> kept as-is,
        # factor = (180 + 60 + 60)/180; increase = 300 cents.
        rows = [("a", 60_000, 100), ("a", 120_000, 200),
                ("a", 180_000, 300), ("a", 240_000, 400)]
        df = self._run(ray_session, rows)
        assert len(df) == 1 and df["n_samples"][0] == 4
        want = 300 * ((180_000 + 60_000 + 60_000) / 180_000) / 100.0 / 300.0
        assert df["xrate_per_s"][0] == round(want, 6)

    def test_sparse_edges_use_half_interval(self, ray_session):
        # 2 samples at 100s and 160s: avg interval 60s, edge gaps 100s and
        # 140s both exceed 66s -> replaced by 30s each.
        rows = [("a", 100_000, 5000), ("a", 160_000, 5600)]
        df = self._run(ray_session, rows)
        # time-to-zero 60s*(5000/600) = 500s doesn't bind; both edges 30s
        want = 600 * ((60_000 + 30_000 + 30_000) / 60_000) / 100.0 / 300.0
        assert df["xrate_per_s"][0] == round(want, 6)

    def test_counter_starting_at_zero_gets_no_start_extrapolation(
            self, ray_session):
        # first_v = 0: time-to-zero is 0 -> the start edge contributes
        # nothing (the counter was born at its first sample).
        rows = [("a", 100_000, 0), ("a", 160_000, 600)]
        df = self._run(ray_session, rows)
        want = 600 * ((60_000 + 0.0 + 30_000) / 60_000) / 100.0 / 300.0
        assert df["xrate_per_s"][0] == round(want, 6)

    def test_time_to_zero_caps_start_gap(self, ray_session):
        # counter starts near zero: first_v/inc small -> time-to-zero
        # 60s * (10/600) = 1s beats the 30s half-interval fallback.
        rows = [("a", 100_000, 10), ("a", 160_000, 610)]
        df = self._run(ray_session, rows)
        si = 60_000.0
        dz = si * (10 / 600)
        want = 600 * ((si + dz + 30_000) / si) / 100.0 / 300.0
        assert df["xrate_per_s"][0] == round(want, 6)

    def test_reset_within_window(self, ray_session):
        # 100 -> 20 is a reset: contribution is 20, not -80.
        rows = [("a", 60_000, 100), ("a", 120_000, 20), ("a", 180_000, 50)]
        df = self._run(ray_session, rows)
        inc = 20 + 30
        si = 120_000.0
        # avg interval 60s -> threshold 66s: start gap 60s kept, end gap
        # 120s falls back to 30s; time-to-zero 120s*(100/50) doesn't bind
        want = inc * ((si + 60_000 + 30_000) / si) / 100.0 / 300.0
        assert df["xrate_per_s"][0] == round(want, 6)

    def test_degenerate_windows_emit_nothing(self, ray_session):
        # single sample; two samples at the SAME ms (zero span)
        import ray.data

        from prom_tsdb_copyer_ray.stages.windowed import extrapolated_rate

        t = pa.table({
            "k": pa.array(["solo", "tied", "tied"], pa.string()),
            "tms": pa.array([60_000, 60_000, 60_000], pa.int64()),
            "oid": pa.array([0, 1, 2], pa.int64()),
            "cv": pa.array([100, 100, 200], pa.int64()),
        })
        out = extrapolated_rate(ray.data.from_arrow(t).repartition(2),
                                ["k"], "tms", ["oid"], "cv", 300_000)
        assert out.count() == 0
