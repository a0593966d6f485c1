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
