"""Session-12 statistics wave: trend / randomness / stability tests over
the per-type hourly event-count series.

All operators here share ONE substrate: the (event_type, hr) count
census — a per-batch Arrow ``group_by`` combiner collapses the events
stream to at most types x hours rows, one sharded exchange moves only
census rows (the fano_factor shape, pipelines/extras.py), and the
driver-final scan densifies each type's series over the corpus hour
grid [min hr, max hr] (absent hours are true zeros) and runs exact
integer math.  The grid length H is bounded by the TIME RANGE, never by
corpus size — at 100 TB a 10-year corpus is ~88k hours of driver-side
metadata per type, and the O(H^2) pairwise scan in mann_kendall has the
documented O(H log H) merge-inversion escalation.

Float protocol as everywhere (pipelines/stats2.py): statistics stay
exact-integer until ONE mirrored float expression shared verbatim with
the SQL oracle (IEEE casts / products / sqrt are correctly rounded, so
results are bit-identical); per-lag terms that must be summed across
rows are pico-floored first (the harmonic-mean protocol) so the sum is
an associative integer sum.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..stages.keyed import sharded_grouped_agg
from ..windows import ts_to_ms


def _read(sf_dir: str, name: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def dense_hour_counts(sf_dir: str):
    """The shared substrate: per-type DENSE hourly count series.

    Returns ``(series, H)`` where ``series`` is an ordered
    ``{event_type: np.int64[H]}`` over the corpus-global hour grid
    (zeros for absent hours).  One (event_type, hr) census exchange;
    the dense arrays are driver-side metadata bounded by the time range.
    """
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        tms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": batch["event_type"],
            "hr": pa.array(tms // 3_600_000, pa.int64()),
            "c": pa.array(np.ones(len(tms), np.int64)),
        })
        g = t.group_by(["event_type", "hr"]).aggregate([("c", "sum")])
        return g.rename_columns(["event_type", "hr", "c"])

    census = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "hr"], [("c", "sum")], num_shards=4,
    ).to_pandas()
    h_lo = int(census["hr"].min())
    h_hi = int(census["hr"].max())
    big_h = h_hi - h_lo + 1
    series: dict[str, np.ndarray] = {}
    for et, grp in census.groupby("event_type", sort=True):
        c = np.zeros(big_h, np.int64)
        c[grp["hr"].to_numpy() - h_lo] = grp["c"].to_numpy()
        series[str(et)] = c
    return series, big_h


def q_mann_kendall(sf_dir: str):
    """Mann-Kendall trend test per event type over the dense hourly
    count series: S = sum_{i<j} sign(c_j - c_i) — EXACT integers (no
    float enters S or the tie-corrected variance numerator
    var_num = H(H-1)(2H+5) - sum_t t(t-1)(2t+5)).  The z statistic is
    one mirrored float expression ((S -/+ 1)/sqrt(var_num/18.0)).
    Driver scan is O(H^2) vectorized over the grid (H = time-range
    hours, metadata-sized); escalation at very long ranges is the
    O(H log H) merge-inversion count over the same census."""
    series, big_h = dense_hour_counts(sf_dir)
    out = {"event_type": [], "s_stat": [], "var_num": [], "z": []}
    for et, c in series.items():
        diff = np.sign(c[None, :] - c[:, None])
        s = int(np.triu(diff, 1).sum())
        _, t_counts = np.unique(c, return_counts=True)
        tie_sum = sum(int(t) * (int(t) - 1) * (2 * int(t) + 5)
                      for t in t_counts)
        var_num = big_h * (big_h - 1) * (2 * big_h + 5) - tie_sum
        if s > 0:
            z = (float(s) - 1.0) / math.sqrt(float(var_num) / 18.0)
        elif s < 0:
            z = (float(s) + 1.0) / math.sqrt(float(var_num) / 18.0)
        else:
            z = 0.0
        out["event_type"].append(et)
        out["s_stat"].append(s)
        out["var_num"].append(var_num)
        out["z"].append(round(z, 6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "s_stat": pa.array(out["s_stat"], pa.int64()),
        "var_num": pa.array(out["var_num"], pa.int64()),
        "z": pa.array(out["z"], pa.float64()),
    })


def q_turning_points(sf_dir: str):
    """Turning-points randomness test per event type: T = count of
    strict local extrema in the dense hourly count series (exact int),
    z = (T - 2(H-2)/3) / sqrt((16H-29)/90) as ONE mirrored float
    expression.  Same single census exchange as mann_kendall."""
    series, big_h = dense_hour_counts(sf_dir)
    out = {"event_type": [], "t_points": [], "n_hours": [], "z": []}
    for et, c in series.items():
        mid, left, right = c[1:-1], c[:-2], c[2:]
        peaks = (left < mid) & (mid > right)
        valleys = (left > mid) & (mid < right)
        t = int(np.count_nonzero(peaks | valleys))
        z = (float(t) - 2.0 * float(big_h - 2) / 3.0) / math.sqrt(
            (16.0 * float(big_h) - 29.0) / 90.0)
        out["event_type"].append(et)
        out["t_points"].append(t)
        out["n_hours"].append(big_h)
        out["z"].append(round(z, 6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "t_points": pa.array(out["t_points"], pa.int64()),
        "n_hours": pa.array(out["n_hours"], pa.int64()),
        "z": pa.array(out["z"], pa.float64()),
    })


def q_allan_variance(sf_dir: str):
    """Allan (two-sample) variance of the hourly count process at
    cluster times tau in {1, 2, 4} hours, per event type: complete
    windows of tau hours are summed (exact ints), and
    avar = sum (w_{i+1} - w_i)^2 / (2 (M-1) tau^2) keeps the window-SUM
    form so the only float op is the final mirrored division (the
    window MEANS would be rationals; sums are exact).  Multi-tau slope
    is the white-vs-flicker noise discriminator."""
    series, big_h = dense_hour_counts(sf_dir)
    out = {"event_type": [], "tau": [], "m_windows": [], "avar": []}
    for et, c in series.items():
        for tau in (1, 2, 4):
            m = big_h // tau
            w = c[: m * tau].reshape(m, tau).sum(axis=1)
            dw = np.diff(w)
            ssd = int(np.sum(dw * dw))
            avar = float(ssd) / float(2 * (m - 1) * tau * tau)
            out["event_type"].append(et)
            out["tau"].append(tau)
            out["m_windows"].append(m)
            out["avar"].append(round(avar, 6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "tau": pa.array(out["tau"], pa.int64()),
        "m_windows": pa.array(out["m_windows"], pa.int64()),
        "avar": pa.array(out["avar"], pa.float64()),
    })
