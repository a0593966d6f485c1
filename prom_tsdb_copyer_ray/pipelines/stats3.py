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


# Micro-floored trig constants floor(cos|sin(2*pi*d/24) * 1e6) for
# d = 0..23, embedded as LITERALS here and in the SQL oracle (a VALUES
# table) so no cross-engine libm trig call can flip a floor boundary —
# the constants are part of the query definition.
_FC24 = [1000000, 965925, 866025, 707106, 500000, 258819, 0, -258820,
         -500000, -707107, -866026, -965926, -1000000, -965926, -866026,
         -707107, -500001, -258820, -1, 258819, 500000, 707106, 866025,
         965925]
_FS24 = [0, 258819, 499999, 707106, 866025, 965925, 1000000, 965925,
         866025, 707106, 499999, 258819, 0, -258820, -500000, -707107,
         -866026, -965926, -1000000, -965926, -866026, -707107, -500001,
         -258820]


def q_diurnal_amplitude(sf_dir: str):
    """First-harmonic (24 h cycle) DFT amplitude of each type's
    hour-of-day activity profile: A = sum_d T_d*FC_d,
    B = sum_d T_d*FS_d over the 24-cell hod census with the micro-
    floored trig LITERALS above (exact integer sums, Python bignums),
    amplitude ratio = sqrt(A^2+B^2)/(1e6*N) as ONE mirrored float
    expression.  A flat profile scores ~0, a pure 24 h sinusoid ~0.5.
    One (type, hod) census exchange — 24 x types rows."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        tms = ts_to_ms(batch["ts"]).to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": batch["event_type"],
            "d": pa.array((tms // 3_600_000) % 24, pa.int64()),
            "t": pa.array(np.ones(len(tms), np.int64)),
        })
        g = t.group_by(["event_type", "d"]).aggregate([("t", "sum")])
        return g.rename_columns(["event_type", "d", "t"])

    census = sharded_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "d"], [("t", "sum")], num_shards=2,
    ).to_pandas()
    out = {"event_type": [], "n": [], "a_cos": [], "b_sin": [],
           "amp_ratio": []}
    for et, grp in census.groupby("event_type", sort=True):
        d = grp["d"].to_numpy()
        t = grp["t"].to_numpy()
        a = sum(int(tt) * _FC24[int(dd)] for dd, tt in zip(d, t))
        b = sum(int(tt) * _FS24[int(dd)] for dd, tt in zip(d, t))
        s1 = int(t.sum())
        amp = math.sqrt(float(a * a + b * b)) / (1e6 * float(s1))
        out["event_type"].append(str(et))
        out["n"].append(s1)
        out["a_cos"].append(a)
        out["b_sin"].append(b)
        out["amp_ratio"].append(round(amp, 6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "a_cos": pa.array(out["a_cos"], pa.int64()),
        "b_sin": pa.array(out["b_sin"], pa.int64()),
        "amp_ratio": pa.array(out["amp_ratio"], pa.float64()),
    })


def q_permutation_entropy(sf_dir: str):
    """Order-3 permutation entropy of the dense hourly count series per
    type: each length-3 window maps to its ordinal pattern (ties broken
    by position, i.e. ``i precedes j iff c_i <= c_j`` for i < j), the
    6-cell pattern census is exact, and H = -sum n_p * ln(n_p/N) runs
    in the micro-floored log domain so the cross-pattern sum is an
    associative integer sum; pe_norm divides by the micro-floored
    ln(6) LITERAL 1.791759.  Low PE = rigid diurnal structure, high PE
    = noise-like ordering."""
    series, _big_h = dense_hour_counts(sf_dir)
    out = {"event_type": [], "n_windows": [], "pe_nats": [], "pe_norm": []}
    for et, c in series.items():
        c0, c1, c2 = c[:-2], c[1:-1], c[2:]
        pid = (4 * (c0 <= c1).astype(np.int64)
               + 2 * (c0 <= c2).astype(np.int64)
               + (c1 <= c2).astype(np.int64))
        counts = np.bincount(pid, minlength=8)
        n = int(pid.size)
        total = sum(int(np_) * math.floor(math.log(np_ / n) * 1e6)
                    for np_ in counts if np_ > 0)
        pe = -(float(total) / 1e6) / float(n)
        out["event_type"].append(et)
        out["n_windows"].append(n)
        out["pe_nats"].append(round(pe, 6))
        out["pe_norm"].append(round(pe / 1.791759, 6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_windows": pa.array(out["n_windows"], pa.int64()),
        "pe_nats": pa.array(out["pe_nats"], pa.float64()),
        "pe_norm": pa.array(out["pe_norm"], pa.float64()),
    })


def q_ljung_box(sf_dir: str):
    """Ljung-Box portmanteau autocorrelation test (lags 1..6) on the
    dense hourly count series per type.  Each lag's autocovariance is
    kept in the EXACT cross-multiplied integer form
    cov_k*H^2 = H^2*P_k - H*S1*(A_k+B_k) + (H-k)*S1^2 (P_k = lagged dot
    product, A_k/B_k = head/tail sums — Python bignums), so r_k is ONE
    division of exact ints; each r_k^2/(H-k) term is pico-floored (the
    harmonic-mean protocol — terms << 1) making the lag sum associative,
    and Q = H(H+2) * sum/1e12 is the final mirrored expression."""
    series, big_h = dense_hour_counts(sf_dir)
    out = {"event_type": [], "n_hours": [], "r1": [], "lb_q": []}
    for et, c in series.items():
        p0 = int(np.dot(c, c))
        s1 = int(c.sum())
        den = big_h * (big_h * p0 - s1 * s1)
        total = 0
        r1 = 0.0
        for k in range(1, 7):
            pk = int(np.dot(c[:-k], c[k:]))
            ak = int(c[:-k].sum())
            bk = int(c[k:].sum())
            covk = (big_h * big_h * pk - big_h * s1 * (ak + bk)
                    + (big_h - k) * s1 * s1)
            r = float(covk) / float(den)
            if k == 1:
                r1 = round(r, 6)
            total += math.floor(r * r / (big_h - k) * 1e12)
        q = round(float(big_h * (big_h + 2)) * (float(total) / 1e12), 6)
        out["event_type"].append(et)
        out["n_hours"].append(big_h)
        out["r1"].append(r1)
        out["lb_q"].append(q)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_hours": pa.array(out["n_hours"], pa.int64()),
        "r1": pa.array(out["r1"], pa.float64()),
        "lb_q": pa.array(out["lb_q"], pa.float64()),
    })


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
