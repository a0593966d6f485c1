"""Brute-force cross-checks for the census-bounded statistical queries
(basket_lift pair expansion, isotonic minimax monotonicity/optimality) on
adversarial synthetic events — sessions crossing block boundaries,
single-type sessions, timestamp ties."""

from __future__ import annotations

import itertools
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, user, ts_ms, event_type):
    t = pa.table({
        "event_id": pa.array(np.arange(len(user), dtype=np.int64)),
        "ts": pa.array(np.asarray(ts_ms, np.int64), pa.timestamp("ms")),
        "user_id": pa.array(np.asarray(user, np.int64)),
        "event_type": pa.array(list(event_type), pa.string()),
        "value": pa.array(np.ones(len(user), np.float64)),
        "props": pa.array(["{}"] * len(user), pa.string()),
    })
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))


def _brute_lift(user, ts_ms, event_type, gap_ms):
    """Scalar reference: gap sessions per user -> distinct-type sets ->
    pair counts -> lift."""
    import collections

    by_user = collections.defaultdict(list)
    for u, t, e in zip(user, ts_ms, event_type):
        by_user[u].append((t, e))
    sessions = []
    for u, evs in by_user.items():
        evs.sort()
        cur = {evs[0][1]}
        last = evs[0][0]
        for t, e in evs[1:]:
            if t - last > gap_ms:
                sessions.append(cur)
                cur = set()
            cur.add(e)
            last = t
        sessions.append(cur)
    n = len(sessions)
    singles = collections.Counter()
    pairs = collections.Counter()
    for s in sessions:
        for e in s:
            singles[e] += 1
        for a, b in itertools.combinations(sorted(s), 2):
            pairs[(a, b)] += 1
    out = {}
    for (a, b), nab in pairs.items():
        out[(a, b)] = (nab, round(float(nab * n)
                                  / float(singles[a] * singles[b]), 6))
    return out


def test_basket_lift_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.queries import (SESSION_GAP_MS,
                                                        q_basket_lift)

    rng = np.random.default_rng(7)
    n = 4000
    user = rng.integers(0, 37, n)
    # spread over ~20 gaps so every user has several sessions; include ties
    ts = rng.integers(0, 20, n) * (SESSION_GAP_MS + 1) \
        + rng.integers(0, 1000, n)
    ts[::97] = ts[1::97][: len(ts[::97])]  # duplicate timestamps
    et = np.array(["alpha", "beta", "gamma", "delta"])[rng.integers(0, 4, n)]
    _write_events(str(tmp_path), user, ts, et)

    got = q_basket_lift(str(tmp_path))
    got = got.to_pandas() if not hasattr(got, "sort_values") else got
    want = _brute_lift(user.tolist(), ts.tolist(), et.tolist(),
                       SESSION_GAP_MS)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        nab, lift = want[(r["type_a"], r["type_b"])]
        assert r["n_both"] == nab
        assert r["lift"] == pytest.approx(lift, abs=1e-9)


def test_isotonic_hourly_monotone_and_pool_optimal(ray_session, tmp_path):
    """Fit is non-decreasing in hod and equals the scalar PAVA on the
    same exact census (minimax == PAVA equivalence in practice)."""
    from prom_tsdb_copyer_ray.pipelines.queries import q_isotonic_hourly

    rng = np.random.default_rng(11)
    n = 5000
    user = rng.integers(0, 10, n)
    ts = rng.integers(0, 30 * 24, n) * 3_600_000 + rng.integers(0, 3600_000, n)
    et = np.array(["a", "b"])[rng.integers(0, 2, n)]
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(user.astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 500, n), 2)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))

    got = q_isotonic_hourly(str(tmp_path)).to_pandas()
    tsms = ts.astype(np.int64)
    for typ, grp in got.groupby("event_type"):
        g = grp.sort_values("hod")
        assert (np.diff(g["iso_mean"].to_numpy()) >= -1e-12).all()
        # scalar PAVA on the exact integer census
        m = et == typ
        hod = (tsms[m] // 3_600_000) % 24
        cv = np.rint(t["value"].to_numpy(zero_copy_only=False)[m] * 100)
        sums = np.zeros(24)
        cnts = np.zeros(24)
        for h, c in zip(hod, cv):
            sums[h] += c
            cnts[h] += 1
        keep = cnts > 0
        s, w = sums[keep], cnts[keep]
        blocks = [[s[i], w[i]] for i in range(len(s))]
        i = 0
        while i < len(blocks) - 1:
            if blocks[i][0] / blocks[i][1] > blocks[i + 1][0] / blocks[i + 1][1]:
                blocks[i][0] += blocks[i + 1][0]
                blocks[i][1] += blocks[i + 1][1]
                del blocks[i + 1]
                i = max(i - 1, 0)
            else:
                i += 1
        # expand block means back to per-cell fitted values by re-walking
        # each block's pooled weight
        vals = [b[0] / b[1] for b in blocks]
        widths = []
        j = 0
        for b in blocks:
            tot = 0.0
            cells = 0
            while tot < b[1] - 1e-9:
                tot += w[j]
                j += 1
                cells += 1
            widths.append(cells)
        per_cell = np.concatenate([
            np.full(c, v) for v, c in zip(vals, widths)])
        np.testing.assert_allclose(
            g["iso_mean"].to_numpy(),
            np.round(per_cell / 100.0, 6), atol=1e-9)


def test_debounce_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.queries import q_debounce_events

    rng = np.random.default_rng(13)
    n = 3000
    user = rng.integers(0, 29, n)
    ts = np.cumsum(rng.integers(0, 400_000, n))  # mixed gaps around 5 min
    rng.shuffle(ts)
    et = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
    _write_events(str(tmp_path), user, ts, et)

    got = q_debounce_events(str(tmp_path)).to_pandas() \
        .set_index("event_type").sort_index()

    import collections
    by_key = collections.defaultdict(list)
    for i, (u, t, e) in enumerate(zip(user, ts, et)):
        by_key[(u, e)].append((t, i))
    total = collections.Counter()
    kept = collections.Counter()
    for (u, e), evs in by_key.items():
        evs.sort()
        last = None
        for t, _ in evs:
            total[e] += 1
            if last is None or t - last > 300_000:
                kept[e] += 1
            last = t
    for e in ("x", "y", "z"):
        assert got.loc[e, "n_total"] == total[e]
        assert got.loc[e, "n_kept"] == kept[e]


def test_max_concurrency_carry_across_days(ray_session, tmp_path):
    """Sessions spanning day boundaries exercise the driver carry: the
    per-day local max alone would be wrong without the carry-in."""
    from prom_tsdb_copyer_ray.pipelines.queries import (SESSION_GAP_MS,
                                                        q_max_concurrency)

    day = 86_400_000
    # 3 users with one long session each crossing into day 1, plus a
    # burst of 2 users only inside day 1
    rows = [
        (1, int(day * 0.5)), (1, int(day * 1.2)),   # user 1 spans days 0-1
        (2, int(day * 0.6)), (2, int(day * 1.3)),
        (3, int(day * 0.7)), (3, int(day * 1.4)),
        (4, int(day * 1.15)),                       # instant sessions at the
        (5, int(day * 1.15)),                       # same t, both open then
    ]
    assert day * 1.2 - day * 0.5 <= SESSION_GAP_MS
    user = np.array([r[0] for r in rows])
    ts = np.array([r[1] for r in rows])
    _write_events(str(tmp_path), user, ts, ["e"] * len(rows))

    got = q_max_concurrency(str(tmp_path)).to_pandas() \
        .set_index("day")["max_concurrent"]
    # day 0: users 1,2,3 open -> 3; day 1: those 3 still open + users 4,5 -> 5
    assert got.loc[0] == 3
    assert got.loc[day] == 5


def _rand_events(tmp_path, seed=23, n=6000):
    rng = np.random.default_rng(seed)
    user = rng.integers(0, 50, n)
    ts = rng.integers(0, 40 * 24, n) * 3_600_000 + rng.integers(0, 3_600_000, n)
    et = np.array(["click", "view", "error"])[rng.integers(0, 3, n)]
    val = np.round(rng.gamma(2.0, 80.0, n), 2)  # skewed, positive
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(user.astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    return et, val


def test_welch_t_matches_bruteforce(ray_session, tmp_path):
    """t and df equal the textbook Welch formulas computed naively on
    the raw cent values (the census path must not change the math)."""
    from prom_tsdb_copyer_ray.pipelines.extras import q_welch_t

    et, val = _rand_events(tmp_path)
    got = q_welch_t(str(tmp_path)).to_pandas()
    cv = np.rint(val * 100)
    for _, r in got.iterrows():
        a = cv[et == r["type_a"]]
        b = cv[et == r["type_b"]]
        sa, sb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
        t = (a.mean() - b.mean()) / np.sqrt(sa + sb)
        df = (sa + sb) ** 2 / (sa * sa / (len(a) - 1) + sb * sb / (len(b) - 1))
        assert r["t_stat"] == pytest.approx(t, abs=1e-4)
        assert r["df"] == pytest.approx(df, rel=1e-6)


def test_skew_kurtosis_matches_bruteforce(ray_session, tmp_path):
    """g1/g2 equal naive population moments on the raw cents (the floor
    protocol's error is far below the assertion tolerance)."""
    from prom_tsdb_copyer_ray.pipelines.extras import q_skew_kurtosis

    et, val = _rand_events(tmp_path)
    got = q_skew_kurtosis(str(tmp_path)).to_pandas()
    cv = np.rint(val * 100)
    for _, r in got.iterrows():
        x = cv[et == r["event_type"]]
        d = x - x.mean()
        m2, m3, m4 = (d ** 2).mean(), (d ** 3).mean(), (d ** 4).mean()
        assert r["n"] == len(x)
        assert r["skewness"] == pytest.approx(m3 / m2 ** 1.5, abs=1e-4)
        assert r["ex_kurtosis"] == pytest.approx(m4 / m2 ** 2 - 3.0, abs=1e-4)


def test_mean_family_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.extras import q_mean_family

    et, val = _rand_events(tmp_path)
    got = q_mean_family(str(tmp_path)).to_pandas()
    cv = np.rint(val * 100)
    for _, r in got.iterrows():
        x = cv[(et == r["event_type"]) & (cv > 0)]
        assert r["n_pos"] == len(x)
        assert r["arith_mean"] == pytest.approx(x.mean() / 100.0, abs=1e-5)
        assert r["harmonic_mean"] == pytest.approx(
            len(x) / (1.0 / x).sum() / 100.0, rel=1e-5)
        assert r["log_gmean_cents"] == pytest.approx(
            np.log(x).mean(), abs=1e-5)


def test_cross_corr_matches_bruteforce(ray_session, tmp_path):
    """Lagged r equals np.corrcoef over the naively-built hourly sums."""
    from prom_tsdb_copyer_ray.pipelines.extras import q_cross_corr

    et, val = _rand_events(tmp_path, seed=31)
    import pyarrow.parquet as _pq
    t = _pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    ts = t["ts"].cast(pa.int64()).to_numpy()
    cv = np.rint(val * 100).astype(np.int64)
    hr = ts // 3_600_000
    got = q_cross_corr(str(tmp_path)).to_pandas().set_index("lag")
    x = {}
    y = {}
    for h, c, e in zip(hr, cv, et):
        d = x if e == "click" else y if e == "view" else None
        if d is not None:
            d[h] = d.get(h, 0) + int(c)
    for lag in (0, 1, 2, 3):
        xs = [v for h, v in sorted(x.items()) if h + lag in y]
        ys = [y[h + lag] for h in sorted(x) if h + lag in y]
        r = np.corrcoef(np.asarray(xs, float), np.asarray(ys, float))[0, 1]
        assert got.loc[lag, "n"] == len(xs)
        assert got.loc[lag, "r"] == pytest.approx(r, abs=1e-6)


def test_mutual_information_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.extras import q_mutual_information

    et, _ = _rand_events(tmp_path, seed=41)
    import pyarrow.parquet as _pq
    t = _pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    hod = (t["ts"].cast(pa.int64()).to_numpy() // 3_600_000) % 24
    got = q_mutual_information(str(tmp_path)).to_pandas()
    types = sorted(set(et))
    n = len(et)
    mi = 0.0
    for ty in types:
        for h in range(24):
            o = int(((et == ty) & (hod == h)).sum())
            if o == 0:
                continue
            r = int((et == ty).sum())
            c = int((hod == h).sum())
            mi += (o / n) * np.log(n * o / (r * c))
    assert got.loc[0, "n"] == n
    assert got.loc[0, "mi_nats"] == pytest.approx(mi, abs=1e-4)


def test_jackknife_se_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.extras import q_jackknife_se

    et, val = _rand_events(tmp_path, seed=43)
    import pyarrow.parquet as _pq
    t = _pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    hod = (t["ts"].cast(pa.int64()).to_numpy() // 3_600_000) % 24
    cv = np.rint(val * 100)
    got = q_jackknife_se(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        m = et == r["event_type"]
        x, h = cv[m], hod[m]
        hs = sorted(set(h.tolist()))
        thetas = np.array([x[h != hh].mean() for hh in hs])
        g = len(hs)
        se = np.sqrt((g - 1) / g * ((thetas - thetas.mean()) ** 2).sum())
        assert r["g_groups"] == g
        assert r["jk_se"] == pytest.approx(se / 100.0, abs=1e-4)


def test_linreg_2f_matches_lstsq(ray_session, tmp_path):
    """Cramer-rule betas equal np.linalg.lstsq on the raw design."""
    from prom_tsdb_copyer_ray.pipelines.extras import q_linreg_2f

    et, val = _rand_events(tmp_path, seed=53)
    import pyarrow.parquet as _pq
    t = _pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    ts = t["ts"].cast(pa.int64()).to_numpy()
    cv = np.rint(val * 100)
    h = (ts // 3_600_000) % 24
    d = ((ts // 86_400_000) + 4) % 7
    X = np.column_stack([np.ones(len(cv)), h, d])
    beta = np.linalg.lstsq(X, cv, rcond=None)[0] / 100.0
    got = q_linreg_2f(str(tmp_path)).to_pandas()
    assert got.loc[0, "n"] == len(cv)
    assert got.loc[0, "beta0"] == pytest.approx(beta[0], abs=1e-4)
    assert got.loc[0, "beta_hod"] == pytest.approx(beta[1], abs=1e-4)
    assert got.loc[0, "beta_dow"] == pytest.approx(beta[2], abs=1e-4)


def test_kaplan_meier_matches_bruteforce(ray_session, tmp_path):
    """log S(t) equals the scalar KM product over the same lifespans."""
    from prom_tsdb_copyer_ray.pipelines.extras import q_kaplan_meier

    _rand_events(tmp_path, seed=59)
    import pyarrow.parquet as _pq
    t = _pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    ts = t["ts"].cast(pa.int64()).to_numpy()
    uid = t["user_id"].to_numpy()
    mn, mx = {}, {}
    for u, s in zip(uid, ts):
        mn[u] = min(mn.get(u, s), s)
        mx[u] = max(mx.get(u, s), s)
    dmax = max(mx.values())
    spans = [((mx[u] - mn[u]) // 3_600_000, dmax - mx[u] < 86_400_000)
             for u in mn]
    got = q_kaplan_meier(str(tmp_path)).to_pandas()
    surv = 1.0
    rows = iter(got.itertuples())
    for dur in sorted({s for s, _ in spans}):
        at_risk = sum(1 for s, _ in spans if s >= dur)
        deaths = sum(1 for s, c in spans if s == dur and not c)
        if deaths <= 0 or at_risk <= deaths:
            continue
        surv *= (at_risk - deaths) / at_risk
        r = next(rows)
        assert r.duration_h == dur
        assert r.at_risk == at_risk
        assert r.deaths == deaths
        assert r.log_surv == pytest.approx(np.log(surv), abs=1e-3)
    assert next(rows, None) is None
