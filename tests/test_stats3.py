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


def test_diurnal_amplitude_matches_bruteforce(ray_session, tmp_path):
    """Amplitude ratio equals the true (un-floored) first DFT harmonic
    of the hod profile to well under the micro-floor error bound."""
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_diurnal_amplitude

    et, hrs = _rand_events(tmp_path)
    got = q_diurnal_amplitude(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        hod = hrs[et == r["event_type"]] % 24
        t = np.bincount(hod, minlength=24)
        a = sum(t[d] * math.cos(2 * math.pi * d / 24) for d in range(24))
        b = sum(t[d] * math.sin(2 * math.pi * d / 24) for d in range(24))
        ref = math.sqrt(a * a + b * b) / t.sum()
        assert int(r["n"]) == int(t.sum())
        assert r["amp_ratio"] == pytest.approx(ref, abs=1e-4)


def test_permutation_entropy_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_permutation_entropy

    et, hrs = _rand_events(tmp_path)
    got = q_permutation_entropy(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]]
        pats = {}
        for i in range(len(c) - 2):
            w = [(c[i], 0), (c[i + 1], 1), (c[i + 2], 2)]
            pat = tuple(p for _, p in sorted(w))
            pats[pat] = pats.get(pat, 0) + 1
        n = len(c) - 2
        ref = -sum(v / n * math.log(v / n) for v in pats.values())
        assert int(r["n_windows"]) == n
        assert r["pe_nats"] == pytest.approx(ref, abs=1e-4)
        assert r["pe_norm"] == pytest.approx(ref / math.log(6), abs=1e-4)


def test_ljung_box_matches_bruteforce(ray_session, tmp_path):
    """Q and r1 equal the textbook float formulas on the dense series
    (the cross-multiplied integer path must not change the math)."""
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_ljung_box

    et, hrs = _rand_events(tmp_path)
    got = q_ljung_box(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]].astype(float)
        h = len(c)
        m = c.mean()
        den = ((c - m) ** 2).sum()
        q = 0.0
        for k in range(1, 7):
            rk = ((c[:-k] - m) * (c[k:] - m)).sum() / den
            if k == 1:
                assert r["r1"] == pytest.approx(rk, abs=1e-5)
            q += rk * rk / (h - k)
        q *= h * (h + 2)
        assert int(r["n_hours"]) == h
        assert r["lb_q"] == pytest.approx(q, rel=1e-6, abs=1e-4)


def _write_docs(tmp_path, seed=7, n=300):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]

    def letters(i):  # letter-only id: tokenizer is [A-Za-z]+
        s = ""
        while True:
            s += chr(ord("a") + i % 26)
            i //= 26
            if i == 0:
                return s

    texts, langs = [], []
    for i in range(n):
        k = int(rng.integers(5, 40))
        # Zipf-ish: word j with weight 1/(j+1); plus a per-doc hapax
        ws = [words[min(int(rng.zipf(1.5)) - 1, 9)] for _ in range(k)]
        if rng.random() < 0.3:
            ws.append("unique" + letters(i) + "x")
        texts.append(" ".join(ws))
        langs.append(["en", "de", "fr"][int(rng.integers(0, 3))])
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    return texts, langs


def test_hapax_rate_matches_bruteforce(ray_session, tmp_path):
    from collections import Counter

    from prom_tsdb_copyer_ray.pipelines.stats3 import q_hapax_rate

    texts, langs = _write_docs(tmp_path)
    got = q_hapax_rate(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        cnt = Counter()
        for t, la in zip(texts, langs):
            if la == r["lang"]:
                cnt.update(t.split())
        assert int(r["vocab"]) == len(cnt)
        assert int(r["hapax"]) == sum(1 for v in cnt.values() if v == 1)
        assert int(r["tokens"]) == sum(cnt.values())
        assert r["hapax_rate"] == pytest.approx(
            sum(1 for v in cnt.values() if v == 1) / len(cnt), abs=1e-6)
        assert r["ttr"] == pytest.approx(
            len(cnt) / sum(cnt.values()), abs=1e-6)


def test_zipf_slope_matches_lstsq(ray_session, tmp_path):
    from collections import Counter

    from prom_tsdb_copyer_ray.pipelines.stats3 import q_zipf_slope

    texts, _ = _write_docs(tmp_path)
    got = q_zipf_slope(str(tmp_path)).to_pandas()
    cnt = Counter()
    for t in texts:
        cnt.update(t.split())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    x = np.log(np.arange(1, len(top) + 1, dtype=float))
    y = np.log(np.array([v for _, v in top], dtype=float))
    slope = np.polyfit(x, y, 1)[0]
    assert int(got["n_terms"][0]) == len(top)
    assert got["zipf_slope"][0] == pytest.approx(slope, abs=1e-3)


def test_jsd_types_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_jsd_types

    et, hrs = _rand_events(tmp_path)
    got = q_jsd_types(str(tmp_path)).to_pandas()
    assert len(got) == 3  # C(3,2) pairs
    for _, r in got.iterrows():
        a = np.bincount(hrs[et == r["type_a"]] % 24, minlength=24)
        b = np.bincount(hrs[et == r["type_b"]] % 24, minlength=24)
        p, q = a / a.sum(), b / b.sum()
        m = (p + q) / 2
        ref = 0.0
        for i in range(24):
            if p[i] > 0:
                ref += 0.5 * p[i] * math.log(p[i] / m[i])
            if q[i] > 0:
                ref += 0.5 * q[i] * math.log(q[i] / m[i])
        assert int(r["n_a"]) == a.sum() and int(r["n_b"]) == b.sum()
        assert r["jsd_nats"] == pytest.approx(ref, abs=1e-4)


def test_theil_index_matches_bruteforce(ray_session, tmp_path):
    import pandas as pd

    from prom_tsdb_copyer_ray.pipelines.stats3 import q_theil_index

    rng = np.random.default_rng(5)
    n = 3000
    user = rng.integers(0, 80, n)
    val = np.round(rng.lognormal(3.0, 1.0, n), 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.full(n, 10 ** 12, np.int64), pa.timestamp("ms")),
        "user_id": pa.array(user.astype(np.int64)),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_theil_index(str(tmp_path)).to_pandas()
    x = pd.DataFrame({"u": user, "x": np.rint(val * 100)}) \
        .groupby("u")["x"].sum().to_numpy(float)
    mu = x.mean()
    ref = float(np.mean(x / mu * np.log(x / mu)))
    assert int(got["n_users"][0]) == len(x)
    assert got["theil"][0] == pytest.approx(ref, abs=1e-4)


def test_gumbel_daily_max_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_gumbel_daily_max

    et, hrs = _rand_events(tmp_path)
    got = q_gumbel_daily_max(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]]
        nd = len(c) // 24
        m = c[: nd * 24].reshape(nd, 24).max(axis=1).astype(float)
        beta = m.std(ddof=1) * math.sqrt(6) / math.pi
        mu = m.mean() - 0.5772156649 * beta
        assert int(r["n_days"]) == nd
        assert r["gumbel_beta"] == pytest.approx(beta, rel=1e-4)
        assert r["gumbel_mu"] == pytest.approx(mu, rel=1e-3, abs=1e-3)


def test_hurst_aggvar_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_hurst_aggvar

    et, hrs = _rand_events(tmp_path)
    got = q_hurst_aggvar(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]].astype(float)
        xs, ys = [], []
        for m in (1, 2, 4, 8, 16):
            mm = len(c) // m
            y = c[: mm * m].reshape(mm, m).mean(axis=1)
            xs.append(math.log(m))
            ys.append(math.log(y.var(ddof=1)))
        slope = np.polyfit(xs, ys, 1)[0]
        assert r["slope"] == pytest.approx(slope, abs=1e-3)
        assert r["hurst"] == pytest.approx(1.0 + slope / 2.0, abs=1e-3)


def test_odds_ratio_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_odds_ratio

    rng = np.random.default_rng(11)
    n = 4000
    eday = rng.integers(19723, 19753, n)  # 30 days
    ts = eday * 86_400_000 + rng.integers(0, 86_400_000, n)
    et = np.where(rng.random(n) < 0.2, "purchase", "view")
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(np.ones(n, np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_odds_ratio(str(tmp_path)).to_pandas()
    wknd = ((eday + 3) % 7) >= 5
    purch = et == "purchase"
    a = int((purch & wknd).sum())
    b = int((purch & ~wknd).sum())
    c = int((~purch & wknd).sum())
    d = int((~purch & ~wknd).sum())
    assert [int(got[k][0]) for k in ("n_pw", "n_pd", "n_ow", "n_od")] \
        == [a, b, c, d]
    orr = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert got["odds_ratio"][0] == pytest.approx(orr, rel=1e-6)
    assert got["log_or"][0] == pytest.approx(math.log(orr), abs=1e-5)
    assert got["ci_lo"][0] == pytest.approx(
        math.log(orr) - 1.959964 * se, abs=1e-4)
    assert got["ci_hi"][0] == pytest.approx(
        math.log(orr) + 1.959964 * se, abs=1e-4)


def test_bhattacharyya_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_bhattacharyya

    rng = np.random.default_rng(13)
    n = 5000
    et = np.array(["click", "view", "error"])[rng.integers(0, 3, n)]
    val = np.round(rng.gamma(2.0, 5.0, n), 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.full(n, 10 ** 12, np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_bhattacharyya(str(tmp_path)).to_pandas()
    cv = np.rint(val * 100).astype(int)
    for _, r in got.iterrows():
        a = cv[et == r["type_a"]]
        b = cv[et == r["type_b"]]
        sup = set(a) | set(b)
        pa_ = {v: (a == v).sum() / len(a) for v in sup}
        pb_ = {v: (b == v).sum() / len(b) for v in sup}
        ref = sum(math.sqrt(pa_[v] * pb_[v]) for v in sup)
        assert r["bc"] == pytest.approx(ref, abs=1e-4)
        assert r["hellinger"] == pytest.approx(
            math.sqrt(1 - ref), abs=1e-4)


def test_kendall_w_matches_scipy_formula(ray_session, tmp_path):
    """W equals the tie-corrected textbook formula on midranks computed
    with scipy-free rankdata over the 24-cell hod profiles."""
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_kendall_w

    et, hrs = _rand_events(tmp_path)
    got = q_kendall_w(str(tmp_path)).to_pandas()
    hod = hrs % 24
    types = sorted(set(et))
    k, n = len(types), 24
    ranks = []
    ties = 0.0
    for ty in types:
        t = np.bincount(hod[et == ty], minlength=24).astype(float)
        order = t.argsort(kind="stable")
        r = np.empty(n)
        i = 0
        sv = t[order]
        while i < n:
            j = i
            while j < n and sv[j] == sv[i]:
                j += 1
            r[order[i:j]] = (i + j + 1) / 2.0
            g = j - i
            ties += g ** 3 - g
            i = j
        ranks.append(r)
    rsum = np.sum(ranks, axis=0)
    s = ((rsum - rsum.mean()) ** 2).sum()
    ref = 12.0 * s / (k * k * (n ** 3 - n) - k * ties)
    assert int(got["k_judges"][0]) == k and int(got["n_items"][0]) == n
    assert got["kendall_w"][0] == pytest.approx(ref, abs=1e-6)


def test_transfer_entropy_matches_bruteforce(ray_session, tmp_path):
    from collections import Counter

    from prom_tsdb_copyer_ray.pipelines.stats3 import q_transfer_entropy

    et, hrs = _rand_events(tmp_path)
    got = q_transfer_entropy(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    bits = {ty: (c > c.mean()).astype(int) for ty, c in dense.items()}
    assert len(got) == 6  # 3 types, ordered pairs
    for _, r in got.iterrows():
        x, y = bits[r["dst_type"]], bits[r["src_type"]]
        tri = Counter(zip(x[1:], x[:-1], y[:-1]))
        nxy = Counter(zip(x[:-1], y[:-1]))
        nxx = Counter(zip(x[1:], x[:-1]))
        nx = Counter(x[:-1])
        n = len(x) - 1
        ref = sum(c / n * math.log((c * nx[(t[1],)[0]])
                                   / (nxy[(t[1], t[2])] * nxx[(t[0], t[1])]))
                  for t, c in tri.items())
        assert int(r["n_trans"]) == n
        assert r["te_nats"] == pytest.approx(ref, abs=1e-4)


def test_hill_tail_matches_bruteforce(ray_session, tmp_path):
    import pandas as pd

    from prom_tsdb_copyer_ray.pipelines.stats3 import q_hill_tail

    rng = np.random.default_rng(17)
    n = 4000
    user = rng.integers(0, 200, n)
    val = np.round(rng.pareto(2.0, n) * 10 + 0.01, 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.full(n, 10 ** 12, np.int64), pa.timestamp("ms")),
        "user_id": pa.array(user.astype(np.int64)),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_hill_tail(str(tmp_path)).to_pandas()
    x = pd.DataFrame({"u": user, "x": np.rint(val * 100).astype(np.int64)}) \
        .groupby("u")["x"].sum().sort_values(ascending=False).to_numpy()
    top = x[:51].astype(float)
    k = len(top) - 1
    ref = k / sum(math.log(v / top.min()) for v in top)
    assert int(got["n_tail"][0]) == k
    assert int(got["x_min"][0]) == int(top.min())
    assert got["hill_alpha"][0] == pytest.approx(ref, rel=1e-4)


def test_cronbach_alpha_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_cronbach_alpha

    et, hrs = _rand_events(tmp_path)
    got = q_cronbach_alpha(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    nd = len(next(iter(dense.values()))) // 24
    daily = {ty: c[: nd * 24].reshape(nd, 24).sum(axis=1).astype(float)
             for ty, c in dense.items()}
    k = len(daily)
    item_vars = sum(x.var(ddof=1) for x in daily.values())
    tot_var = np.sum(list(daily.values()), axis=0).var(ddof=1)
    ref = (k / (k - 1)) * (1 - item_vars / tot_var)
    assert int(got["k_items"][0]) == k and int(got["n_days"][0]) == nd
    assert got["cronbach_alpha"][0] == pytest.approx(ref, abs=1e-6)


def test_sign_test_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_sign_test

    et, hrs = _rand_events(tmp_path)
    got = q_sign_test(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    assert len(got) == 3
    for _, r in got.iterrows():
        ca, cb = dense[r["type_a"]], dense[r["type_b"]]
        a = int((ca > cb).sum())
        b = int((ca < cb).sum())
        assert int(r["n_gt"]) == a and int(r["n_lt"]) == b
        assert r["z"] == pytest.approx(
            (2 * a - (a + b)) / math.sqrt(a + b), abs=1e-5)


def test_wilcoxon_signed_matches_scipy_formula(ray_session, tmp_path):
    """z equals the textbook normal-approximation Wilcoxon (midranks,
    tie-corrected variance, no continuity correction) computed naively."""
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_wilcoxon_signed

    et, hrs = _rand_events(tmp_path)
    got = q_wilcoxon_signed(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        d = dense[r["type_a"]] - dense[r["type_b"]]
        d = d[d != 0].astype(float)
        ad = np.abs(d)
        order = ad.argsort(kind="stable")
        ranks = np.empty(len(ad))
        sv = ad[order]
        i = 0
        ties = 0.0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            g = j - i
            ties += g ** 3 - g
            i = j
        n = len(d)
        wplus = ranks[d > 0].sum()
        var = n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
        zref = (wplus - n * (n + 1) / 4.0) / math.sqrt(var)
        assert int(r["n_nonzero"]) == n
        assert int(r["w2"]) == int(round(2 * wplus))
        assert r["z"] == pytest.approx(zref, abs=1e-5)


def test_spectral_flatness_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_spectral_flatness

    et, hrs = _rand_events(tmp_path)
    got = q_spectral_flatness(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        t = np.bincount(hrs[et == r["event_type"]] % 24, minlength=24)
        ps = []
        for k in range(1, 12):
            a = sum(t[d] * math.cos(2 * math.pi * k * d / 24)
                    for d in range(24))
            b = sum(t[d] * math.sin(2 * math.pi * k * d / 24)
                    for d in range(24))
            ps.append(a * a + b * b)
        ref = np.mean(np.log(ps)) - math.log(np.mean(ps))
        # micro-floored trig constants shift each P_k slightly; the
        # log-domain comparison tolerance reflects that, not the floor
        assert r["ln_flatness"] == pytest.approx(ref, abs=5e-3)
        assert r["ln_flatness"] <= 1e-9


def test_dau_jaccard_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_dau_jaccard

    rng = np.random.default_rng(19)
    n = 3000
    user = rng.integers(0, 60, n)
    day = rng.integers(19723, 19733, n)
    ts = day * 86_400_000 + rng.integers(0, 86_400_000, n)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(user.astype(np.int64)),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array(np.ones(n, np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_dau_jaccard(str(tmp_path)).to_pandas()
    sets = {d: set(user[day == d]) for d in np.unique(day)}
    days = sorted(sets)
    exp = [(d, sets[d], sets[d + 1]) for d in days if d + 1 in sets]
    assert len(got) == len(exp)
    for (d, sa, sb), (_, r) in zip(exp, got.iterrows()):
        inter = len(sa & sb)
        assert int(r["day"]) == d
        assert int(r["n_day"]) == len(sa)
        assert int(r["n_next"]) == len(sb)
        assert int(r["n_both"]) == inter
        assert r["jaccard"] == pytest.approx(
            inter / len(sa | sb), abs=1e-6)


def test_cohen_kappa_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_cohen_kappa

    et, hrs = _rand_events(tmp_path)
    got = q_cohen_kappa(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    bits = {ty: (c * len(c) > c.sum()).astype(int)
            for ty, c in dense.items()}
    for _, r in got.iterrows():
        x, y = bits[r["type_a"]], bits[r["type_b"]]
        h = len(x)
        po = (x == y).mean()
        pe = (x.mean() * y.mean()
              + (1 - x.mean()) * (1 - y.mean()))
        ref = (po - pe) / (1 - pe)
        assert int(r["n_agree"]) == int((x == y).sum())
        assert r["kappa"] == pytest.approx(ref, abs=1e-6)


def test_friedman_test_matches_bruteforce(ray_session, tmp_path):
    """chi2 equals the tie-corrected Conover formula computed with
    naive per-block midranks."""
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_friedman_test

    et, hrs = _rand_events(tmp_path)
    got = q_friedman_test(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    types = sorted(dense)
    k = len(types)
    h = len(dense[types[0]])
    ranks = np.zeros((k, h))
    for b in range(h):
        col = [dense[t][b] for t in types]
        for j in range(k):
            ranks[j, b] = (sum(1 for v in col if v < col[j])
                           + (sum(1 for v in col if v == col[j]) + 1)
                           / 2.0)
    rj = ranks.sum(axis=1)
    a = (ranks ** 2).sum()
    c0 = h * k * (k + 1) ** 2 / 4.0
    ref = (k - 1) * ((rj ** 2).sum() - h * c0) / (a - c0)
    assert int(got["k_types"][0]) == k
    assert int(got["n_blocks"][0]) == h
    assert got["chi2"][0] == pytest.approx(ref, abs=1e-6)


def test_renyi2_entropy_matches_bruteforce(ray_session, tmp_path):
    from collections import Counter

    from prom_tsdb_copyer_ray.pipelines.stats3 import q_renyi2_entropy

    rng = np.random.default_rng(29)
    n = 5000
    et = np.array(["click", "view"])[rng.integers(0, 2, n)]
    val = np.round(rng.gamma(2.0, 3.0, n), 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.full(n, 10 ** 12, np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_renyi2_entropy(str(tmp_path)).to_pandas()
    cv = np.rint(val * 100).astype(int)
    for _, r in got.iterrows():
        c = Counter(cv[et == r["event_type"]])
        tot = sum(c.values())
        ref = -math.log(sum(v * v for v in c.values()) / tot ** 2)
        assert int(r["n"]) == tot
        assert r["renyi2"] == pytest.approx(ref, abs=1e-5)


def test_seasonal_strength_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_seasonal_strength

    et, hrs = _rand_events(tmp_path)
    got = q_seasonal_strength(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]].astype(float)
        nd = len(c) // 24
        c = c[: nd * 24]
        grid = c.reshape(nd, 24)
        m_hod = grid.mean(axis=0)
        ss_resid = ((grid - m_hod[None, :]) ** 2).sum()
        ss_total = ((c - c.mean()) ** 2).sum()
        ref = 1.0 - ss_resid / ss_total
        assert r["r2_seasonal"] == pytest.approx(ref, abs=1e-6)


def test_acf_halflife_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_acf_halflife

    et, hrs = _rand_events(tmp_path)
    got = q_acf_halflife(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]].astype(float)
        m = c.mean()

        def rk(k):
            return ((c[:-k] - m) * (c[k:] - m)).sum() \
                / ((c - m) ** 2).sum()

        r1 = rk(1)
        hl = -1
        for k in range(2, 49):
            if rk(k) < r1 / 2:
                hl = k
                break
        assert int(r["halflife"]) == hl
        assert r["r1"] == pytest.approx(r1, abs=1e-5)
        if hl > 0:
            assert r["r_half"] == pytest.approx(rk(hl), abs=1e-5)


def test_kmer_richness_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_kmer_richness

    et, hrs = _rand_events(tmp_path)
    got = q_kmer_richness(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]]
        bit = (c * len(c) > c.sum()).astype(int)
        words = {tuple(bit[i:i + 8]) for i in range(len(bit) - 7)}
        assert int(r["n_windows"]) == len(bit) - 7
        assert int(r["n_distinct"]) == len(words)
        assert r["richness"] == pytest.approx(
            len(words) / min(256, len(bit) - 7), abs=1e-6)


def test_pacf2_matches_bruteforce(ray_session, tmp_path):
    """phi22 equals the Durbin-Levinson form computed from naive float
    autocorrelations."""
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_pacf2

    et, hrs = _rand_events(tmp_path)
    got = q_pacf2(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]].astype(float)
        m = c.mean()
        den = ((c - m) ** 2).sum()
        r1 = ((c[:-1] - m) * (c[1:] - m)).sum() / den
        r2 = ((c[:-2] - m) * (c[2:] - m)).sum() / den
        assert r["phi11"] == pytest.approx(r1, abs=1e-5)
        assert r["phi22"] == pytest.approx(
            (r2 - r1 * r1) / (1 - r1 * r1), abs=1e-5)


def test_stochastic_dominance_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import (
        q_stochastic_dominance,
    )

    rng = np.random.default_rng(37)
    n = 4000
    et = np.array(["click", "view"])[rng.integers(0, 2, n)]
    # 'view' stochastically larger: shifted support
    val = np.round(rng.gamma(2.0, 3.0, n) + (et == "view") * 2.0, 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.full(n, 10 ** 12, np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_stochastic_dominance(str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    cv = np.rint(val * 100).astype(int)
    a = np.sort(cv[et == "click"])
    b = np.sort(cv[et == "view"])
    sup = np.array(sorted(set(a) | set(b)))
    fa = np.searchsorted(a, sup, side="right") / len(a)
    fb = np.searchsorted(b, sup, side="right") / len(b)
    n_le = int((fa <= fb).sum())
    assert int(r["n_support"]) == len(sup)
    assert r["frac_a_below"] == pytest.approx(n_le / len(sup), abs=1e-6)
    # click's CDF should sit weakly above view's everywhere -> view
    # dominates click -> fsd == -1
    assert int(r["fsd"]) == (1 if (fa <= fb).all()
                             else -1 if (fa >= fb).all() else 0)


def test_moods_median_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_moods_median

    rng = np.random.default_rng(41)
    n = 5000
    et = np.array(["click", "view", "error"])[rng.integers(0, 3, n)]
    val = np.round(rng.gamma(2.0, 4.0, n)
                   + (et == "error") * 1.5, 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.full(n, 10 ** 12, np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_moods_median(str(tmp_path)).to_pandas()
    cv = np.rint(val * 100).astype(int)
    sv = np.sort(cv)
    med = int(sv[(len(sv) - 1) // 2])  # lower median
    assert int(got["median_cv"][0]) == med
    chi2 = 0.0
    r_above = int((cv > med).sum())
    r_below = int((cv <= med).sum())
    for ty in ("click", "error", "view"):
        o_a = int(((et == ty) & (cv > med)).sum())
        o_b = int(((et == ty) & (cv <= med)).sum())
        col = o_a + o_b
        for o, rr in ((o_a, r_above), (o_b, r_below)):
            e = rr * col / n
            chi2 += (o - e) ** 2 / e
    assert int(got["n"][0]) == n
    assert got["chi2"][0] == pytest.approx(chi2, abs=1e-4)


def _write_valued_events(tmp_path, seed, shift_by_type=0.0):
    rng = np.random.default_rng(seed)
    n = 5000
    et = np.array(["click", "view", "error"])[rng.integers(0, 3, n)]
    val = np.round(rng.gamma(2.0, 4.0, n)
                   + (et == "error") * shift_by_type, 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.full(n, 10 ** 12, np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    return et, np.rint(val * 100).astype(np.int64)


def test_kruskal_wallis_matches_scipy_formula(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_kruskal_wallis

    et, cv = _write_valued_events(tmp_path, 43, shift_by_type=1.0)
    got = q_kruskal_wallis(str(tmp_path)).to_pandas()
    # naive midranks
    order = cv.argsort(kind="stable")
    ranks = np.empty(len(cv))
    sv = cv[order]
    i = 0
    ties = 0.0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        g = j - i
        ties += g ** 3 - g
        i = j
    n = len(cv)
    h = 12.0 / (n * (n + 1)) * sum(
        ranks[et == ty].sum() ** 2 / (et == ty).sum()
        for ty in np.unique(et)) - 3 * (n + 1)
    h /= 1 - ties / (n ** 3 - n)
    assert int(got["n"][0]) == n
    assert got["h_stat"][0] == pytest.approx(h, abs=1e-4)


def test_brown_forsythe_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_brown_forsythe

    et, cv = _write_valued_events(tmp_path, 47, shift_by_type=2.0)
    got = q_brown_forsythe(str(tmp_path)).to_pandas()
    zs, groups = [], []
    for ty in np.unique(et):
        x = np.sort(cv[et == ty])
        med = x[(len(x) - 1) // 2]  # lower median
        zs.append(np.abs(cv[et == ty] - med).astype(float))
        groups.append(ty)
    k = len(groups)
    n = len(cv)
    zbar = np.concatenate(zs).mean()
    between = sum(len(z) * (z.mean() - zbar) ** 2 for z in zs)
    within = sum(((z - z.mean()) ** 2).sum() for z in zs)
    ref = (n - k) / (k - 1) * between / within
    assert got["w_stat"][0] == pytest.approx(ref, rel=1e-4)


def test_grubbs_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_grubbs

    et, cv = _write_valued_events(tmp_path, 53)
    got = q_grubbs(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        x = cv[et == r["event_type"]].astype(float)
        g = np.abs(x - x.mean()).max() / x.std(ddof=1)
        assert g == pytest.approx(r["g_stat"], abs=1e-5)
        assert abs(int(r["outlier_cv"]) - x.mean()) \
            == pytest.approx(np.abs(x - x.mean()).max(), abs=1e-6)


def test_heaps_law_matches_bruteforce(ray_session, tmp_path):
    from collections import Counter

    from prom_tsdb_copyer_ray.pipelines.stats3 import q_heaps_law

    texts, _ = _write_docs(tmp_path)
    got = q_heaps_law(str(tmp_path)).to_pandas()
    n = len(texts)
    xs, ys = [], []
    for i in range(1, 6):
        cut = (n * i) // 5
        toks = [w for t in texts[:cut] for w in t.split()]
        xs.append(math.log(len(toks)))
        ys.append(math.log(len(set(toks))))
    beta = np.polyfit(xs, ys, 1)[0]
    assert int(got["vocab_full"][0]) == len(
        {w for t in texts for w in t.split()})
    assert got["heaps_beta"][0] == pytest.approx(beta, abs=1e-3)


def test_heaps_law_sparse_doc_ids(ray_session, tmp_path):
    """Round-3 regression (ADVICE): prefixes must be the first k docs
    in doc_id ORDER, not `doc_id < count-derived cut` — sparse/offset
    ids (stride 997 so the order-statistic bucket census spans several
    2^16 buckets) must give the same beta as positional prefixes."""
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_heaps_law

    texts, _ = _write_docs(tmp_path)
    n = len(texts)
    ids = np.arange(n, dtype=np.int64) * 997 + 54321
    t = pq.read_table(os.path.join(str(tmp_path), "documents.parquet"))
    t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                     pa.array(ids))
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    got = q_heaps_law(str(tmp_path)).to_pandas()
    xs, ys = [], []
    for i in range(1, 6):
        cut = (n * i) // 5          # positional: first cut docs by id order
        toks = [w for txt in texts[:cut] for w in txt.split()]
        xs.append(math.log(len(toks)))
        ys.append(math.log(len(set(toks))))
    beta = np.polyfit(xs, ys, 1)[0]
    assert int(got["vocab_full"][0]) == len(
        {w for txt in texts for w in txt.split()})
    assert got["heaps_beta"][0] == pytest.approx(beta, abs=1e-3)


def test_term_burstiness_empty_token_batches(ray_session, tmp_path):
    """Round-3 regression (ADVICE): documents with zero [A-Za-z] tokens
    must still count toward n_docs in every VMR."""
    from collections import Counter

    from prom_tsdb_copyer_ray.pipelines.stats3 import q_term_burstiness

    texts, _ = _write_docs(tmp_path)
    # append 60 token-free docs (digits/punct only)
    extra = ["123 456 !!!"] * 60
    all_texts = texts + extra
    n = len(all_texts)
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(all_texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(x) for x in all_texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    got = q_term_burstiness(str(tmp_path)).to_pandas()
    per_doc = [Counter(txt.split()) for txt in texts] \
        + [Counter() for _ in extra]
    cf = Counter()
    for c in per_doc:
        cf.update(c)
    top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["term"]) == [term for term, _ in top]
    for (term, s1), (_, r) in zip(top, got.iterrows()):
        f = np.array([c.get(term, 0) for c in per_doc], float)
        vmr = f.var() / f.mean()
        assert int(r["cf"]) == s1
        assert r["vmr"] == pytest.approx(vmr, abs=1e-4)


def test_term_burstiness_matches_bruteforce(ray_session, tmp_path):
    from collections import Counter

    from prom_tsdb_copyer_ray.pipelines.stats3 import q_term_burstiness

    texts, _ = _write_docs(tmp_path)
    got = q_term_burstiness(str(tmp_path)).to_pandas()
    n_docs = len(texts)
    per_doc = [Counter(t.split()) for t in texts]
    cf = Counter()
    for c in per_doc:
        cf.update(c)
    top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["term"]) == [t for t, _ in top]
    for (term, s1), (_, r) in zip(top, got.iterrows()):
        f = np.array([c.get(term, 0) for c in per_doc], float)
        vmr = f.var() / f.mean()
        assert int(r["cf"]) == s1
        assert r["vmr"] == pytest.approx(vmr, abs=1e-4)


def test_rfm_segments_matches_bruteforce(ray_session, tmp_path):
    import pandas as pd

    from prom_tsdb_copyer_ray.pipelines.stats3 import (
        _ntile_1based,
        q_rfm_segments,
    )

    rng = np.random.default_rng(59)
    n = 3000
    user = rng.integers(0, 77, n)
    day = rng.integers(19723, 19753, n)
    ts = day * 86_400_000 + rng.integers(0, 86_400_000, n)
    val = np.round(rng.gamma(2.0, 5.0, n), 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(user.astype(np.int64)),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_rfm_segments(str(tmp_path)).to_pandas()
    u = pd.DataFrame({
        "user_id": user, "day": day,
        "cents": np.rint(val * 100).astype(np.int64),
    }).groupby("user_id").agg(
        day=("day", "max"), n=("day", "size"), cents=("cents", "sum"))
    u["recency"] = u["day"].max() - u["day"]
    nu = len(u)
    segs = {}
    qcodes = {}
    for col, name in (("recency", "r"), ("n", "f"), ("cents", "m")):
        order = u.reset_index().sort_values(
            [col, "user_id"], kind="mergesort")["user_id"].tolist()
        qcodes[name] = {uid: _ntile_1based(i + 1, nu, 5)
                        for i, uid in enumerate(order)}
    for uid in u.index:
        key = (qcodes["r"][uid], qcodes["f"][uid], qcodes["m"][uid])
        segs[key] = segs.get(key, 0) + 1
    assert int(got["n_users"].sum()) == nu
    for _, r in got.iterrows():
        key = (int(r["r_q"]), int(r["f_q"]), int(r["m_q"]))
        assert segs.get(key) == int(r["n_users"]), key


def test_mcnemar_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_mcnemar

    rng = np.random.default_rng(61)
    n = 4000
    user = rng.integers(0, 60, n)
    day = rng.integers(19723, 19753, n)
    ts = day * 86_400_000 + rng.integers(0, 86_400_000, n)
    et = np.where(rng.random(n) < 0.3, "purchase", "view")
    val = np.round(rng.gamma(2.0, 5.0, n), 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(user.astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_mcnemar(str(tmp_path)).to_pandas()
    cv = np.rint(val * 100).astype(np.int64)
    p = et == "purchase"
    pv = np.sort(cv[p])
    thr = int(pv[int(np.argmax(10 * np.arange(1, len(pv) + 1)
                               >= 9 * len(pv)))])
    mid = (int(day[p].min()) + int(day[p].max()) + 1) // 2
    hv = p & (cv > thr)
    b = c = 0
    for u in np.unique(user[hv]):
        m = hv & (user == u)
        e = bool((day[m] < mid).any())
        l = bool((day[m] >= mid).any())
        b += e and not l
        c += l and not e
    assert int(got["thr_cv"][0]) == thr
    assert int(got["mid_day"][0]) == mid
    assert int(got["b_early_only"][0]) == b
    assert int(got["c_late_only"][0]) == c
    assert got["mcnemar"][0] == pytest.approx(
        (b - c) ** 2 / (b + c), abs=1e-6)


def test_cochran_q_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_cochran_q

    et, cv = _write_valued_events(tmp_path, 67)
    got = q_cochran_q(str(tmp_path)).to_pandas()
    import pandas as pd

    df = pd.read_parquet(os.path.join(str(tmp_path), "events.parquet"))
    c = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    sv = np.sort(c)
    thr = int(sv[int(np.argmax(10 * np.arange(1, len(sv) + 1)
                               >= 9 * len(sv)))])
    sel = df[c > thr]
    x = sel.groupby(["user_id", "event_type"]).size().clip(upper=1) \
        .unstack(fill_value=0)
    k = x.shape[1]
    cj = x.sum(axis=0).to_numpy(float)
    ru = x.sum(axis=1).to_numpy(float)
    n = cj.sum()
    ref = (k - 1) * (k * (cj ** 2).sum() - n * n) \
        / (k * n - (ru ** 2).sum())
    assert int(got["thr_cv"][0]) == thr
    assert got["cochran_q"][0] == pytest.approx(ref, abs=1e-4)


def test_matthews_corr_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_matthews_corr

    et, hrs = _rand_events(tmp_path)
    got = q_matthews_corr(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    bits = {ty: (c * len(c) > c.sum()).astype(int)
            for ty, c in dense.items()}
    for _, r in got.iterrows():
        x, y = bits[r["type_a"]], bits[r["type_b"]]
        a = int(((x == 1) & (y == 1)).sum())
        b = int(((x == 1) & (y == 0)).sum())
        c = int(((x == 0) & (y == 1)).sum())
        d = int(((x == 0) & (y == 0)).sum())
        ref = (a * d - b * c) / math.sqrt(
            (a + b) * (a + c) * (b + d) * (c + d))
        assert r["mcc"] == pytest.approx(ref, abs=1e-6)


def test_log_rank_matches_bruteforce(ray_session, tmp_path):
    """z equals the textbook log-rank normal statistic computed with a
    naive per-duration loop (same censoring rule as kaplan_meier)."""
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_log_rank

    rng = np.random.default_rng(71)
    n = 4000
    user = rng.integers(0, 90, n)
    ts = rng.integers(0, 30 * 24, n) * 3_600_000 \
        + rng.integers(0, 3_600_000, n)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(user.astype(np.int64)),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array(np.ones(n, np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_log_rank(str(tmp_path)).to_pandas()
    import pandas as pd

    u = pd.DataFrame({"u": user, "ts": ts}).groupby("u")["ts"] \
        .agg(["min", "max"])
    dmax = u["max"].max()
    dur = ((u["max"] - u["min"]) // 3_600_000).to_numpy(np.int64)
    cens = ((dmax - u["max"]) < 86_400_000).to_numpy()
    grp = (u.index.to_numpy() % 2).astype(int)
    at1 = int((grp == 1).sum())
    at0 = int((grp == 0).sum())
    o1 = e1 = v = 0.0
    for d in sorted(set(dur)):
        m = dur == d
        d1 = int((m & ~cens & (grp == 1)).sum())
        d0 = int((m & ~cens & (grp == 0)).sum())
        dt = d1 + d0
        nt = at1 + at0
        if dt > 0 and nt > 1:
            o1 += d1
            e1 += dt * at1 / nt
            v += dt * at1 * at0 * (nt - dt) / (nt * nt * (nt - 1))
        at1 -= int((m & (grp == 1)).sum())
        at0 -= int((m & (grp == 0)).sum())
    zref = (o1 - e1) / math.sqrt(v)
    assert int(got["o1_deaths"][0]) == int(o1)
    assert got["log_rank_z"][0] == pytest.approx(zref, abs=1e-3)


def test_cramer_von_mises_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_cramer_von_mises

    rng = np.random.default_rng(73)
    n = 5000
    et = np.where(rng.random(n) < 0.4, "purchase", "view")
    val = np.round(rng.gamma(2.0, 4.0, n)
                   + (et == "purchase") * 0.8, 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.full(n, 10 ** 12, np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_cramer_von_mises(str(tmp_path)).to_pandas()
    cv = np.rint(val * 100).astype(np.int64)
    a = np.sort(cv[et == "purchase"])
    b = np.sort(cv[et == "view"])
    pooled = np.concatenate([a, b])
    fa = np.searchsorted(a, pooled, side="right") / len(a)
    fb = np.searchsorted(b, pooled, side="right") / len(b)
    ref = (len(a) * len(b) / (len(a) + len(b)) ** 2) \
        * ((fa - fb) ** 2).sum()
    assert got["cvm_t"][0] == pytest.approx(ref, abs=1e-6)


def test_partial_corr_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_partial_corr

    rng = np.random.default_rng(79)
    n = 5000
    hrs = rng.integers(0, 30 * 24, n)
    ts = hrs * 3_600_000 + rng.integers(0, 3_600_000, n)
    hod = hrs % 24
    val = np.round(rng.gamma(2.0, 3.0, n) + hod * 0.1, 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_partial_corr(str(tmp_path)).to_pandas()
    cv = np.rint(val * 100).astype(float)
    dow = ((ts // 86_400_000) + 3) % 7
    rxy = np.corrcoef(cv, hod)[0, 1]
    rxz = np.corrcoef(cv, dow)[0, 1]
    ryz = np.corrcoef(hod.astype(float), dow.astype(float))[0, 1]
    ref = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz ** 2) * (1 - ryz ** 2))
    assert got["r_xy"][0] == pytest.approx(rxy, abs=1e-5)
    assert got["r_partial"][0] == pytest.approx(ref, abs=1e-5)


def test_kuiper_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_kuiper

    rng = np.random.default_rng(83)
    n = 4000
    et = np.where(rng.random(n) < 0.4, "purchase", "view")
    hod = np.where(et == "purchase",
                   rng.integers(8, 20, n), rng.integers(0, 24, n))
    ts = rng.integers(0, 30, n) * 86_400_000 + hod * 3_600_000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(np.ones(n, np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_kuiper(str(tmp_path)).to_pandas()
    a = np.bincount(hod[et == "purchase"], minlength=24)
    b = np.bincount(hod[et == "view"], minlength=24)
    fa = np.cumsum(a) / a.sum()
    fb = np.cumsum(b) / b.sum()
    ref = (fa - fb).max() + (fb - fa).max()
    assert got["kuiper_v"][0] == pytest.approx(ref, abs=1e-6)


def test_pettitt_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_pettitt

    et, hrs = _rand_events(tmp_path)
    got = q_pettitt(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]]
        h = len(c)
        # independent derivation: 2D summed-area table over the full
        # sign matrix, U_t = block sum over rows<=t, cols>t
        sgn = np.sign(c[:, None].astype(np.int64) - c[None, :])
        sat = sgn.cumsum(axis=0).cumsum(axis=1)
        best_k, best_t = -1, -1
        for t_ in range(h - 1):
            u = int(sat[t_, h - 1] - sat[t_, t_])
            if abs(u) > best_k:
                best_k, best_t = abs(u), t_
        assert int(r["k_stat"]) == best_k
        assert int(r["t_hat"]) == best_t


def test_f_test_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_f_test

    et, cv = _write_valued_events(tmp_path, 89, shift_by_type=1.0)
    got = q_f_test(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        a = cv[et == r["type_a"]].astype(float)
        b = cv[et == r["type_b"]].astype(float)
        ref = a.var(ddof=1) / b.var(ddof=1)
        assert int(r["df1"]) == len(a) - 1
        assert int(r["df2"]) == len(b) - 1
        assert r["f_stat"] == pytest.approx(ref, rel=1e-6)


def test_cliffs_delta_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_cliffs_delta

    et, cv = _write_valued_events(tmp_path, 97, shift_by_type=1.0)
    got = q_cliffs_delta(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        a = cv[et == r["type_a"]]
        b = cv[et == r["type_b"]]
        gt = sum(int((b < x).sum()) for x in a)
        lt = sum(int((b > x).sum()) for x in a)
        ties = len(a) * len(b) - gt - lt
        assert r["cliffs_delta"] == pytest.approx(
            (gt - lt) / (len(a) * len(b)), abs=1e-6)
        assert r["vd_a"] == pytest.approx(
            (gt + ties / 2) / (len(a) * len(b)), abs=1e-6)


def test_page_trend_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_page_trend

    et, hrs = _rand_events(tmp_path)
    got = q_page_trend(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    k = 24
    for _, r in got.iterrows():
        c = dense[r["event_type"]]
        nd = len(c) // 24
        grid = c[: nd * 24].reshape(nd, 24).astype(float)
        l_val = 0.0
        for d in range(nd):
            row = grid[d]
            ranks = np.empty(k)
            order = row.argsort(kind="stable")
            sv = row[order]
            i = 0
            while i < k:
                j = i
                while j < k and sv[j] == sv[i]:
                    j += 1
                ranks[order[i:j]] = (i + j + 1) / 2.0
                i = j
            l_val += sum((h + 1) * ranks[h] for h in range(k))
        e_l = nd * k * (k + 1) ** 2 / 4.0
        var_l = nd * k ** 2 * (k + 1) ** 2 * (k - 1) / 144.0
        assert int(r["l2_stat"]) == int(round(2 * l_val))
        assert r["z"] == pytest.approx(
            (l_val - e_l) / math.sqrt(var_l), abs=1e-5)


def test_jonckheere_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_jonckheere

    rng = np.random.default_rng(101)
    n = 4000
    hrs = rng.integers(0, 30 * 24, n)
    hod = hrs % 24
    # ordered shift: later day-parts get larger values
    val = np.round(rng.gamma(2.0, 3.0, n) + (hod // 6) * 0.5, 2)
    ts = hrs * 3_600_000 + rng.integers(0, 3_600_000, n)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_jonckheere(str(tmp_path)).to_pandas()
    cv = np.rint(val * 100).astype(np.int64)
    part = hod // 6
    jt = 0.0
    for p1 in range(4):
        for p2 in range(p1 + 1, 4):
            a = cv[part == p1]
            b = cv[part == p2]
            for x in a:
                jt += (b > x).sum() + 0.5 * (b == x).sum()
    sizes = [int((part == p).sum()) for p in range(4)]
    nt = sum(sizes)
    e = (nt * nt - sum(s * s for s in sizes)) / 4.0
    v = (nt * nt * (2 * nt + 3)
         - sum(s * s * (2 * s + 3) for s in sizes)) / 72.0
    assert int(got["jt2_stat"][0]) == int(round(2 * jt))
    assert got["z"][0] == pytest.approx((jt - e) / math.sqrt(v), abs=1e-5)


def test_mantel_haenszel_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_mantel_haenszel

    rng = np.random.default_rng(103)
    n = 5000
    eday = rng.integers(19723, 19753, n)
    hod = rng.integers(0, 24, n)
    ts = eday * 86_400_000 + hod * 3_600_000
    et = np.where(rng.random(n) < 0.25, "purchase", "view")
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(np.ones(n, np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_mantel_haenszel(str(tmp_path)).to_pandas()
    dow = (eday + 3) % 7
    night = (hod < 6) | (hod >= 22)
    purch = et == "purchase"
    num = den = 0.0
    for d in range(7):
        m = dow == d
        a = int((m & purch & night).sum())
        b = int((m & purch & ~night).sum())
        c = int((m & ~purch & night).sum())
        dd = int((m & ~purch & ~night).sum())
        ni = a + b + c + dd
        num += a * dd / ni
        den += b * c / ni
    assert int(got["k_strata"][0]) == 7
    assert got["mh_or"][0] == pytest.approx(num / den, abs=1e-4)
    assert got["log_mh_or"][0] == pytest.approx(
        math.log(num / den), abs=1e-4)


def test_ansari_bradley_matches_bruteforce(ray_session, tmp_path):
    """AB equals the naive outside-in midrank-score sum (scipy's tie
    convention: average scores over tied blocks)."""
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_ansari_bradley

    rng = np.random.default_rng(107)
    n = 3000
    et = np.where(rng.random(n) < 0.5, "purchase", "view")
    val = np.round(rng.gamma(2.0, 3.0 + (et == "purchase") * 2.0), 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.full(n, 10 ** 12, np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_ansari_bradley(str(tmp_path)).to_pandas()
    cv = np.rint(val * 100).astype(np.int64)
    pooled = np.sort(cv)
    big_n = len(pooled)
    scores = np.minimum(np.arange(1, big_n + 1),
                        big_n + 1 - np.arange(1, big_n + 1)).astype(float)
    # average scores over tie blocks
    avg = {}
    i = 0
    while i < big_n:
        j = i
        while j < big_n and pooled[j] == pooled[i]:
            j += 1
        avg[int(pooled[i])] = scores[i:j].mean()
        i = j
    ab = sum(avg[int(x)] for x in cv[et == "purchase"])
    assert got["ab_stat"][0] == pytest.approx(ab, abs=1e-2)
    na = int((et == "purchase").sum())
    mb = big_n - na
    if big_n % 2 == 0:
        e = na * (big_n + 2) / 4.0
        v = na * mb * (big_n + 2) * (big_n - 2) / (48.0 * (big_n - 1))
    else:
        e = na * (big_n + 1) ** 2 / (4.0 * big_n)
        v = na * mb * (big_n + 1) * (3 + big_n ** 2) \
            / (48.0 * big_n ** 2)
    assert got["z"][0] == pytest.approx((ab - e) / math.sqrt(v),
                                        abs=1e-4)


def test_cohens_h_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_cohens_h

    rng = np.random.default_rng(109)
    n = 4000
    eday = rng.integers(19723, 19753, n)
    ts = eday * 86_400_000 + rng.integers(0, 86_400_000, n)
    wknd = ((eday + 3) % 7) >= 5
    p_rate = np.where(wknd, 0.3, 0.15)
    et = np.where(rng.random(n) < p_rate, "purchase", "view")
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(np.ones(n, np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_cohens_h(str(tmp_path)).to_pandas()
    p1 = (wknd & (et == "purchase")).sum() / wknd.sum()
    p2 = (~wknd & (et == "purchase")).sum() / (~wknd).sum()
    ref = 2 * (math.asin(math.sqrt(p1)) - math.asin(math.sqrt(p2)))
    assert got["cohens_h"][0] == pytest.approx(ref, abs=1e-4)


def test_ordinal_assoc_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_ordinal_assoc

    rng = np.random.default_rng(113)
    n = 3000
    hrs = rng.integers(0, 30 * 24, n)
    hod = hrs % 24
    val = np.round(rng.gamma(2.0, 20.0, n) + hod * 2.0, 2)
    ts = hrs * 3_600_000 + rng.integers(0, 3_600_000, n)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_ordinal_assoc(str(tmp_path)).to_pandas()
    x = hod
    y = np.rint(val * 100).astype(np.int64) // 5000
    conc = disc = tx = ty = 0
    for i in range(n):
        dxs = x[i + 1:] - x[i]
        dys = y[i + 1:] - y[i]
        conc += int(((dxs > 0) & (dys > 0)).sum()
                    + ((dxs < 0) & (dys < 0)).sum())
        disc += int(((dxs > 0) & (dys < 0)).sum()
                    + ((dxs < 0) & (dys > 0)).sum())
        tx += int(((dxs != 0) & (dys == 0)).sum())
        ty += int(((dxs == 0) & (dys != 0)).sum())
    m = min(len(np.unique(x)), len(np.unique(y)))
    assert int(got["conc"][0]) == conc
    assert int(got["disc"][0]) == disc
    assert got["gamma"][0] == pytest.approx(
        (conc - disc) / (conc + disc), abs=1e-6)
    assert got["somers_dyx"][0] == pytest.approx(
        (conc - disc) / (conc + disc + tx), abs=1e-6)
    assert got["somers_dxy"][0] == pytest.approx(
        (conc - disc) / (conc + disc + ty), abs=1e-6)
    assert got["tau_c"][0] == pytest.approx(
        2 * m * (conc - disc) / (n * n * (m - 1)), abs=1e-6)


def test_icc_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import q_icc

    et, hrs = _rand_events(tmp_path)
    got = q_icc(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    nd = len(next(iter(dense.values()))) // 24
    mat = np.stack([c[: nd * 24].reshape(nd, 24).sum(axis=1)
                    for c in dense.values()], axis=1).astype(float)
    d, k = mat.shape
    gm = mat.mean()
    msr = (k * ((mat.mean(axis=1) - gm) ** 2).sum()) / (d - 1)
    msc = (d * ((mat.mean(axis=0) - gm) ** 2).sum()) / (k - 1)
    sse = ((mat - mat.mean(axis=1, keepdims=True)
            - mat.mean(axis=0, keepdims=True) + gm) ** 2).sum()
    mse = sse / ((d - 1) * (k - 1))
    ref = (msr - mse) / (msr + (k - 1) * mse + k * (msc - mse) / d)
    assert int(got["n_days"][0]) == d
    assert int(got["k_raters"][0]) == k
    assert got["icc2_1"][0] == pytest.approx(ref, abs=1e-5)
