"""Brute-force references for the round-3 continuation statistics waves
(pipelines/stats5.py): dispersion / autocorrelation / inequality /
variance-homogeneity indices computed from naive per-hour loops."""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_stats3 import _dense, _rand_events


def _valued_events(tmp_path, seed=97, n=3000):
    """Events with varied values + user ids (hoover needs non-constant
    value; the stats3 fixture pins value=1)."""
    rng = np.random.default_rng(seed)
    hrs = rng.integers(0, 20 * 24, n)
    ts = hrs * 3_600_000 + rng.integers(0, 3_600_000, n)
    et = np.array(["click", "view", "error"])[rng.integers(0, 3, n)]
    vals = np.round(rng.lognormal(3.0, 1.0, n), 2)
    users = rng.integers(0, 40, n).astype(np.int64)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(users),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    return et, hrs, vals, users


def test_geary_c_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_geary_c

    et, hrs = _rand_events(tmp_path)
    got = q_geary_c(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    assert set(got["event_type"]) == set(dense)
    for _, r in got.iterrows():
        c = dense[r["event_type"]].astype(np.float64)
        num = (len(c) - 1) * ((np.diff(c) ** 2).sum() * 2)
        den = 2 * (2 * (len(c) - 1)) * ((c - c.mean()) ** 2).sum()
        assert r["geary_c"] == pytest.approx(num / den, abs=1e-5)


def test_dispersion_indices_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_dispersion_indices

    et, hrs = _rand_events(tmp_path)
    got = q_dispersion_indices(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]].astype(np.float64)
        h = len(c)
        s1 = c.sum()
        mor = h * (c * (c - 1)).sum() / (s1 * (s1 - 1))
        assert r["morisita"] == pytest.approx(mor, abs=1e-5)
        m = c.mean()
        var_pop = ((c - m) ** 2).mean()
        mstar = m + var_pop / m - 1.0
        assert r["patchiness"] == pytest.approx(mstar / m, abs=1e-5)
        var_s = ((c - m) ** 2).sum() / (h - 1)
        kref = m * m / (var_s - m) if var_s > m else 0.0
        assert r["nb_k"] == pytest.approx(kref, abs=1e-4)


def test_hoover_index_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_hoover_index

    _, _, vals, users = _valued_events(tmp_path)
    got = q_hoover_index(str(tmp_path)).to_pandas()
    cents = np.rint(vals * 100.0).astype(np.int64)
    totals = np.array([cents[users == u].sum()
                       for u in np.unique(users)], np.float64)
    assert int(got["n_users"][0]) == len(totals)
    ref = np.abs(totals - totals.mean()).sum() / (2 * totals.sum())
    assert got["hoover"][0] == pytest.approx(ref, abs=1e-6)


def test_variance_homogeneity_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import (
        q_variance_homogeneity,
    )

    et, hrs = _rand_events(tmp_path)
    got = q_variance_homogeneity(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    vs = {ty: np.var(c.astype(np.float64), ddof=1)
          for ty, c in dense.items()}
    assert int(got["k_groups"][0]) == len(vs)
    mx = max(vs.values())
    assert got["max_type"][0] == min(t for t in vs if vs[t] == mx)
    assert got["fmax"][0] == pytest.approx(mx / min(vs.values()), abs=1e-5)
    assert got["cochran_c"][0] == pytest.approx(
        mx / sum(vs.values()), abs=1e-6)


def test_chatterjee_xi_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_chatterjee_xi

    et, hrs = _rand_events(tmp_path)
    got = q_chatterjee_xi(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, row in got.iterrows():
        y = dense[row["event_type"]]
        n = len(y)
        r = np.array([(y <= yi).sum() for yi in y], np.int64)
        l_ge = np.array([(y >= yi).sum() for yi in y], np.int64)
        num = n * np.abs(np.diff(r)).sum()
        den = 2 * (l_ge * (n - l_ge)).sum()
        assert row["xi"] == pytest.approx(1.0 - num / den, abs=1e-6)


def test_cusum_squares_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_cusum_squares

    et, hrs = _rand_events(tmp_path)
    got = q_cusum_squares(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, row in got.iterrows():
        y = dense[row["event_type"]].astype(np.float64)
        n = len(y)
        c2 = np.cumsum(y * y)
        dev = np.abs(c2[:-1] / c2[-1] - np.arange(1, n) / n)
        assert row["stat"] == pytest.approx(dev.max(), abs=1e-6)
        assert int(row["at_pos"]) == int(np.argmax(dev)) + 1


def test_records_count_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_records_count

    et, hrs = _rand_events(tmp_path)
    got = q_records_count(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, row in got.iterrows():
        y = dense[row["event_type"]]
        best, n_rec, last = -1, 0, 0
        for i, v in enumerate(y):
            if v > best:
                best, n_rec, last = int(v), n_rec + 1, i + 1
        assert int(row["n_records"]) == n_rec
        assert int(row["last_record_pos"]) == last


def test_buishand_range_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_buishand_range

    et, hrs = _rand_events(tmp_path)
    got = q_buishand_range(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, row in got.iterrows():
        y = dense[row["event_type"]].astype(np.float64)
        n = len(y)
        sstar = np.concatenate([[0.0],
                                np.cumsum(y) - np.arange(1, n + 1)
                                * y.mean()])
        r = sstar.max() - sstar.min()
        s = y.std(ddof=1)
        assert row["q"] == pytest.approx(r / (s * math.sqrt(n)), abs=1e-5)
        assert int(row["r_scaled"]) == pytest.approx(r * n, abs=0.5)


def test_emd_and_energy_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import (
        q_emd_cents,
        q_energy_distance,
    )

    et, _, vals, _ = _valued_events(tmp_path, seed=11, n=800)
    cents = np.rint(vals * 100.0).astype(np.int64)
    groups = {ty: np.sort(cents[et == ty]) for ty in np.unique(et)}

    emd = q_emd_cents(str(tmp_path)).to_pandas()
    eng = q_energy_distance(str(tmp_path)).to_pandas()
    assert len(emd) == len(eng) == 3

    for _, row in emd.iterrows():
        a = groups[row["type_a"]].astype(np.float64)
        b = groups[row["type_b"]].astype(np.float64)
        # brute W1 via equal-mass quantile coupling on the merged grid
        grid = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, grid, side="right") / len(a)
        fb = np.searchsorted(b, grid, side="right") / len(b)
        ref = float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(grid)))
        assert row["w1_cents"] == pytest.approx(ref, abs=1e-5)

    for _, row in eng.iterrows():
        a = groups[row["type_a"]].astype(np.float64)
        b = groups[row["type_b"]].astype(np.float64)
        mab = np.abs(a[:, None] - b[None, :]).mean()
        maa = np.abs(a[:, None] - a[None, :]).mean()
        mbb = np.abs(b[:, None] - b[None, :]).mean()
        assert row["energy_cents"] == pytest.approx(
            2 * mab - maa - mbb, abs=1e-5)


def _midrank(a):
    """Average (mid) ranks, 1-based, ties averaged."""
    a = np.asarray(a, np.float64)
    order = np.argsort(a, kind="stable")
    ranks = np.empty(len(a), np.float64)
    i = 0
    srt = a[order]
    while i < len(a):
        j = i
        while j + 1 < len(a) and srt[j + 1] == srt[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def test_quade_test_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_quade_test

    et, hrs = _rand_events(tmp_path)
    got = q_quade_test(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    types = sorted(dense)
    mat = np.stack([dense[t] for t in types]).astype(np.float64)
    k, b = mat.shape
    r = np.stack([_midrank(mat[:, j]) for j in range(b)], axis=1)
    q = _midrank(mat.max(axis=0) - mat.min(axis=0))
    s = q[None, :] * (r - (k + 1) / 2.0)
    sj = s.sum(axis=1)
    a_stat = (s ** 2).sum()
    b_stat = (sj ** 2).sum() / b
    ref = (b - 1) * b_stat / (a_stat - b_stat)
    assert int(got["k_types"][0]) == k
    assert int(got["n_blocks"][0]) == b
    assert got["t_stat"][0] == pytest.approx(ref, abs=1e-5)


def test_levene_mean_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_levene_mean

    et, hrs = _rand_events(tmp_path)
    got = q_levene_mean(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    zs = {t: np.abs(c - c.mean()) for t, c in
          ((t, dense[t].astype(np.float64)) for t in sorted(dense))}
    k = len(zs)
    n = sum(len(z) for z in zs.values())
    zbar = np.concatenate(list(zs.values())).mean()
    between = sum(len(z) * (z.mean() - zbar) ** 2 for z in zs.values())
    within = sum(((z - z.mean()) ** 2).sum() for z in zs.values())
    ref = ((n - k) / (k - 1)) * between / within
    assert got["w_stat"][0] == pytest.approx(ref, abs=1e-5)


def test_bartlett_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_bartlett

    et, hrs = _rand_events(tmp_path)
    got = q_bartlett(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    vs = [np.var(dense[t].astype(np.float64), ddof=1)
          for t in sorted(dense)]
    k = len(vs)
    h = len(next(iter(dense.values())))
    n = k * h
    sp2 = sum((h - 1) * v for v in vs) / (n - k)
    num = (n - k) * math.log(sp2) - sum((h - 1) * math.log(v)
                                        for v in vs)
    c = 1 + (k / (h - 1) - 1 / (n - k)) / (3 * (k - 1))
    # the engine micro-floors each ln: allow a couple of micro-nats * H
    assert got["chi2"][0] == pytest.approx(num / c, abs=2e-3)


def test_bartlett_degenerate_zero_variance(ray_session, tmp_path):
    """A constant series (zero variance) must emit 0.0, not crash."""
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_bartlett

    n = 240
    hrs = np.arange(n) % 120
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array((hrs * 3_600_000).astype(np.int64),
                       pa.timestamp("ms")),
        "user_id": pa.array(np.zeros(n, np.int64)),
        "event_type": pa.array(["flat"] * (n // 2) + ["vary"] * (n // 2),
                               pa.string()),
        "value": pa.array(np.ones(n, np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_bartlett(str(tmp_path)).to_pandas()
    assert got["chi2"][0] == 0.0


def test_gk_lambda_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_gk_lambda

    et, hrs = _rand_events(tmp_path)
    got = q_gk_lambda(str(tmp_path)).to_pandas().iloc[0]
    dow = ((hrs // 24) + 3) % 7
    types = sorted(np.unique(et))
    dows = sorted(np.unique(dow))
    piv = np.zeros((len(types), len(dows)), np.int64)
    for i, ty in enumerate(types):
        for j, d in enumerate(dows):
            piv[i, j] = int(((et == ty) & (dow == d)).sum())
    n = piv.sum()
    srm, scm = piv.max(axis=1).sum(), piv.max(axis=0).sum()
    mct, mrt = piv.sum(axis=0).max(), piv.sum(axis=1).max()
    assert got["n"] == n
    assert got["lambda_c_given_r"] == pytest.approx(
        (srm - mct) / (n - mct), abs=1e-5)
    assert got["lambda_r_given_c"] == pytest.approx(
        (scm - mrt) / (n - mrt), abs=1e-5)
    assert got["lambda_sym"] == pytest.approx(
        (srm + scm - mct - mrt) / (2 * n - mct - mrt), abs=1e-5)


def test_agreement_coefs_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_agreement_coefs

    et, hrs = _rand_events(tmp_path)
    got = q_agreement_coefs(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    big_h = len(next(iter(dense.values())))
    bits = {t: (c * big_h > c.sum()).astype(float) for t, c in dense.items()}
    assert len(got) == 3  # 3 types -> 3 pairs
    for _, r in got.iterrows():
        x, y = bits[r["type_a"]], bits[r["type_b"]]
        po = float((x == y).mean())
        pbar = (x.mean() + y.mean()) / 2.0
        pe_pi = pbar * pbar + (1 - pbar) * (1 - pbar)
        pe_ac = 2.0 * pbar * (1 - pbar)
        assert r["scott_pi"] == pytest.approx(
            (po - pe_pi) / (1 - pe_pi), abs=1e-5)
        assert r["gwet_ac1"] == pytest.approx(
            (po - pe_ac) / (1 - pe_ac), abs=1e-5)


def test_lins_ccc_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_lins_ccc

    et, hrs = _rand_events(tmp_path)
    got = q_lins_ccc(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["type_a"]].astype(np.float64)
        y = dense[r["type_b"]].astype(np.float64)
        cov = ((x - x.mean()) * (y - y.mean())).mean()
        den = x.var() + y.var() + (x.mean() - y.mean()) ** 2
        assert r["ccc"] == pytest.approx(2 * cov / den, abs=1e-5)


# ---------------------------------------------------------------------------
# wave 15: two-sample distribution tests
# ---------------------------------------------------------------------------

def _cents_by_type(et, vals):
    cents = np.rint(vals * 100).astype(np.int64)
    return {t: np.sort(cents[et == t]) for t in np.unique(et)}


def test_ks_two_sample_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_ks_two_sample

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_ks_two_sample(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    assert len(got) == 3
    for _, r in got.iterrows():
        a, b = by[r["type_a"]], by[r["type_b"]]
        sup = np.union1d(a, b)
        fa = np.searchsorted(a, sup, side="right") / len(a)
        fb = np.searchsorted(b, sup, side="right") / len(b)
        d = np.abs(fa - fb)
        k = int(d.argmax())
        assert r["d_stat"] == pytest.approx(d[k], abs=1e-6)
        assert r["at_cv"] == sup[k]


def test_kuiper_two_sample_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_kuiper_two_sample

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_kuiper_two_sample(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        a, b = by[r["type_a"]], by[r["type_b"]]
        sup = np.union1d(a, b)
        fa = np.searchsorted(a, sup, side="right") / len(a)
        fb = np.searchsorted(b, sup, side="right") / len(b)
        v = max((fa - fb).max(), 0) + max((fb - fa).max(), 0)
        assert r["kuiper_v"] == pytest.approx(v, abs=1e-6)


def test_cvm_two_sample_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_cvm_two_sample

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_cvm_two_sample(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        a, b = by[r["type_a"]], by[r["type_b"]]
        na, nb = len(a), len(b)
        pooled = np.concatenate([a, b])
        fa = np.searchsorted(a, pooled, side="right") / na
        fb = np.searchsorted(b, pooled, side="right") / nb
        t = na * nb / (na + nb) ** 2 * ((fa - fb) ** 2).sum()
        assert r["cvm_t"] == pytest.approx(t, abs=1e-6)


def test_cucconi_matches_bruteforce(ray_session, tmp_path):
    import pandas as pd

    from prom_tsdb_copyer_ray.pipelines.stats5 import q_cucconi

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_cucconi(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        a, b = by[r["type_a"]], by[r["type_b"]]
        n1, n2 = len(a), len(b)
        n = n1 + n2
        ranks = pd.Series(np.concatenate([a, b])).rank(method="average")
        ra = ranks.to_numpy()[:n1]
        s2 = (ra ** 2).sum()
        s2c = ((n + 1 - ra) ** 2).sum()
        var = n1 * n2 * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5.0
        u = (6 * s2 - n1 * (n + 1) * (2 * n + 1)) / np.sqrt(var)
        v = (6 * s2c - n1 * (n + 1) * (2 * n + 1)) / np.sqrt(var)
        rho = 2.0 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1.0
        c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
        assert r["cucconi_c"] == pytest.approx(c, rel=1e-6, abs=1e-6)


def test_ks_two_sample_identical_distributions(ray_session, tmp_path):
    """Two types with byte-identical value multisets: D = 0 and at_cv is
    the smallest support cent on both engines."""
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_ks_two_sample

    n = 200
    rng = np.random.default_rng(5)
    vals = np.round(rng.lognormal(2.0, 0.7, n), 2)
    t = pa.table({
        "event_id": pa.array(np.arange(2 * n, dtype=np.int64)),
        "ts": pa.array(np.arange(2 * n, dtype=np.int64) * 60_000,
                       pa.timestamp("ms")),
        "user_id": pa.array(np.zeros(2 * n, np.int64)),
        "event_type": pa.array(["a"] * n + ["b"] * n, pa.string()),
        "value": pa.array(np.concatenate([vals, vals])),
        "props": pa.array(["{}"] * (2 * n), pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_ks_two_sample(str(tmp_path)).to_pandas()
    assert got["d_stat"][0] == 0.0
    assert got["at_cv"][0] == int(np.rint(vals * 100).min())


# ---------------------------------------------------------------------------
# wave 16: contingency effect sizes
# ---------------------------------------------------------------------------

def _pivot_type_dow(et, hrs):
    dow = ((hrs // 24) + 3) % 7
    types = sorted(np.unique(et))
    dows = sorted(np.unique(dow))
    piv = np.zeros((len(types), len(dows)), np.int64)
    for i, ty in enumerate(types):
        for j, d in enumerate(dows):
            piv[i, j] = int(((et == ty) & (dow == d)).sum())
    return piv


def test_cramers_v_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_cramers_v_dow

    et, hrs = _rand_events(tmp_path)
    got = q_cramers_v_dow(str(tmp_path)).to_pandas().iloc[0]
    piv = _pivot_type_dow(et, hrs).astype(np.float64)
    n = piv.sum()
    exp = np.outer(piv.sum(axis=1), piv.sum(axis=0)) / n
    chi2 = ((piv - exp) ** 2 / exp).sum()
    r, c = piv.shape
    assert got["n"] == n
    assert got["chi2"] == pytest.approx(chi2, abs=1e-4)
    assert got["cramers_v"] == pytest.approx(
        np.sqrt(chi2 / (n * min(r - 1, c - 1))), abs=1e-5)
    assert got["tschuprow_t"] == pytest.approx(
        np.sqrt(chi2 / (n * np.sqrt((r - 1) * (c - 1)))), abs=1e-5)
    assert got["pearson_c"] == pytest.approx(
        np.sqrt(chi2 / (chi2 + n)), abs=1e-5)


def test_gk_tau_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_gk_tau

    et, hrs = _rand_events(tmp_path)
    got = q_gk_tau(str(tmp_path)).to_pandas().iloc[0]
    piv = _pivot_type_dow(et, hrs).astype(np.float64)
    n = piv.sum()
    rows = piv.sum(axis=1)
    cols = piv.sum(axis=0)
    # tau_{c|r}: reduction in Gini error predicting dow from type
    tau_cr = ((n * ((piv ** 2).sum(axis=1) / rows).sum()
               - (cols ** 2).sum())
              / (n ** 2 - (cols ** 2).sum()))
    tau_rc = ((n * ((piv ** 2).sum(axis=0) / cols).sum()
               - (rows ** 2).sum())
              / (n ** 2 - (rows ** 2).sum()))
    assert got["tau_c_given_r"] == pytest.approx(tau_cr, abs=1e-5)
    assert got["tau_r_given_c"] == pytest.approx(tau_rc, abs=1e-5)


def test_yule_coefs_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_yule_coefs

    rng = np.random.default_rng(11)
    n = 2000
    hrs = rng.integers(0, 20 * 24, n)
    et = np.array(["purchase", "view", "click"])[rng.integers(0, 3, n)]
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array((hrs * 3_600_000).astype(np.int64),
                       pa.timestamp("ms")),
        "user_id": pa.array(np.zeros(n, np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(np.ones(n, np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_yule_coefs(str(tmp_path)).to_pandas().iloc[0]
    we = ((hrs // 24) + 3) % 7 >= 5
    pu = et == "purchase"
    a = float((we & pu).sum())
    b = float((we & ~pu).sum())
    c = float((~we & pu).sum())
    d = float((~we & ~pu).sum())
    assert got["yule_q"] == pytest.approx(
        (a * d - b * c) / (a * d + b * c), abs=1e-6)
    assert got["yule_y"] == pytest.approx(
        (np.sqrt(a * d) - np.sqrt(b * c))
        / (np.sqrt(a * d) + np.sqrt(b * c)), abs=1e-6)


def test_yule_coefs_degenerate_no_purchase(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_yule_coefs

    et, hrs = _rand_events(tmp_path)  # click/view/error only
    got = q_yule_coefs(str(tmp_path)).to_pandas().iloc[0]
    assert got["yule_q"] == 0.0
    assert got["yule_y"] == 0.0


# ---------------------------------------------------------------------------
# wave 17: multi-rater agreement
# ---------------------------------------------------------------------------

def test_fleiss_kappa_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_fleiss_kappa

    et, hrs = _rand_events(tmp_path)
    got = q_fleiss_kappa(str(tmp_path)).to_pandas().iloc[0]
    dense = _dense(et, hrs)
    big_h = len(next(iter(dense.values())))
    bits = np.stack([(c * big_h > c.sum()).astype(np.int64)
                     for _, c in sorted(dense.items())])
    nr = bits.shape[0]
    n1 = bits.sum(axis=0)
    nij = np.stack([n1, nr - n1], axis=1).astype(np.float64)
    p_i = ((nij ** 2).sum(axis=1) - nr) / (nr * (nr - 1))
    p_bar = p_i.mean()
    p_j = nij.sum(axis=0) / (big_h * nr)
    p_e = (p_j ** 2).sum()
    assert got["n_raters"] == nr
    assert got["fleiss_kappa"] == pytest.approx(
        (p_bar - p_e) / (1 - p_e), abs=1e-6)


def test_kripp_alpha_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_kripp_alpha

    et, hrs = _rand_events(tmp_path)
    got = q_kripp_alpha(str(tmp_path)).to_pandas().iloc[0]
    dense = _dense(et, hrs)
    big_h = len(next(iter(dense.values())))
    bits = np.stack([(c * big_h > c.sum()).astype(np.int64)
                     for _, c in sorted(dense.items())])
    nr = bits.shape[0]
    n1 = bits.sum(axis=0).astype(np.float64)
    n0 = nr - n1
    big_n = big_h * nr
    d_o = 2 * (n1 * n0).sum() / (nr - 1)
    c1, c0 = n1.sum(), n0.sum()
    d_e = 2 * c1 * c0 / (big_n - 1)
    assert got["kripp_alpha"] == pytest.approx(1 - d_o / d_e, abs=1e-6)


def test_weighted_kappa_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats3 import _ntile_1based
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_weighted_kappa

    et, hrs = _rand_events(tmp_path)
    got = q_weighted_kappa(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    big_h = len(next(iter(dense.values())))
    codes = {}
    for t, c in dense.items():
        order = np.lexsort((np.arange(big_h), c))
        q = np.empty(big_h, np.int64)
        for r0, idx in enumerate(order):
            q[idx] = _ntile_1based(r0 + 1, big_h, 5)
        codes[t] = q
    for _, r in got.iterrows():
        qa, qb = codes[r["type_a"]], codes[r["type_b"]]
        joint = np.zeros((5, 5), np.float64)
        for i, j in zip(qa - 1, qb - 1):
            joint[i, j] += 1
        joint /= big_h
        rr, cc = joint.sum(axis=1), joint.sum(axis=0)
        idx = np.arange(5)
        for wname, w in (("kappa_lin", np.abs(idx[:, None] - idx)),
                         ("kappa_quad", (idx[:, None] - idx) ** 2)):
            po = (w * joint).sum()
            pe = (w * np.outer(rr, cc)).sum()
            assert r[wname] == pytest.approx(1 - po / pe, abs=1e-6)


# ---------------------------------------------------------------------------
# wave 18: signal complexity
# ---------------------------------------------------------------------------

def test_hjorth_params_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_hjorth_params

    et, hrs = _rand_events(tmp_path)
    got = q_hjorth_params(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["event_type"]].astype(np.float64)
        d1, d2 = np.diff(x), np.diff(np.diff(x))
        v0, v1, v2 = x.var(), d1.var(), d2.var()
        mob = np.sqrt(v1 / v0)
        assert r["activity"] == pytest.approx(v0, abs=1e-4)
        assert r["mobility"] == pytest.approx(mob, abs=1e-5)
        assert r["complexity"] == pytest.approx(
            np.sqrt(v2 / v1) / mob, abs=1e-5)


def test_sample_entropy_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_sample_entropy

    et, hrs = _rand_events(tmp_path)
    got = q_sample_entropy(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["event_type"]].astype(np.int64)
        ad = np.sort(np.abs(np.diff(x)))
        tol = int(ad[(len(ad) + 1) // 2 - 1])
        assert r["r_tol"] == tol
        n_t = len(x) - 2
        b = a = 0
        for i in range(n_t):
            for j in range(i + 1, n_t):
                if (abs(x[i] - x[j]) <= tol
                        and abs(x[i + 1] - x[j + 1]) <= tol):
                    b += 1
                    if abs(x[i + 2] - x[j + 2]) <= tol:
                        a += 1
        assert r["b_cnt"] == b
        assert r["a_cnt"] == a
        if a and b:
            assert r["sampen"] == pytest.approx(np.log(b / a), abs=1e-5)


def test_katz_fd_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_katz_fd

    et, hrs = _rand_events(tmp_path)
    got = q_katz_fd(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["event_type"]].astype(np.float64)
        ll = np.abs(np.diff(x)).sum()
        ext = np.abs(x - x[0]).max()
        n = len(x) - 1
        ref = np.log(n) / (np.log(n) + np.log(ext) - np.log(ll))
        assert r["katz_fd"] == pytest.approx(ref, abs=1e-4)


def test_mean_crossings_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_mean_crossings

    et, hrs = _rand_events(tmp_path)
    got = q_mean_crossings(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["event_type"]].astype(np.float64)
        s = np.sign(x - x.mean())
        cr = int(((s[:-1] * s[1:]) < 0).sum())
        assert r["crossings"] == cr
        assert r["rate"] == pytest.approx(cr / (len(x) - 1), abs=1e-6)


# ---------------------------------------------------------------------------
# wave 19: robust scale
# ---------------------------------------------------------------------------

def test_gini_mean_diff_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_gini_mean_diff

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_gini_mean_diff(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        x = by[r["event_type"]].astype(np.float64)
        n = len(x)
        pair_sum = np.abs(x[:, None] - x[None, :]).sum() / 2
        gmd = 2 * pair_sum / (n * (n - 1))
        assert r["gmd_cents"] == pytest.approx(gmd, rel=1e-9, abs=1e-5)
        assert r["gmd_rel"] == pytest.approx(gmd / x.mean(), abs=1e-6)


def test_robust_spread_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_robust_spread

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_robust_spread(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        x = np.sort(by[r["event_type"]])
        n = len(x)
        med = x[-(-n // 2) - 1]
        q1 = x[-(-n // 4) - 1]
        q3 = x[-(-(3 * n) // 4) - 1]
        mad = np.sort(np.abs(x - med))[-(-n // 2) - 1]
        assert r["med_cents"] == med
        assert r["mad_cents"] == mad
        assert r["q1_cents"] == q1
        assert r["q3_cents"] == q3
        assert r["iqr_cents"] == q3 - q1
        assert r["qcd"] == pytest.approx((q3 - q1) / (q3 + q1), abs=1e-6)


def test_qn_scale_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_qn_scale

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_qn_scale(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        x = by[r["event_type"]]
        n = len(x)
        iu = np.triu_indices(n, k=1)
        diffs = np.sort(np.abs(x[:, None] - x[None, :])[iu])
        h = n // 2 + 1
        k = h * (h - 1) // 2
        assert r["n"] == n
        assert r["qn_cents"] == diffs[k - 1]


# ---------------------------------------------------------------------------
# wave 20: vocabulary richness estimators
# ---------------------------------------------------------------------------

def _docs_fixture(tmp_path, seed=29, n_docs=60):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa", "lonely", "rare"]
    probs = np.array([20, 15, 12, 9, 7, 5, 4, 3, 2, 1, 0.5, 0.5])
    probs = probs / probs.sum()
    texts = [" ".join(rng.choice(words, size=rng.integers(5, 40),
                                 p=probs)) for _ in range(n_docs)]
    t = pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "url": pa.array([f"http://x/{i}" for i in range(n_docs)]),
        "lang": pa.array(["en"] * n_docs),
        "text": pa.array(texts),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    from collections import Counter
    c = Counter()
    for s in texts:
        c.update(w.lower() for w in s.split())
    return c


def test_jackknife_richness_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_jackknife_richness

    c = _docs_fixture(tmp_path)
    got = q_jackknife_richness(str(tmp_path)).to_pandas().iloc[0]
    n = sum(c.values())
    v = len(c)
    v1 = sum(1 for x in c.values() if x == 1)
    v2 = sum(1 for x in c.values() if x == 2)
    assert got["vocab"] == v
    assert got["jack1"] == pytest.approx(v + v1 * (n - 1) / n, abs=1e-5)
    assert got["jack2"] == pytest.approx(
        v + v1 * (2 * n - 3) / n - v2 * (n - 2) ** 2 / (n * (n - 1)),
        abs=1e-5)


def test_menhinick_dugast_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_menhinick_dugast

    c = _docs_fixture(tmp_path)
    got = q_menhinick_dugast(str(tmp_path)).to_pandas().iloc[0]
    n = sum(c.values())
    v = len(c)
    assert got["menhinick"] == pytest.approx(v / np.sqrt(n), abs=1e-6)
    assert got["dugast_uber"] == pytest.approx(
        np.log(n) ** 2 / (np.log(n) - np.log(v)), abs=1e-4)


def test_brillouin_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_brillouin_index

    c = _docs_fixture(tmp_path)
    got = q_brillouin_index(str(tmp_path)).to_pandas().iloc[0]
    n = sum(c.values())
    ref = (math.lgamma(n + 1)
           - sum(math.lgamma(m + 1) for m in c.values())) / n
    assert got["n_tokens"] == n
    assert got["brillouin"] == pytest.approx(ref, abs=1e-4)


# ---------------------------------------------------------------------------
# wave 21: bivariate dependence
# ---------------------------------------------------------------------------

def test_hoeffding_d_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_hoeffding_d

    et, hrs = _rand_events(tmp_path)
    got = q_hoeffding_d(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, row in got.iterrows():
        x = dense[row["type_a"]].astype(np.float64)
        y = dense[row["type_b"]].astype(np.float64)
        n = len(x)
        r = np.empty(n)
        s = np.empty(n)
        q = np.empty(n)
        for i in range(n):
            r[i] = (x < x[i]).sum() + ((x == x[i]).sum() + 1) / 2
            s[i] = (y < y[i]).sum() + ((y == y[i]).sum() + 1) / 2
            q[i] = (1 + ((x < x[i]) & (y < y[i])).sum()
                    + 0.5 * ((x == x[i]) & (y < y[i])).sum()
                    + 0.5 * ((x < x[i]) & (y == y[i])).sum()
                    + 0.25 * (((x == x[i]) & (y == y[i])).sum() - 1))
        d1 = ((q - 1) * (q - 2)).sum()
        d2 = ((r - 1) * (r - 2) * (s - 1) * (s - 2)).sum()
        d3 = ((r - 2) * (s - 2) * (q - 1)).sum()
        d = (30 * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
             / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4)))
        assert row["hoeffding_d"] == pytest.approx(d, abs=1e-6)


def test_blomqvist_beta_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_blomqvist_beta

    et, hrs = _rand_events(tmp_path)
    got = q_blomqvist_beta(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, row in got.iterrows():
        x = dense[row["type_a"]]
        y = dense[row["type_b"]]
        n = len(x)
        mx = np.sort(x)[(n + 1) // 2 - 1]
        my = np.sort(y)[(n + 1) // 2 - 1]
        n1 = (((x > mx) & (y > my)) | ((x < mx) & (y < my))).sum()
        n2 = (((x > mx) & (y < my)) | ((x < mx) & (y > my))).sum()
        assert row["blomqvist_beta"] == pytest.approx(
            (n1 - n2) / (n1 + n2), abs=1e-6)


def test_dcor_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_dcor

    et, hrs = _rand_events(tmp_path)
    got = q_dcor(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, row in got.iterrows():
        x = dense[row["type_a"]].astype(np.float64)
        y = dense[row["type_b"]].astype(np.float64)
        a = np.abs(x[:, None] - x[None, :])
        b = np.abs(y[:, None] - y[None, :])
        aa = a - a.mean(0) - a.mean(1)[:, None] + a.mean()
        bb = b - b.mean(0) - b.mean(1)[:, None] + b.mean()
        dcov2 = (aa * bb).mean()
        vx = (aa * aa).mean()
        vy = (bb * bb).mean()
        ref = np.sqrt(dcov2 / np.sqrt(vx * vy))
        assert row["dcor"] == pytest.approx(ref, abs=1e-5)


def test_dcor_perfect_dependence(ray_session, tmp_path):
    """x and y = 2x are perfectly (linearly) distance-correlated."""
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_dcor

    n = 120
    rng = np.random.default_rng(3)
    base = rng.integers(1, 8, n)
    hrs = np.repeat(np.arange(n), base)
    et = ["a"] * len(hrs) + ["b"] * (2 * len(hrs))
    hrs2 = np.concatenate([hrs, hrs, hrs])
    t = pa.table({
        "event_id": pa.array(np.arange(len(et), dtype=np.int64)),
        "ts": pa.array((hrs2 * 3_600_000).astype(np.int64),
                       pa.timestamp("ms")),
        "user_id": pa.array(np.zeros(len(et), np.int64)),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(np.ones(len(et), np.float64)),
        "props": pa.array(["{}"] * len(et), pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_dcor(str(tmp_path)).to_pandas()
    assert got["dcor"][0] == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------------------
# wave 22: homogeneity / records / long memory
# ---------------------------------------------------------------------------

def test_snht_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_snht

    et, hrs = _rand_events(tmp_path)
    got = q_snht(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["event_type"]].astype(np.float64)
        n = len(x)
        mu, var = x.mean(), x.var()
        best_t, best_k = -1.0, 0
        for k in range(1, n):
            z1 = (x[:k].mean() - mu) / np.sqrt(var)
            z2 = (x[k:].mean() - mu) / np.sqrt(var)
            t = k * z1 * z1 + (n - k) * z2 * z2
            if t > best_t + 1e-12:
                best_t, best_k = t, k
        assert r["at_k"] == best_k
        assert r["t_max"] == pytest.approx(best_t, abs=1e-5)


def test_foster_stuart_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_foster_stuart

    et, hrs = _rand_events(tmp_path)
    got = q_foster_stuart(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["event_type"]]
        up = sum(1 for i in range(1, len(x))
                 if x[i] > x[:i].max())
        lo = sum(1 for i in range(1, len(x))
                 if x[i] < x[:i].min())
        assert r["n_upper"] == up
        assert r["n_lower"] == lo
        assert r["fs_d"] == up - lo
        assert r["fs_s"] == up + lo


def test_rs_hurst_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_rs_hurst

    et, hrs = _rand_events(tmp_path)
    got = q_rs_hurst(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["event_type"]].astype(np.float64)
        means = {}
        for w in (64, 256):
            vals = []
            for j in range(len(x) // w):
                seg = x[j * w:(j + 1) * w]
                dev = np.cumsum(seg - seg.mean())
                rng = dev.max() - dev.min()
                s = seg.std(ddof=1)
                if s > 0 and rng > 0:
                    vals.append(rng / s)
            means[w] = np.mean(vals) if vals else 0.0
        assert r["rs64"] == pytest.approx(means[64], abs=1e-4)
        assert r["rs256"] == pytest.approx(means[256], abs=1e-4)
        if means[64] > 0 and means[256] > 0:
            assert r["hurst_rs"] == pytest.approx(
                np.log(means[256] / means[64]) / np.log(4), abs=1e-4)


# ---------------------------------------------------------------------------
# wave 23: two-sample score tests
# ---------------------------------------------------------------------------

def _perm_z_ref(scores_pool, in_a, n1, n2):
    n = n1 + n2
    t = scores_pool[in_a].sum()
    s_mean = scores_pool.mean()
    pop_var = scores_pool.var()
    var_t = n1 * n2 * pop_var / (n - 1)
    return (t - n1 * s_mean) / np.sqrt(var_t)


def test_mood_squared_ranks_matches_bruteforce(ray_session, tmp_path):
    import pandas as pd

    from prom_tsdb_copyer_ray.pipelines.stats5 import q_mood_squared_ranks

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_mood_squared_ranks(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        a, b = by[r["type_a"]], by[r["type_b"]]
        pool = np.concatenate([a, b])
        n = len(pool)
        ranks = pd.Series(pool).rank(method="average").to_numpy()
        scores = (ranks - (n + 1) / 2) ** 2
        in_a = np.zeros(n, bool)
        in_a[:len(a)] = True
        ref = _perm_z_ref(scores, in_a, len(a), len(b))
        assert r["mood_z"] == pytest.approx(ref, abs=1e-5)


def test_savage_scores_matches_bruteforce(ray_session, tmp_path):
    import pandas as pd

    from prom_tsdb_copyer_ray.pipelines.stats5 import q_savage_scores

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_savage_scores(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        a, b = by[r["type_a"]], by[r["type_b"]]
        pool = np.concatenate([a, b])
        n = len(pool)
        # exact savage scores with tie averaging (float reference)
        inc = 1.0 / (n - np.arange(1, n + 1) + 1)
        hs = np.concatenate([[0.0], np.cumsum(inc)])
        order = np.sort(pool)
        sv = np.empty(n)
        ranks = pd.Series(pool).rank(method="min").to_numpy(np.int64)
        cnt = pd.Series(pool).groupby(pool).transform("size") \
            .to_numpy(np.int64)
        for i in range(n):
            lo = ranks[i] - 1
            hi = lo + cnt[i]
            sv[i] = (hs[hi] - hs[lo]) / cnt[i]
        in_a = np.zeros(n, bool)
        in_a[:len(a)] = True
        ref = _perm_z_ref(sv, in_a, len(a), len(b))
        assert r["savage_z"] == pytest.approx(ref, abs=1e-3)


def test_fligner_policello_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_fligner_policello

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_fligner_policello(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        a, b = by[r["type_a"]], by[r["type_b"]]
        p = np.array([(b < x).sum() + 0.5 * (b == x).sum() for x in a])
        q = np.array([(a < y).sum() + 0.5 * (a == y).sum() for y in b])
        v1 = ((p - p.mean()) ** 2).sum()
        v2 = ((q - q.mean()) ** 2).sum()
        ref = ((p.sum() - q.sum())
               / (2 * np.sqrt(v1 + v2 + p.mean() * q.mean())))
        assert r["fp_z"] == pytest.approx(ref, abs=1e-5)


# ---------------------------------------------------------------------------
# wave 24: k-sample AD + contingency GOF variants
# ---------------------------------------------------------------------------

def test_ad_ksample_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_ad_ksample

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_ad_ksample(str(tmp_path)).to_pandas().iloc[0]
    by = _cents_by_type(et, vals)
    samples = [by[t] for t in sorted(by)]
    pooled = np.sort(np.concatenate(samples))
    zs = np.unique(pooled)
    n = len(pooled)
    lj = np.array([(pooled == z).sum() for z in zs], np.float64)
    bj = np.cumsum(lj) - lj / 2
    total = 0.0
    for s in samples:
        ni = len(s)
        fij = np.array([(s == z).sum() for z in zs], np.float64)
        mij = np.cumsum(fij) - fij / 2
        den = bj * (n - bj) - n * lj / 4
        ok = den > 0
        inner = (lj[ok] / n * (n * mij[ok] - ni * bj[ok]) ** 2
                 / den[ok]).sum()
        total += inner / ni
    ref = (n - 1) / n * total
    assert got["k_samples"] == len(samples)
    assert got["n_pooled"] == n
    assert got["a2_akn"] == pytest.approx(ref, abs=1e-3)


def test_freeman_tukey_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_freeman_tukey

    et, hrs = _rand_events(tmp_path)
    got = q_freeman_tukey(str(tmp_path)).to_pandas().iloc[0]
    piv = _pivot_type_dow(et, hrs).astype(np.float64)
    n = piv.sum()
    exp = np.outer(piv.sum(axis=1), piv.sum(axis=0)) / n
    ref = 4 * ((np.sqrt(piv) - np.sqrt(exp)) ** 2).sum()
    assert got["freeman_tukey"] == pytest.approx(ref, abs=1e-3)


def test_neyman_chi2_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_neyman_chi2

    et, hrs = _rand_events(tmp_path)
    got = q_neyman_chi2(str(tmp_path)).to_pandas().iloc[0]
    piv = _pivot_type_dow(et, hrs).astype(np.float64)
    n = piv.sum()
    exp = np.outer(piv.sum(axis=1), piv.sum(axis=0)) / n
    mask = piv > 0
    ref = (((piv - exp) ** 2 / piv)[mask]).sum()
    assert got["neyman_chi2"] == pytest.approx(ref, abs=1e-4)


# ---------------------------------------------------------------------------
# wave 25: Lepage + robust location
# ---------------------------------------------------------------------------

def test_lepage_matches_bruteforce(ray_session, tmp_path):
    import pandas as pd

    from prom_tsdb_copyer_ray.pipelines.stats5 import q_lepage

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_lepage(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        a, b = by[r["type_a"]], by[r["type_b"]]
        pool = np.concatenate([a, b])
        n = len(pool)
        ranks = pd.Series(pool).rank(method="average").to_numpy()
        ab_scores = np.minimum(ranks, n + 1 - ranks)
        in_a = np.zeros(n, bool)
        in_a[:len(a)] = True
        zw = _perm_z_ref(ranks, in_a, len(a), len(b))
        zab = _perm_z_ref(ab_scores, in_a, len(a), len(b))
        assert r["lepage_l"] == pytest.approx(zw ** 2 + zab ** 2,
                                              abs=1e-4)


def test_location_estimates_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_location_estimates

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_location_estimates(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        x = np.sort(by[r["event_type"]])
        n = len(x)
        med = x[(n + 1) // 2 - 1]
        q1 = x[(n + 3) // 4 - 1]
        q3 = x[(3 * n + 3) // 4 - 1]
        x33 = x[(n + 2) // 3 - 1]
        x66 = x[(2 * n + 2) // 3 - 1]
        assert r["trimean"] == pytest.approx((q1 + 2 * med + q3) / 4,
                                             abs=1e-6)
        assert r["gastwirth"] == pytest.approx(
            (3 * x33 + 4 * med + 3 * x66) / 10, abs=1e-6)
        assert r["midhinge"] == pytest.approx((q1 + q3) / 2, abs=1e-6)


def test_trimmed_means_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_trimmed_means

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_trimmed_means(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        x = np.sort(by[r["event_type"]])
        n = len(x)
        k = n // 10
        core = x[k:n - k]
        assert r["trimmed_mean"] == pytest.approx(core.mean(),
                                                  abs=1e-6)
        wx = np.concatenate([[x[k]] * k, core, [x[n - k - 1]] * k])
        assert r["winsor_mean"] == pytest.approx(wx.mean(), abs=1e-6)


# ---------------------------------------------------------------------------
# wave 26: Benford, weekly harmonic, cross-correlation
# ---------------------------------------------------------------------------

def test_benford_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_benford_first_digit

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_benford_first_digit(str(tmp_path)).to_pandas().iloc[0]
    cents = np.rint(vals * 100).astype(np.int64)
    cents = cents[cents > 0]
    digits = np.array([int(str(c)[0]) for c in cents])
    n = len(digits)
    p = np.log10(1 + 1 / np.arange(1, 10))
    o = np.array([(digits == d).sum() for d in range(1, 10)],
                 np.float64)
    chi2 = (((o - n * p) ** 2) / (n * p)).sum()
    assert got["n"] == n
    assert got["benford_chi2"] == pytest.approx(chi2, abs=1e-3)
    dev = np.abs(o / n - p)
    assert got["max_dev_digit"] == int(dev.argmax()) + 1
    assert got["max_dev"] == pytest.approx(dev.max(), abs=1e-5)


def test_weekly_harmonic_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_weekly_harmonic

    et, hrs = _rand_events(tmp_path)
    got = q_weekly_harmonic(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        how = hrs[et == r["event_type"]] % 168
        cnt = np.bincount(how, minlength=168).astype(np.float64)
        a = (cnt * np.cos(2 * np.pi * np.arange(168) / 168)).sum()
        b = (cnt * np.sin(2 * np.pi * np.arange(168) / 168)).sum()
        ref = np.sqrt(a * a + b * b) / cnt.sum()
        assert r["n"] == cnt.sum()
        assert r["amp_ratio"] == pytest.approx(ref, abs=1e-4)


def test_cross_corr_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_cross_corr_lags

    et, hrs = _rand_events(tmp_path)
    got = q_cross_corr_lags(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    assert len(got) == 3 * 4  # 3 pairs x 4 lags
    for _, r in got.iterrows():
        x = dense[r["type_a"]].astype(np.float64)
        y = dense[r["type_b"]].astype(np.float64)
        k = int(r["lag"])
        xs, ys = x[:len(x) - k], y[k:]
        ref = np.corrcoef(xs, ys)[0, 1]
        assert r["ccf"] == pytest.approx(ref, abs=1e-6)


# ---------------------------------------------------------------------------
# wave 27: token lengths, Page-Hinkley, activity Gini
# ---------------------------------------------------------------------------

def test_word_length_stats_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_word_length_stats

    c = _docs_fixture(tmp_path)
    got = q_word_length_stats(str(tmp_path)).to_pandas().iloc[0]
    lens = []
    for w, m in c.items():
        lens.extend([len(w)] * m)
    lens = np.array(lens, np.float64)
    assert got["n_tokens"] == len(lens)
    assert got["mean_len"] == pytest.approx(lens.mean(), abs=1e-6)
    assert got["var_len"] == pytest.approx(lens.var(), abs=1e-6)
    vals, cnts = np.unique(lens, return_counts=True)
    p = cnts / cnts.sum()
    assert got["len_entropy"] == pytest.approx(
        -(p * np.log(p)).sum(), abs=1e-4)


def test_page_hinkley_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_page_hinkley

    et, hrs = _rand_events(tmp_path)
    got = q_page_hinkley(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["event_type"]].astype(np.float64)
        s = np.cumsum(x - x.mean())
        best, best_k, run_min = -np.inf, 0, 0.0
        for k in range(len(s)):
            gap = s[k] - run_min
            if gap > best + 1e-12:
                best, best_k = gap, k + 1
            run_min = min(run_min, s[k])
        assert r["at_k"] == best_k
        assert r["ph_stat"] == pytest.approx(best, abs=1e-5)


def test_activity_gini_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_activity_gini

    et, hrs = _rand_events(tmp_path)
    got = q_activity_gini(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["event_type"]].astype(np.float64)
        h = len(x)
        pair = np.abs(x[:, None] - x[None, :]).sum() / 2
        assert r["activity_gini"] == pytest.approx(
            pair / (h * x.sum()), abs=1e-6)


# ---------------------------------------------------------------------------
# wave 28: mode, generalized ESD, Tukey quick
# ---------------------------------------------------------------------------

def test_mode_stats_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_mode_stats

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_mode_stats(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        x = by[r["event_type"]]
        v, c = np.unique(x, return_counts=True)
        best = v[c == c.max()].min()
        assert r["mode_cents"] == best
        assert r["mode_count"] == c.max()
        n = len(x)
        med = np.sort(x)[(n + 1) // 2 - 1]
        ref = 3 * (x.mean() - med) / x.std(ddof=1)
        assert r["pearson_skew2"] == pytest.approx(ref, abs=1e-5)


def test_generalized_esd_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_generalized_esd

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_generalized_esd(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for t in sorted(by):
        x = list(by[t])
        sub = got[got["event_type"] == t].sort_values("round")
        assert list(sub["round"]) == [1, 2, 3]
        for _, r in sub.iterrows():
            arr = np.array(x, np.float64)
            dev = np.abs(arr - arr.mean())
            cand = arr[dev == dev.max()].min()
            assert r["at_cv"] == cand
            assert r["r_stat"] == pytest.approx(
                dev.max() / arr.std(ddof=1), abs=1e-5)
            x.remove(cand)


def test_tukey_quick_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_tukey_quick

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_tukey_quick(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        a, b = by[r["type_a"]], by[r["type_b"]]
        assert r["t_ab"] == (a > b.max()).sum() + (b < a.min()).sum()
        assert r["t_ba"] == (b > a.max()).sum() + (a < b.min()).sum()


# ---------------------------------------------------------------------------
# wave 29: proportion / dispersion / circular quick tests
# ---------------------------------------------------------------------------

def test_two_prop_z_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_two_prop_z

    rng = np.random.default_rng(17)
    n = 2500
    hrs = rng.integers(0, 20 * 24, n)
    et = np.array(["purchase", "view"])[rng.integers(0, 2, n)]
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array((hrs * 3_600_000).astype(np.int64),
                       pa.timestamp("ms")),
        "user_id": pa.array(np.zeros(n, np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(np.ones(n, np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_two_prop_z(str(tmp_path)).to_pandas().iloc[0]
    we = ((hrs // 24) + 3) % 7 >= 5
    pu = et == "purchase"
    x1, n1 = (we & pu).sum(), we.sum()
    x2, n2 = (~we & pu).sum(), (~we).sum()
    p = (x1 + x2) / (n1 + n2)
    ref = ((x1 / n1 - x2 / n2)
           / np.sqrt(p * (1 - p) * (1 / n1 + 1 / n2)))
    assert got["n_weekend"] == n1
    assert got["n_weekday"] == n2
    assert got["prop_z"] == pytest.approx(ref, abs=1e-5)


def test_poisson_dispersion_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_poisson_dispersion

    et, hrs = _rand_events(tmp_path)
    got = q_poisson_dispersion(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["event_type"]].astype(np.float64)
        chi2 = ((x - x.mean()) ** 2).sum() / x.mean()
        assert r["disp_chi2"] == pytest.approx(chi2, abs=1e-4)
        assert r["vmr"] == pytest.approx(x.var() / x.mean(), abs=1e-5)


def test_coef_variation_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_coef_variation

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_coef_variation(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        x = by[r["event_type"]].astype(np.float64)
        assert r["cv"] == pytest.approx(x.std(ddof=1) / x.mean(),
                                        abs=1e-6)
        xs = np.sort(x)
        n = len(xs)
        med = xs[(n + 1) // 2 - 1]
        q1 = xs[(n + 3) // 4 - 1]
        q3 = xs[(3 * n + 3) // 4 - 1]
        assert r["cv_quartile"] == pytest.approx((q3 - q1) / med,
                                                 abs=1e-6)


def test_rayleigh_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_rayleigh_test

    et, hrs = _rand_events(tmp_path)
    got = q_rayleigh_test(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        hod = hrs[et == r["event_type"]] % 24
        ang = 2 * np.pi * hod / 24
        a, b = np.cos(ang).sum(), np.sin(ang).sum()
        n = len(hod)
        rbar = np.sqrt(a * a + b * b) / n
        # z = (A^2+B^2)/(1e12*n) with micro-scaled A,B == n*Rbar^2
        assert r["rayleigh_z"] == pytest.approx(
            (a * a + b * b) / n, abs=1e-3)
        assert r["circ_var"] == pytest.approx(1 - rbar, abs=1e-5)


# ---------------------------------------------------------------------------
# wave 30: concentration analytics
# ---------------------------------------------------------------------------

def test_lorenz_points_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_lorenz_points

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_lorenz_points(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    assert len(got) == 3 * 9
    for _, r in got.iterrows():
        x = np.sort(by[r["event_type"]])
        n = len(x)
        k = -((-int(r["p_pct"]) * n) // 100)
        assert r["lorenz"] == pytest.approx(
            x[:k].sum() / x.sum(), abs=1e-6)


def test_user_hhi_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_user_hhi

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_user_hhi(str(tmp_path)).to_pandas().iloc[0]
    _, cnts = np.unique(users, return_counts=True)
    shares = cnts / cnts.sum()
    hhi = (shares ** 2).sum()
    assert got["n_users"] == len(cnts)
    assert got["hhi"] == pytest.approx(hhi, abs=1e-6)
    assert got["effective_users"] == pytest.approx(1 / hhi, abs=1e-4)


def test_topk_user_share_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_topk_user_share

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_topk_user_share(str(tmp_path)).to_pandas().iloc[0]
    _, cnts = np.unique(users, return_counts=True)
    top = np.sort(cnts)[::-1][:10].sum()
    assert got["n_events"] == len(users)
    assert got["topk_sum"] == top
    assert got["topk_share"] == pytest.approx(top / len(users),
                                              abs=1e-6)


# ---------------------------------------------------------------------------
# wave 31: sessions / burstiness / memory
# ---------------------------------------------------------------------------

def _user_gaps_ref(hrs_ms, users):
    gaps_s, pairs, brk, in_ms = [], [], 0, 0
    for u in np.unique(users):
        t = np.sort(hrs_ms[users == u])
        g = np.diff(t)
        gs = g // 1000
        gaps_s.extend(gs)
        pairs.extend(zip(gs[:-1], gs[1:]))
        brk += int((g > 1_800_000).sum())
        in_ms += int(g[g <= 1_800_000].sum())
    return np.array(gaps_s, np.float64), pairs, brk, in_ms


def test_session_stats_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_session_stats

    et, hrs, vals, users = _valued_events(tmp_path)
    t = pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    tms = t["ts"].cast(pa.int64()).to_numpy()  # timestamp("ms")
    got = q_session_stats(str(tmp_path)).to_pandas().iloc[0]
    gaps, pairs, brk, in_ms = _user_gaps_ref(tms, users)
    n_sessions = len(np.unique(users)) + brk
    assert got["n_sessions"] == n_sessions
    assert got["avg_events"] == pytest.approx(len(users) / n_sessions,
                                              abs=1e-6)
    assert got["avg_duration_s"] == pytest.approx(
        in_ms / 1000 / n_sessions, abs=1e-5)


def test_burstiness_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import (
        q_interevent_burstiness,
    )

    et, hrs, vals, users = _valued_events(tmp_path)
    t = pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    tms = t["ts"].cast(pa.int64()).to_numpy()
    got = q_interevent_burstiness(str(tmp_path)).to_pandas().iloc[0]
    gaps, _, _, _ = _user_gaps_ref(tms, users)
    mu, sig = gaps.mean(), gaps.std()
    assert got["n_gaps"] == len(gaps)
    assert got["burstiness"] == pytest.approx(
        (sig - mu) / (sig + mu), abs=1e-6)


def test_memory_coef_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_interevent_memory

    et, hrs, vals, users = _valued_events(tmp_path)
    t = pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    tms = t["ts"].cast(pa.int64()).to_numpy()
    got = q_interevent_memory(str(tmp_path)).to_pandas().iloc[0]
    _, pairs, _, _ = _user_gaps_ref(tms, users)
    gx = np.array([p[0] for p in pairs], np.float64)
    gy = np.array([p[1] for p in pairs], np.float64)
    assert got["n_pairs"] == len(pairs)
    assert got["memory_coef"] == pytest.approx(
        np.corrcoef(gx, gy)[0, 1], abs=1e-5)


# ---------------------------------------------------------------------------
# wave 32: gap quantiles, lifetimes, per-user counts
# ---------------------------------------------------------------------------

def test_gap_quantiles_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_gap_quantiles

    et, hrs, vals, users = _valued_events(tmp_path)
    t = pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    tms = t["ts"].cast(pa.int64()).to_numpy()
    got = q_gap_quantiles(str(tmp_path)).to_pandas().iloc[0]
    gaps = []
    for u in np.unique(users):
        g = np.diff(np.sort(tms[users == u])) // 1000
        gaps.extend(g)
    gaps = np.sort(np.array(gaps, np.int64))
    n = len(gaps)
    assert got["n_gaps"] == n
    assert got["med_gap_s"] == gaps[(n + 1) // 2 - 1]
    assert got["p90_gap_s"] == gaps[(9 * n + 9) // 10 - 1]
    assert got["p99_gap_s"] == gaps[(99 * n + 99) // 100 - 1]
    assert got["max_gap_s"] == gaps[-1]


def test_user_lifetimes_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_user_lifetimes

    et, hrs, vals, users = _valued_events(tmp_path)
    t = pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    tms = t["ts"].cast(pa.int64()).to_numpy()
    got = q_user_lifetimes(str(tmp_path)).to_pandas().iloc[0]
    uu = np.unique(users)
    spans = np.array([(tms[users == u].max() - tms[users == u].min())
                      // 1000 for u in uu], np.float64)
    singles = sum(1 for u in uu if (users == u).sum() == 1)
    assert got["n_users"] == len(uu)
    assert got["single_share"] == pytest.approx(singles / len(uu),
                                                abs=1e-6)
    assert got["avg_span_s"] == pytest.approx(spans.mean(), abs=1e-5)


def test_events_per_user_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_events_per_user

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_events_per_user(str(tmp_path)).to_pandas().iloc[0]
    _, cnts = np.unique(users, return_counts=True)
    c = cnts.astype(np.float64)
    assert got["n_users"] == len(c)
    assert got["mean_events"] == pytest.approx(c.mean(), abs=1e-6)
    assert got["var_events"] == pytest.approx(c.var(), abs=1e-5)
    assert got["vmr_events"] == pytest.approx(c.var() / c.mean(),
                                              abs=1e-6)


# ---------------------------------------------------------------------------
# wave 33: corpus composition
# ---------------------------------------------------------------------------

def _docs_multi_lang(tmp_path, seed=41, n_docs=80):
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, n_docs)]
    srcs = np.array(["s1", "s2", "s3", "s4"])[rng.integers(0, 4, n_docs)]
    words = ["lorem", "ipsum", "dolor", "sit", "amet"]
    texts = [" ".join(rng.choice(words, size=rng.integers(3, 30)))
             for _ in range(n_docs)]
    t = pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(list(langs)),
        "source": pa.array(list(srcs)),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    return langs, srcs, texts


def test_doc_tokens_by_lang_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_doc_tokens_by_lang

    langs, srcs, texts = _docs_multi_lang(tmp_path)
    got = q_doc_tokens_by_lang(str(tmp_path)).to_pandas()
    toks = np.array([len(s.split()) for s in texts])
    for _, r in got.iterrows():
        sub = np.sort(toks[langs == r["lang"]])
        n = len(sub)
        assert r["n_docs"] == n
        assert r["mean_tokens"] == pytest.approx(sub.mean(), abs=1e-6)
        assert r["med_tokens"] == sub[(n + 1) // 2 - 1]
        assert r["p90_tokens"] == sub[(9 * n + 9) // 10 - 1]


def test_source_concentration_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import (
        q_source_concentration,
    )

    langs, srcs, texts = _docs_multi_lang(tmp_path)
    got = q_source_concentration(str(tmp_path)).to_pandas().iloc[0]
    vals, cnts = np.unique(srcs, return_counts=True)
    shares = cnts / cnts.sum()
    assert got["n_sources"] == len(vals)
    assert got["hhi"] == pytest.approx((shares ** 2).sum(), abs=1e-6)
    top = min(vals[cnts == cnts.max()].tolist())
    assert got["top_source"] == top
    assert got["top_share"] == pytest.approx(cnts.max() / cnts.sum(),
                                             abs=1e-6)


def test_lang_entropy_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_lang_entropy

    langs, srcs, texts = _docs_multi_lang(tmp_path)
    got = q_lang_entropy(str(tmp_path)).to_pandas().iloc[0]
    _, cnts = np.unique(langs, return_counts=True)
    p = cnts / cnts.sum()
    assert got["n_langs"] == len(cnts)
    assert got["lang_entropy"] == pytest.approx(
        -(p * np.log(p)).sum(), abs=1e-4)


# ---------------------------------------------------------------------------
# wave 34: exceedances + calendar profiles
# ---------------------------------------------------------------------------

def test_mean_excess_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_mean_excess

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_mean_excess(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        x = np.sort(by[r["event_type"]])
        n = len(x)
        u = x[(19 * n + 19) // 20 - 1]
        exc = x[x > u]
        assert r["threshold"] == u
        assert r["n_exceed"] == len(exc)
        assert r["mean_excess"] == pytest.approx(
            (exc - u).mean() if len(exc) else 0.0, abs=1e-6)


def test_peak_hour_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_peak_hour_share

    et, hrs = _rand_events(tmp_path)
    got = q_peak_hour_share(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        hod = hrs[et == r["event_type"]] % 24
        cnt = np.bincount(hod, minlength=24)
        assert r["peak_hod"] == int(cnt.argmax())
        assert r["peak_share"] == pytest.approx(
            cnt.max() / cnt.sum(), abs=1e-6)


def test_weekend_lift_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_weekend_lift

    et, hrs = _rand_events(tmp_path)
    got = q_weekend_lift(str(tmp_path)).to_pandas()
    all_hrs = np.arange(hrs.min(), hrs.max() + 1)
    we_h = (((all_hrs // 24) + 3) % 7 >= 5).sum()
    wd_h = len(all_hrs) - we_h
    for _, r in got.iterrows():
        h = hrs[et == r["event_type"]]
        we = (((h // 24) + 3) % 7 >= 5).sum()
        wd = len(h) - we
        assert r["weekend_lift"] == pytest.approx(
            (we / we_h) / (wd / wd_h), abs=1e-5)


# ---------------------------------------------------------------------------
# wave 35: OLS trend + Granger causality
# ---------------------------------------------------------------------------

def test_ols_trend_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_ols_trend

    et, hrs = _rand_events(tmp_path)
    got = q_ols_trend(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        y = dense[r["event_type"]].astype(np.float64)
        t = np.arange(len(y), dtype=np.float64)
        slope = np.polyfit(t, y, 1)[0]
        corr = np.corrcoef(t, y)[0, 1]
        assert r["slope_per_hour"] == pytest.approx(slope, abs=1e-6)
        assert r["r2"] == pytest.approx(corr ** 2, abs=1e-6)


def test_granger_1lag_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_granger_1lag

    et, hrs = _rand_events(tmp_path)
    got = q_granger_1lag(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    assert len(got) == 3 * 2  # 3 types, ordered pairs
    for _, r in got.iterrows():
        xa = dense[r["cause"]].astype(np.float64)
        xb = dense[r["effect"]].astype(np.float64)
        y = xb[1:]
        n = len(y)
        xr = np.column_stack([np.ones(n), xb[:-1]])
        xu = np.column_stack([np.ones(n), xb[:-1], xa[:-1]])
        br, *_ = np.linalg.lstsq(xr, y, rcond=None)
        bu, *_ = np.linalg.lstsq(xu, y, rcond=None)
        rss_r = ((y - xr @ br) ** 2).sum()
        rss_u = ((y - xu @ bu) ** 2).sum()
        f = (rss_r - rss_u) * (n - 3) / rss_u
        assert r["f_stat"] == pytest.approx(f, rel=1e-4, abs=1e-4)


# ---------------------------------------------------------------------------
# wave 36: effect sizes, KL vs pooled, longest run
# ---------------------------------------------------------------------------

def test_cohens_d_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_effect_sizes

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_effect_sizes(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        a = by[r["type_a"]].astype(np.float64)
        b = by[r["type_b"]].astype(np.float64)
        n1, n2 = len(a), len(b)
        sp = np.sqrt(((n1 - 1) * a.var(ddof=1)
                      + (n2 - 1) * b.var(ddof=1)) / (n1 + n2 - 2))
        d = (a.mean() - b.mean()) / sp
        assert r["cohens_d"] == pytest.approx(d, abs=1e-6)
        assert r["hedges_g"] == pytest.approx(
            d * (1 - 3 / (4 * (n1 + n2) - 9)), abs=1e-6)
        assert r["glass_delta"] == pytest.approx(
            (a.mean() - b.mean()) / a.std(ddof=1), abs=1e-6)


def test_kl_vs_pooled_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_kl_vs_pooled

    et, hrs = _rand_events(tmp_path)
    got = q_kl_vs_pooled(str(tmp_path)).to_pandas()
    hod = hrs % 24
    pooled = np.bincount(hod, minlength=24).astype(np.float64)
    q = pooled / pooled.sum()
    for _, r in got.iterrows():
        c = np.bincount(hod[et == r["event_type"]],
                        minlength=24).astype(np.float64)
        p = c / c.sum()
        mask = p > 0
        ref = (p[mask] * np.log(p[mask] / q[mask])).sum()
        assert r["kl_bits_e"] == pytest.approx(ref, abs=1e-4)


def test_longest_run_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_longest_run

    et, hrs = _rand_events(tmp_path)
    got = q_longest_run(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["event_type"]]
        med = np.sort(x)[(len(x) + 1) // 2 - 1]
        above = x > med
        best = cur = runs = 0
        prev = False
        for b in above:
            if b:
                cur += 1
                if not prev:
                    runs += 1
                best = max(best, cur)
            else:
                cur = 0
            prev = bool(b)
        assert r["longest_run"] == best
        assert r["n_runs"] == runs


# ---------------------------------------------------------------------------
# wave 37: overlap / homogeneity
# ---------------------------------------------------------------------------

def test_tv_overlap_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_tv_overlap

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_tv_overlap(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        a, b = by[r["type_a"]], by[r["type_b"]]
        sup = np.union1d(a, b)
        pa_ = np.array([(a == v).sum() for v in sup]) / len(a)
        pb_ = np.array([(b == v).sum() for v in sup]) / len(b)
        tv = np.abs(pa_ - pb_).sum() / 2
        assert r["tv_dist"] == pytest.approx(tv, abs=1e-6)
        assert r["overlap"] == pytest.approx(1 - tv, abs=1e-6)


def test_chi2_homogeneity_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_chi2_homogeneity

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_chi2_homogeneity(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        a, b = by[r["type_a"]], by[r["type_b"]]
        sup = np.union1d(a, b)
        oa = np.array([(a == v).sum() for v in sup], np.float64)
        ob = np.array([(b == v).sum() for v in sup], np.float64)
        n1, n2 = len(a), len(b)
        tot = oa + ob
        ea = n1 * tot / (n1 + n2)
        eb = n2 * tot / (n1 + n2)
        chi2 = (((oa - ea) ** 2 / ea) + ((ob - eb) ** 2 / eb)).sum()
        assert r["chi2"] == pytest.approx(chi2, abs=1e-3)


def test_active_hours_jaccard_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import (
        q_active_hours_jaccard,
    )

    et, hrs = _rand_events(tmp_path)
    got = q_active_hours_jaccard(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        a = dense[r["type_a"]] > 0
        b = dense[r["type_b"]] > 0
        assert r["n_both"] == (a & b).sum()
        assert r["jaccard"] == pytest.approx(
            (a & b).sum() / (a | b).sum(), abs=1e-6)


# ---------------------------------------------------------------------------
# wave 38: ANOVA + shape diagnostics
# ---------------------------------------------------------------------------

def test_anova_f_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_anova_f

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_anova_f(str(tmp_path)).to_pandas().iloc[0]
    by = _cents_by_type(et, vals)
    groups = [by[t].astype(np.float64) for t in sorted(by)]
    allv = np.concatenate(groups)
    gm = allv.mean()
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(allv)
    assert got["k_groups"] == k
    assert got["anova_f"] == pytest.approx(
        (ssb / (k - 1)) / (ssw / (n - k)), abs=1e-4)
    assert got["eta_sq"] == pytest.approx(ssb / (ssb + ssw), abs=1e-6)


def test_dow_uniformity_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_dow_uniformity

    et, hrs = _rand_events(tmp_path)
    got = q_dow_uniformity(str(tmp_path)).to_pandas()
    dow = ((hrs // 24) + 3) % 7
    for _, r in got.iterrows():
        c = np.bincount(dow[et == r["event_type"]],
                        minlength=7).astype(np.float64)
        e = c.sum() / 7
        assert r["chi2_uniform"] == pytest.approx(
            (((c - e) ** 2) / e).sum(), abs=1e-4)


def test_quantile_skew_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_quantile_skew

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_quantile_skew(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        x = np.sort(by[r["event_type"]])
        n = len(x)
        med = x[(n + 1) // 2 - 1]
        q1, q3 = x[(n + 3) // 4 - 1], x[(3 * n + 3) // 4 - 1]
        p10, p90 = x[(n + 9) // 10 - 1], x[(9 * n + 9) // 10 - 1]
        assert r["bowley_skew"] == pytest.approx(
            (q3 + q1 - 2 * med) / (q3 - q1), abs=1e-6)
        assert r["kelly_skew"] == pytest.approx(
            (p90 + p10 - 2 * med) / (p90 - p10), abs=1e-6)


# ---------------------------------------------------------------------------
# wave 39: outliers + uniform GOF
# ---------------------------------------------------------------------------

def test_outlier_counts_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_outlier_counts

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_outlier_counts(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        x = np.sort(by[r["event_type"]])
        n = len(x)
        med = x[(n + 1) // 2 - 1]
        q1, q3 = x[(n + 3) // 4 - 1], x[(3 * n + 3) // 4 - 1]
        mad = np.sort(np.abs(x - med))[(n + 1) // 2 - 1]
        iqr = q3 - q1
        assert r["iqr_low"] == (x < q1 - 1.5 * iqr).sum()
        assert r["iqr_high"] == (x > q3 + 1.5 * iqr).sum()
        assert r["robust_z_cnt"] == (np.abs(x - med) > 3 * mad).sum()


def test_ks_uniform_value_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_ks_uniform_value

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_ks_uniform_value(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        x = np.sort(by[r["event_type"]])
        n = len(x)
        lo, hi = x[0], x[-1]
        sup = np.unique(x)
        f = np.searchsorted(x, sup, side="right") / n
        u = (sup - lo) / (hi - lo)
        d = np.abs(f - u)
        k = int(d.argmax())
        assert r["d_stat"] == pytest.approx(d[k], abs=1e-6)
        assert r["at_cv"] == sup[k]


# ---------------------------------------------------------------------------
# wave 40: value-mass concentration
# ---------------------------------------------------------------------------

def test_half_value_point_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_half_value_point

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_half_value_point(str(tmp_path)).to_pandas()
    by = _cents_by_type(et, vals)
    for _, r in got.iterrows():
        x = np.sort(by[r["event_type"]])
        mass = np.cumsum(x)
        k = int(np.searchsorted(2 * mass, mass[-1]))
        assert r["half_value_cv"] == x[k]
        assert r["events_below"] == pytest.approx(
            (x <= x[k]).sum() / len(x), abs=1e-6)


def test_user_gini_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_user_gini

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_user_gini(str(tmp_path)).to_pandas().iloc[0]
    _, cnts = np.unique(users, return_counts=True)
    c = cnts.astype(np.float64)
    pair = np.abs(c[:, None] - c[None, :]).sum() / 2
    assert got["n_users"] == len(c)
    assert got["user_gini"] == pytest.approx(
        pair / (len(c) * c.sum()), abs=1e-6)


# ---------------------------------------------------------------------------
# wave 41: longitudinal product analytics
# ---------------------------------------------------------------------------

def test_value_trend_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_value_trend

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_value_trend(str(tmp_path)).to_pandas()
    t = pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    tms = t["ts"].cast(pa.int64()).to_numpy()
    days = tms // 86_400_000
    cents = np.rint(vals * 100)
    for _, r in got.iterrows():
        m = et == r["event_type"]
        d = days[m].astype(np.float64)
        v = cents[m].astype(np.float64)
        slope = np.polyfit(d, v, 1)[0]
        corr = np.corrcoef(d, v)[0, 1]
        assert r["slope_cents_day"] == pytest.approx(slope, abs=1e-5)
        assert r["r2"] == pytest.approx(corr ** 2, abs=1e-6)


def test_returning_share_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_returning_share

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_returning_share(str(tmp_path)).to_pandas().iloc[0]
    t = pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    days = t["ts"].cast(pa.int64()).to_numpy() // 86_400_000
    first = {u: days[users == u].min() for u in np.unique(users)}
    returning = sum(1 for u, d in zip(users, days) if d > first[u])
    assert got["n_events"] == len(users)
    assert got["returning_share"] == pytest.approx(
        returning / len(users), abs=1e-6)


def test_stickiness_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats5 import q_stickiness

    et, hrs, vals, users = _valued_events(tmp_path)
    got = q_stickiness(str(tmp_path)).to_pandas().iloc[0]
    t = pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    days = t["ts"].cast(pa.int64()).to_numpy() // 86_400_000
    ud = set(zip(users, days))
    uw = set((u, d // 7) for u, d in ud)
    n_days = len(set(days))
    n_weeks = len(set(d // 7 for d in days))
    assert got["sum_dau"] == len(ud)
    assert got["sum_wau"] == len(uw)
    assert got["stickiness"] == pytest.approx(
        (len(ud) / n_days) / (len(uw) / n_weeks), abs=1e-6)
