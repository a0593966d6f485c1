"""Brute-force references for the round-3 statistics wave
(pipelines/stats4.py): lexical-richness indices computed from a naive
Counter, sequence tests computed from naive per-hour loops."""

from __future__ import annotations

import math
import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_stats3 import _dense, _rand_events, _write_docs


def _counts(texts):
    cf: Counter = Counter()
    for t in texts:
        cf.update(w for w in t.split())
    return cf


def test_lexical_richness_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import (
        q_good_turing,
        q_guiraud_r,
        q_herdan_c,
        q_honore_h,
        q_sichel_s,
        q_simpson_lexical,
        q_yule_k,
    )

    texts, _ = _write_docs(tmp_path)
    cf = _counts(texts)
    n = sum(cf.values())
    v = len(cf)
    v1 = sum(1 for x in cf.values() if x == 1)
    v2 = sum(1 for x in cf.values() if x == 2)
    s2 = sum(x * x for x in cf.values())

    yk = q_yule_k(str(tmp_path)).to_pandas()
    assert int(yk["n_tokens"][0]) == n and int(yk["vocab"][0]) == v
    assert yk["yule_k"][0] == pytest.approx(1e4 * (s2 - n) / n**2, abs=1e-5)

    sd = q_simpson_lexical(str(tmp_path)).to_pandas()
    assert sd["simpson_d"][0] == pytest.approx(
        sum(x * (x - 1) for x in cf.values()) / (n * (n - 1)), abs=1e-6)

    gt = q_good_turing(str(tmp_path)).to_pandas()
    assert int(gt["n_hapax"][0]) == v1
    assert gt["coverage"][0] == pytest.approx(1 - v1 / n, abs=1e-6)

    ss = q_sichel_s(str(tmp_path)).to_pandas()
    assert int(ss["n_dis"][0]) == v2
    assert ss["sichel_s"][0] == pytest.approx(v2 / v, abs=1e-6)

    hc = q_herdan_c(str(tmp_path)).to_pandas()
    assert hc["herdan_c"][0] == pytest.approx(
        math.log(v) / math.log(n), abs=1e-5)

    gr = q_guiraud_r(str(tmp_path)).to_pandas()
    assert gr["guiraud_r"][0] == pytest.approx(v / math.sqrt(n), abs=1e-6)

    hh = q_honore_h(str(tmp_path)).to_pandas()
    assert hh["honore_h"][0] == pytest.approx(
        100 * math.log(n) / (1 - v1 / v), abs=1e-2)


def test_durbin_watson_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_durbin_watson

    et, hrs = _rand_events(tmp_path)
    got = q_durbin_watson(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]].astype(float)
        ref = (np.diff(c) ** 2).sum() / ((c - c.mean()) ** 2).sum()
        assert r["dw"] == pytest.approx(ref, abs=1e-5)


def test_moran_lag1_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_moran_lag1

    et, hrs = _rand_events(tmp_path, seed=33)
    got = q_moran_lag1(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["event_type"]].astype(float)
        h = len(x)
        d = x - x.mean()
        # Moran's I, W = chain adjacency both directions (weight sum
        # 2(H-1)); numerator sum over ordered adjacent pairs
        ref = (h / (2.0 * (h - 1))) * 2.0 * (d[:-1] * d[1:]).sum() \
            / (d * d).sum()
        assert r["moran_i"] == pytest.approx(ref, abs=1e-5)


def test_cox_stuart_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_cox_stuart

    et, hrs = _rand_events(tmp_path, seed=34)
    got = q_cox_stuart(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]]
        h = len(c)
        half, off = h // 2, h - h // 2
        up = sum(1 for i in range(half) if c[i + off] > c[i])
        dn = sum(1 for i in range(half) if c[i + off] < c[i])
        assert int(r["n_up"]) == up and int(r["n_down"]) == dn
        nn = up + dn
        zref = 0.0 if nn == 0 else (2 * up - nn) / math.sqrt(nn)
        assert r["z"] == pytest.approx(zref, abs=1e-6)


def test_kpss_level_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_kpss_level

    et, hrs = _rand_events(tmp_path, seed=35)
    got = q_kpss_level(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        x = dense[r["event_type"]].astype(float)
        h = len(x)
        e = x - x.mean()
        s = np.cumsum(e)
        # eta = H^-2 sum S_t^2 / (sum e^2 / H)
        ref = (s * s).sum() / h**2 / ((e * e).sum() / h)
        assert r["kpss"] == pytest.approx(ref, abs=1e-5)


def test_ks_uniform_hod_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_ks_uniform_hod

    et, hrs = _rand_events(tmp_path, seed=36)
    got = q_ks_uniform_hod(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        hod = hrs[et == r["event_type"]] % 24
        n = len(hod)
        counts = np.bincount(hod, minlength=24)
        cum = np.cumsum(counts)
        ref = max(abs(cum[t] / n - (t + 1) / 24) for t in range(24))
        assert int(r["n"]) == n
        assert r["ks_d"] == pytest.approx(ref, abs=1e-6)


def test_cochran_armitage_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_cochran_armitage

    rng = np.random.default_rng(41)
    n = 6000
    hrs = rng.integers(0, 30 * 24, n)
    # purchase probability rising with day-part -> a real trend
    part = (hrs % 24) // 4
    purch = rng.random(n) < (0.05 + 0.03 * part)
    et = np.where(purch, "purchase", "view")
    ts = hrs * 3_600_000 + rng.integers(0, 3_600_000, n)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(np.ones(n, np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_cochran_armitage(str(tmp_path)).to_pandas()
    r_i = np.array([purch[part == i].sum() for i in range(6)], float)
    n_i = np.array([(part == i).sum() for i in range(6)], float)
    s = np.arange(6, dtype=float)
    big_n, big_r = n_i.sum(), r_i.sum()
    t_stat = (s * r_i).sum() - big_r * (s * n_i).sum() / big_n
    var = (big_r / big_n) * (1 - big_r / big_n) * (
        (s * s * n_i).sum() - (s * n_i).sum() ** 2 / big_n)
    zref = t_stat / math.sqrt(var)
    assert int(got["n_events"][0]) == n
    assert int(got["n_purchases"][0]) == int(big_r)
    assert got["z"][0] == pytest.approx(zref, abs=1e-5)
    assert got["z"][0] > 3  # the planted trend is detected


def _write_valued(tmp_path, seed=61, n=5000, types=("click", "view",
                                                    "purchase")):
    rng = np.random.default_rng(seed)
    et = np.array(types)[rng.integers(0, len(types), n)]
    # per-type location shift so the two-sample statistics are nonzero
    shift = {t: 2.0 * i for i, t in enumerate(types)}
    val = np.round(rng.gamma(2.0, 3.0, n)
                   + np.array([shift[t] for t in et]), 2)
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


def test_anderson_darling_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_anderson_darling

    et, cv = _write_valued(tmp_path)
    got = q_anderson_darling(str(tmp_path)).to_pandas()
    x = np.sort(cv[et == "purchase"])
    y = np.sort(cv[et == "view"])
    n, m = len(x), len(y)
    big_n = n + m
    pooled = np.sort(np.concatenate([x, y]))
    vals = np.unique(pooled)
    ref = 0.0
    for v in vals:
        big_b = int((pooled <= v).sum())
        if big_b >= big_n:
            continue
        l = int((pooled == v).sum())
        big_m = int((x <= v).sum())
        ref += l * (big_m * big_n - n * big_b) ** 2 / (
            big_b * (big_n - big_b))
    ref /= n * m
    assert int(got["n_purchase"][0]) == n
    assert got["ad_a2"][0] == pytest.approx(ref, abs=1e-4)


def test_hodges_lehmann_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_hodges_lehmann

    et, cv = _write_valued(tmp_path, seed=62, n=800)
    got = q_hodges_lehmann(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        a = cv[et == r["type_a"]]
        b = cv[et == r["type_b"]]
        diffs = np.sort((a[:, None] - b[None, :]).ravel())
        k = (len(a) * len(b) + 1) // 2
        assert int(r["hl_cents"]) == int(diffs[k - 1])


def test_jarque_bera_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_jarque_bera

    et, cv = _write_valued(tmp_path, seed=63)
    got = q_jarque_bera(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        x = cv[et == r["event_type"]].astype(float)
        n = len(x)
        d = x - x.mean()
        skew = (d ** 3).mean() / (d ** 2).mean() ** 1.5
        kurt = (d ** 4).mean() / (d ** 2).mean() ** 2 - 3
        ref = n * (skew ** 2 / 6 + kurt ** 2 / 24)
        assert r["jb"] == pytest.approx(ref, rel=1e-4)
        # gamma values are right-skewed: JB must reject normality hard
        assert r["jb"] > 10


def test_heavy_hitters_matches_exact(ray_session, tmp_path):
    """The Misra-Gries two-pass result must EQUAL the exact census
    answer (the mergeable-sketch bound guarantees it)."""
    from collections import Counter

    from prom_tsdb_copyer_ray.pipelines.stats4 import q_heavy_hitters

    texts, _ = _write_docs(tmp_path)
    got = q_heavy_hitters(str(tmp_path)).to_pandas()
    cf = Counter(w for t in texts for w in t.split())
    n = sum(cf.values())
    want = sorted((t, c) for t, c in cf.items() if c * 64 > n)
    assert list(zip(got["term"], got["n"])) == want
    assert len(want) > 0  # the zipf fixture has heavy hitters


def test_ccnet_buckets_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_ccnet_buckets

    texts, _ = _write_docs(tmp_path)
    got = q_ccnet_buckets(str(tmp_path)).to_pandas() \
        .set_index("bucket")
    # brute force: per-doc mean -ln(corpus unigram prob), floor centi
    cf = _counts(texts)
    n_tok = sum(cf.values())
    bs = []
    for t in texts:
        ws = t.split()
        if not ws:
            continue
        nll = round(-sum(math.log(cf[w] / n_tok) for w in ws) / len(ws), 6)
        bs.append(math.floor(nll * 100))
    bs = np.array(sorted(bs))
    n = len(bs)
    t1 = int(bs[(n + 2) // 3 - 1])   # smallest b with 3*cum >= n
    t2 = int(bs[(2 * n + 2) // 3 - 1])
    nh = int((bs <= t1).sum())
    nm = int(((bs > t1) & (bs <= t2)).sum())
    assert int(got.loc["head", "n_docs"]) == nh
    assert int(got.loc["middle", "n_docs"]) == nm
    assert int(got.loc["tail", "n_docs"]) == n - nh - nm
    assert int(got.loc["head", "thr_centinll"]) == t1
    assert int(got.loc["middle", "thr_centinll"]) == t2


def test_ge2_index_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_ge2_index

    et, cv = _write_valued(tmp_path, seed=71)
    got = q_ge2_index(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        x = cv[et == r["event_type"]].astype(float)
        ref = ((x ** 2).mean() / x.mean() ** 2 - 1.0) / 2.0
        assert r["ge2"] == pytest.approx(ref, abs=1e-5)


def test_g_test_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_g_test

    et, hrs = _rand_events(tmp_path, seed=81)
    got = q_g_test(str(tmp_path)).to_pandas()
    dow = (hrs // 24 + 3) % 7
    types = np.unique(et)
    n = len(et)
    ref = 0.0
    for ty in types:
        for d in range(7):
            o = int(((et == ty) & (dow == d)).sum())
            if o == 0:
                continue
            e = (et == ty).sum() * (dow == d).sum() / n
            ref += 2 * o * math.log(o / e)
    assert int(got["n"][0]) == n
    assert got["g_stat"][0] == pytest.approx(ref, abs=0.05)


def test_pielou_j_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_pielou_j

    et, _ = _rand_events(tmp_path, seed=82)
    got = q_pielou_j(str(tmp_path)).to_pandas()
    types, counts = np.unique(et, return_counts=True)
    n = counts.sum()
    h = -sum(c / n * math.log(c / n) for c in counts)
    ref = h / math.log(len(types))
    assert int(got["k_types"][0]) == len(types)
    assert got["pielou_j"][0] == pytest.approx(ref, abs=1e-4)


def test_dixon_q_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_dixon_q

    et, cv = _write_valued(tmp_path, seed=83)
    got = q_dixon_q(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        v = np.unique(cv[et == r["event_type"]])
        rng = v[-1] - v[0]
        assert r["q_low"] == pytest.approx((v[1] - v[0]) / rng, abs=1e-6)
        assert r["q_high"] == pytest.approx((v[-1] - v[-2]) / rng, abs=1e-6)


def test_theil_u_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_theil_u

    et, hrs = _rand_events(tmp_path, seed=91)
    got = q_theil_u(str(tmp_path)).to_pandas()
    dow = (hrs // 24 + 3) % 7
    n = len(et)
    types = np.unique(et)
    hy = -sum((et == t).sum() / n * math.log((et == t).sum() / n)
              for t in types)
    hyx = 0.0
    for d in range(7):
        nd = (dow == d).sum()
        if nd == 0:
            continue
        for t in types:
            o = ((et == t) & (dow == d)).sum()
            if o:
                hyx -= o / n * math.log(o / nd)
    ref = (hy - hyx) / hy
    assert got["theil_u"][0] == pytest.approx(ref, abs=1e-3)


def test_bowker_matches_bruteforce(ray_session, tmp_path):
    from collections import Counter

    from prom_tsdb_copyer_ray.pipelines.stats4 import q_bowker

    rng = np.random.default_rng(92)
    n = 6000
    user = rng.integers(0, 80, n)
    day = rng.integers(19723, 19783, n)
    # drift: types skew toward 'view' late -> asymmetric table
    late = day >= 19753
    p_click = np.where(late, 0.25, 0.6)
    r = rng.random(n)
    et = np.where(r < p_click, "click",
                  np.where(r < p_click + 0.3, "view", "purchase"))
    ts = day * 86_400_000 + rng.integers(0, 86_400_000, n)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("ms")),
        "user_id": pa.array(user.astype(np.int64)),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(np.ones(n, np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_bowker(str(tmp_path)).to_pandas()
    mid = (int(day.min()) + int(day.max()) + 1) // 2
    assert int(got["mid_day"][0]) == mid
    piv: Counter = Counter()
    for u in np.unique(user):
        halves = {}
        for h in (0, 1):
            m = (user == u) & ((day >= mid) == bool(h))
            if not m.any():
                break
            cnt = Counter(et[m])
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            halves[h] = best
        if len(halves) == 2:
            piv[(halves[0], halves[1])] += 1
    types = sorted({a for a, _ in piv} | {b for _, b in piv})
    chi2 = 0.0
    df = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            nij, nji = piv[(ta, tb)], piv[(tb, ta)]
            if nij + nji == 0:
                continue
            df += 1
            chi2 += (nij - nji) ** 2 / (nij + nji)
    assert int(got["df"][0]) == df
    assert got["bowker_chi2"][0] == pytest.approx(chi2, abs=1e-4)
    assert got["bowker_chi2"][0] > 3  # planted drift is asymmetric


def test_chao1_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_chao1

    texts, _ = _write_docs(tmp_path)
    cf = _counts(texts)
    v = len(cf)
    v1 = sum(1 for x in cf.values() if x == 1)
    v2 = sum(1 for x in cf.values() if x == 2)
    got = q_chao1(str(tmp_path)).to_pandas()
    ref = v + v1 * v1 / (2 * v2) if v2 else v + v1 * (v1 - 1) / 2
    assert int(got["vocab"][0]) == v
    assert got["chao1"][0] == pytest.approx(ref, abs=1e-4)


def test_lang_vocab_overlap_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import (
        q_lang_vocab_overlap,
        q_whittaker_beta,
    )

    texts, langs = _write_docs(tmp_path)
    vocab = {}
    for t, l in zip(texts, langs):
        vocab.setdefault(l, set()).update(t.split())
    got = q_lang_vocab_overlap(str(tmp_path)).to_pandas()
    for _, r in got.iterrows():
        a, b = vocab[r["lang_a"]], vocab[r["lang_b"]]
        inter = len(a & b)
        assert int(r["n_inter"]) == inter
        assert int(r["n_union"]) == len(a | b)
        assert r["jaccard"] == pytest.approx(inter / len(a | b), abs=1e-6)
        assert r["overlap"] == pytest.approx(
            inter / min(len(a), len(b)), abs=1e-6)
        assert r["dice"] == pytest.approx(
            2 * inter / (len(a) + len(b)), abs=1e-6)

    wb = q_whittaker_beta(str(tmp_path)).to_pandas()
    gamma = len(set().union(*vocab.values()))
    k = len(vocab)
    ref = k * gamma / sum(len(v) for v in vocab.values()) - 1
    assert int(wb["gamma_vocab"][0]) == gamma
    assert wb["whittaker_beta"][0] == pytest.approx(ref, abs=1e-5)


def test_diversity_indices_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import (
        q_hill_numbers,
        q_margalef,
        q_mcintosh_d,
    )

    texts, _ = _write_docs(tmp_path)
    cf = _counts(texts)
    n = sum(cf.values())
    v = len(cf)
    s2 = sum(x * x for x in cf.values())

    hn = q_hill_numbers(str(tmp_path)).to_pandas()
    h_ref = -sum(c / n * math.log(c / n) for c in cf.values())
    assert int(hn["hill_q0"][0]) == v
    # h1_micronats is N-normalized micro-nat entropy
    assert hn["h1_micronats"][0] / 1e6 == pytest.approx(h_ref, abs=1e-4)
    assert hn["hill_q2"][0] == pytest.approx(n * n / s2, abs=1e-4)

    mc = q_mcintosh_d(str(tmp_path)).to_pandas()
    ref = (n - math.sqrt(s2)) / (n - math.sqrt(n))
    assert mc["mcintosh_d"][0] == pytest.approx(ref, abs=1e-6)

    mg = q_margalef(str(tmp_path)).to_pandas()
    assert mg["margalef_r"][0] == pytest.approx(
        (v - 1) / math.log(n), abs=1e-4)
    assert mg["berger_parker"][0] == pytest.approx(
        max(cf.values()) / n, abs=1e-6)


def test_ace_and_gini_match_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import (
        q_ace_richness,
        q_lexical_gini,
    )

    texts, _ = _write_docs(tmp_path)
    cf = _counts(texts)
    abund = np.array(sorted(cf.values()))
    rare = abund[abund <= 10]
    s_rare, s_abund = len(rare), int((abund > 10).sum())
    n_rare = int(rare.sum())
    f1 = int((abund == 1).sum())
    sumi = int(sum(i * (i - 1) * int((rare == i).sum())
                   for i in range(1, 11)))
    got = q_ace_richness(str(tmp_path)).to_pandas()
    if n_rare in (0, f1) or n_rare < 2:
        ref = float(s_abund + s_rare)   # degenerate: no coverage signal
    else:
        c = 1 - f1 / n_rare
        g2 = max(s_rare * sumi / (c * n_rare * (n_rare - 1)) - 1, 0.0)
        ref = s_abund + s_rare / c + f1 / c * g2
    assert int(got["s_rare"][0]) == s_rare
    assert got["ace"][0] == pytest.approx(ref, rel=1e-6)

    # second fixture with dis-legomena so the REAL correction branch runs
    texts2 = texts + [texts[i] + " " + texts[i] for i in range(0, 40, 2)]
    n2 = len(texts2)
    t2 = pa.table({
        "doc_id": pa.array(np.arange(n2, dtype=np.int64)),
        "text": pa.array(texts2, pa.string()),
        "lang": pa.array(["en"] * n2, pa.string()),
        "source": pa.array(["s"] * n2, pa.string()),
        "n_chars": pa.array([len(x) for x in texts2], pa.int64()),
    })
    pq.write_table(t2, os.path.join(str(tmp_path), "documents.parquet"))
    cf2 = _counts(texts2)
    ab2 = np.array(sorted(cf2.values()))
    rare2 = ab2[ab2 <= 10]
    s_rare2, s_abund2 = len(rare2), int((ab2 > 10).sum())
    n_rare2, f12 = int(rare2.sum()), int((ab2 == 1).sum())
    sumi2 = int(sum(i * (i - 1) * int((rare2 == i).sum())
                    for i in range(1, 11)))
    got2 = q_ace_richness(str(tmp_path)).to_pandas()
    assert n_rare2 not in (0, f12) and n_rare2 >= 2  # branch really runs
    c2 = 1 - f12 / n_rare2
    g22 = max(s_rare2 * sumi2 / (c2 * n_rare2 * (n_rare2 - 1)) - 1, 0.0)
    ref2 = s_abund2 + s_rare2 / c2 + f12 / c2 * g22
    assert got2["ace"][0] == pytest.approx(ref2, rel=1e-6)
    # restore the original fixture for the gini check below
    t1 = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t1, os.path.join(str(tmp_path), "documents.parquet"))

    gg = q_lexical_gini(str(tmp_path)).to_pandas()
    v, n = len(abund), int(abund.sum())
    ranksum = sum((2 * (i + 1) - v - 1) * int(x)
                  for i, x in enumerate(abund))
    assert gg["lexical_gini"][0] == pytest.approx(ranksum / (v * n),
                                                  abs=1e-6)


def test_runs_updown_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_runs_updown

    et, hrs = _rand_events(tmp_path, seed=95)
    got = q_runs_updown(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        s = np.sign(np.diff(dense[r["event_type"]]))
        s = s[s != 0]
        n = len(s)
        runs = 1 + int((s[1:] != s[:-1]).sum()) if n else 0
        assert int(r["n_signs"]) == n and int(r["n_runs"]) == runs
        zref = (0.0 if n == 0 else
                (runs - (2 * n + 1) / 3) / math.sqrt((16 * n - 13) / 90))
        assert r["z"] == pytest.approx(zref, abs=1e-5)


def test_bartels_rvn_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_bartels_rvn

    et, hrs = _rand_events(tmp_path, seed=96)
    got = q_bartels_rvn(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    for _, r in got.iterrows():
        c = dense[r["event_type"]].astype(float)
        # midranks
        order = np.argsort(c, kind="stable")
        ranks = np.empty(len(c))
        i = 0
        srt = c[order]
        while i < len(c):
            j = i
            while j < len(c) and srt[j] == srt[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        num = (np.diff(ranks) ** 2).sum()
        den = ((ranks - ranks.mean()) ** 2).sum()
        assert r["rvn"] == pytest.approx(num / den, abs=1e-5)


def test_seasonal_mk_matches_bruteforce(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.stats4 import q_seasonal_mk

    et, hrs = _rand_events(tmp_path, seed=97)
    got = q_seasonal_mk(str(tmp_path)).to_pandas()
    dense = _dense(et, hrs)
    h_lo = int(hrs.min())
    for _, r in got.iterrows():
        c = dense[r["event_type"]]
        s_tot, var_num = 0, 0
        for hod in range(24):
            x = np.array([c[i] for i in range(len(c))
                          if (h_lo + i) % 24 == hod])
            nh = len(x)
            if nh < 2:
                continue
            s_tot += sum(int(np.sign(x[j] - x[i]))
                         for i in range(nh) for j in range(i + 1, nh))
            tie = sum(int(t) * (t - 1) * (2 * t + 5)
                      for t in np.unique(x, return_counts=True)[1])
            var_num += nh * (nh - 1) * (2 * nh + 5) - tie
        assert int(r["s_stat"]) == s_tot
        assert int(r["var_num"]) == var_num
        zref = ((s_tot - 1) if s_tot > 0 else (s_tot + 1) if s_tot < 0
                else 0) / math.sqrt(var_num / 18.0) if s_tot != 0 else 0.0
        assert r["z"] == pytest.approx(zref, abs=1e-5)
