"""Exact O(H log H) rank / pairwise-sum kernels for the dense-grid
pair-statistics family (Hoeffding's D, distance correlation,
Mann-Kendall, Pettitt, ...).

These replace the O(H^2) driver-side comparison matrices flagged in the
round-3 verdict (`stats5.py` q_hoeffding_d and siblings): H is the
hourly-grid length — bounded by the time span, not data volume — but a
multi-year corpus (H ~ 26k hours) made the H x H bool/int64 matrices
~0.7-5.4 GB per pair and minutes-slow.  Every kernel here is exact
integer math (numpy int64 where bounds allow, Python bignum folds where
they don't), so the statistics produced are bit-identical to the
quadratic formulations — the brute-force parity tests in
`tests/test_pairstats_fast.py` check exactly that.

Reference semantics: SAS-convention Hoeffding D and Szekely-Rizzo
distance covariance as documented on the callers in
`pipelines/stats5.py`; no reference-repo counterpart (the reference,
/root/reference, is a TSDB copyer — these are engine-side analytics).
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "count_smaller_left",
    "rank_lt_eq",
    "sign_row_sums",
    "concordance_s",
    "bivariate_rank_counts",
    "abs_prod_pair_sum",
    "abs_dist_row_sums",
]


def count_smaller_left(y: np.ndarray) -> np.ndarray:
    """``res[i] = #{j < i : y[j] < y[i]}`` — strict, original order.

    Bottom-up merge over power-of-two blocks: each block is kept sorted
    (values + parallel original indices); for every adjacent (L, R)
    block pair the whole R block is counted against L with ONE
    ``np.searchsorted`` (left side, so equals are excluded), then the
    pair is merged.  O(H log^2 H) numpy work, O(H) small Python loop
    iterations — no H x H materialization.
    """
    y = np.asarray(y)
    n = len(y)
    res = np.zeros(n, np.int64)
    if n < 2:
        return res
    vals = y.copy()
    orig = np.arange(n)
    # seed with sorted base blocks of 256: intra-block counts via one
    # O(b^2) masked comparison per block (65k bools — trivial), which
    # removes the width-1..128 merge passes whose tiny numpy calls
    # dominate wall time at H ~ 26k
    base = 256
    tri = np.arange(base)
    tri_mask_full = tri[None, :] < tri[:, None]
    for lo in range(0, n, base):
        hi = min(lo + base, n)
        b = hi - lo
        blk = vals[lo:hi]
        mask = tri_mask_full[:b, :b] if b < base else tri_mask_full
        res[orig[lo:hi]] += ((blk[None, :] < blk[:, None]) & mask).sum(
            axis=1)
        order = np.argsort(blk, kind="mergesort")
        vals[lo:hi] = blk[order]
        orig[lo:hi] = orig[lo:hi][order]
    width = base
    while width < n:
        for lo in range(0, n - width, 2 * width):
            mid = lo + width
            hi = min(lo + 2 * width, n)
            left_v = vals[lo:mid]
            right_v = vals[mid:hi]
            # every element of R sits after every element of L in the
            # original order, so L contributes to R's left-counts
            res[orig[mid:hi]] += np.searchsorted(left_v, right_v, "left")
            # merge the two sorted runs (stable, keeps ties in place)
            seg = vals[lo:hi]
            order = np.argsort(seg, kind="mergesort")
            vals[lo:hi] = seg[order]
            orig[lo:hi] = orig[lo:hi][order]
        width *= 2
    return res


def rank_lt_eq(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """``(lt, eq)`` with ``lt[i] = #{j : x[j] < x[i]}`` and
    ``eq[i] = #{j : x[j] == x[i]}`` (self included) — O(H log H)."""
    xs = np.sort(x)
    lo = np.searchsorted(xs, x, "left")
    hi = np.searchsorted(xs, x, "right")
    return lo.astype(np.int64), (hi - lo).astype(np.int64)


def sign_row_sums(x: np.ndarray) -> np.ndarray:
    """``row[i] = sum_j sign(x[i] - x[j])`` — exact, O(H log H)."""
    lt, eq = rank_lt_eq(x)
    n = len(x)
    gt = n - lt - eq
    return lt - gt


def concordance_s(x: np.ndarray) -> int:
    """Mann-Kendall ``S = sum_{i<j} sign(x[j] - x[i])`` — exact.

    ``P = #{i<j : x[j] > x[i]}`` via :func:`count_smaller_left` on x,
    ``M`` via the same on ``-x`` (strict greater-left); S = P - M.
    """
    p = int(count_smaller_left(x).sum())
    m = int(count_smaller_left(-np.asarray(x)).sum())
    return p - m


def bivariate_rank_counts(
    x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-point strict/tied quadrant counts ``(c_ll, c_el, c_le, c_ee)``
    for the SAS-convention Hoeffding bivariate rank
    ``Q_i = 1 + c_ll + (c_el + c_le)/2 + c_ee/4``:

    - ``c_ll[i] = #{j : x[j] < x[i] and y[j] < y[i]}``
    - ``c_el[i] = #{j : x[j] == x[i] and y[j] < y[i]}``
    - ``c_le[i] = #{j : x[j] < x[i] and y[j] == y[i]}``
    - ``c_ee[i] = #{j != i : x[j] == x[i] and y[j] == y[i]}``

    Stable (x, y) lexsort; in that order ``L[i] = #{j earlier : y[j] <
    y[i]}`` counts exactly the c_ll pairs plus the same-x smaller-y
    pairs (= c_el), so ``c_ll = L - c_el``.  c_el / c_le / c_ee are
    run-boundary arithmetic on the (x, y) and (y, x) sorts.  All exact
    int64, O(H log^2 H).
    """
    x = np.asarray(x)
    y = np.asarray(y)
    n = len(x)

    def _group_and_pair_starts(a, b):
        """Sort by (a, b); per ORIGINAL index return ``(order,
        smaller_b_in_group, run_len)`` where smaller_b_in_group[i] =
        #{j : a[j] == a[i], b[j] < b[i]} (= offset of i's (a,b)-run
        start inside its a-group) and run_len[i] = size of i's exact
        (a, b) run."""
        order = np.lexsort((b, a))
        sa, sb = a[order], b[order]
        new_a = np.empty(n, bool)
        new_a[0] = True
        new_a[1:] = sa[1:] != sa[:-1]
        new_ab = new_a.copy()
        new_ab[1:] |= sb[1:] != sb[:-1]
        grp_start = np.maximum.accumulate(
            np.where(new_a, np.arange(n), 0))
        run_id = np.cumsum(new_ab) - 1
        run_start = np.maximum.accumulate(
            np.where(new_ab, np.arange(n), 0))
        run_len = np.bincount(run_id)[run_id]
        out_grp = np.empty(n, np.int64)
        out_len = np.empty(n, np.int64)
        out_grp[order] = run_start - grp_start
        out_len[order] = run_len
        return order, out_grp, out_len

    # (x, y) sort: c_el + c_ee, and L for c_ll
    order_xy, c_el, len_xy = _group_and_pair_starts(x, y)
    c_ee = len_xy - 1
    # L in (x, y)-sorted order, mapped back to original indices
    l_sorted = count_smaller_left(y[order_xy])
    big_l = np.empty(n, np.int64)
    big_l[order_xy] = l_sorted
    c_ll = big_l - c_el
    # (y, x) sort: c_le
    _, c_le, _ = _group_and_pair_starts(y, x)
    return c_ll, c_el, c_le, c_ee


def abs_prod_pair_sum(x: np.ndarray, y: np.ndarray) -> int:
    """Exact ``sum_{i<j} |x[i]-x[j]| * |y[i]-y[j]|`` as a Python int.

    Sort by x (equal-x pairs contribute 0, so tie order is free); then
    for j-before-i, ``|dx| = x_i - x_j``.  Bottom-up merge over y: for
    a block pair (L, R) every L element precedes every R element in
    x-order, and with L sorted by y carrying prefix sums of (count, x,
    y, x*y) the two sign cases collapse to prefix/suffix arithmetic at
    ``k = searchsorted(L_y, y_i, 'right')`` (ties land in the <= bucket
    where the y-difference is 0).  Per-element terms stay within int64
    for count-valued inputs (< 2^20); block partial sums are folded to
    Python bignums before they can overflow.
    """
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    n = len(x)
    if n < 2:
        return 0
    order = np.argsort(x, kind="mergesort")
    xs = x[order]
    ys = y[order]
    total = 0
    vals_y = ys.copy()
    vals_x = xs.copy()
    vmax = int(max(np.abs(xs).max(), np.abs(ys).max(), 1))
    if vmax < 1 << 20 and n < 1 << 21:
        # fast path: per-element merge terms stay < 2^57 and base-block
        # pair products < 2^56, so int64 holds everywhere below; chunked
        # reduceat partials are folded to Python ints before overflow
        base = 256
        for lo in range(0, n, base):
            hi = min(lo + base, n)
            bx = vals_x[lo:hi]
            by = vals_y[lo:hi]
            # xs is globally x-sorted, so within the block x_i >= x_j
            # for i > j: |dx| = dx on the strict lower triangle
            a = bx[:, None] - bx[None, :]
            b = np.abs(by[:, None] - by[None, :])
            total += int(np.tril(a * b, -1).sum())
            o = np.argsort(by, kind="mergesort")
            vals_y[lo:hi] = by[o]
            vals_x[lo:hi] = bx[o]
        width = base
    else:
        # values beyond the documented count bound (never hourly
        # counts): exact object-dtype blocked quadratic — bignum-safe,
        # O(n^2/blk) numpy calls, correctness over speed
        blk = 512
        for s in range(0, n, blk):
            e = min(s + blk, n)
            a = (xs[s:e, None].astype(object) - xs[None, :e].astype(object))
            b = abs(ys[s:e, None].astype(object) - ys[None, :e].astype(object))
            m = np.arange(e)[None, :] < np.arange(s, e)[:, None]
            total += int(((a * b) * m).sum())
        return int(total)

    def _fold(t):
        # exact sum of an int64 array whose elements are < 2^57:
        # chunk partials of 32 elements stay < 2^62
        if len(t) <= 32:
            return int(t.sum())
        cuts = np.arange(0, len(t), 32)
        return sum(np.add.reduceat(t, cuts).tolist())

    while width < n:
        for lo in range(0, n - width, 2 * width):
            mid = lo + width
            hi = min(lo + 2 * width, n)
            ly = vals_y[lo:mid]
            lx = vals_x[lo:mid]
            ry = vals_y[mid:hi]
            rx = vals_x[mid:hi]
            c_l = mid - lo
            sy = np.concatenate(([0], np.cumsum(ly)))
            sx = np.concatenate(([0], np.cumsum(lx)))
            sxy = np.concatenate(([0], np.cumsum(lx * ly)))
            k = np.searchsorted(ly, ry, "right")
            # y_j <= y_i: (x_i - x_j)(y_i - y_j)
            t1 = (k * rx * ry - rx * sy[k] - ry * sx[k] + sxy[k])
            # y_j > y_i: (x_i - x_j)(y_j - y_i)
            t2 = (rx * (sy[c_l] - sy[k])
                  - (c_l - k) * rx * ry
                  - (sxy[c_l] - sxy[k])
                  + ry * (sx[c_l] - sx[k]))
            total += _fold(t1 + t2)
            seg_y = vals_y[lo:hi]
            o = np.argsort(seg_y, kind="mergesort")
            vals_y[lo:hi] = seg_y[o]
            seg_x = vals_x[lo:hi]
            vals_x[lo:hi] = seg_x[o]
        width *= 2
    return int(total)


def exact_dot(u: np.ndarray, v: np.ndarray) -> int:
    """Exact ``sum_i u[i]*v[i]`` for non-negative int64 arrays.

    Vectorized int64 chunk partials when the per-element product bound
    leaves headroom (chunk size sized from the actual maxima), Python
    bignum fold otherwise — bit-identical either way.
    """
    u = np.asarray(u, np.int64)
    v = np.asarray(v, np.int64)
    n = len(u)
    if n == 0:
        return 0
    bound = int(u.max()) * int(v.max()) if n else 0
    if 0 < bound < 1 << 56:
        chunk = max(1, (1 << 62) // max(bound, 1))
        p = u * v
        if chunk >= n:
            return int(p.sum())
        cuts = np.arange(0, n, chunk)
        return sum(np.add.reduceat(p, cuts).tolist())
    return sum(int(a) * int(b) for a, b in zip(u, v))


def abs_dist_row_sums(x: np.ndarray) -> np.ndarray:
    """``ra[i] = sum_j |x[i] - x[j]|`` — exact int64, O(H log H).

    With x sorted and prefix sums ``ps``, the row sum at sorted rank k
    is ``k*xs_k - ps_k + (S - ps_{k+1}) - (n-1-k)*xs_k``; mapped back
    through the argsort.
    """
    x = np.asarray(x, np.int64)
    n = len(x)
    order = np.argsort(x, kind="mergesort")
    xs = x[order]
    ps = np.concatenate(([0], np.cumsum(xs)))  # ps[k] = sum of first k
    k = np.arange(n, dtype=np.int64)
    s_tot = ps[n]
    row_sorted = (k * xs - ps[:-1]) + ((s_tot - ps[1:]) - (n - 1 - k) * xs)
    ra = np.empty(n, np.int64)
    ra[order] = row_sorted
    return ra
