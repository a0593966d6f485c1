"""Third-wave fixture-oracle generator: expected output for
``lttb_downsample`` and ``holt_winters``, computed by independent
from-the-spec single-process references (plain-Python LTTB per the documented integer-boundary spec in
``stages/windowed.lttb_indices``; only the 5m collapse uses NumPy, because
the spec defines cents as ``np.rint(value * 100)``).

Same corpus-key protocol as gen_oracle_fixtures.py, but keyed on EVENTS
(the query's input table): ``corpus_key = SUM(CAST(value * 100 AS BIGINT))``
— DuckDB's double→BIGINT cast is ties-to-even, identical to np.rint.

Run from /root/repo:  python tests/fixtures/gen_oracle_fixtures3.py
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# extra corpora (e.g. the 10x sf1 replica) — same hook as
# gen_oracle_fixtures.py; the round-4 sf1 sweep caught that this file and
# gen_oracle_fixtures2.py were missing it (their oracles returned 0 rows)
SF_DIRS += [d for d in os.environ.get("GRAFT_EXTRA_SF_DIRS", "").split(",") if d]

MS_5M = 300_000
N_OUT = 50


def lttb_reference(x: list, y: list, n_out: int) -> list:
    """From-the-spec scalar LTTB (no shared code with the engine kernel)."""
    n = len(x)
    if n <= n_out:
        return list(range(n))
    nb = n_out - 2

    def bound(j: int) -> int:
        return n if j == nb + 1 else 1 + (j * (n - 2)) // nb

    selected = [0]
    a = 0
    for i in range(nb):
        nlo, nhi = bound(i + 1), bound(i + 2)
        avg_x = sum(float(x[k]) for k in range(nlo, nhi)) / (nhi - nlo)
        avg_y = sum(float(y[k]) for k in range(nlo, nhi)) / (nhi - nlo)
        dx = float(x[a]) - avg_x
        dy = avg_y - float(y[a])
        best, best_area = -1, -1.0
        for c in range(bound(i), bound(i + 1)):
            area = abs(dx * (float(y[c]) - float(y[a]))
                       - (float(x[a]) - float(x[c])) * dy)
            if area > best_area:
                best, best_area = c, area
        selected.append(best)
        a = best
    selected.append(n - 1)
    return selected


def holt_reference(y: list, alpha: float, gamma: float) -> tuple:
    """From-the-spec scalar Holt recursion (stages/windowed.holt_linear)."""
    level = float(y[0])
    trend = float(y[1]) - float(y[0])
    for i in range(1, len(y)):
        prev = level
        level = alpha * float(y[i]) + (1.0 - alpha) * (level + trend)
        trend = gamma * (level - prev) + (1.0 - gamma) * trend
    return level, trend


def main() -> None:
    rows = {"corpus_key": [], "event_type": [], "window_start": [],
            "sum_value": []}
    for sf in SF_DIRS:
        t = pq.read_table(f"{sf}/events.parquet",
                          columns=["event_type", "ts", "value"])
        tms = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 1000
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        corpus_key = int(cents.sum())
        etype = np.asarray(t["event_type"].to_pylist(), dtype=object)
        win = (tms // MS_5M) * MS_5M
        for ty in sorted(set(etype.tolist())):
            m = etype == ty
            w, c = win[m], cents[m]
            order = np.argsort(w, kind="mergesort")
            w, c = w[order], c[order]
            # collapse duplicate windows (sum of cents per window)
            uw, inv = np.unique(w, return_inverse=True)
            cs = np.zeros(len(uw), dtype=np.int64)
            np.add.at(cs, inv, c)
            idx = lttb_reference(uw.tolist(), cs.tolist(), N_OUT)
            for i in idx:
                rows["corpus_key"].append(corpus_key)
                rows["event_type"].append(ty)
                rows["window_start"].append(int(uw[i]))
                rows["sum_value"].append(float(cs[i]) / 100.0)
    out = pa.table({
        "corpus_key": pa.array(rows["corpus_key"], pa.int64()),
        "event_type": pa.array(rows["event_type"], pa.string()),
        "window_start": pa.array(rows["window_start"], pa.int64()),
        "sum_value": pa.array(rows["sum_value"], pa.float64()),
    })
    pq.write_table(out, os.path.join(HERE, "oracle_lttb.parquet"))
    print(f"oracle_lttb.parquet: {out.num_rows} rows")

    hrows = {"corpus_key": [], "event_type": [], "level": [], "trend": []}
    for sf in SF_DIRS:
        t = pq.read_table(f"{sf}/events.parquet",
                          columns=["event_type", "ts", "value"])
        tms = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 1000
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        corpus_key = int(cents.sum())
        etype = np.asarray(t["event_type"].to_pylist(), dtype=object)
        win = (tms // MS_5M) * MS_5M
        for ty in sorted(set(etype.tolist())):
            m = etype == ty
            w, c = win[m], cents[m]
            order = np.argsort(w, kind="mergesort")
            w, c = w[order], c[order]
            uw, inv = np.unique(w, return_inverse=True)
            cs = np.zeros(len(uw), dtype=np.int64)
            np.add.at(cs, inv, c)
            if len(uw) < 2:
                continue
            level, trend = holt_reference(cs.tolist(), 0.3, 0.1)
            hrows["corpus_key"].append(corpus_key)
            hrows["event_type"].append(ty)
            hrows["level"].append(level / 100.0)
            hrows["trend"].append(trend / 100.0)
    hout = pa.table({
        "corpus_key": pa.array(hrows["corpus_key"], pa.int64()),
        "event_type": pa.array(hrows["event_type"], pa.string()),
        "level": pa.array(hrows["level"], pa.float64()),
        "trend": pa.array(hrows["trend"], pa.float64()),
    })
    pq.write_table(hout, os.path.join(HERE, "oracle_holt.parquet"))
    print(f"oracle_holt.parquet: {hout.num_rows} rows")


if __name__ == "__main__":
    main()
