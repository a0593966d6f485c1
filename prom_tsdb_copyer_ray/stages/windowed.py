"""Custom windowed operators Ray Data lacks natively (brief: "custom operators").

Both are compositions of ``map_batches`` + ``groupby().map_groups`` with
vectorized NumPy bodies (option (a) of the custom-operator ladder) and
document their partitioning assumption: one group = one partition key's full
history, bounded because inputs are *collapsed* tier rows, not raw samples.

* :func:`sliding_window_sum` — rolling aggregate over aligned tier windows
  (e.g. trailing 1h sum of 5m counts), per key.  Prefix-sum + searchsorted:
  O(n log n) per group, no Python loops.
* :func:`asof_join` — for every left row, the latest right row with
  ``right.ts <= left.ts`` within the same key (DuckDB ``ASOF JOIN``
  semantics).  Broadcast-free: co-partition both sides by key through one
  groupby over the union (sides tagged), then a vectorized searchsorted per
  group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sliding_window_sum(
    tier_ds,
    key_cols: list[str],
    window_col: str = "window_start",
    value_col: str = "n",
    trail_ms: int = 3_600_000,
    out_col: str = "sliding_sum",
):
    """Trailing-window sum over aligned windows per key.

    For each row, sums ``value_col`` over rows of the same key whose window
    start lies in ``(window - trail_ms, window]`` — matching SQL
    ``SUM(v) OVER (PARTITION BY key ORDER BY w RANGE BETWEEN trail-step
    PRECEDING AND CURRENT ROW)``.
    """

    def per_group(group: pa.Table) -> pa.Table:
        w = group[window_col].to_numpy().astype(np.int64, copy=False)
        v = group[value_col].to_numpy().astype(np.float64, copy=False)
        order = np.argsort(w, kind="stable")
        w_s, v_s = w[order], v[order]
        csum = np.concatenate([[0.0], np.cumsum(v_s)])
        lo = np.searchsorted(w_s, w_s - (trail_ms - 1), side="left")
        hi = np.arange(1, len(w_s) + 1)
        sums = csum[hi] - csum[lo]
        out = group.take(pa.array(order))
        return out.append_column(out_col, pa.array(sums, pa.float64()))

    return tier_ds.groupby(key_cols).map_groups(per_group, batch_format="pyarrow")


def asof_join(
    left_ds,
    right_ds,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
):
    """As-of join: latest right row with ts <= left ts, per key.

    Implementation: tag each side, union (one shuffle co-partitions both
    sides by key), then per key group: sort right by ts, vectorized
    ``searchsorted`` of left timestamps.  Left rows with no match keep nulls.
    Partitioning assumption: one key's full right history fits in one group
    (right side is a collapsed/dimension-like table, not raw events).
    """
    right_value_cols = right_value_cols or []

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column("_side", pa.nulls(batch.num_rows, pa.string()).fill_null(side))

        return fn

    def norm_left(batch: pa.Table) -> pa.Table:
        for c in right_value_cols:
            rc = c + suffix
            if rc not in batch.column_names:
                batch = batch.append_column(rc, pa.nulls(batch.num_rows, pa.float64()))
        if "_r_ts" not in batch.column_names:
            batch = batch.append_column("_r_ts", pa.nulls(batch.num_rows, pa.int64()))
        return batch

    def norm_right(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k] for k in key_cols}
        cols["_r_ts"] = pc.cast(batch[right_ts], pa.int64())
        for c in right_value_cols:
            cols[c + suffix] = pc.cast(batch[c], pa.float64())
        return pa.table(cols)

    left_tagged = left_ds.map_batches(norm_left, batch_format="pyarrow").map_batches(
        tag("l"), batch_format="pyarrow"
    )
    right_tagged = right_ds.map_batches(norm_right, batch_format="pyarrow").map_batches(
        tag("r"), batch_format="pyarrow"
    )

    def per_group(group: pa.Table) -> pa.Table:
        side = np.array(group["_side"].to_pylist())
        is_left = side == "l"
        left_t = group.filter(pa.array(is_left))
        right_t = group.filter(pa.array(~is_left))
        left_t = left_t.drop_columns("_side")
        if left_t.num_rows == 0 or right_t.num_rows == 0:
            # inner as-of: a key with no right history contributes nothing
            return left_t.slice(0, 0)
        lts = pc.cast(left_t[left_ts], pa.int64()).to_numpy()
        rts = right_t["_r_ts"].to_numpy().astype(np.int64, copy=False)
        order = np.argsort(rts, kind="stable")
        rts_s = rts[order]
        idx = np.searchsorted(rts_s, lts, side="right") - 1
        matched = idx >= 0
        # inner as-of semantics (DuckDB ASOF JOIN default): drop unmatched
        out = left_t.filter(pa.array(matched))
        idx_m = order[idx[matched]]
        out = out.set_column(
            out.column_names.index("_r_ts"),
            "_r_ts",
            pa.array(rts[idx_m], pa.int64()),
        )
        for c in right_value_cols:
            rc = c + suffix
            vals = right_t[rc].to_numpy(zero_copy_only=False)[idx_m]
            out = out.set_column(
                out.column_names.index(rc), rc, pa.array(vals.astype(np.float64), pa.float64())
            )
        return out

    return (
        left_tagged.union(right_tagged)
        .groupby(key_cols)
        .map_groups(per_group, batch_format="pyarrow")
    )
