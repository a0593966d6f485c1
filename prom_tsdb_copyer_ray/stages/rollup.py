"""Tier rollup: samples -> 5m chunks -> 1h -> 1d continuous aggregates.

This is the engine's replacement for the reference's block write + merge
compaction (operators O11 + O14):

* :func:`rollup_raw` — the analogue of ``NewBlockWriter``/``Flush``
  (``copyer.go:82,157-163``): sort samples by time per series, dedup
  identical-timestamp samples (keep-first — deterministically the min-value
  one; the compactor's overlap-dedup semantics, ``compact.go:37``),
  aggregate count/sum/min/max/first/last per tier window, and
  delta-of-delta + Gorilla-XOR encode the raw points into a chunk struct.
  Series with zero in-range samples emit nothing (operator O9,
  ``copyer.go:142-145``).
* :func:`rollup_up` — the continuous-aggregate merge (the analogue of
  ``LeveledCompactor.Compact``, ``compact.go:18-45``, but *parallel*: the
  reference's strictly sequential compaction is its scaling ceiling,
  ``README.md:64-65``): merge finer-tier rows into the coarser window with
  the partial+final pattern (sum-of-sums, min-of-mins, first/last by time),
  and encode a **gap-filled** grid of finer-window means as the coarser
  chunk (missing finer slots -> NaN points, ts = finer window starts).

Partitioning / skew design (SURVEY.md §4, north_rule):

The shuffle key is ``(_gw, _shard)`` (time-major, so output blocks are
time-clustered for the day-partitioned write) where ``_shard = stable_hash64(series_key)
% num_shards`` and ``_gw`` is a coarse *group* window (default 1 day).  One
``map_groups`` call therefore covers MANY (series, tier-window) cells and
processes them fully vectorized (lexsort + ``np.*.reduceat``), amortizing the
per-group scheduling overhead that a naive per-(series, window) ``map_groups``
pays.  Hash-sharding spreads hot domains across shards; within a shard a hot
series is still bounded by the group window (a group is at most 1/num_shards
of one day's series-space — the same memory-bounding role the reference's
``-S`` slice duration plays, ``main.go:121``).  ``num_shards`` × days is the
shuffle parallelism: size it ≥ 2-4 tasks per core at cluster scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codec import encode_timestamps_many, encode_values_many
from ..functions.hashing import stable_hash64
from ..windows import MS_1D, TIER_PARENT, TIERS, window_start_np

LABEL_COLS = ("__name__", "domain", "lang")
DEFAULT_NUM_SHARDS = 64

CHUNK_FIELDS = [
    ("series_key", pa.string()),
    ("__name__", pa.string()),
    ("domain", pa.string()),
    ("lang", pa.string()),
    ("tier", pa.string()),
    ("window_start", pa.int64()),
    ("min_ts", pa.int64()),
    ("max_ts", pa.int64()),
    ("n_samples", pa.int64()),
    ("ts_bytes", pa.binary()),
    ("val_bytes", pa.binary()),
    ("agg_count", pa.int64()),
    ("agg_sum", pa.float64()),
    ("agg_min", pa.float64()),
    ("agg_max", pa.float64()),
    ("agg_first", pa.float64()),
    ("agg_last", pa.float64()),
]
CHUNK_SCHEMA = pa.schema(CHUNK_FIELDS)


def _series_codes(table: pa.Table) -> tuple[np.ndarray, pa.Array]:
    """Dictionary-encode series_key -> (int codes ndarray, dictionary array)."""
    col = table["series_key"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    return d.indices.to_numpy().astype(np.int64, copy=False), d.dictionary


def _shard_of(col: pa.ChunkedArray | pa.Array, num_shards: int) -> pa.Array:
    """Deterministic hash shard of a string column (vectorized via dictionary)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    shard_per_key = np.array(
        [stable_hash64(s) % num_shards for s in d.dictionary.to_pylist()], dtype=np.int64
    )
    if len(shard_per_key) == 0:
        return pa.array(np.empty(0, dtype=np.int64))
    return pa.array(shard_per_key[d.indices.to_numpy().astype(np.int64, copy=False)])


def _take_str(col, order: np.ndarray, idx: np.ndarray) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.take(pa.array(order[idx]))


def _build_chunk_table(
    tier: str,
    group: pa.Table,
    order: np.ndarray,
    starts: np.ndarray,
    series_col: pa.Array,
    wstart: np.ndarray,
    min_ts: np.ndarray,
    max_ts: np.ndarray,
    n_samples: np.ndarray,
    ts_bytes: list[bytes],
    val_bytes: list[bytes],
    agg_count: np.ndarray,
    agg_sum: np.ndarray,
    agg_min: np.ndarray,
    agg_max: np.ndarray,
    agg_first: np.ndarray,
    agg_last: np.ndarray,
) -> pa.Table:
    n = len(starts)
    cols = {
        "series_key": series_col,
        "__name__": _take_str(group["__name__"], order, starts)
        if "__name__" in group.column_names
        else pa.nulls(n, pa.string()).fill_null(""),
        "domain": _take_str(group["domain"], order, starts)
        if "domain" in group.column_names
        else pa.nulls(n, pa.string()).fill_null(""),
        "lang": _take_str(group["lang"], order, starts)
        if "lang" in group.column_names
        else pa.nulls(n, pa.string()).fill_null(""),
        "tier": pa.nulls(n, pa.string()).fill_null(tier),
        "window_start": pa.array(wstart, pa.int64()),
        "min_ts": pa.array(min_ts, pa.int64()),
        "max_ts": pa.array(max_ts, pa.int64()),
        "n_samples": pa.array(n_samples, pa.int64()),
        "ts_bytes": pa.array(ts_bytes, pa.binary()),
        "val_bytes": pa.array(val_bytes, pa.binary()),
        "agg_count": pa.array(agg_count, pa.int64()),
        "agg_sum": pa.array(agg_sum, pa.float64()),
        "agg_min": pa.array(agg_min, pa.float64()),
        "agg_max": pa.array(agg_max, pa.float64()),
        "agg_first": pa.array(agg_first, pa.float64()),
        "agg_last": pa.array(agg_last, pa.float64()),
    }
    return pa.table(cols)


def _rollup_raw_group(group: pa.Table, tier: str) -> pa.Table:
    """One (shard, group-window) of raw samples -> tier chunk rows (vectorized)."""
    d_ms = TIERS[tier]
    group = group.combine_chunks()
    codes, dictionary = _series_codes(group)
    ts = group["ts"].to_numpy().astype(np.int64, copy=False)
    val = group["value"].to_numpy().astype(np.float64, copy=False)
    if len(ts) == 0:
        return _build_chunk_table(
            tier, group, np.empty(0, np.int64), np.empty(0, np.int64),
            pa.array([], pa.string()), *([np.empty(0, np.int64)] * 3),
            np.empty(0, np.int64), [], [], np.empty(0, np.int64),
            *([np.empty(0, np.float64)] * 5),
        )

    order = np.lexsort((val, ts, codes))
    codes_s, ts_s, val_s = codes[order], ts[order], val[order]
    # dedup: same (series, ts) keep first (min value) — deterministic
    keep = np.empty(len(ts_s), dtype=bool)
    keep[0] = True
    np.logical_or(codes_s[1:] != codes_s[:-1], ts_s[1:] != ts_s[:-1], out=keep[1:])
    order, codes_s, ts_s, val_s = order[keep], codes_s[keep], ts_s[keep], val_s[keep]

    win = window_start_np(ts_s, d_ms)
    newgrp = np.empty(len(ts_s), dtype=bool)
    newgrp[0] = True
    np.logical_or(codes_s[1:] != codes_s[:-1], win[1:] != win[:-1], out=newgrp[1:])
    starts = np.flatnonzero(newgrp)
    ends = np.r_[starts[1:], len(ts_s)]

    sums = np.add.reduceat(val_s, starts)
    mins = np.minimum.reduceat(val_s, starts)
    maxs = np.maximum.reduceat(val_s, starts)
    counts = (ends - starts).astype(np.int64)

    # all chunks of the group encoded in ONE vectorized pass (codec.py)
    chunk_offsets = np.append(starts, len(ts_s))
    ts_bytes = encode_timestamps_many(ts_s, chunk_offsets)
    val_bytes = encode_values_many(val_s, chunk_offsets)

    series_col = dictionary.take(pa.array(codes_s[starts]))
    return _build_chunk_table(
        tier, group, order, starts, series_col,
        win[starts], ts_s[starts], ts_s[ends - 1], counts,
        ts_bytes, val_bytes,
        counts, sums, mins, maxs, val_s[starts], val_s[ends - 1],
    )


def _rollup_merge_group(group: pa.Table, tier: str, finer_ms: int) -> pa.Table:
    """One (shard, group-window) of finer-tier rows -> coarser chunk rows.

    Within one series, finer windows are disjoint, so ordering by min_ts
    equals ordering by window_start — one lexsort serves first/last picking
    and the gap-fill grid construction.
    """
    d_ms = TIERS[tier]
    group = group.combine_chunks()
    codes, dictionary = _series_codes(group)
    wstarts = group["window_start"].to_numpy().astype(np.int64, copy=False)
    if len(wstarts) == 0:
        return _build_chunk_table(
            tier, group, np.empty(0, np.int64), np.empty(0, np.int64),
            pa.array([], pa.string()), *([np.empty(0, np.int64)] * 3),
            np.empty(0, np.int64), [], [], np.empty(0, np.int64),
            *([np.empty(0, np.float64)] * 5),
        )
    cw = window_start_np(wstarts, d_ms)

    order = np.lexsort((wstarts, cw, codes))
    codes_s, cw_s, w_s = codes[order], cw[order], wstarts[order]
    cnt = group["agg_count"].to_numpy().astype(np.int64, copy=False)[order]
    s = group["agg_sum"].to_numpy().astype(np.float64, copy=False)[order]
    mn = group["agg_min"].to_numpy()[order]
    mx = group["agg_max"].to_numpy()[order]
    first = group["agg_first"].to_numpy()[order]
    last = group["agg_last"].to_numpy()[order]
    min_ts = group["min_ts"].to_numpy().astype(np.int64, copy=False)[order]
    max_ts = group["max_ts"].to_numpy().astype(np.int64, copy=False)[order]

    newgrp = np.empty(len(w_s), dtype=bool)
    newgrp[0] = True
    np.logical_or(codes_s[1:] != codes_s[:-1], cw_s[1:] != cw_s[:-1], out=newgrp[1:])
    starts = np.flatnonzero(newgrp)
    ends = np.r_[starts[1:], len(w_s)]

    counts = np.add.reduceat(cnt, starts)
    sums = np.add.reduceat(s, starts)
    mins = np.minimum.reduceat(mn, starts)
    maxs = np.maximum.reduceat(mx, starts)
    g_min_ts = np.minimum.reduceat(min_ts, starts)
    g_max_ts = np.maximum.reduceat(max_ts, starts)

    means = s / cnt
    n_slots = d_ms // finer_ms
    # vectorized gap-filled grid for ALL chunks at once: chunk j owns flat
    # slots [j*n_slots, (j+1)*n_slots); a finer row lands at slot
    # (w_s - its coarse window) // finer_ms — then one batch encode pass
    n_chunks = len(starts)
    grid_ts = np.repeat(cw_s[starts], n_slots) + np.tile(
        np.arange(n_slots, dtype=np.int64) * finer_ms, n_chunks
    )
    grid_vals = np.full(n_chunks * n_slots, np.nan, dtype=np.float64)
    chunk_of_row = np.repeat(np.arange(n_chunks, dtype=np.int64), ends - starts)
    grid_vals[chunk_of_row * n_slots + (w_s - cw_s) // finer_ms] = means
    grid_offsets = np.arange(n_chunks + 1, dtype=np.int64) * n_slots
    ts_bytes = encode_timestamps_many(grid_ts, grid_offsets)
    val_bytes = encode_values_many(grid_vals, grid_offsets)
    n_samples = np.full(n_chunks, n_slots, dtype=np.int64)

    series_col = dictionary.take(pa.array(codes_s[starts]))
    return _build_chunk_table(
        tier, group, order, starts, series_col,
        cw_s[starts], g_min_ts, g_max_ts, n_samples,
        ts_bytes, val_bytes,
        counts, sums, mins, maxs, first[starts], last[ends - 1],
    )


def _shuffle_partitions() -> int:
    """Sort/groupby fan-in: ~2 partitions per CPU.  Ray's sort makes one
    range partition per input block; with hundreds of small blocks that is a
    quadratic (blocks x partitions) exchange of tiny objects — coalescing to
    O(CPUs) blocks first keeps the all-to-all linear."""
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n = 8
    return max(16, 2 * n)


def _with_shard_and_gw(ds, ts_col: str, num_shards: int, group_window_ms: int,
                       coalesce: bool = True):
    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("_shard", _shard_of(batch["series_key"], num_shards))
        gw = pa.array(window_start_np(batch[ts_col].to_numpy().astype(np.int64), group_window_ms))
        return batch.append_column("_gw", gw)

    out = ds.map_batches(fn, batch_format="pyarrow")
    if coalesce:
        out = out.repartition(_shuffle_partitions())
    return out


def _drop_keys(table: pa.Table) -> pa.Table:
    for c in ("_shard", "_gw"):
        if c in table.column_names:
            table = table.drop_columns(c)
    return table


def rollup_raw(
    samples_ds,
    tier: str = "5m",
    num_shards: int = DEFAULT_NUM_SHARDS,
    group_window_ms: int = MS_1D,
    metrics_sink=None,
):
    """Raw samples Dataset -> tier chunk Dataset (the one wide shuffle over
    raw data; every later tier shuffles only collapsed rows)."""
    d = TIERS[tier]
    if group_window_ms % d != 0:
        raise ValueError(f"group window {group_window_ms} not a multiple of tier {tier}")

    def per_group(group: pa.Table) -> pa.Table:
        import time

        from ..state import metrics

        t0 = time.monotonic()
        out = _rollup_raw_group(_drop_keys(group), tier)
        metrics.record(metrics_sink, f"rollup_raw_{tier}_group_ms", (time.monotonic() - t0) * 1000)
        return out

    return (
        _with_shard_and_gw(samples_ds, "ts", num_shards, group_window_ms)
        .groupby(["_gw", "_shard"])
        .map_groups(per_group, batch_format="pyarrow")
    )


def rollup_up(
    finer_ds,
    tier: str,
    num_shards: int = DEFAULT_NUM_SHARDS,
    group_factor: int = 16,
    metrics_sink=None,
):
    """Finer-tier chunk Dataset -> coarser tier (partial+final merge shuffle).

    Group window = ``tier * group_factor`` so one vectorized call merges many
    coarser windows (map_groups overhead amortized, same as rollup_raw).
    """
    finer_ms = TIERS[TIER_PARENT[tier]]
    d = TIERS[tier]

    def per_group(group: pa.Table) -> pa.Table:
        import time

        from ..state import metrics

        t0 = time.monotonic()
        out = _rollup_merge_group(_drop_keys(group), tier, finer_ms)
        metrics.record(metrics_sink, f"rollup_up_{tier}_group_ms", (time.monotonic() - t0) * 1000)
        return out

    return (
        # no coalesce hop: merge inputs are already collapsed chunk rows in
        # O(partitions) blocks; an extra repartition is a pure latency barrier
        _with_shard_and_gw(finer_ds, "window_start", num_shards, d * group_factor,
                           coalesce=False)
        .groupby(["_gw", "_shard"])
        .map_groups(per_group, batch_format="pyarrow")
    )


def apply_retention(tier_ds, keep_ms: int, now_ms: int):
    """Retention cut: drop windows whose start is older than ``now - keep``.

    The downsample/retention leg of the engine: fine tiers keep short
    history, coarse tiers keep long history (e.g. 5m: 7d, 1h: 90d, 1d: ∞).
    """
    cutoff = now_ms - keep_ms

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["window_start"], cutoff))

    return tier_ds.map_batches(fn, batch_format="pyarrow")


def decode_tier_points(tier_table: pa.Table) -> pa.Table:
    """Decode chunk rows back to (series_key, ts, value) points (verify path).

    The inverse of the encode stage; used by golden tests and the ``verify``
    pipeline (the reference's old-vs-new comparison, ``README.md:76-107``).
    """
    from ..codec import decode_chunk

    keys, names, domains, langs, ts_out, val_out = [], [], [], [], [], []
    sk = tier_table["series_key"].to_pylist()
    nm = tier_table["__name__"].to_pylist()
    dm = tier_table["domain"].to_pylist()
    lg = tier_table["lang"].to_pylist()
    for i in range(tier_table.num_rows):
        n = tier_table["n_samples"][i].as_py()
        t_arr, v_arr = decode_chunk(
            tier_table["ts_bytes"][i].as_py(), tier_table["val_bytes"][i].as_py(), n
        )
        keys.extend([sk[i]] * n)
        names.extend([nm[i]] * n)
        domains.extend([dm[i]] * n)
        langs.extend([lg[i]] * n)
        ts_out.append(t_arr)
        val_out.append(v_arr)
    return pa.table(
        {
            "series_key": pa.array(keys, pa.string()),
            "__name__": pa.array(names, pa.string()),
            "domain": pa.array(domains, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "ts": pa.array(np.concatenate(ts_out) if ts_out else np.empty(0, np.int64)),
            "value": pa.array(np.concatenate(val_out) if val_out else np.empty(0, np.float64)),
        }
    )
