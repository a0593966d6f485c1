"""Aligned time-window math (reference operator O3, ``copyer.go:36-56``).

The reference slices ``[from, to]`` into windows aligned to epoch multiples of
a duration ``d``: the first window start is ``d * (from // d)``, each window is
``[start, start + d - 1ms]``, emitted windows are clamped to ``[from, to]``,
and iteration continues while ``start <= to`` (``copyer.go:46``).  ``d == 0``
degenerates to the single window ``[from, to]`` (``copyer.go:37-41``).

In the Ray engine this is two things:

* :func:`aligned_windows` — the driver-side iterator (small; used for
  partition planning, retention cut-offs and tests — the direct analogue).
* :func:`window_start` — the *vectorized* form: a window-start key column
  derived inside ``map_batches``; it is the groupby/shuffle key for every
  rollup tier (SURVEY.md §2 O3 mapping).

All times are int64 Unix milliseconds UTC (the reference uses ``UnixMilli``
throughout, ``copyer.go:75``).  Timestamps are assumed non-negative (epoch
range), where Go's truncating integer division and floor division agree.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MS_5M = 5 * 60 * 1000
MS_1H = 60 * 60 * 1000
MS_1D = 24 * 60 * 60 * 1000

TIERS: dict[str, int] = {"5m": MS_5M, "1h": MS_1H, "1d": MS_1D}
#: coarser tier -> the finer tier it rolls up from (continuous-aggregate chain)
TIER_PARENT: dict[str, str] = {"1h": "5m", "1d": "1h"}


def aligned_windows(from_ms: int, to_ms: int, d_ms: int) -> list[tuple[int, int]]:
    """All aligned windows covering ``[from_ms, to_ms]`` (ends inclusive).

    Exact semantics of ``getQueryRange`` (``copyer.go:36-56``): start floored
    to a multiple of ``d_ms``, end = start + d - 1, both clamped; loop while
    start <= to.  ``d_ms == 0`` -> single ``[from, to]`` window.
    """
    if d_ms == 0:
        return [(from_ms, to_ms)]
    if d_ms < 0:
        raise ValueError(f"negative window duration: {d_ms}")
    out: list[tuple[int, int]] = []
    start = d_ms * (from_ms // d_ms)
    end = start + d_ms - 1
    while start <= to_ms:
        out.append((max(start, from_ms), min(end, to_ms)))
        start += d_ms
        end += d_ms
    return out


def window_start(ts: pa.ChunkedArray | pa.Array | np.ndarray, d_ms: int) -> pa.Array:
    """Vectorized aligned window start: ``d * (ts // d)`` over int64 ms."""
    if d_ms <= 0:
        raise ValueError(f"window duration must be positive, got {d_ms}")
    if isinstance(ts, np.ndarray):
        ts = pa.array(ts)
    ts = pc.cast(ts, pa.int64())
    # integer division (truncating == floor for non-negative epoch ms) — exact,
    # unlike a float64 round-trip
    return pc.multiply(pc.divide(ts, pa.scalar(d_ms, pa.int64())), pa.scalar(d_ms, pa.int64()))


def window_start_np(ts: np.ndarray, d_ms: int) -> np.ndarray:
    """NumPy variant of :func:`window_start` for int64 ms arrays."""
    if d_ms <= 0:
        raise ValueError(f"window duration must be positive, got {d_ms}")
    ts = np.asarray(ts, dtype=np.int64)
    return (ts // d_ms) * d_ms


def ts_to_ms(ts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Cast a timestamp column of any unit to int64 Unix milliseconds."""
    typ = ts.type
    if pa.types.is_timestamp(typ):
        raw = pc.cast(ts, pa.int64())
        divisor = {"s": None, "ms": 1, "us": 1000, "ns": 1_000_000}[typ.unit]
        if typ.unit == "s":
            return pc.multiply(raw, pa.scalar(1000, pa.int64()))
        if divisor == 1:
            return raw
        # truncating integer division, same as Go time.UnixMilli for the
        # non-negative epoch range this engine operates on
        return pc.divide(raw, pa.scalar(divisor, pa.int64()))
    return pc.cast(ts, pa.int64())
