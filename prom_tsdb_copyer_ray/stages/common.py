"""Shared shuffle-shape helpers for the sharded-kernel operators.

One home for the splitmix-style avalanche hash and the narrow-row shuffle
fan-in so pipeline-tuning fixes apply everywhere at once (the hash and the
heuristic had drifted into five and three copies respectively).
"""

from __future__ import annotations

import numpy as np


def mix64(x: np.ndarray) -> np.ndarray:
    """Splitmix-style avalanche over int-like input; uint64 out."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64)
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
    return x


def fmix64(x: np.ndarray) -> np.ndarray:
    """Full murmur3 finalizer (two multiplies).  Use this when the VALUE of
    the hash matters (e.g. HLL register index/rank from the top bits) — the
    single-multiply :func:`mix64` leaves the high bits under-mixed for
    small sequential inputs (measured: 20% low HLL estimates)."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x


def shard_of_ints(x: np.ndarray, num_shards: int) -> np.ndarray:
    """Deterministic hash shard of an int array (int64 out)."""
    return (mix64(x) % np.uint64(num_shards)).astype(np.int64)


def narrow_fanin() -> int:
    """Shuffle fan-in for narrow (8-24 B) rows: ``max(8, CPUs // 2)``.

    Ray's sort exchange is (blocks x partitions) tasks; at the default
    2 blocks/CPU a 32-cpu node pays 64x64 = 4096 ~1.5 ms exchange tasks to
    move a few MB of band/pair/label rows.  Half a partition per CPU keeps
    the exchange linear while still scaling with cluster size
    (``cluster_resources`` counts every node's CPUs)."""
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n = 8
    return max(8, n // 2)
