"""Runtime timing metrics (operator O18, the ``--show-metrics`` histograms).

The reference keeps per-series copy / flush duration histograms and prints
them with ``--show-metrics`` (``copyer.go:22-34``, summary ``main.go``).
The Ray analogue: a zero-CPU named actor collects per-group stage wall
times fired from inside ``map_groups`` tasks (fire-and-forget, one tiny
message per vectorized group — thousands per run, not per row), and
``drain()`` folds them into count/sum/quantile summaries that ``run_copy``
attaches to its result and the CLI prints.

The sink is OPT-IN (created by the driver entrypoint); when absent the
stage-side ``record()`` is a cached no-op — zero overhead for library use.
This is the one shared-mutable-state case where a raw Ray actor is the
right tool (a Dataset can't express a cross-stage metrics channel).
"""

from __future__ import annotations

import numpy as np

SINK_NAME = "graft_metrics_sink"
SINK_NAMESPACE = "graft_metrics"

_local_handle_cache: dict[str, object] = {}


def _sink_actor_cls():
    import ray

    @ray.remote(num_cpus=0)
    class MetricsSink:
        def __init__(self) -> None:
            self._samples: dict[str, list[float]] = {}

        def record(self, key: str, values: list[float]) -> None:
            self._samples.setdefault(key, []).extend(values)

        def drain(self) -> dict:
            out = {}
            for key, vals in self._samples.items():
                a = np.asarray(vals, dtype=np.float64)
                out[key] = {
                    "count": int(len(a)),
                    "sum_ms": round(float(a.sum()), 3),
                    "p50_ms": round(float(np.percentile(a, 50)), 3),
                    "p90_ms": round(float(np.percentile(a, 90)), 3),
                    "p99_ms": round(float(np.percentile(a, 99)), 3),
                    "max_ms": round(float(a.max()), 3),
                }
            self._samples.clear()
            return out

    return MetricsSink


def create_sink():
    """Create (or fetch) the named sink — call from the driver entrypoint."""
    import ray

    return _sink_actor_cls().options(
        name=SINK_NAME, namespace=SINK_NAMESPACE, get_if_exists=True,
        lifetime="detached",
    ).remote()


def drain_sink(handle=None) -> dict:
    import ray

    h = handle or _get_handle()
    if h is None:
        return {}
    return ray.get(h.drain.remote())


def destroy_sink() -> None:
    import ray

    h = _get_handle()
    if h is not None:
        ray.kill(h)
    _local_handle_cache.clear()


def _get_handle():
    if "h" in _local_handle_cache:
        return _local_handle_cache["h"]
    import ray

    try:
        h = ray.get_actor(SINK_NAME, namespace=SINK_NAMESPACE)
        _local_handle_cache["h"] = h
        return h
    except ValueError:
        return None


def record(sink, key: str, wall_ms: float) -> None:
    """Fire-and-forget a timing sample from inside a task.

    ``sink`` is the actor handle shipped WITH the task closure (the stage
    captured it when the pipeline was built) — no per-call actor lookup,
    strictly zero overhead when metrics are off (``sink is None``)."""
    if sink is None:
        return
    sink.record.remote(key, [float(wall_ms)])
