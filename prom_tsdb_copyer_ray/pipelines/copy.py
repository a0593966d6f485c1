"""The flagship copy/rollup pipeline (operator O15, ``doCopy`` analogue).

End-to-end plan (SURVEY.md §3 Ray translation)::

    pages Dataset
      -> map_batches(PageToSamples, actor pool)   # extraction, O8
      -> matcher filter kernel                    # O5 (before relabel, as
                                                  #  Select() runs before the
                                                  #  label rewrite, copyer.go:91)
      -> relabel kernel                           # O7
      -> rollup_raw  -> 5m tier                   # O11 (encode) shuffle #1
      -> rollup_up   -> 1h tier                   # O14 (merge)  shuffle #2
      -> rollup_up   -> 1d tier                   #              shuffle #3
      -> write_parquet per tier + manifests       # resumable, state/manifest

:func:`run_copy` checkpoints each tier to Parquet and feeds the next tier
from the *written* tier (the analogue of compaction reading written blocks),
so a resumed run never recomputes a completed tier, and the in-memory
lineage is never executed twice.

:func:`build_tiers` is the all-in-memory variant for driver queries/tests:
it materializes the collapsed 5m tier (small relative to input) before
branching so the extraction stage runs exactly once.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from ..functions.matchers import Matcher, make_filter_fn
from ..functions.relabel import make_relabel_fn
from ..stages.extract import SAMPLE_LABELS, PageToSamples
from ..stages.rollup import rollup_raw, rollup_up
from ..state.manifest import load_manifest, read_tier, write_tier


def pages_to_samples(
    pages_ds,
    matchers: Sequence[Matcher] | None = None,
    relabels: Mapping[str, str] | None = None,
    validate: str = "strict",
    batch_size: int = 4096,
    concurrency=(1, 8),
):
    """pages -> filtered/relabeled samples Dataset (extraction actor pool).

    ``concurrency`` is the actor-pool size ((min, max) autoscales with the
    streaming executor's backpressure — the semaphore analogue, pool.go).
    """
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
    samples = pages_ds.map_batches(
        PageToSamples, fn_constructor_kwargs={"validate": validate}, **kwargs
    )
    if matchers:
        samples = samples.map_batches(make_filter_fn(matchers), batch_format="pyarrow")
    if relabels:
        samples = samples.map_batches(
            make_relabel_fn(relabels, SAMPLE_LABELS), batch_format="pyarrow"
        )
    return samples


def build_tiers(
    pages_ds,
    matchers: Sequence[Matcher] | None = None,
    relabels: Mapping[str, str] | None = None,
    validate: str = "strict",
    tiers: Sequence[str] = ("5m", "1h", "1d"),
    **kw,
):
    """In-memory tier chain; returns {tier: Dataset}.

    The 5m tier is materialized before fan-out (collapsed chunk rows, orders
    of magnitude smaller than the raw input) so upstream extraction executes
    once, not once per consumer.
    """
    samples = pages_to_samples(pages_ds, matchers, relabels, validate, **kw)
    out = {}
    t5 = rollup_raw(samples, "5m").materialize()
    out["5m"] = t5
    if "1h" in tiers or "1d" in tiers:
        t1h = rollup_up(t5, "1h").materialize()
        out["1h"] = t1h
        if "1d" in tiers:
            out["1d"] = rollup_up(t1h, "1d")
    return {t: out[t] for t in tiers}


def run_copy(
    pages_ds_factory,
    out_dir: str,
    matchers: Sequence[Matcher] | None = None,
    relabels: Mapping[str, str] | None = None,
    validate: str = "strict",
    **kw,
) -> dict:
    """Checkpointed end-to-end run; returns {tier: manifest}.

    ``pages_ds_factory`` is a zero-arg callable returning the pages Dataset
    (a factory so a resumed run whose 5m tier is already complete never even
    constructs the read).  Each tier is written (resumably, day-partitioned)
    before the next tier reads it back from Parquet.
    """
    manifests = {}
    m5 = load_manifest(out_dir, "5m")
    if m5["status"] != "complete":
        samples = pages_to_samples(pages_ds_factory(), matchers, relabels, validate, **kw)
        m5 = write_tier(rollup_raw(samples, "5m"), out_dir, "5m")
    manifests["5m"] = m5

    m1h = load_manifest(out_dir, "1h")
    if m1h["status"] != "complete":
        m1h = write_tier(rollup_up(read_tier(out_dir, "5m"), "1h"), out_dir, "1h")
    manifests["1h"] = m1h

    m1d = load_manifest(out_dir, "1d")
    if m1d["status"] != "complete":
        m1d = write_tier(rollup_up(read_tier(out_dir, "1h"), "1d"), out_dir, "1d")
    manifests["1d"] = m1d
    return manifests
