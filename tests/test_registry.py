"""Registry-consolidation guards (round-3 verdict item 6): duplicate
query names must raise at registration, and the battery totals are
pinned so a silent shadow (the round-3 `0a31085` bug class) can never
pass the suite again."""

from __future__ import annotations

import pytest

from prom_tsdb_copyer_ray.pipelines.queries import ORACLE_SQL, QUERIES
from prom_tsdb_copyer_ray.pipelines.registry import GuardedRegistry

# bump BOTH when a wave adds queries; a mismatch here means a name was
# eaten (or the tally in COVERAGE.md is stale)
EXPECTED_QUERIES = 442
EXPECTED_ORACLES = 441  # pages_tiers_chunks is rows-only (raw chunk bytes)


def test_battery_totals_pinned():
    assert len(QUERIES) == EXPECTED_QUERIES
    assert len(ORACLE_SQL) == EXPECTED_ORACLES
    assert set(ORACLE_SQL) <= set(QUERIES)
    assert set(QUERIES) - set(ORACLE_SQL) == {"pages_tiers_chunks"}


def test_duplicate_registration_raises():
    r = GuardedRegistry("test")
    r["a"] = 1
    with pytest.raises(ValueError, match="duplicate"):
        r["a"] = 2
    with pytest.raises(ValueError, match="duplicate"):
        r.update({"a": 3})
    with pytest.raises(ValueError, match="duplicate"):
        r |= {"b": 1, "a": 4}
    assert r["a"] == 1 and r["b"] == 1  # b landed before a raised? no:
    # update applies in iteration order; "b" precedes "a" in the literal,
    # so it was registered before the duplicate raised


def test_live_registries_are_guarded():
    assert isinstance(QUERIES, GuardedRegistry)
    assert isinstance(ORACLE_SQL, GuardedRegistry)
    name = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate"):
        QUERIES.update({name: QUERIES[name]})
    with pytest.raises(ValueError, match="duplicate"):
        ORACLE_SQL.update({next(iter(ORACLE_SQL)): "SELECT 1"})


def test_collect_stable_preserves_schema_of_empty_results():
    """Ray drops the schema of an all-empty Dataset (``to_pandas`` returns a
    (0, 0) frame), which broke the driver compare for ``absent_series`` at
    sf1 density (round-4 sweep).  ``_collect_stable`` must rebuild the
    columns from the Dataset schema."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from prom_tsdb_copyer_ray.pipelines.queries import _collect_stable

    def empty(batch: pa.Table) -> pa.Table:
        return batch.slice(0, 0)  # schema-preserving empty, like only_absent

    def make():
        return ray.data.from_arrow(
            pa.table({"a": pa.array([1, 2], pa.int64()),
                      "b": pa.array(["x", "y"], pa.string())})
        ).map_batches(empty, batch_format="pyarrow")

    assert len(make().to_pandas().columns) == 0  # the Ray quirk this guards
    df = _collect_stable(make())
    assert list(df.columns) == ["a", "b"]
    assert len(df) == 0
    assert df["a"].dtype == "int64" and df["b"].dtype == object
    # non-empty path untouched
    df2 = _collect_stable(ray.data.from_pandas(pd.DataFrame({"a": [1]})))
    assert df2.shape == (1, 1)


def test_split_modules_only_via_aggregator():
    """The queries_w* chunks register into the shared registries at import;
    importing them through the aggregator must be idempotent (sys.modules
    caching), i.e. a second import never re-registers."""
    import importlib

    import prom_tsdb_copyer_ray.pipelines.queries as q

    before = len(q.QUERIES)
    importlib.import_module("prom_tsdb_copyer_ray.pipelines.queries_w1")
    importlib.import_module("prom_tsdb_copyer_ray.pipelines.qsubstrate")
    assert len(q.QUERIES) == before
