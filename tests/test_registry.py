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
