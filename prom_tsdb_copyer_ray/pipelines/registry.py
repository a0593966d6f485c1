"""Collision-proof query/oracle registries (round-3 verdict item 6).

Round 3's `0a31085` fixed four wave names that silently SHADOWED
pre-existing queries because ``dict.update`` overwrites.  These guarded
dicts make that bug structurally impossible: any duplicate registration
— via ``update``, ``[]=``, or ``|=`` — raises at import time, so the
suite (and ``len(QUERIES)`` accounting) fails before a query can be
eaten.  ``tests/test_registry.py`` pins the battery size and parity
between QUERIES and ORACLE_SQL.
"""
from __future__ import annotations


class GuardedRegistry(dict):
    """A dict that refuses to overwrite an existing key."""

    def __init__(self, label: str):
        super().__init__()
        self._label = label

    def __setitem__(self, key, value):
        if key in self:
            raise ValueError(
                f"duplicate {self._label} registration: {key!r} is "
                "already registered — rename the new query (round-3 "
                "wave-name collision class)")
        super().__setitem__(key, value)

    def update(self, other=(), **kw):  # type: ignore[override]
        items = other.items() if hasattr(other, "items") else other
        for k, v in items:
            self[k] = v
        for k, v in kw.items():
            self[k] = v

    def __ior__(self, other):
        self.update(other)
        return self

    def replace(self, key, value):
        """Explicit, intentional override (none needed today)."""
        super().__setitem__(key, value)
