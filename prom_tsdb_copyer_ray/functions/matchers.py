"""Label matchers: parse + vectorized Arrow predicates (operators O4, O5).

Semantics follow the reference exactly:

* Parse (``main.go:82-111``): a CLI string ``k<op>v`` where op precedence is
  ``!=``, ``=~``, ``!~`` then ``=``; the value may itself contain the
  separator (it is re-joined, ``main.go:109``); a bare string ``s`` with no
  operator is sugar for ``__name__ = s`` (``main.go:97``).
* Evaluation: Prometheus matcher semantics — ``=`` / ``!=`` exact string
  (in)equality, ``=~`` / ``!~`` fully-anchored regex (``^(?:pat)$``).  A
  missing label evaluates as the empty string.  Multiple matchers AND
  together; the default matcher set is ``{__name__ != ""}`` = "all series"
  (``main.go:153-158``).

Evaluation here is a vectorized ``pyarrow.compute`` kernel over label
columns inside ``map_batches`` — never a Python loop over rows.  ``=``
matchers on Parquet partition columns can additionally be pushed into
``read_parquet`` filters (see sources/parquet.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence

import pyarrow as pa
import pyarrow.compute as pc

EQ, NEQ, RE, NRE = "=", "!=", "=~", "!~"
_OPS_IN_PRECEDENCE = (NEQ, RE, NRE, EQ)  # main.go:84-107 switch order


@dataclass(frozen=True)
class Matcher:
    op: str  # one of = != =~ !~
    name: str
    value: str

    def __post_init__(self) -> None:
        if self.op not in (EQ, NEQ, RE, NRE):
            raise ValueError(f"bad matcher op: {self.op!r}")


def parse_matcher(s: str) -> Matcher:
    """Parse one ``k<op>v`` string (``mustParseKV``, ``main.go:82-111``).

    The first operator found (checking ``!=``, ``=~``, ``!~``, ``=`` in that
    order) splits the string; everything after the first occurrence is the
    value even if it contains more separators (``main.go:109`` re-join).
    A string containing no operator matches the metric name: ``__name__=s``.
    """
    for op in _OPS_IN_PRECEDENCE:
        idx = s.find(op)
        if idx >= 0:
            # `=` would also match inside `!=` / `=~`; the precedence order
            # plus find() of the *operator itself* resolves it like the Go
            # switch does (it tests the longer ops first).
            name, value = s[:idx], s[idx + len(op) :]
            if op == EQ and name.endswith("!"):
                # guard: `a!=b` found via `=` can't happen (NEQ tested first)
                raise AssertionError("unreachable")
            return Matcher(op, name, value)
    return Matcher(EQ, "__name__", s)


def parse_matchers(specs: Iterable[str]) -> list[Matcher]:
    return [parse_matcher(s) for s in specs]


def default_matchers() -> list[Matcher]:
    """The all-series default ``{__name__ != ""}`` (``main.go:153-158``)."""
    return [Matcher(NEQ, "__name__", "")]


def _label_column(table: pa.Table, name: str) -> pa.ChunkedArray | pa.Array:
    """Label column lookup; a missing label is the empty string (Prometheus)."""
    if name in table.column_names:
        col = table[name]
        # null label values also behave as ""
        return pc.fill_null(pc.cast(col, pa.string()), "")
    return pa.nulls(table.num_rows, pa.string()).fill_null("")


def matcher_mask(table: pa.Table, matchers: Sequence[Matcher]) -> pa.ChunkedArray | pa.Array:
    """Boolean mask of rows whose label columns satisfy ALL matchers."""
    mask = None
    for m in matchers:
        col = _label_column(table, m.name)
        if m.op == EQ:
            part = pc.equal(col, m.value)
        elif m.op == NEQ:
            part = pc.not_equal(col, m.value)
        else:
            part = pc.match_substring_regex(col, f"^(?:{m.value})$")
            if m.op == NRE:
                part = pc.invert(part)
        mask = part if mask is None else pc.and_(mask, part)
    if mask is None:
        mask = pa.nulls(table.num_rows, pa.bool_()).fill_null(True)
    return mask


def filter_table(table: pa.Table, matchers: Sequence[Matcher]) -> pa.Table:
    """Vectorized AND-of-matchers filter (operator O5, ``copyer.go:91``)."""
    if not matchers:
        return table
    return table.filter(matcher_mask(table, matchers))


def make_filter_fn(matchers: Sequence[Matcher]):
    """A ``map_batches(fn, batch_format="pyarrow")`` callable for a fixed set."""
    ms = list(matchers)

    def fn(batch: pa.Table) -> pa.Table:
        return filter_table(batch, ms)

    return fn
