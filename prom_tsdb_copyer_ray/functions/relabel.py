"""Relabel kernels (operator O7, ``copyer.go:99-105``).

The reference applies each ``-L k=v`` flag as a **blind upsert** on every
series' label set — ``builder.Set(k, v)`` overwrites an existing label without
checking (flag doc ``main.go:43-45``), and is applied before writing, so it
changes series identity and can *merge* previously distinct series.  The merge
is healed downstream: merged series flow into the same rollup group (the
TSDB-head-dedup analogue; here, the tier groupby).

Here a relabel is a vectorized Arrow kernel inside ``map_batches``: replace or
append a constant (or computed) label column, then recompute ``series_key``.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc


def relabel_table(table: pa.Table, rules: Mapping[str, str]) -> pa.Table:
    """Blind-upsert constant labels: set column ``k`` to scalar ``v`` for each rule.

    Overwrites existing columns without checking (``main.go:43-45`` semantics).
    """
    for name, value in rules.items():
        arr = pa.nulls(table.num_rows, pa.string()).fill_null(value)
        if name in table.column_names:
            table = table.set_column(table.column_names.index(name), name, arr)
        else:
            table = table.append_column(name, arr)
    return table


def series_key(table: pa.Table, label_cols: Sequence[str]) -> pa.Array:
    """Canonical series identity: ``k=v,k=v,...`` over sorted label names.

    The reference's series identity is the full sorted label set
    (``copyer.go:95-98``; ``__name__`` is just another label).  Columns absent
    from the table are skipped; null values normalize to "" so the key is
    deterministic regardless of block layout.  The key is internal (shuffle /
    dedup identity), never user-facing.
    """
    parts: list[pa.ChunkedArray | pa.Array] = []
    first = True
    for name in sorted(label_cols):
        if name not in table.column_names:
            continue
        col = pc.fill_null(pc.cast(table[name], pa.string()), "")
        piece = pc.binary_join_element_wise(
            pa.nulls(table.num_rows, pa.string()).fill_null(name), col, "="
        )
        if first:
            parts.append(piece)
            first = False
        else:
            parts.append(pa.nulls(table.num_rows, pa.string()).fill_null(","))
            parts.append(piece)
    if not parts:
        return pa.nulls(table.num_rows, pa.string()).fill_null("")
    if len(parts) == 1:
        out = parts[0]
    else:
        out = pc.binary_join_element_wise(*parts, "")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def make_relabel_fn(rules: Mapping[str, str], label_cols: Sequence[str], key_col: str = "series_key"):
    """``map_batches`` callable: upsert labels then recompute the series key."""
    rules = dict(rules)
    label_cols = list(label_cols)

    def fn(batch: pa.Table) -> pa.Table:
        batch = relabel_table(batch, rules)
        key = series_key(batch, sorted(set(label_cols) | set(rules)))
        if key_col in batch.column_names:
            batch = batch.set_column(batch.column_names.index(key_col), key_col, key)
        else:
            batch = batch.append_column(key_col, key)
        return batch

    return fn


def label_replace(table: pa.Table, dst: str, replacement: str, src: str,
                  regex: str) -> pa.Table:
    """PromQL ``label_replace(v, dst, replacement, src, regex)``: when the
    FULLY-ANCHORED regex matches the ``src`` label, set ``dst`` to
    ``replacement`` with ``\\1``-style backrefs expanded; non-matching rows
    keep their existing ``dst`` (or "" when absent) — exact PromQL
    semantics.  Vectorized: one RE2 ``replace_substring_regex`` + one match
    mask, no Python per row."""
    anchored = f"^(?:{regex})$"
    src_col = (table[src] if src in table.column_names
               else pa.nulls(table.num_rows, pa.string()).fill_null(""))
    matched = pc.match_substring_regex(src_col, anchored)
    replaced = pc.replace_substring_regex(src_col, anchored, replacement)
    old = (table[dst] if dst in table.column_names
           else pa.nulls(table.num_rows, pa.string()).fill_null(""))
    out = pc.if_else(matched, replaced, old)
    if dst in table.column_names:
        return table.set_column(table.column_names.index(dst), dst, out)
    return table.append_column(dst, out)


def label_join(table: pa.Table, dst: str, sep: str,
               srcs: Sequence[str]) -> pa.Table:
    """PromQL ``label_join(v, dst, sep, srcs...)``: ``dst`` becomes the
    ``sep``-joined values of the source labels (missing labels join as
    "").  One Arrow ``binary_join_element_wise`` call."""
    cols = [
        (table[c].combine_chunks() if isinstance(table[c], pa.ChunkedArray)
         else table[c])
        if c in table.column_names
        else pa.nulls(table.num_rows, pa.string()).fill_null("")
        for c in srcs
    ]
    out = pc.binary_join_element_wise(*cols, sep)
    if dst in table.column_names:
        return table.set_column(table.column_names.index(dst), dst, out)
    return table.append_column(dst, out)
