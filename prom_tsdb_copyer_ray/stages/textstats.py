"""Text-analysis stages over a documents table (training-data pipeline).

Language-ID, quality scoring, token counting, fingerprinting — each a
vectorized or actor-pool ``map_batches`` stage over ``(doc_id, text, ...)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import poly_hash_column
from ..functions.text import LangIdModel, quality_counts, token_count


def add_quality_counts(ds, text_col: str = "text"):
    """Vectorized quality raw counts (chars/alpha/digit/space/tokens)."""
    return ds.map_batches(
        lambda b: quality_counts(b, text_col), batch_format="pyarrow"
    )


def add_token_count(ds, text_col: str = "text", out_col: str = "n_tokens"):
    return ds.map_batches(
        lambda b: b.append_column(out_col, token_count(b[text_col])),
        batch_format="pyarrow",
    )


class LangIdStage:
    """Actor-pool stage: add ``pred_lang`` (heuristic model built per actor)."""

    def __init__(self, text_col: str = "text") -> None:
        self.model = LangIdModel()
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = self.model.predict(batch[self.text_col].to_pylist())
        return batch.append_column("pred_lang", pa.array(preds, pa.string()))


def add_lang_id(ds, text_col: str = "text", concurrency=(1, 8)):
    return ds.map_batches(
        LangIdStage, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency,
    )


def term_document_frequency(ds, text_col: str = "text", top_n: int = 100,
                            num_shards: int = 64):
    """Top-N vocabulary terms by document frequency (df).

    Terms are ASCII ``[A-Za-z]+`` runs, lowercased; df counts each doc once
    per term.  Scale shape: the per-batch stage is a true combiner — it
    emits (term, partial_df) rows, so the shuffle moves per-batch vocab
    (Zipf-bounded), never per-occurrence rows; the groupby is over a hash
    shard of the term with a segment sum, and only the collapsed vocab
    reaches the final (tiny) sort.  The per-doc ``re.findall`` is a
    C-level compiled-regex pass, same justification as the extraction
    stage (stages/extract.py)."""
    import re

    word_re = re.compile(r"[A-Za-z]+")

    def partial_df(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for t in batch[text_col].to_pylist():
            counts.update({m.lower() for m in word_re.findall(t or "")})
        terms = list(counts.keys())
        tbl = pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "df": pa.array([counts[t] for t in terms], pa.int64()),
            }
        )
        shard = (poly_hash_column(tbl["term"], fold63=False) % np.uint64(num_shards)).astype(np.int64)
        return tbl.append_column("_tshard", pa.array(shard))

    def shard_sum(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        t = group.sort_by([("term", "ascending")])
        term = t["term"].combine_chunks() if isinstance(t["term"], pa.ChunkedArray) else t["term"]
        import pyarrow.compute as pc

        n = t.num_rows
        new = np.ones(n, dtype=bool)
        new[1:] = pc.not_equal(term.slice(1), term.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.flatnonzero(new)
        sums = np.add.reduceat(t["df"].to_numpy(zero_copy_only=False), starts)
        return pa.table(
            {
                "term": term.take(pa.array(starts)),
                "df": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    vocab = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("_tshard")
        .map_groups(shard_sum, batch_format="pyarrow")
    )
    return vocab.sort(["df", "term"], descending=[True, False]).limit(top_n)


def add_fingerprint(ds, text_col: str = "text", out_col: str = "fingerprint"):
    """Rolling-hash document fingerprint column (int64, deterministic).

    Fully vectorized: one O(total_bytes) pass over the column's UTF-8 buffer
    (``poly_hash_column``), value-identical to the scalar
    ``text_fingerprint`` (pytest-checked)."""

    def fn(batch: pa.Table) -> pa.Table:
        fps = poly_hash_column(batch[text_col]).astype(np.int64)
        return batch.append_column(out_col, pa.array(fps))

    return ds.map_batches(fn, batch_format="pyarrow")
