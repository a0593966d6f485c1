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


def add_fingerprint(ds, text_col: str = "text", out_col: str = "fingerprint"):
    """Rolling-hash document fingerprint column (int64, deterministic).

    Fully vectorized: one O(total_bytes) pass over the column's UTF-8 buffer
    (``poly_hash_column``), value-identical to the scalar
    ``text_fingerprint`` (pytest-checked)."""

    def fn(batch: pa.Table) -> pa.Table:
        fps = poly_hash_column(batch[text_col]).astype(np.int64)
        return batch.append_column(out_col, pa.array(fps))

    return ds.map_batches(fn, batch_format="pyarrow")
