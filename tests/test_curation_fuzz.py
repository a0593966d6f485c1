"""Cross-engine fuzz: the curation kernels vs the exact DuckDB expressions
their oracles use, on adversarial text (whitespace runs, unicode, blanks,
repeats).  Pure-kernel tests — no Ray session needed."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from prom_tsdb_copyer_ray.stages.curation import (
    normalize_text_batch,
    repetition_stats_batch,
)

# words + whitespace + a sprinkle of unicode (incl. combining accents so the
# NFC path is exercised) + control-ish chars
_WORD = st.text(
    alphabet="abcXYZ0é9́中-.,", min_size=1, max_size=6
)
_SEP = st.sampled_from([" ", "  ", "\t", "\n", " \t\n", "\r\n"])
_TEXT = st.one_of(
    st.just(""),
    st.just("   \t\n "),
    st.lists(_WORD, min_size=1, max_size=25).flatmap(
        lambda ws: _SEP.map(lambda s: s.join(ws))
    ),
    st.lists(st.sampled_from(["dup", "dup dup", "x y", "\tz"]),
             min_size=1, max_size=30).map(" ".join),
)

_REP_SQL = r"""
WITH toks AS (
  SELECT i AS doc_id,
         CASE WHEN trim(t, ' ' || chr(9) || chr(13) || chr(10)) = ''
              THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(
                   trim(t, ' ' || chr(9) || chr(13) || chr(10)), '[ \t\r\n]+') END AS tk
  FROM df),
g AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
             i -> tk[i] || chr(1) || tk[i+1])) AS gram FROM toks),
gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
gm AS (SELECT doc_id, max(c) AS mx FROM gc GROUP BY 1)
SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(t.tk)) AS BIGINT) AS n_distinct_tokens,
       CAST(coalesce(gm.mx, 0) AS BIGINT) AS max_gram2_count
FROM toks t LEFT JOIN gm ON t.doc_id = gm.doc_id ORDER BY 1
"""

_NORM_SQL = r"""
SELECT i AS doc_id,
       trim(regexp_replace(lower(nfc_normalize(t)), '[ \t\r\n]+', ' ', 'g'), ' ')
       AS norm_text
FROM df ORDER BY 1
"""


def _duck(texts, sql):
    import pandas as pd

    con = duckdb.connect()
    df = pd.DataFrame({"i": range(len(texts)), "t": texts})
    con.register("df", df)
    return con.execute(sql).df()


@settings(max_examples=40, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_repetition_fuzz_vs_duckdb(texts):
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = repetition_stats_batch(batch).to_pandas().sort_values("doc_id")
    want = _duck(texts, _REP_SQL)
    for col in ("n_tokens", "n_distinct_tokens", "max_gram2_count"):
        assert got[col].tolist() == want[col].astype("int64").tolist(), (col, texts)


@settings(max_examples=40, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_normalize_fuzz_vs_duckdb(texts):
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = normalize_text_batch(batch).to_pandas().sort_values("doc_id")
    want = _duck(texts, _NORM_SQL)
    assert got["norm_text"].tolist() == want["norm_text"].tolist(), texts
