"""The ``pages`` input table (BASELINE.json ``input_hint`` schema).

Schema: ``url: string, warc_ts: timestamp[ms], html: binary, text: string,
lang: string`` — the "source TSDB" of the new engine (the analogue of the
reference's read-only block dir, ``copyer.go:60``).

Two deterministic constructors, both seed-fixed, no wall-clock, no external
data:

* :func:`generate_pages` — the FIXTURES.md F1 synthetic generator:
  Zipf-skewed domains (two hot ones), irregular timestamps with >5m gaps,
  duplicate ``(url, warc_ts)`` rows, HTML edge cases (script/style blocks,
  entities, malformed tails).  Used by golden e2e tests and the bench.
* :func:`pages_from_documents` — derives pages 1:1 from a ``documents``
  parquet (doc_id, text, lang, source) with closed-form url/timestamp/html,
  so a DuckDB oracle can mirror every downstream rollup **without** parsing
  HTML (the wrap/extract pair is the identity on ``text`` by construction,
  which pytest verifies byte-for-byte).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.text import html_escape_basic, wrap_html

BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z — matches the testdata epoch
DOC_TS_STEP_MS = 7_000  # pages_from_documents: warc_ts = BASE_MS + doc_id * 7s

_WORDS = (
    "data query batch window spark merge table row column value part hash scan "
    "filter sort stream join agg fast slow small big line order key the a"
).split()
_CJK = "数据查询批处理窗口合并表行列值部分哈希扫描过滤排序流连接聚合快慢小大行序键的一"


def _domain_pool(n_domains: int = 50) -> list[str]:
    return [f"site{i:02d}.example.com" for i in range(n_domains)]


def generate_pages(
    n: int,
    seed: int = 42,
    n_domains: int = 50,
    hot_mass: float = 0.3,
    dup_frac: float = 0.01,
    span_ms: int = 24 * 3600 * 1000,
) -> pa.Table:
    """Deterministic synthetic pages table (FIXTURES.md F1).

    Two "hot" domains carry ``hot_mass`` of the rows each (skew-splitting
    exercise); ``dup_frac`` of rows are exact ``(url, warc_ts)`` duplicates
    (dedup-keep-first exercise); timestamps are irregular over ``span_ms``
    with guaranteed >5m gaps.
    """
    rng = np.random.RandomState(seed)
    domains = _domain_pool(n_domains)
    langs = ["en", "zh", "de", "ja"]

    # domain distribution: two hot + zipf tail
    tail = 1.0 / np.arange(1, n_domains - 1, dtype=np.float64)
    tail = (1 - 2 * hot_mass) * tail / tail.sum()
    probs = np.concatenate([[hot_mass, hot_mass], tail])
    dom_idx = rng.choice(n_domains, size=n, p=probs)
    lang_idx = (dom_idx * 7 + rng.randint(0, 3, size=n)) % len(langs)

    # irregular timestamps: sorted uniform + forced >5m gaps every ~1000 rows
    ts = np.sort(rng.randint(0, span_ms, size=n).astype(np.int64))
    gap_every = max(1, n // 37)
    ts[::gap_every] += 0  # keep deterministic layout
    ts = BASE_MS + ts + (np.arange(n, dtype=np.int64) // gap_every) * 400_000

    urls, htmls, texts, langs_out = [], [], [], []
    word_idx = rng.randint(0, len(_WORDS), size=(n, 12))
    edge_kind = rng.randint(0, 5, size=n)
    for i in range(n):
        dom = domains[dom_idx[i]]
        lang = langs[lang_idx[i]]
        if lang == "zh":
            text = "".join(_CJK[j % len(_CJK)] for j in word_idx[i]) + " 混合 ascii & <标记>"
        else:
            text = " ".join(_WORDS[j] for j in word_idx[i])
            if edge_kind[i] == 1:
                text += " & <angle> text"
            elif edge_kind[i] == 2:
                text += "\nsecond line — dash"
        url = f"https://{dom}/p/{i}"
        body = html_escape_basic(text)
        title = f"page {i}"
        # html edge cases around the canonical <p> body (extraction must
        # still return `text` byte-identically)
        if edge_kind[i] == 3:
            html = (
                f"<html><head><title>{title}</title><style>p {{margin:0}}</style></head>"
                f"<body><script>var a='<p>no</p>';</script><p>{body}</p></body></html>"
            )
        elif edge_kind[i] == 4:
            html = (
                f"<html><head><title>{title}</title></head>"
                f"<body><p>{body}</p></body></html><broken trail"
            )
        else:
            html = (
                f"<html><head><title>{title}</title></head>"
                f"<body><p>{body}</p></body></html>"
            )
        urls.append(url)
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs_out.append(lang)

    # duplicates: repeat the first k rows verbatim at the end (same url+ts)
    k = int(n * dup_frac)
    if k:
        urls += urls[:k]
        htmls += htmls[:k]
        texts += texts[:k]
        langs_out += langs_out[:k]
        ts = np.concatenate([ts, ts[:k]])

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("ms")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs_out, pa.string()),
        }
    )


def pages_from_documents_batch(batch: pa.Table) -> pa.Table:
    """Vectorized documents -> pages derivation (map_batches kernel).

    Closed-form so a SQL oracle can mirror it:
    ``url = 'https://' || source || '.example.com/doc/' || doc_id``,
    ``warc_ts = BASE_MS + doc_id * 7000`` (ms),
    ``html = wrap_html('doc' || doc_id, text)``, ``lang`` passthrough.
    """
    doc_id = batch["doc_id"].to_numpy()
    texts = batch["text"].to_pylist()
    sources = batch["source"].to_pylist()
    urls = [f"https://{s}.example.com/doc/{d}" for s, d in zip(sources, doc_id)]
    htmls = [wrap_html(f"doc{d}", t or "") for d, t in zip(doc_id, texts)]
    ts = BASE_MS + doc_id.astype(np.int64) * DOC_TS_STEP_MS
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("ms")),
            "html": pa.array(htmls, pa.binary()),
            "text": batch["text"],
            "lang": batch["lang"],
        }
    )


def read_pages_from_documents(sf_dir: str, replicate: int = 1):
    """Ray Dataset of pages derived from ``{sf_dir}/documents.parquet``.

    ``replicate > 1`` tiles the corpus deterministically for bench scale:
    copy ``r`` shifts doc_ids by ``r * (max_id + 1)`` (distinct urls and
    timestamps, same text payloads) — no external data, same skew shape.
    """
    import pyarrow.parquet as pq
    import ray.data

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text", "lang", "source"])
    if replicate > 1:
        n_docs = pq.read_metadata(path).num_rows
        shift = int(n_docs)

        def tile(batch: pa.Table) -> pa.Table:
            out = []
            for r in range(replicate):
                t = batch.set_column(
                    batch.column_names.index("doc_id"),
                    "doc_id",
                    pa.compute.add(batch["doc_id"], r * shift),
                )
                out.append(t)
            return pa.concat_tables(out)

        ds = ds.map_batches(tile, batch_format="pyarrow")
    return ds.map_batches(pages_from_documents_batch, batch_format="pyarrow")
