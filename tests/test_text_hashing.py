"""Text/HTML and hashing function tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from prom_tsdb_copyer_ray.functions.hashing import (
    MinHasher,
    char_ngram_hashes,
    hamming64,
    jaccard,
    poly_hash_column,
    poly_hash_windows,
    popcount64,
    simhash64,
    stable_hash64,
    text_fingerprint,
    word_ngram_hashes,
)
from prom_tsdb_copyer_ray.functions.text import (
    LangIdModel,
    extract_text,
    html_escape_basic,
    html_unescape_basic,
    quality_counts,
    token_count,
    url_domain,
    wrap_html,
    PAGE_TEMPLATE_OVERHEAD,
)


# --- html wrap/extract (input_hint byte-identical invariant) ---------------

def test_wrap_extract_roundtrip():
    for text in [
        "hello world",
        "a < b & c > d",
        "multi\nline\ntext",
        "中文文本 with mixed ascii",
        "&amp; literal-entity-looking text &lt;",
        "",
        "  leading and trailing  ",
    ]:
        html = wrap_html("some title", text)
        assert extract_text(html) == text, text


def test_template_overhead_constant():
    text = "xyz & <tag>"
    esc = html_escape_basic(text)
    html = wrap_html("t", text)
    assert len(html) == PAGE_TEMPLATE_OVERHEAD + len("t") + len(esc.encode("utf-8"))


def test_escape_inverse():
    s = "a&b<c>d&amp;"
    assert html_unescape_basic(html_escape_basic(s)) == s


def test_extract_strips_title_script_style_malformed():
    html = (
        b"<html><head><title>TITLE</title><style>p{color:red}</style></head>"
        b"<body><script>var x = '<p>not text</p>';</script>"
        b"<p>first</p><div>skipped</div><p>second &#x2014; dash</p></body><broken"
    )
    assert extract_text(html) == "first\nsecond — dash"


def test_extract_entities():
    assert extract_text(b"<p>&quot;q&quot; &#65; &amp;</p>") == '"q" A &'


def test_extract_texts_vectorized_matches_scalar():
    """extract_texts (RE2 fast path + scalar fallback) is byte-identical to
    extract_text per row, across fast-path, fallback, and edge-case html."""
    from prom_tsdb_copyer_ray.functions.text import extract_texts
    from prom_tsdb_copyer_ray.sources.pages import generate_pages

    pages = generate_pages(300, seed=9)  # includes script/style + broken-trail kinds
    htmls = pages["html"].to_pylist()
    extra = [
        b"<html><body><p>one</p><p>two</p></body></html>",          # multi-p
        b"<p>a &#x2014; b</p>",                                      # numeric entity
        b"<p>&quot;q&quot; &apos;s&apos; &nbsp;</p>",                # named entities
        b"no paragraphs here",                                       # no <p>
        b"<p>unclosed paragraph",                                    # no </p>
        b"<P CLASS='x'>upper</P>",                                   # case + attrs
        b"",                                                         # empty
        "<p>café 中文</p>".encode("utf-8"),             # multibyte
        b"<p>bad \xff utf8</p>",                                     # invalid utf-8
        b"<script>var p='<p>no</p>';</script><p>yes</p>",            # script block
    ]
    all_html = htmls + extra
    got = extract_texts(pa.array(all_html, pa.binary())).to_pylist()
    from prom_tsdb_copyer_ray.functions.text import extract_text

    for h, g in zip(all_html, got):
        assert g == extract_text(h), h[:60]


# --- url/token/quality kernels --------------------------------------------

def test_url_domain():
    urls = pa.array(
        [
            "https://example.com/path/x",
            "http://sub.dom.org/",
            "https://nopath.net",
            "https://host.io/p?q=1",
        ]
    )
    got = url_domain(urls).to_pylist()
    assert got == ["example.com", "sub.dom.org", "nopath.net", "host.io"]


def test_token_count():
    texts = pa.array(["a b  c", "", "   ", "one", "\tx\ny z  "])
    assert token_count(texts).to_pylist() == [3, 0, 0, 1, 3]


def test_quality_counts():
    t = pa.table({"doc_id": [1], "text": ["Ab1 c!"]})
    out = quality_counts(t)
    assert out["n_chars_text"].to_pylist() == [6]
    assert out["n_alpha"].to_pylist() == [3]
    assert out["n_digit"].to_pylist() == [1]
    assert out["n_space"].to_pylist() == [1]
    assert out["n_tokens"].to_pylist() == [2]


def test_langid():
    m = LangIdModel()
    assert m.predict_one("the quick brown fox is in the barn with a dog") == "en"
    assert m.predict_one("der hund ist nicht in der schule und das haus") == "de"
    assert m.predict_one("这是一个中文文档，包含很多中文字符，用于测试。") == "zh"
    assert m.predict_one("") == "und"
    assert m.predict_one("zzz qqq xxx") == "und"


# --- hashing ---------------------------------------------------------------

def test_stable_hash_deterministic():
    assert stable_hash64("abc") == stable_hash64(b"abc")
    assert stable_hash64("abc") != stable_hash64("abd")


def test_char_ngram_rolling_matches_naive():
    text = "hello world, rolling hashes"
    n = 5
    got = char_ngram_hashes(text, n)
    b = text.encode("utf-8")
    assert len(got) == len(b) - n + 1
    # naive recomputation of each window
    B, SEED = 1000003, 0x9E3779B97F4A7C15
    for i in range(len(b) - n + 1):
        acc = 0
        for x in b[i : i + n]:
            acc = (acc * B + x + SEED) % 2**64
        assert int(got[i]) == acc, i


def test_char_ngram_short_text():
    assert len(char_ngram_hashes("ab", 5)) == 1
    assert len(char_ngram_hashes("", 5)) == 0


def test_word_ngrams():
    assert len(word_ngram_hashes("a b c d", 3)) == 2
    assert len(word_ngram_hashes("a b", 3)) == 1
    assert len(word_ngram_hashes("", 3)) == 0


def test_minhash_similarity_tracks_jaccard():
    mh = MinHasher(num_perm=128)
    a = char_ngram_hashes("the quick brown fox jumps over the lazy dog " * 5)
    b = char_ngram_hashes("the quick brown fox jumps over the lazy cat " * 5)
    c = char_ngram_hashes("completely different content with other words " * 5)
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    true_ab = jaccard(a, b)
    assert sim_ab > sim_ac
    assert abs(sim_ab - true_ab) < 0.15


def test_minhash_band_hashes_identical_docs_collide():
    mh = MinHasher(num_perm=128)
    h = char_ngram_hashes("same document text here")
    assert mh.band_hashes(mh.signature(h), 32) == mh.band_hashes(mh.signature(h.copy()), 32)


def test_simhash_near_duplicates_close():
    a = simhash64(char_ngram_hashes("the quick brown fox jumps over the lazy dog " * 10))
    b = simhash64(char_ngram_hashes("the quick brown fox jumps over the lazy cat " * 10))
    c = simhash64(char_ngram_hashes("totally unrelated words appear in this one " * 10))
    assert hamming64(a, b) < hamming64(a, c)


def test_fingerprint_deterministic_and_sensitive():
    f1 = text_fingerprint("abc def")
    assert f1 == text_fingerprint("abc def")
    assert f1 != text_fingerprint("abc deg")
    assert 0 <= f1 < 2**63
    assert text_fingerprint("") == 0


_POLY_TEXTS = ["abc def", "", "中文 unicode ééé", "x", "a" * 1000, "abc def", "\n\t "]


def test_poly_hash_column_matches_scalar():
    col = pa.array(_POLY_TEXTS, pa.string())
    got = poly_hash_column(col)
    want = [text_fingerprint(t) for t in _POLY_TEXTS]
    assert [int(x) for x in got] == want


def test_poly_hash_column_chunked_sliced_null():
    chunked = pa.chunked_array([_POLY_TEXTS[:3], _POLY_TEXTS[3:]], pa.string())
    assert [int(x) for x in poly_hash_column(chunked)] == [
        text_fingerprint(t) for t in _POLY_TEXTS
    ]
    sliced = pa.array(_POLY_TEXTS).slice(2, 4)
    assert [int(x) for x in poly_hash_column(sliced)] == [
        text_fingerprint(t) for t in _POLY_TEXTS[2:6]
    ]
    with_null = pa.array(["a", None, "b"])
    assert [int(x) for x in poly_hash_column(with_null)] == [
        text_fingerprint("a"), 0, text_fingerprint("b")
    ]


def test_poly_hash_windows_uint64_values():
    vals = np.array([5, 7, 7, 0, 2**63], dtype=np.uint64)
    offs = np.array([0, 2, 2, 5], dtype=np.int64)
    h = poly_hash_windows(vals, offs)
    assert len(h) == 3
    assert int(h[1]) == 0  # empty window
    # same content -> same hash, regardless of surrounding windows
    h2 = poly_hash_windows(vals[:2], np.array([0, 2]))
    assert int(h[0]) == int(h2[0])


def test_popcount64_matches_python():
    xs = np.array([0, 1, 3, 2**64 - 1, 0x8000000000000000, 12345678901234567], dtype=np.uint64)
    assert list(popcount64(xs)) == [bin(int(x)).count("1") for x in xs]


def test_bpe_token_count():
    from prom_tsdb_copyer_ray.functions.text import bpe_token_count

    texts = pa.array([
        "hello world",          # 2
        "it's done",            # it / 's / done = 3
        "a1b2",                 # a / 1 / b / 2 = 4
        "hi, there!",           # hi / , / there / ! = 4
        "",                     # 0
        "   ",                  # 0
        "中文 text",             # 中文 / text = 2
        None,                   # null -> 0
    ])
    assert bpe_token_count(texts).to_pylist() == [2, 3, 4, 4, 0, 0, 2, 0]


def test_redact_regex_pii():
    import pyarrow as pa

    from prom_tsdb_copyer_ray.functions.text import PII_PATTERNS, redact_regex

    texts = pa.array([
        "contact bob.smith+x@example.co.uk or 192.168.001.42 now",
        "call +1 (555) 867-5309 twice",
        "no pii here",
        "",
        "two mails: a@b.io c@d.org",
    ])
    red, n = redact_regex(texts, PII_PATTERNS)
    red = red.to_pylist()
    assert red[0] == "contact <EMAIL> or <IP> now"
    assert "<NUM>" in red[1] and "555" not in red[1]
    assert red[2] == "no pii here"
    assert red[3] == ""
    assert red[4] == "two mails: <EMAIL> <EMAIL>"
    assert n.to_pylist() == [2, 1, 0, 0, 2]


def test_redact_regex_counts_on_original():
    import pyarrow as pa

    from prom_tsdb_copyer_ray.functions.text import redact_regex

    # overlapping patterns each count against the ORIGINAL text
    red, n = redact_regex(
        pa.array(["ip 10.0.0.1"]),
        [(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"), (r"[0-9]+", "<NUM>")],
    )
    assert red.to_pylist() == ["ip <IP>"]
    assert n.to_pylist() == [1 + 4]


def test_langid_predict_batch_matches_predict_one():
    import pyarrow as pa

    from prom_tsdb_copyer_ray.functions.text import LangIdModel

    m = LangIdModel()
    texts = [
        "",
        None,
        "the of and to a in is that it for",
        "der die das und ist nicht ein eine",
        "el la los de que y en un una es",
        "le la les de des et un une est dans",
        "一" * 50,
        "mixed 一二三四五 the of and " + "一" * 200,
        "zzz qqq xxx",           # words but no stopword hits
        "1234 5678 !!!",         # no words at all
        "LA DE QUE Y EN",        # uppercase handling
        "qué señor l'homme café de",  # accented adjacency
        "de" * 3,                 # 'dedede' is one token, not a stopword
        "the " * 3000,            # truncation at 4000 codepoints
        "x" * 4100 + " the of and to a in is that",  # stopwords past 4000
    ]
    texts_py = [t if t is not None else "" for t in texts]
    want = [m.predict_one(t) for t in texts_py]
    got = m.predict_batch(pa.array(texts, pa.string())).to_pylist()
    assert got == want


def test_unigram_logprob_vs_reference(ray_session):
    """Corpus-unigram NLL per doc: whitespace tokens, empty docs vanish,
    multi-block invariance; vs a sequential dict reference."""
    import math

    import pyarrow as pa
    import ray.data

    from prom_tsdb_copyer_ray.stages.textstats import unigram_logprob

    texts = ["the cat sat", "the the the", "  ", "", "cat dog",
             "unique tokens here now", "the cat"] * 3
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = (
        unigram_logprob(ray.data.from_arrow(t).repartition(5))
        .to_pandas().set_index("doc_id")["nll"]
    )
    counts: dict[str, int] = {}
    toks_by_doc = {}
    for i, x in zip(ids, texts):
        toks = x.strip(" \t\r\n").split() if x.strip(" \t\r\n") else []
        toks_by_doc[i] = toks
        for tok in toks:
            counts[tok] = counts.get(tok, 0) + 1
    total = sum(counts.values())
    for i in ids:
        toks = toks_by_doc[i]
        if not toks:
            assert i not in out.index
            continue
        want = -sum(math.log(counts[tok] / total) for tok in toks) / len(toks)
        assert abs(out[i] - want) < 5.01e-7, i  # operator rounds to 6 dp


def test_lev_batch_hypothesis():
    """Pair-axis-vectorized DP equals the classic sequential DP on random
    unicode byte strings (no Ray needed)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from prom_tsdb_copyer_ray.stages.dedup import _lev_batch

    def ref(a: bytes, b: bytes) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(st.text(max_size=12), st.text(max_size=12)),
                    min_size=1, max_size=8))
    def check(pairs):
        a = [x.encode("utf-8") for x, _ in pairs]
        b = [y.encode("utf-8") for _, y in pairs]
        got = _lev_batch(a, b)
        for i, (x, y) in enumerate(zip(a, b)):
            assert got[i] == ref(x, y)

    check()


def test_bpe_train_hand_corpus(ray_session):
    """First merges on a constructed corpus follow pair frequency with
    lexicographic ties, and later rounds count over MERGED symbols."""
    import ray.data

    from prom_tsdb_copyer_ray.stages.textstats import bpe_train

    # "abab" x3, "abc" x2 -> pairs: (a,b)=8?? compute: abab has (a,b),(b,a),(a,b)
    # word freqs: abab:3 -> (a,b)x2,(b,a)x1 each; abc:2 -> (a,b),(b,c)
    # (a,b) = 3*2 + 2 = 8; (b,a) = 3; (b,c) = 2 -> merge1 = (a,b)
    # after merge: abab -> (ab, ab); abc -> (ab, c)
    # round2: (ab,ab)=3, (ab,c)=2 -> merge2 = (ab, ab)
    t = pa.table({"text": ["abab abab", "abab abc", "abc"]})
    out = bpe_train(ray.data.from_arrow(t).repartition(2), k=3)
    assert out[0] == ("a", "b", 8)
    assert out[1] == ("ab", "ab", 3)
    assert out[2] == ("ab", "c", 2)


def test_bpe_train_paths_agree(ray_session):
    """The driver-side fast path and the distributed per-round loop
    learn identical merges (small_vocab_rows=0 forces the loop)."""
    import ray.data

    from prom_tsdb_copyer_ray.stages.textstats import bpe_train

    t = pa.table({"text": [
        "the quick brown fox", "the quick red fox fox",
        "lazy dogs and quick dogs", "the the the",
    ]})
    ds = ray.data.from_arrow(t).repartition(3)
    fast = bpe_train(ds, k=5)
    slow = bpe_train(ds, k=5, small_vocab_rows=0)
    assert fast == slow and len(fast) == 5


def test_morton2d_interleave_and_locality():
    """morton2d equals a per-bit interleave reference, and sorting by it
    clusters BOTH dimensions (per-block bounding boxes shrink vs the
    one-column sort — the zone-map pruning property Z-ORDER exists for)."""
    import numpy as np

    from prom_tsdb_copyer_ray.functions.hashing import morton2d

    def ref(x, y):
        m = 0
        for i in range(31):
            m |= ((x >> i) & 1) << (2 * i)
            m |= ((y >> i) & 1) << (2 * i + 1)
        return m

    rng = np.random.default_rng(11)
    xs = rng.integers(0, 2**31, 300).astype(np.int64)
    ys = rng.integers(0, 2**31, 300).astype(np.int64)
    got = morton2d(xs, ys)
    assert all(int(g) == ref(int(a), int(b)) for g, a, b in zip(got, xs, ys))

    # locality: zone maps prune on BOTH dimensions.  A 1-column sort gives
    # blocks the full range of the OTHER column (y-predicates prune
    # nothing); Z-order bounds both spans.
    n = 4096
    gx = rng.integers(0, 1 << 16, n).astype(np.int64)
    gy = rng.integers(0, 1 << 16, n).astype(np.int64)

    def mean_spans(order):
        a = gx[order].reshape(16, -1)
        b = gy[order].reshape(16, -1)
        return (float(np.mean(a.max(1) - a.min(1))),
                float(np.mean(b.max(1) - b.min(1))))

    zx, zy = mean_spans(np.argsort(morton2d(gx, gy), kind="stable"))
    xx, xy = mean_spans(np.argsort(gx, kind="stable"))
    full = float(1 << 16)
    assert xy > 0.95 * full          # 1-col sort: no pruning on y
    assert zy < 0.5 * full           # z-order: y span bounded...
    assert zx < 0.5 * full           # ...and x span still bounded too
