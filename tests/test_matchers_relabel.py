"""Matcher parse/filter + relabel tests (operators O4, O5, O7; FIXTURES F2)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from prom_tsdb_copyer_ray.functions.matchers import (
    EQ,
    NEQ,
    NRE,
    RE,
    Matcher,
    default_matchers,
    filter_table,
    parse_matcher,
)
from prom_tsdb_copyer_ray.functions.relabel import relabel_table, series_key


# --- parse (main.go:82-111) ------------------------------------------------

@pytest.mark.parametrize(
    "s,op,name,value",
    [
        ("a=b", EQ, "a", "b"),
        ("a!=b", NEQ, "a", "b"),
        ("a=~b.*", RE, "a", "b.*"),
        ("a!~b.*", NRE, "a", "b.*"),
        ("a=b=c", EQ, "a", "b=c"),          # value contains separator (main.go:109)
        ("a=~x=~y", RE, "a", "x=~y"),
        ("up", EQ, "__name__", "up"),        # bare string -> __name__ match (main.go:97)
        ("a=", EQ, "a", ""),
    ],
)
def test_parse(s, op, name, value):
    assert parse_matcher(s) == Matcher(op, name, value)


def test_default_all_series():
    assert default_matchers() == [Matcher(NEQ, "__name__", "")]


# --- filter (copyer.go:91 semantics) --------------------------------------

@pytest.fixture
def table():
    return pa.table(
        {
            "__name__": ["crawl_rate", "crawl_rate", "page_size_bytes", "page_size_bytes"],
            "domain": ["a.com", "b.org", "a.com", "c.net"],
            "lang": ["en", "zh", "en", None],
        }
    )


def test_filter_eq(table):
    out = filter_table(table, [Matcher(EQ, "domain", "a.com")])
    assert out["__name__"].to_pylist() == ["crawl_rate", "page_size_bytes"]


def test_filter_and_of_matchers(table):
    out = filter_table(
        table, [Matcher(EQ, "domain", "a.com"), Matcher(EQ, "__name__", "crawl_rate")]
    )
    assert out.num_rows == 1


def test_filter_regex_anchored(table):
    # Prometheus regexes are fully anchored: "a" must NOT match "a.com"
    assert filter_table(table, [Matcher(RE, "domain", "a")]).num_rows == 0
    assert filter_table(table, [Matcher(RE, "domain", "a.*")]).num_rows == 2
    assert filter_table(table, [Matcher(NRE, "domain", "a.*")]).num_rows == 2


def test_filter_missing_label_is_empty_string(table):
    # null lang behaves as ""; matcher lang="" selects it
    assert filter_table(table, [Matcher(EQ, "lang", "")]).num_rows == 1
    # a label column that doesn't exist at all behaves as "" too
    assert filter_table(table, [Matcher(EQ, "nope", "")]).num_rows == 4
    assert filter_table(table, [Matcher(NEQ, "nope", "")]).num_rows == 0


def test_filter_default_matches_all(table):
    assert filter_table(table, default_matchers()).num_rows == 4


# --- relabel (copyer.go:99-105) -------------------------------------------

def test_relabel_blind_upsert(table):
    out = relabel_table(table, {"lang": "forced", "env": "prod"})
    assert out["lang"].to_pylist() == ["forced"] * 4  # overwrites without checking
    assert out["env"].to_pylist() == ["prod"] * 4     # appends new label


def test_relabel_identity_merge(table):
    # relabel to constants merges previously distinct series keys
    keys_before = series_key(table, ["__name__", "domain", "lang"]).to_pylist()
    assert len(set(keys_before)) == 4
    out = relabel_table(table, {"domain": "all", "lang": "any"})
    keys_after = series_key(out, ["__name__", "domain", "lang"]).to_pylist()
    assert len(set(keys_after)) == 2  # only __name__ still distinguishes


def test_series_key_sorted_and_stable():
    t = pa.table({"b": ["2"], "a": ["1"], "__name__": ["m"]})
    assert series_key(t, ["b", "a", "__name__"]).to_pylist() == ["__name__=m,a=1,b=2"]


class TestLabelOps:
    """PromQL label_replace / label_join semantics (functions/relabel.py)."""

    def test_label_replace_match_and_miss(self):
        import pyarrow as pa
        from prom_tsdb_copyer_ray.functions.relabel import label_replace

        t = pa.table({
            "src": ["src7.example.com", "nope", "src12.example.com"],
            "dst": ["old_a", "old_b", "old_c"],
        })
        out = label_replace(t, "dst", r"\1", "src",
                            r"(src\d+)\.example\.com")
        # match -> backref expansion; miss -> EXISTING dst kept (PromQL)
        assert out["dst"].to_pylist() == ["src7", "old_b", "src12"]

    def test_label_replace_absent_columns(self):
        import pyarrow as pa
        from prom_tsdb_copyer_ray.functions.relabel import label_replace

        t = pa.table({"a": ["x", "y"]})
        # absent src reads as "", absent dst defaults to "" on miss
        out = label_replace(t, "new", "hit", "missing", r"x.*")
        assert out["new"].to_pylist() == ["", ""]
        out2 = label_replace(t, "new", "empty_src", "missing", r".*")
        assert out2["new"].to_pylist() == ["empty_src", "empty_src"]

    def test_label_replace_anchoring(self):
        import pyarrow as pa
        from prom_tsdb_copyer_ray.functions.relabel import label_replace

        t = pa.table({"src": ["abc"], "dst": ["keep"]})
        # PromQL regexes are fully anchored: a partial match is a miss
        out = label_replace(t, "dst", "hit", "src", r"b")
        assert out["dst"].to_pylist() == ["keep"]

    def test_label_join(self):
        import pyarrow as pa
        from prom_tsdb_copyer_ray.functions.relabel import label_join

        t = pa.table({"a": ["1", "2"], "b": ["x", "y"]})
        out = label_join(t, "j", "-", ["a", "b", "ghost"])
        assert out["j"].to_pylist() == ["1-x-", "2-y-"]
        # dst overwrite in place
        out2 = label_join(out, "a", ":", ["b", "b"])
        assert out2["a"].to_pylist() == ["x:x", "y:y"]
