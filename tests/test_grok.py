"""grok/dissect compiler unit tests (pure driver-side, no Spark).

Reference semantics: libs/grok Grok.java (bank expansion, typed captures),
libs/dissect DissectParser.java + DissectKey.java (append / append-with-
order / skip / right padding)."""
import re

import pytest
from pyspark.sql import functions as F

from opensearch_spark.ingest.grok import (
    GrokError, compile_dissect, compile_grok,
)


def _match(rx, s):
    m = re.match(f"^(?:{rx})$", s)
    return m.groups() if m else None


def test_grok_typed_captures():
    rx, caps = compile_grok("%{INT:a:int} %{NUMBER:b:float} %{WORD:c}")
    assert caps == [("a", "long"), ("b", "double"), ("c", "string")]
    assert _match(rx, "-3 2.5 xy") == ("-3", "2.5", "xy")


def test_grok_unnamed_does_not_capture():
    rx, caps = compile_grok("%{INT} %{WORD:w}")
    assert caps == [("w", "string")]
    assert _match(rx, "7 ok") == ("ok",)


def test_grok_bank_indirection():
    # NUMBER → %{BASE10NUM}, IP → %{IPV4}: nested references expand
    rx, caps = compile_grok("%{NUMBER:n} %{IP:ip}")
    assert _match(rx, "1.5 10.0.0.255") == ("1.5", "10.0.0.255")
    assert _match(rx, "1.5 10.0.0.999") is None


def test_grok_unknown_pattern_raises():
    with pytest.raises(GrokError):
        compile_grok("%{NOPE:x}")


def test_grok_cycle_raises():
    with pytest.raises(GrokError):
        compile_grok("%{A:x}", bank={"A": "%{B}", "B": "%{A}"})


def test_grok_literal_regex_passthrough():
    rx, _ = compile_grok(r"uid=\[%{INT:u}\]")
    assert _match(rx, "uid=[42]") == ("42",)


def test_dissect_basic_and_skip():
    rx, slots, fields = compile_dissect("%{a} %{?x} %{b}")
    assert fields == ["a", "b"]
    assert _match(rx, "p skipme q") == ("p", "skipme", "q")


def test_dissect_append_pattern_order():
    # bare %{+k} appends in pattern order (DissectKey APPEND)
    _, slots, fields = compile_dissect("%{+k}-%{+k}")
    assert slots == [("k", 0), ("k", 1)]
    assert fields == ["k"]


def test_dissect_append_with_order():
    # %{+k/n} reorders by n, not pattern position (APPEND_WITH_ORDER)
    _, slots, _ = compile_dissect("%{+k/2}-%{+k/1}")
    assert slots == [("k", 2), ("k", 1)]


def test_dissect_right_padding():
    rx, _, _ = compile_dissect("%{a->} %{b}")
    assert _match(rx, "x      y") == ("x", "y")
    assert _match(rx, "x y") == ("x", "y")


def test_dissect_trailing_greedy():
    rx, _, _ = compile_dissect("%{a}|%{rest}")
    assert _match(rx, "k|v with | pipes") == ("k", "v with | pipes")


def test_dissect_no_keys_raises():
    with pytest.raises(GrokError):
        compile_dissect("just literal text")


def test_raw_group_neutralized():
    # a user capturing group must not shift named-capture numbering
    rx, caps = compile_grok("(foo|bar) %{WORD:w}")
    assert caps == [("w", "string")]
    assert _match(rx, "foo hello") == ("hello",)


def test_raw_group_in_char_class_untouched():
    rx, _ = compile_grok(r"[(]%{INT:n}[)]")
    assert _match(rx, "(7)") == ("7",)


def test_escaped_paren_untouched():
    rx, _ = compile_grok(r"\(%{INT:n}\)")
    assert _match(rx, "(9)") == ("9",)


def test_malformed_reference_raises():
    with pytest.raises(GrokError):
        compile_grok("%{INT:uid:integer}")  # unknown type token
    with pytest.raises(GrokError):
        compile_grok("%{WORD:first-name}")  # illegal name char


def test_dissect_duplicate_plain_key_raises():
    with pytest.raises(GrokError):
        compile_dissect("%{a}|%{a}")
    # plain-then-append on the same name is the legal append form
    rx, slots, fields = compile_dissect("%{a} %{+a}")
    assert fields == ["a"]


def test_grok_columns_empty_capture_vs_no_match(spark):
    from opensearch_spark.ingest.grok import grok_columns

    df = spark.createDataFrame(
        [("xabc",), ("zzz",)], ["line"])
    cols = grok_columns("line", "%{DATA:prefix}x%{GREEDYDATA:rest}")
    out = {r["line"]: (r["prefix"], r["rest"])
           for r in df.withColumns(cols).collect()}
    assert out["xabc"] == ("", "abc")     # matching row, empty capture kept
    assert out["zzz"] == (None, None)     # no match → NULLs


class TestRound4ReviewFixes:
    def test_dissect_handles_newlines_in_values(self, spark):
        from opensearch_spark.ingest.grok import dissect_columns

        df = spark.createDataFrame(
            [(1, "app|error\ncaused by: x"), (2, "app|clean")],
            "id long, line string")
        cols = dissect_columns(F.col("line"), "%{svc}|%{msg}")
        rows = {r["id"]: (r["svc"], r["msg"]) for r in
                df.select("id", *[c.alias(n)
                                  for n, c in cols.items()]).collect()}
        assert rows[1] == ("app", "error\ncaused by: x")
        assert rows[2] == ("app", "clean")

    def test_grok_matches_rejects_trailing_newline(self, spark):
        from opensearch_spark.ingest.grok import grok_matches

        df = spark.createDataFrame([(1, "GET"), (2, "GET\n")],
                                   "id long, v string")
        out = {r["id"]: r["ok"] for r in df.select(
            "id", grok_matches(F.col("v"),
                               "%{HTTPMETHOD:m}").alias("ok")).collect()}
        assert out == {1: True, 2: False}

    def test_grok_rejects_backrefs_and_duplicate_names(self):
        from opensearch_spark.ingest.grok import GrokError, compile_grok

        with pytest.raises(GrokError, match="backreference"):
            compile_grok(r"%{WORD:w} (.)\1")
        with pytest.raises(GrokError, match="duplicate grok capture"):
            compile_grok("%{INT:x} %{WORD:x}")

    def test_dissect_trailing_pad_strips_and_bad_orders_raise(self, spark):
        from opensearch_spark.ingest.grok import (GrokError, compile_dissect,
                                                  dissect_columns)

        df = spark.createDataFrame([(1, "x y   ")], "id long, line string")
        cols = dissect_columns(F.col("line"), "%{a} %{b->}")
        row = df.select(*[c.alias(n) for n, c in cols.items()]).first()
        assert (row["a"], row["b"]) == ("x", "y")  # padding stripped
        for bad in ("%{+a/x}|%{b}", "%{+a/}|%{b}", "%{+a/-1}|%{b}"):
            with pytest.raises(GrokError):
                compile_dissect(bad)

    def test_analyzers_tolerate_none(self):
        from opensearch_spark.analysis.analyzer import tokenize

        for an in ("standard", "french", "icu", "cjk_bigram", "cjk_dict"):
            assert tokenize(None, an) == []
