"""Tokenizer contract tests (mirror the reference's indices.analyze/ YAML
suites: exact token sequences, incl. the 255-char max_token_length boundary
of StandardAnalyzerProvider.java:54)."""

from opensearch_spark.analysis import tokenize
from opensearch_spark.analysis.analyzer import (
    tokenize_standard,
    tokenize_standard_code,
    tokenize_standard_code_ngram,
)


def test_standard_basic():
    assert tokenize_standard("The QUICK brown-fox 42!") == [
        "the",
        "quick",
        "brown",
        "fox",
        "42",
    ]


def test_standard_keeps_snake_case_like_uax29():
    assert tokenize_standard("foo_bar baz") == ["foo_bar", "baz"]


def test_standard_empty_and_none():
    assert tokenize_standard("") == []
    assert tokenize_standard("   \n\t ") == []


def test_standard_unicode():
    assert tokenize_standard("Größe café 北京") == ["größe", "café", "北京"]


def test_max_token_length_splits_at_255():
    tok = "a" * 600
    out = tokenize_standard(tok)
    assert [len(t) for t in out] == [255, 255, 90]


def test_code_camel_snake_digits():
    assert tokenize_standard_code("parseHTTPResponse_v2") == [
        "parse",
        "http",
        "response",
        "v",
        "2",
    ]
    assert tokenize_standard_code("utf8Decoder") == ["utf", "8", "decoder"]


def test_code_paths_and_dots():
    assert tokenize_standard_code("org.apache.spark.sql") == [
        "org",
        "apache",
        "spark",
        "sql",
    ]


def test_ngram_shingles():
    assert tokenize_standard_code_ngram("a b c", n=2) == [
        "a",
        "b",
        "c",
        "a b",
        "b c",
    ]


def test_registry_dispatch():
    assert tokenize("FooBar", "standard_code") == ["foo", "bar"]
    assert tokenize("FooBar", "standard") == ["foobar"]


def test_analyze_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from opensearch_spark.analysis import analyze_udf

    rows = [("import os\ndef fooBar(x): return x_y",), ("",), (None,)]
    df = spark.createDataFrame(rows, ["content"])
    got = [
        r[0]
        for r in df.select(analyze_udf("standard_code")(F.col("content"))).collect()
    ]
    assert got[0] == tokenize_standard_code(rows[0][0])
    assert got[1] == [] and got[2] == []


# ---------------------------------------------------------------------------
# token-filter chain (stop / stem / fold / synonym / edge_ngram)
# ---------------------------------------------------------------------------

def test_minimal_english_stem():
    from opensearch_spark.analysis.analyzer import stem_minimal_english as st

    # Lucene EnglishMinimalStemFilter semantics (Harman s-stemmer)
    assert st("tables") == "table"
    assert st("queries") == "query"     # -ies -> -y
    assert st("ponies") == "pony"
    assert st("glass") == "glass"       # -ss unchanged
    assert st("bus") == "bus"           # -us unchanged
    assert st("goes") == "goes"         # -oes unchanged
    assert st("dies") == "dy"           # -ies -> -y (4th-from-end not a/e)
    assert st("is") == "is"             # len < 3
    assert st("table") == "table"       # no trailing s


def test_stop_and_stem_chain():
    from opensearch_spark.analysis import tokenize

    assert tokenize("the tables and queries", "english_light") == [
        "table", "query"]


def test_fold_chain():
    from opensearch_spark.analysis import tokenize

    assert tokenize("Café Über naïve", "fold") == ["cafe", "uber", "naive"]


def test_synonym_chain():
    from opensearch_spark.analysis import tokenize

    assert tokenize("tbl rapid spark", "synonym_demo") == [
        "table", "fast", "spark"]


def test_edge_ngram_chain():
    from opensearch_spark.analysis import tokenize

    assert tokenize("go spark", "edge_ngram_1_8") == [
        "g", "go", "s", "sp", "spa", "spar", "spark"]
    # max_gram caps long tokens at 8 prefixes
    assert tokenize("refactoring", "edge_ngram_1_8") == [
        "r", "re", "ref", "refa", "refac", "refact", "refacto", "refactor"]


def test_match_analyzer_override_is_plumbed():
    from opensearch_spark.search import Match

    q = Match(field="text", text="tbl", analyzer="synonym_demo")
    assert q.analyzer == "synonym_demo"


def test_char_trigram_chain():
    from opensearch_spark.analysis import tokenize

    assert tokenize("merge go", "char_trigram") == ["mer", "erg", "rge", "go"]


def test_shingle_subfield_analyzers():
    """search_as_you_type subfields: shingles only (output_unigrams
    false), SearchAsYouTypeFieldMapper.java."""
    from opensearch_spark.analysis.analyzer import ANALYZERS

    assert ANALYZERS["shingle_2"]("a b c") == ["a b", "b c"]
    assert ANALYZERS["shingle_3"]("a b c d") == ["a b c", "b c d"]
    assert ANALYZERS["shingle_3"]("a b") == []  # too short -> no tokens
    assert ANALYZERS["shingle_2"]("one") == []


def test_cjk_bigram_filter():
    """Lucene CJKBigramFilter semantics: ideograph runs emit overlapping
    bigrams, a lone ideogram stays a unigram, non-CJK passes through."""
    from opensearch_spark.analysis import tokenize

    assert tokenize("今天天气", "cjk_bigram") == [
        "今天", "天天", "天气"]
    assert tokenize("merge 今 table", "cjk_bigram") == [
        "merge", "今", "table"]
    # mixed script inside one word token: runs split, each handled
    assert tokenize("abc今天", "cjk_bigram") == [
        "abc", "今天"]
    # katakana counts as CJK for bigramming (Lucene han+kana flags)
    assert tokenize("カタ", "cjk_bigram") == ["カタ"]
    assert tokenize("", "cjk_bigram") == []


def test_synonym_graph_greedy_longest_match():
    """SynonymGraphFilterFactory contracting rules: greedy longest match
    first, non-overlapping, left-to-right."""
    from opensearch_spark.analysis.analyzer import make_filter_chain

    chain = make_filter_chain(
        "standard",
        synonyms_multi={("key", "order"): "sort",
                        ("key", "order", "by"): "orderby"})
    # longest rule wins at the same start
    assert chain("key order by x") == ["orderby", "x"]
    assert chain("key order x") == ["sort", "x"]
    # consumed tokens can't seed a second match
    assert chain("key key order") == ["key", "sort"]
    # no match -> passthrough
    assert chain("order key") == ["order", "key"]


def test_keyword_marker_and_stemmer_override():
    """KeywordMarkerFilterFactory protects terms from the stemmer;
    StemmerOverrideTokenFilterFactory maps then protects its outputs."""
    from opensearch_spark.analysis.analyzer import make_filter_chain

    chain = make_filter_chain(
        "standard", stem=True,
        keyword_marker=frozenset({"pandas"}),
        stemmer_override={"indices": "index"})
    assert chain("tables keys pandas indices") == [
        "table", "key", "pandas", "index"]
    # override output 'index' is protected even though it ends the chain
    chain2 = make_filter_chain(
        "standard", stem=True, stemmer_override={"gas": "gas"})
    assert chain2("gas") == ["gas"]


def test_stemmer_override_protects_only_rewritten_instances():
    """StemmerOverrideFilter sets KeywordAttribute on tokens it REWROTE;
    a natural token equal to an override VALUE still stems normally."""
    from opensearch_spark.analysis.analyzer import make_filter_chain

    chain = make_filter_chain("standard", stem=True,
                              stemmer_override={"ran": "runs"})
    assert chain("runs ran") == ["run", "runs"]


def test_synonyms_multi_single_token_rule_applies():
    from opensearch_spark.analysis.analyzer import make_filter_chain

    chain = make_filter_chain(
        "standard", synonyms_multi={("ml",): "machine_learning",
                                    ("ml", "ops"): "mlops"})
    assert chain("ml pipeline") == ["machine_learning", "pipeline"]
    assert chain("ml ops team") == ["mlops", "team"]  # longest still wins


def test_join_udf_roundtrips_shingle_tokens(spark):
    """Shingle tokens contain spaces — the join/split round-trip must use
    a separator no tokenizer can emit, or shingles degrade to unigrams."""
    from opensearch_spark.analysis import analyze_join_udf, tokens_col
    from opensearch_spark.analysis.analyzer import ANALYZERS

    df = spark.createDataFrame([("spark merge join",)], "content string")
    joined = df.select(
        analyze_join_udf("shingle_2")("content").alias("toks"))
    got = joined.select(tokens_col("toks").alias("arr")).first()["arr"]
    assert got == ANALYZERS["shingle_2"]("spark merge join")
    assert got == ["spark merge", "merge join"]
