"""common terms query (CommonTermsQueryBuilder.java): the df-split
rewrite must agree with the equivalent hand-built bool/match plans on
every branch — mixed split, all-high, all-low (AND), absent-only, empty."""

import pytest

from opensearch_spark.search import Bool, CommonTerms, Match


@pytest.fixture(scope="module")
def searcher(spark, sf_dir):
    from opensearch_spark.entry_queries import get_searcher

    return get_searcher(spark, sf_dir)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_mixed_split_equals_bool_rewrite(searcher):
    """'dup' is rare (LOW at cutoff 0.5), 'merge'/'batch' are ~80%-df
    (HIGH): the query must equal bool(must=match(low), should=match(high))."""
    got = searcher.score(CommonTerms(
        field="text", text="dup merge batch", cutoff_frequency=0.5))
    want = searcher.score(Bool(
        must=[Match(field="text", text="dup")],
        should=[Match(field="text", text="merge batch")]))
    assert _rows(got) == _rows(want)
    # and it differs from a plain OR match (which would not require 'dup')
    plain = searcher.score(Match(field="text", text="dup merge batch"))
    assert len(_rows(plain)) > len(_rows(got))


def test_all_high_falls_back_to_or_match(searcher):
    """Tiny fractional cutoff → every term HIGH → plain OR match with
    high_freq_minimum_should_match."""
    got = searcher.score(CommonTerms(
        field="text", text="merge batch", cutoff_frequency=0.0001))
    want = searcher.score(Match(field="text", text="merge batch"))
    assert _rows(got) == _rows(want)


def test_all_low_with_and_operator(searcher):
    """Cutoff near 1.0 (fraction) → every term LOW; low_freq_operator=and
    → conjunction."""
    got = searcher.score(CommonTerms(
        field="text", text="merge batch", cutoff_frequency=0.9999,
        low_freq_operator="and"))
    want = searcher.score(Match(field="text", text="merge batch",
                                operator="and"))
    assert _rows(got) == _rows(want)


def test_absolute_cutoff(searcher):
    """cutoff >= 1 is an absolute df bound (Lucene maxDocFreq): with
    cutoff 1e9 everything is LOW."""
    got = searcher.score(CommonTerms(
        field="text", text="merge batch", cutoff_frequency=1e9,
        low_freq_operator="and"))
    want = searcher.score(Match(field="text", text="merge batch",
                                operator="and"))
    assert _rows(got) == _rows(want)


def test_absent_terms_classify_low_and_match_nothing(searcher):
    out = searcher.score(CommonTerms(
        field="text", text="zzzmissingterm", cutoff_frequency=0.5))
    assert out.count() == 0


def test_absent_low_term_does_not_block_or(searcher):
    """An absent term joins the LOW group at df 0; with the default OR
    (msm 1) the present low term still satisfies the requirement."""
    got = searcher.score(CommonTerms(
        field="text", text="dup zzzmissingterm merge", cutoff_frequency=0.5))
    want = searcher.score(Bool(
        must=[Match(field="text", text="dup zzzmissingterm")],
        should=[Match(field="text", text="merge")]))
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 0


def test_mixed_branch_honors_high_freq_params(searcher):
    """high_freq_operator/msm must not be silently dropped in the mixed
    low/high branch: with high_freq_operator='and', a doc matching only
    one high term gets NO high-side contribution."""
    got = searcher.score(CommonTerms(
        field="text", text="dup merge batch", cutoff_frequency=0.5,
        high_freq_operator="and"))
    want = searcher.score(Bool(
        must=[Match(field="text", text="dup")],
        should=[Match(field="text", text="merge batch", operator="and")]))
    assert _rows(got) == _rows(want)
    default = searcher.score(CommonTerms(
        field="text", text="dup merge batch", cutoff_frequency=0.5))
    assert _rows(got) != _rows(default)  # the parameter is live


def test_from_dsl_common_terms():
    from opensearch_spark.search.queries import from_dsl

    q = from_dsl({"common_terms": {"text": {
        "query": "dup merge", "cutoff_frequency": 0.5,
        "low_freq_operator": "AND",
        "minimum_should_match": {"low_freq": 2, "high_freq": 1}}}})
    assert isinstance(q, CommonTerms)
    assert q.cutoff_frequency == 0.5
    assert q.low_freq_operator == "and"
    assert q.low_freq_minimum_should_match == 2
    assert q.high_freq_minimum_should_match == 1
    short = from_dsl({"common_terms": {"text": "dup merge"}})
    assert isinstance(short, CommonTerms) and short.cutoff_frequency == 0.01


def test_oracle_sql_absolute_cutoff_matches_engine(searcher, spark, sf_dir):
    """The gate helper's oracle must mirror the engine's absolute-df
    branch (cutoff >= 1), not apply fraction semantics unconditionally."""
    import duckdb

    from opensearch_spark.entry_queries import _common_terms_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    # absolute cutoff 30: 'dup' (df ~25 at sf0.01) is LOW, 'merge' HIGH
    want = sorted(tuple(r) for r in con.sql(
        _common_terms_sql(["dup", "merge"], 30.0)).fetchall())
    got = sorted(tuple(r) for r in searcher.search(
        CommonTerms(field="text", text="dup merge", cutoff_frequency=30.0),
        k=10, mode="exhaustive", round_scores=4).collect())
    assert got == want


def test_empty_text_is_empty(searcher):
    assert searcher.score(CommonTerms(
        field="text", text="   ", cutoff_frequency=0.5)).count() == 0
