"""Simplified-soundex parity: the one generated SQL spelling must agree
with itself across engines (Spark expr vs DuckDB) and with the
driver-side Python twin — on fixtures, on hypothesis-generated tokens,
and on the real sf0.001 vocabulary."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from opensearch_spark.analysis.phonetic import soundex_py, soundex_sql

FIXTURES = [
    ("merge", "M620"), ("merj", "M620"),          # sound-alike pair
    ("table", "T140"), ("tabel", "T140"),
    ("spark", "S162"),
    ("a", "A000"),                                 # vowel-only
    ("aubrey", "A160"),                            # vowel first letter
    ("pfister", "P236"),                           # same-code first pair
    ("tymczak", "T522"),
    ("x9_y", "X000"),                              # non-letters stripped
    ("x" * 65, "X000"),                            # run > 64: collapse depth
    ("b" * 255, "B000"),                           # analyzer MAX_TOKEN_LENGTH
]


@pytest.mark.parametrize("token", ["x" * 65, "b" * 255, "ab" * 120])
def test_long_run_sql_spelling_matches_python(token):
    # a same-code run longer than 2^passes would leave uncollapsed digits
    # in the SQL spelling only — guard the collapse depth against the
    # analyzer's 255-char token bound
    assert _duck_soundex([token]) == [soundex_py(token)]


@pytest.mark.parametrize("token,code", FIXTURES)
def test_soundex_py_fixtures(token, code):
    assert soundex_py(token) == code


def _duck_soundex(tokens):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {soundex_sql('t', 'duckdb')} FROM (SELECT unnest(?) AS t)",
        [list(tokens)]).fetchall()
    return [r[0] for r in rows]


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1,
               max_size=24))
def test_python_twin_matches_duckdb_spelling(token):
    assert _duck_soundex([token]) == [soundex_py(token)]


def test_spark_expr_matches_python_on_real_vocab(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = (docs.select(F.explode(F.split("text", r"\s+")).alias("term"))
             .where(F.col("term") != "").distinct())
    got = {r["term"]: r["code"] for r in terms.select(
        "term", F.expr(soundex_sql("term", "spark")).alias("code")).collect()}
    assert len(got) > 20  # sf0.001's synthetic vocabulary is ~30 terms
    for term, code in got.items():
        assert code == soundex_py(term), term
    assert _duck_soundex(sorted(got)) == [soundex_py(t) for t in sorted(got)]


def test_phonetic_query_expansion(spark):
    from opensearch_spark.entry_queries import get_searcher
    from opensearch_spark.search import Phonetic

    s = get_searcher(spark, "/root/testdata/sf0.001")
    exp = s.expand_terms(Phonetic(field="text", value="merj"))
    assert "merge" in exp
    assert all(soundex_py(t) == soundex_py("merj") for t in exp)
