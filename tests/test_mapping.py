"""Dynamic mapping inference (DocumentParser.java parity): detection
order, numeric widening, conflict degradation, malformed-input safety."""

import pytest
from pyspark.sql import functions as F

from opensearch_spark.index import mapping as M


def _infer(spark, docs):
    df = spark.createDataFrame([(d,) for d in docs], "doc STRING")
    return {r["key"]: r.asDict() for r in M.infer_mapping(df).collect()}


def test_detection_order_and_resolution(spark):
    out = _infer(spark, [
        '{"a": 1, "b": 1.5, "c": true, "d": "2024-03-04", '
        '"e": {"x": 1}, "f": [1], "g": "hello"}',
    ])
    assert out["a"]["resolved_type"] == "long"
    assert out["b"]["resolved_type"] == "double"
    assert out["c"]["resolved_type"] == "boolean"
    assert out["d"]["resolved_type"] == "date"
    assert out["e"]["resolved_type"] == "object"
    assert out["f"]["resolved_type"] == "array"
    assert out["g"]["resolved_type"] == "text"


def test_numeric_widening_long_double(spark):
    """long + double values for the same key widen to double — the
    reference's numeric coercion, not a conflict."""
    out = _infer(spark, ['{"n": 1}', '{"n": 2.5}', '{"n": 3}'])
    assert out["n"]["resolved_type"] == "double"
    assert out["n"]["n_long"] == 2 and out["n"]["n_double"] == 1


def test_incompatible_mix_degrades_to_text(spark):
    out = _infer(spark, ['{"n": 1}', '{"n": true}'])
    assert out["n"]["resolved_type"] == "text"
    out2 = _infer(spark, ['{"d": "2024-01-01"}', '{"d": 5}'])
    assert out2["d"]["resolved_type"] == "text"


def test_malformed_and_null_json_skipped(spark):
    df = spark.createDataFrame(
        [('{"a": 1}',), ("not json",), (None,)], "doc STRING")
    rows = {r["key"]: r for r in M.infer_mapping(df).collect()}
    assert set(rows) == {"a"}
    assert rows["a"]["n_vals"] == 1


def test_negative_and_scientific_numbers(spark):
    out = _infer(spark, ['{"a": -7, "b": -1.5e10}'])
    assert out["a"]["resolved_type"] == "long"
    assert out["b"]["resolved_type"] == "double"


def test_bare_exponent_is_double_and_oracle_agrees(spark):
    """'1e5' (exponent, no decimal point): Spark's map parse keeps the
    raw token, DuckDB normalizes to '100000.0' — both must infer double."""
    import duckdb

    out = _infer(spark, ['{"n": 1e5}'])
    assert out["n"]["resolved_type"] == "double"
    con = duckdb.connect()
    rows = con.sql(M.infer_mapping_sql(
        "SELECT '{\"n\": 1e5}' AS doc")).fetchall()
    assert rows[0][1] == "double"


def test_inference_is_pure_codegen_plus_one_groupby(spark):
    df = spark.createDataFrame([('{"a": 1}',)], "doc STRING")
    plan = M.infer_mapping(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_derived_docs_cover_all_shapes(spark):
    ev = (spark.range(0, 40)
          .withColumnRenamed("id", "event_id")
          .withColumn("user_id", F.col("event_id") % 7)
          .withColumn("doc", M.derived_doc_expr()))
    out = {r["key"]: r for r in M.infer_mapping(ev, "doc").collect()}
    assert out["count"]["resolved_type"] == "double"  # long widened
    assert out["active"]["resolved_type"] == "boolean"
    assert out["when"]["resolved_type"] == "date"
    assert out["nested"]["resolved_type"] == "object"
    assert out["tags"]["resolved_type"] == "array"
    assert out["name"]["resolved_type"] == "text"


# ---------------------------------------------------------------------------
# constant_keyword fold (ConstantKeywordFieldMapper / ConstantFieldType)
# ---------------------------------------------------------------------------
def test_simple_match_star_only_wildcard():
    # Regex.simpleMatch: `*` wildcards, `?` is a LITERAL char
    assert M.simple_match("h*t", "hot")
    assert M.simple_match("*", "")
    assert M.simple_match("a*b*c", "aXXbYYc")
    assert not M.simple_match("a*b*c", "aXXbYYd")
    assert not M.simple_match("h?t", "hot")
    assert M.simple_match("h?t", "h?t")
    assert M.simple_match("HOT", "hot", case_insensitive=True)
    assert not M.simple_match("HOT", "hot")
    # pattern tail must not re-consume mid-match characters
    assert not M.simple_match("ab*b", "ab")
    assert M.simple_match("ab*b", "abb")


def test_constant_fold_each_leaf_kind():
    from opensearch_spark.search import queries as Q

    c = {"tier": "hot"}
    fold = lambda leaf: M.resolve_constant_fields(leaf, c)
    assert isinstance(fold(Q.Term(field="tier", value="hot")), Q.MatchAll)
    assert isinstance(fold(Q.Term(field="tier", value="cold")), Q.MatchNone)
    assert isinstance(
        fold(Q.Term(field="tier", value="HOT", case_insensitive=True)),
        Q.MatchAll)
    assert isinstance(fold(Q.Terms(field="tier", values=["warm", "hot"])),
                      Q.MatchAll)
    # termsQuery routes each value through Regex.simpleMatch, so a '*'
    # in a terms VALUE is a wildcard (ConstantFieldType.java:104-113)
    assert isinstance(fold(Q.Terms(field="tier", values=["h*t"])),
                      Q.MatchAll)
    assert isinstance(fold(Q.Terms(field="tier", values=["c*"])),
                      Q.MatchNone)
    # match on a keyword-family field degenerates to termQuery
    assert isinstance(fold(Q.Match(field="tier", text="hot")), Q.MatchAll)
    assert isinstance(fold(Q.Match(field="tier", text="cold")), Q.MatchNone)
    # term values get the same simpleMatch treatment (reference quirk)
    assert isinstance(fold(Q.Term(field="tier", value="h*")), Q.MatchAll)
    assert isinstance(fold(Q.Prefix(field="tier", value="ho")), Q.MatchAll)
    assert isinstance(fold(Q.Prefix(field="tier", value="co")), Q.MatchNone)
    assert isinstance(fold(Q.Wildcard(field="tier", value="h*")), Q.MatchAll)
    assert isinstance(fold(Q.Exists(field="tier")), Q.MatchAll)
    # boost preserved on the fold
    assert fold(Q.Term(field="tier", value="hot", boost=2.5)).boost == 2.5
    # non-constant fields untouched
    t = Q.Term(field="lang", value="en")
    assert fold(t) is t
    # unsupported leaf kinds raise like ConstantFieldType (no rangeQuery)
    with pytest.raises(ValueError):
        fold(Q.Range(field="tier", gte="a"))


def test_constant_fold_recurses_and_preserves_plan_shape():
    from opensearch_spark.search import queries as Q

    q = Q.Bool(
        must=[Q.Match(field="text", text="spark")],
        filter=[Q.Term(field="tier", value="hot")],
        must_not=[Q.Wildcard(field="tier", value="c*ld")],
    )
    r = M.resolve_constant_fields(q, {"tier": "hot"})
    assert isinstance(r.filter[0], Q.MatchAll)
    assert isinstance(r.must_not[0], Q.MatchNone)
    assert r.must[0] is q.must[0]  # untouched subtree not copied
