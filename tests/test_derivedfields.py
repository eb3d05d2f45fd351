"""Derived (query-time scripted) fields — DerivedFieldMapper.java /
DerivedFieldSupportedTypes.java / DerivedFieldQuery.java semantics."""

import pytest

from opensearch_spark.search.derivedfields import (SUPPORTED_TYPES,
                                                   with_derived_fields)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "alpha", "en", 150), (2, "beta", "de", 240), (3, "gamma", "en", 90)],
        "doc_id long, text string, lang string, n_chars long")


def test_types_cast_to_declared_mapping(spark):
    d = with_derived_fields(_docs(spark), {
        "is_long": {"type": "boolean",
                    "script": "doc['n_chars'].value > 100"},
        "chars_100": {"type": "long", "script": {
            "source": "doc['n_chars'].value / params.div",
            "params": {"div": 100.0}}},
        "lang_up": {"type": "keyword",
                    "script": "doc['lang'].value.toUpperCase()"},
    })
    types = dict(d.dtypes)
    assert types["is_long"] == "boolean"
    assert types["chars_100"] == "bigint"
    assert types["lang_up"] == "string"
    rows = {r.doc_id: r for r in d.collect()}
    assert rows[1].is_long and not rows[3].is_long
    assert rows[2].chars_100 == 2  # 2.4 cast long -> 2
    assert rows[1].lang_up == "EN"


def test_unsupported_type_raises(spark):
    with pytest.raises(ValueError, match="unsupported type"):
        with_derived_fields(_docs(spark), {
            "x": {"type": "wildcard", "script": "doc['lang'].value"}})
    assert "geo_point" not in SUPPORTED_TYPES  # dedicated geo module


def test_derived_field_filters_fuse_into_scan(spark, tmp_path):
    """The derived projection + filter must collapse into one codegen
    stage over the scan — no shuffle, no extra pass."""
    p = str(tmp_path / "docs")
    _docs(spark).write.parquet(p)
    d = with_derived_fields(spark.read.parquet(p), {
        "c100": {"type": "double", "script": {
            "source": "doc['n_chars'].value / params.div",
            "params": {"div": 100.0}}}})
    plan = d.where("c100 > 1.0")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
