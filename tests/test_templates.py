"""Composable index-template resolution (index/templates.py) vs the
MetadataIndexTemplateService.java rules."""

import pytest

from opensearch_spark.index.templates import (ComponentTemplate,
                                              IndexTemplate,
                                              TemplateRegistry,
                                              simple_match)


def _registry() -> TemplateRegistry:
    r = TemplateRegistry()
    r.put_component("base", ComponentTemplate(
        settings={"number_of_shards": 1, "analyzer": "standard"},
        mappings={"text": "text"}))
    r.put_component("code", ComponentTemplate(
        settings={"analyzer": "standard_code"},
        mappings={"lang": "keyword"}))
    r.put_template("logs", IndexTemplate(
        index_patterns=("logs-*",), priority=10,
        composed_of=("base",), settings={"number_of_shards": 4}))
    r.put_template("logs-special", IndexTemplate(
        index_patterns=("logs-special-*",), priority=20,
        composed_of=("base", "code"),
        settings={"refresh_interval": "30s"},
        mappings={"path": "keyword"}))
    r.put_template("catchall", IndexTemplate(
        index_patterns=("*",), priority=0))
    return r


def test_simple_match_star_only():
    assert simple_match("logs-*", "logs-2024")
    assert not simple_match("logs-*", "log-2024")
    assert simple_match("*", "anything")
    # regex metachars in patterns are literal
    assert not simple_match("a.c", "abc")
    assert simple_match("a.c", "a.c")


def test_highest_priority_wins():
    r = _registry()
    assert r.find_template("logs-special-1") == "logs-special"
    assert r.find_template("logs-2024") == "logs"
    assert r.find_template("other") == "catchall"


def test_component_merge_order_and_template_override():
    r = _registry()
    got = r.resolve("logs-special-1")
    # 'code' comes after 'base' in composed_of -> its analyzer wins;
    # template's own settings/mappings override all components
    assert got["settings"] == {"number_of_shards": 1,
                               "analyzer": "standard_code",
                               "refresh_interval": "30s"}
    assert got["mappings"] == {"text": "text", "lang": "keyword",
                               "path": "keyword"}
    # template's own settings take highest precedence
    got2 = r.resolve("logs-2024")
    assert got2["settings"]["number_of_shards"] == 4


def test_no_match_returns_none():
    r = TemplateRegistry()
    assert r.resolve("whatever") is None


def test_same_priority_overlap_rejected():
    r = _registry()
    with pytest.raises(ValueError, match="same\\s+priority"):
        r.put_template("logs-dup", IndexTemplate(
            index_patterns=("logs-*",), priority=10))
    # same patterns at a DIFFERENT priority are fine
    r.put_template("logs-override", IndexTemplate(
        index_patterns=("logs-*",), priority=11))
    assert r.find_template("logs-2024") == "logs-override"


def test_glob_intersection_is_exact():
    from opensearch_spark.index.templates import globs_intersect

    # the pair a substitution heuristic misses: both match 'logs-logs'
    assert globs_intersect("*-logs", "logs-*")
    assert globs_intersect("logs-*", "logs-2024")
    assert globs_intersect("*", "anything-*")
    assert not globs_intersect("logs-*", "metrics-*")
    assert not globs_intersect("a*b", "c*d")
    assert globs_intersect("a*b", "ab")
    assert not globs_intersect("a*b", "ba")


def test_same_priority_star_overlap_rejected_both_directions():
    r = TemplateRegistry()
    r.put_template("a", IndexTemplate(index_patterns=("*-logs",), priority=5))
    with pytest.raises(ValueError, match="same\\s+priority"):
        r.put_template("b", IndexTemplate(index_patterns=("logs-*",),
                                          priority=5))


def test_missing_component_rejected():
    r = TemplateRegistry()
    with pytest.raises(ValueError, match="do not exist"):
        r.put_template("bad", IndexTemplate(
            index_patterns=("x-*",), composed_of=("nope",)))


def test_component_mappings_deep_merge(tmp_path):
    """Round-4 review: composing components must merge nested sections
    recursively (resolveSettings/collectMappings), not let a later
    component wholesale replace mappings.properties."""
    from opensearch_spark.index.templates import (ComponentTemplate,
                                                  IndexTemplate,
                                                  TemplateRegistry)

    reg = TemplateRegistry()
    reg.put_component("a", ComponentTemplate(
        mappings={"properties": {"f1": {"type": "long"}}}))
    reg.put_component("b", ComponentTemplate(
        mappings={"properties": {"f2": {"type": "text"}}}))
    reg.put_template("t", IndexTemplate(
        index_patterns=["logs-*"], priority=1, composed_of=["a", "b"]))
    r = reg.resolve("logs-1")
    assert set(r["mappings"]["properties"]) == {"f1", "f2"}


def test_simple_match_no_trailing_newline_leak():
    from opensearch_spark.index.templates import simple_match

    assert simple_match("logs", "logs")
    assert not simple_match("logs", "logs\n")  # old regex '$' leaked this
    assert simple_match("lo*gs", "lo\ngs")     # '*' crosses newlines
