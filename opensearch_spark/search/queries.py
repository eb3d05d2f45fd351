"""Query AST — the engine's first IR, mirroring the reference query DSL.

Each node corresponds to a ``*QueryBuilder`` in the reference
(``server/src/main/java/org/opensearch/index/query/``, registered at
``search/SearchModule.java:1081-1165``); ``from_dsl`` parses the same JSON
shape the reference accepts (subset). Like the reference, every query is
both a predicate (filter context) and a scoring operator (query context).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any


class Query:
    boost: float = 1.0


@dataclass
class MatchAll(Query):
    boost: float = 1.0


@dataclass
class MatchNone(Query):
    boost: float = 1.0


@dataclass
class Match(Query):
    """Analyzed full-text match (MatchQueryBuilder.java, MatchQuery.java:279)."""

    field: str
    text: str
    operator: str = "or"  # or|and
    minimum_should_match: int = 0
    boost: float = 1.0


@dataclass
class MatchPhrase(Query):
    """Positional phrase (MatchPhraseQueryBuilder.java); slop=0 v1."""

    field: str
    text: str
    slop: int = 0
    boost: float = 1.0


@dataclass
class MatchPhrasePrefix(Query):
    """Phrase whose last term is a prefix (MatchPhrasePrefixQueryBuilder.java
    → Lucene MultiPhraseQuery). Scoring here: phrase-BM25 where ptf counts
    matches over ANY expansion and the last position's idf is the max over
    expansions (documented simplification of MultiPhraseQuery's union)."""

    field: str
    text: str
    max_expansions: int = 50
    boost: float = 1.0


@dataclass
class MatchBoolPrefix(Query):
    """Bool OR of the analyzed terms, last term as a prefix query
    (MatchBoolPrefixQueryBuilder.java): BM25 sum over the fixed terms plus
    the prefix clause's constant score (Lucene prefix scores boost·1)."""

    field: str
    text: str
    boost: float = 1.0


@dataclass
class SpanNear(Query):
    """span_near over single-term clauses (SpanNearQueryBuilder.java):
    clause terms at positions p1..pn with, when in_order, p_i > p_{i-1} and
    total extra gap (p_n - p_1 - (n-1)) <= slop. Filter-context operator;
    scores constant boost (the reference's sloppy-freq weighting is a
    documented non-goal, SURVEY §2.2 span_* v3)."""

    field: str
    clauses: list = dc_field(default_factory=list)
    slop: int = 0
    in_order: bool = True
    boost: float = 1.0


@dataclass
class MultiMatch(Query):
    """multi_match best_fields/most_fields (MultiMatchQueryBuilder.java:130)."""

    fields: list[str]
    text: str
    type: str = "best_fields"  # best_fields|most_fields
    tie_breaker: float = 0.0
    boost: float = 1.0


@dataclass
class Term(Query):
    """Exact un-analyzed term (TermQueryBuilder.java)."""

    field: str
    value: Any
    boost: float = 1.0


@dataclass
class Terms(Query):
    """Set membership (TermsQueryBuilder.java)."""

    field: str
    values: list = dc_field(default_factory=list)
    boost: float = 1.0


@dataclass
class TermsSet(Query):
    """Match >= N of given terms (TermsSetQueryBuilder.java)."""

    field: str
    values: list = dc_field(default_factory=list)
    minimum_should_match: int = 1
    boost: float = 1.0


@dataclass
class Range(Query):
    """gt/gte/lt/lte (RangeQueryBuilder.java)."""

    field: str
    gt: Any = None
    gte: Any = None
    lt: Any = None
    lte: Any = None
    boost: float = 1.0


@dataclass
class Exists(Query):
    field: str
    boost: float = 1.0


@dataclass
class Ids(Query):
    values: list = dc_field(default_factory=list)
    boost: float = 1.0


@dataclass
class Prefix(Query):
    """Term starts-with (PrefixQueryBuilder.java) — dictionary expansion."""

    field: str
    value: str
    boost: float = 1.0


@dataclass
class Wildcard(Query):
    """``*``/``?`` pattern over terms (WildcardQueryBuilder.java)."""

    field: str
    value: str
    boost: float = 1.0


@dataclass
class Regexp(Query):
    field: str
    value: str
    boost: float = 1.0


@dataclass
class Fuzzy(Query):
    """Levenshtein <= fuzziness over terms (FuzzyQueryBuilder.java);
    fuzziness=None → AUTO by length (libs/core Fuzziness)."""

    field: str
    value: str
    fuzziness: int | None = None
    boost: float = 1.0


@dataclass
class Bool(Query):
    """must/should/must_not/filter algebra (BoolQueryBuilder.java)."""

    must: list = dc_field(default_factory=list)
    should: list = dc_field(default_factory=list)
    must_not: list = dc_field(default_factory=list)
    filter: list = dc_field(default_factory=list)
    minimum_should_match: int | None = None
    boost: float = 1.0


@dataclass
class ConstantScore(Query):
    filter: Query = None
    boost: float = 1.0


@dataclass
class DisMax(Query):
    """max + tie_breaker * rest (DisMaxQueryBuilder.java)."""

    queries: list = dc_field(default_factory=list)
    tie_breaker: float = 0.0
    boost: float = 1.0


@dataclass
class Boosting(Query):
    """positive demoted by negative match (BoostingQueryBuilder.java)."""

    positive: Query = None
    negative: Query = None
    negative_boost: float = 0.5
    boost: float = 1.0


@dataclass
class FunctionScore(Query):
    """score arithmetic over a sub-query (functionscore/*.java); the
    function is a SQL expression string over columns (score, doc fields)."""

    query: Query = None
    script: str = "score"  # SQL expr; 'score' names the sub-query score
    boost_mode: str = "replace"  # replace|multiply|sum
    boost: float = 1.0


@dataclass
class MoreLikeThis(Query):
    """Salient-term extraction from example docs → OR query
    (MoreLikeThisQueryBuilder.java): tf-idf ranks the example docs' terms."""

    field: str
    like_ids: list = dc_field(default_factory=list)
    max_query_terms: int = 25
    min_term_freq: int = 1
    min_doc_freq: int = 2
    boost: float = 1.0


def from_dsl(d: dict) -> Query:
    """Parse the reference's JSON query DSL (subset) into the AST."""
    if len(d) != 1:
        raise ValueError(f"query object must have exactly one key, got {list(d)}")
    kind, body = next(iter(d.items()))
    if kind == "match_all":
        return MatchAll(boost=body.get("boost", 1.0) if body else 1.0)
    if kind == "match_none":
        return MatchNone()
    if kind == "match":
        f, spec = next(iter(body.items()))
        if isinstance(spec, str):
            return Match(field=f, text=spec)
        return Match(
            field=f,
            text=spec["query"],
            operator=spec.get("operator", "or").lower(),
            minimum_should_match=int(spec.get("minimum_should_match", 0)),
            boost=spec.get("boost", 1.0),
        )
    if kind == "match_phrase":
        f, spec = next(iter(body.items()))
        if isinstance(spec, str):
            return MatchPhrase(field=f, text=spec)
        return MatchPhrase(field=f, text=spec["query"], slop=spec.get("slop", 0),
                           boost=spec.get("boost", 1.0))
    if kind == "match_phrase_prefix":
        f, spec = next(iter(body.items()))
        if isinstance(spec, str):
            return MatchPhrasePrefix(field=f, text=spec)
        return MatchPhrasePrefix(field=f, text=spec["query"],
                                 max_expansions=spec.get("max_expansions", 50),
                                 boost=spec.get("boost", 1.0))
    if kind == "match_bool_prefix":
        f, spec = next(iter(body.items()))
        if isinstance(spec, str):
            return MatchBoolPrefix(field=f, text=spec)
        return MatchBoolPrefix(field=f, text=spec["query"], boost=spec.get("boost", 1.0))
    if kind == "span_near":
        clauses = [next(iter(c["span_term"].values())) for c in body["clauses"]]
        fld = next(iter(body["clauses"][0]["span_term"].keys()))
        return SpanNear(field=fld, clauses=clauses, slop=body.get("slop", 0),
                        in_order=body.get("in_order", True))
    if kind == "multi_match":
        return MultiMatch(
            fields=body["fields"], text=body["query"],
            type=body.get("type", "best_fields"),
            tie_breaker=body.get("tie_breaker", 0.0), boost=body.get("boost", 1.0),
        )
    if kind == "term":
        f, spec = next(iter(body.items()))
        if isinstance(spec, dict):
            return Term(field=f, value=spec["value"], boost=spec.get("boost", 1.0))
        return Term(field=f, value=spec)
    if kind == "terms":
        f = next(k for k in body if k != "boost")
        return Terms(field=f, values=body[f], boost=body.get("boost", 1.0))
    if kind == "terms_set":
        f, spec = next(iter(body.items()))
        return TermsSet(field=f, values=spec["terms"],
                        minimum_should_match=spec.get("minimum_should_match_script", 1)
                        if isinstance(spec.get("minimum_should_match_script"), int)
                        else spec.get("minimum_should_match", 1))
    if kind == "range":
        f, spec = next(iter(body.items()))
        return Range(field=f, gt=spec.get("gt"), gte=spec.get("gte"),
                     lt=spec.get("lt"), lte=spec.get("lte"),
                     boost=spec.get("boost", 1.0))
    if kind == "exists":
        return Exists(field=body["field"])
    if kind == "ids":
        return Ids(values=body["values"])
    if kind == "prefix":
        f, spec = next(iter(body.items()))
        return Prefix(field=f, value=spec["value"] if isinstance(spec, dict) else spec)
    if kind == "wildcard":
        f, spec = next(iter(body.items()))
        return Wildcard(field=f, value=spec["value"] if isinstance(spec, dict) else spec)
    if kind == "regexp":
        f, spec = next(iter(body.items()))
        return Regexp(field=f, value=spec["value"] if isinstance(spec, dict) else spec)
    if kind == "fuzzy":
        f, spec = next(iter(body.items()))
        if isinstance(spec, dict):
            fz = spec.get("fuzziness", "AUTO")
            return Fuzzy(field=f, value=spec["value"],
                         fuzziness=None if fz == "AUTO" else int(fz))
        return Fuzzy(field=f, value=spec)
    if kind == "bool":
        as_list = lambda x: x if isinstance(x, list) else [x]  # noqa: E731
        return Bool(
            must=[from_dsl(q) for q in as_list(body.get("must", []))],
            should=[from_dsl(q) for q in as_list(body.get("should", []))],
            must_not=[from_dsl(q) for q in as_list(body.get("must_not", []))],
            filter=[from_dsl(q) for q in as_list(body.get("filter", []))],
            minimum_should_match=body.get("minimum_should_match"),
            boost=body.get("boost", 1.0),
        )
    if kind == "constant_score":
        return ConstantScore(filter=from_dsl(body["filter"]), boost=body.get("boost", 1.0))
    if kind == "dis_max":
        return DisMax(queries=[from_dsl(q) for q in body["queries"]],
                      tie_breaker=body.get("tie_breaker", 0.0))
    if kind == "boosting":
        return Boosting(positive=from_dsl(body["positive"]),
                        negative=from_dsl(body["negative"]),
                        negative_boost=body.get("negative_boost", 0.5))
    if kind == "function_score":
        return FunctionScore(query=from_dsl(body["query"]),
                             script=body.get("script", "score"),
                             boost_mode=body.get("boost_mode", "replace"))
    if kind == "more_like_this":
        return MoreLikeThis(field=body.get("fields", ["content"])[0],
                            like_ids=body.get("like", []),
                            max_query_terms=body.get("max_query_terms", 25),
                            min_term_freq=body.get("min_term_freq", 1),
                            min_doc_freq=body.get("min_doc_freq", 2))
    if kind == "wrapper":
        import base64
        import json

        return from_dsl(json.loads(base64.b64decode(body["query"])))
    raise ValueError(f"unsupported query kind: {kind}")
