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
    #: query-time analyzer override (the reference match query's `analyzer`
    #: param; used e.g. for query-side synonym expansion or autocomplete
    #: where the index side is edge-ngrammed but the query side is not)
    analyzer: str | None = None


@dataclass
class CommonTerms(Query):
    """common terms query (CommonTermsQueryBuilder.java:77-108 —
    cutoff_frequency default 0.01, low/high_freq_operator default OR;
    deprecated in the reference in favor of match, implemented for 100%
    §2 coverage): query terms are split by document frequency at the
    cutoff — LOW-frequency terms are required, HIGH-frequency terms only
    contribute score ('stopwords without a stopword list'). Cutoff >= 1
    is an absolute df; < 1 is a fraction of doc_count (Lucene
    CommonTermsQuery.buildQuery: low iff df <= maxDocFreq)."""

    field: str
    text: str
    cutoff_frequency: float = 0.01
    low_freq_operator: str = "or"  # or|and
    high_freq_operator: str = "or"
    low_freq_minimum_should_match: int | None = None
    high_freq_minimum_should_match: int | None = None
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
    """span_near (SpanNearQueryBuilder.java): clause terms at positions
    p1..pn with, when in_order, p_i > p_{i-1} and total extra gap
    (p_n - p_1 - (n-1)) <= slop. A clause is a term string or a list of
    alternative terms (inlined span_or sub-clause). Filter-context
    operator; scores constant boost (the reference's sloppy-freq weighting
    is a documented non-goal, SURVEY §2.2 span_* v3)."""

    field: str
    clauses: list = dc_field(default_factory=list)
    slop: int = 0
    in_order: bool = True
    boost: float = 1.0


@dataclass
class SpanGap:
    """span_gap (SpanNearQueryBuilder.SpanGapQueryBuilder): a fixed-width
    placeholder clause inside an in_order span_near — it consumes
    ``width`` token positions between its neighbouring real clauses
    without matching a term. The width counts toward the matched span
    (NOT toward the slop budget): [a, gap(1), b] slop=0 requires b at
    exactly a.position + 2. Only legal strictly between two real
    clauses and only with in_order=true (the reference restriction)."""

    width: int = 1


@dataclass
class SpanFirst(Query):
    """span_first (SpanFirstQueryBuilder.java): the wrapped single-term
    span must END within the first ``end`` positions (Lucene span end is
    exclusive: position + 1 <= end)."""

    field: str
    value: str
    end: int = 3
    boost: float = 1.0


@dataclass
class SpanOr(Query):
    """span_or (SpanOrQueryBuilder.java) over single-term clauses: docs
    with any clause present (position union)."""

    field: str
    values: list = dc_field(default_factory=list)
    boost: float = 1.0


@dataclass
class SpanNot(Query):
    """span_not (SpanNotQueryBuilder.java): include-term spans with no
    exclude-term span within ``pre`` positions before / ``post`` after
    (pre=post=0 → strict overlap, i.e. identical position for single-term
    spans). A doc matches if at least one include span survives."""

    field: str
    include: str = ""
    exclude: str = ""
    pre: int = 0
    post: int = 0
    boost: float = 1.0


@dataclass
class SpanFieldMasking(Query):
    """field_masking_span (SpanFieldMaskingQueryBuilder.java): a span
    clause whose term positions come from ``inner_field``'s index but
    which composes inside a span query on the OUTER field — the classic
    use is position-aligned sibling fields (same source analyzed twice).
    Used as a CLAUSE inside SpanNear.clauses, like the reference nests it
    inside compound spans; outer-field stats drive scoring (here: the
    constant-boost filter-context convention of the span family)."""

    inner_field: str
    value: str


@dataclass
class SpanMulti(Query):
    """span_multi (SpanMultiTermQueryBuilder.java): wrap a multi-term
    query (prefix/wildcard/regexp/fuzzy) as a span clause — the expansion
    becomes a position-set union (bounded by max_expansions)."""

    field: str
    match: Query = None  # Prefix | Wildcard | Regexp | Fuzzy
    boost: float = 1.0


@dataclass
class SpanContaining(Query):
    """span_containing (SpanContainingQueryBuilder.java): matches of the
    ``big`` span (ordered 2-clause span_near within ``slop``) that contain
    a ``little``-term span."""

    field: str
    big: tuple = ()      # (term_a, term_b)
    slop: int = 0
    little: str = ""
    boost: float = 1.0


@dataclass
class SpanWithin(Query):
    """span_within (SpanWithinQueryBuilder.java): ``little``-term spans
    that lie within a ``big`` span match — at doc level the same witness
    condition as span_containing (documented)."""

    field: str
    big: tuple = ()
    slop: int = 0
    little: str = ""
    boost: float = 1.0


@dataclass
class RankFeature(Query):
    """rank_feature query (RankFeatureQueryBuilder.java), saturation
    function: score = boost * value / (value + pivot) over a numeric
    doc column (monotone, bounded — the reference's default function)."""

    field: str
    pivot: float = 1.0
    boost: float = 1.0


@dataclass
class DistanceFeature(Query):
    """distance_feature query (DistanceFeatureQueryBuilder.java):
    score = boost * pivot / (pivot + |value - origin|) — closeness to an
    origin on a numeric/date column."""

    field: str
    origin: float = 0.0
    pivot: float = 1.0
    boost: float = 1.0


@dataclass
class Intervals(Query):
    """intervals query, ``match`` rule (IntervalQueryBuilder.java): the
    analyzed terms must appear with at most ``max_gaps`` total extra
    positions between them; ``ordered`` constrains the order. max_gaps=-1
    means unbounded (reference default). Filter-context/constant score."""

    field: str
    text: str = ""
    max_gaps: int = -1
    ordered: bool = False
    last_prefix: bool = False  # intervals `prefix` rule on the last term
    # intervals multi-term rule on the last term
    # (IntervalsSourceProvider.{Prefix,Wildcard,Fuzzy}): "prefix" |
    # "wildcard" | "fuzzy" — the last token expands to its bounded
    # dictionary matches, used as clause alternatives. last_prefix is the
    # back-compat spelling of last_rule="prefix".
    last_rule: str | None = None
    #: intervals combinators (IntervalsSourceProvider.{AnyOf,AllOf}):
    #: sources = all_of over items, each item a term or a tuple of
    #: alternative terms (an inlined any_of); ordered/max_gaps apply to
    #: the combinator. A single tuple item is a bare any_of. Overrides
    #: ``text`` when non-empty.
    sources: tuple = ()
    boost: float = 1.0


@dataclass
class MultiMatch(Query):
    """multi_match (MultiMatchQueryBuilder.java:74,130-151). Types:

    - best_fields: dis_max over per-field match scores (field-centric)
    - most_fields: sum over per-field match scores
    - cross_fields: term-centric — per analyzed term, dis_max (with
      tie_breaker) over the per-field BM25 term scores, summed over terms.
      Documented simplification vs the reference's blended df: each field
      keeps its own statistics; the blending happens at score level.
    - phrase / phrase_prefix: dis_max over per-field match_phrase /
      match_phrase_prefix scores
    - bool_prefix: dis_max over per-field match_bool_prefix scores
    """

    fields: list[str]
    text: str
    type: str = "best_fields"
    tie_breaker: float = 0.0
    slop: int = 0
    boost: float = 1.0


@dataclass
class Term(Query):
    """Exact un-analyzed term (TermQueryBuilder.java). ``case_insensitive``
    mirrors the reference's term-query flag / the keyword lowercase
    normalizer (LowercaseNormalizer.java)."""

    field: str
    value: Any
    boost: float = 1.0
    case_insensitive: bool = False


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
class Phonetic(Query):
    """Sound-alike term query (plugins/analysis-phonetic,
    PhoneticTokenFilterFactory.java: the filter indexes each token's
    phonetic code; a query token matches every term with the same code).
    Expansion-based here — the simplified-soundex code of ``value``
    expands to the dictionary terms sharing it (a vocabulary-level map,
    since the code depends only on the term), then the standard
    constant-score multi-term rewrite applies."""

    field: str
    value: str
    max_expansions: int | None = None
    boost: float = 1.0


@dataclass
class Prefix(Query):
    """Term starts-with (PrefixQueryBuilder.java) — dictionary expansion,
    bounded by max_expansions (None → engine cap; Lucene MultiTermQuery
    rewrite bounds the same way)."""

    field: str
    value: str
    max_expansions: int | None = None
    boost: float = 1.0


@dataclass
class Wildcard(Query):
    """``*``/``?`` pattern over terms (WildcardQueryBuilder.java)."""

    field: str
    value: str
    max_expansions: int | None = None
    boost: float = 1.0


@dataclass
class Regexp(Query):
    field: str
    value: str
    max_expansions: int | None = None
    boost: float = 1.0


@dataclass
class Fuzzy(Query):
    """Edit-distance <= fuzziness over terms (FuzzyQueryBuilder.java);
    fuzziness=None → AUTO by length (libs/core Fuzziness).
    ``transpositions=True`` (the reference's DEFAULT_TRANSPOSITIONS)
    counts an adjacent swap as ONE edit via true Damerau-Levenshtein
    (vs Lucene's optimal-string-alignment automaton — the variants
    differ only on pairs needing an edit inside a transposed pair,
    impossible below distance 2; see executor._damerau_leq);
    ``transpositions=False`` is classic Levenshtein (Spark/DuckDB
    built-in, fully JVM-side)."""

    field: str
    value: str
    fuzziness: int | None = None
    max_expansions: int | None = None
    boost: float = 1.0
    transpositions: bool = True


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
class ScoreFunction:
    """One scoring function (index/query/functionscore/*FunctionBuilder.java):

    - field_value_factor: modifier(factor * coalesce(field, missing))
      (FieldValueFactorFunctionBuilder.java); modifier in
      none|log1p|ln1p|sqrt|square|reciprocal
    - random_score: deterministic hash of (doc_id, seed) → [0, 1)
      (RandomScoreFunctionBuilder.java — reference hashes _seq_no/_id with
      a seed; here a Knuth multiplicative hash so the DuckDB oracle can
      reproduce it bit-for-bit)
    - gauss|linear|exp: decay over a numeric field's distance from origin
      (DecayFunctionBuilder.java math, public formulas)
    - script: arbitrary SQL expression over doc columns
    """

    kind: str  # field_value_factor|random_score|gauss|linear|exp|script
    field: str | None = None
    factor: float = 1.0
    modifier: str = "none"
    missing: float = 0.0
    seed: int = 0
    origin: float = 0.0
    scale: float = 10.0
    offset: float = 0.0
    decay: float = 0.5
    weight: float = 1.0
    script: str | None = None


@dataclass
class FunctionScore(Query):
    """score arithmetic over a sub-query (functionscore/
    FunctionScoreQueryBuilder.java). Either a bare ``script`` SQL
    expression over (score, doc columns), or a list of ``functions``
    combined by ``score_mode`` then applied to the query score by
    ``boost_mode``."""

    query: Query = None
    script: str = "score"  # SQL expr; 'score' names the sub-query score
    boost_mode: str = "replace"  # replace|multiply|sum|avg|max|min
    functions: list = dc_field(default_factory=list)  # list[ScoreFunction]
    score_mode: str = "multiply"  # multiply|sum|avg|max|min
    boost: float = 1.0


@dataclass
class ScriptScore(Query):
    """script_score (index/query/ScriptScoreQueryBuilder.java): the
    sub-query decides WHICH docs match, the script ALONE decides the
    score (unlike function_score, which combines script and query
    score). ``min_score`` drops hits below the bound before top-k
    (ScriptScoreQuery.java's minScore filter). ``fields`` names the doc
    columns the script reads — they are joined onto the already-bounded
    scored frame, never the full corpus."""

    query: Query = None
    script: str = "score"  # SQL expr over (score, *fields)
    fields: tuple = ()
    min_score: float | None = None
    boost: float = 1.0


@dataclass
class Script(Query):
    """script query (index/query/ScriptQueryBuilder.java): filter-context
    per-doc predicate over docs-table columns. ``script`` holds a Spark-
    SQL boolean expression; the JSON DSL also accepts Painless sources
    (``{"lang": "painless"}`` or auto-detected), compiled JVM-side by
    ``search.painless.painless_to_sql`` — the predicate stays a Catalyst
    expression, pushable to the parquet scan, never a Python UDF."""

    script: str = "TRUE"
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


def _script_src(sc, score_col: str = "score") -> str:
    """Normalize a DSL script object ({"source", "lang", "params"} or a
    bare string) to a Spark-SQL expression. Painless sources (explicit
    ``lang: painless`` or auto-detected Painless-only syntax) compile via
    painless_to_sql; SQL sources pass through untouched."""
    from opensearch_spark.search.painless import (looks_like_painless,
                                                  painless_to_sql)

    if isinstance(sc, dict):
        if "id" in sc and "source" in sc:
            # Script.java's parser rejects a script carrying both a
            # stored id and an inline source — surfacing the malformed
            # request instead of silently preferring one
            raise ValueError(
                "script object must carry either 'id' (stored) or "
                "'source' (inline), not both")
        if "id" in sc and "source" not in sc:
            # ScriptType.STORED (Script.java): resolve {id, params} from
            # the stored-scripts registry; params always come from the
            # request, never the stored source.
            from opensearch_spark.search.apis import get_stored_script

            stored = get_stored_script(sc["id"])
            sc = {"source": stored["source"], "lang": stored["lang"],
                  "params": sc.get("params")}
        if "source" not in sc:
            raise ValueError(
                f"script object must carry 'source', got {sorted(sc)}")
        src = sc["source"]
        lang = sc.get("lang")
        if lang == "expression":
            # modules/lang-expression (Lucene expressions): bare Math
            # functions + bare param variables, rewritten onto the
            # painless grammar
            from opensearch_spark.search.painless import expression_to_sql

            return expression_to_sql(src, sc.get("params"), score_col)
        if lang == "painless" or (lang is None and looks_like_painless(src)):
            return painless_to_sql(src, sc.get("params"), score_col)
        return src
    src = str(sc)
    if looks_like_painless(src):
        return painless_to_sql(src, None, score_col)
    return src


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
        msm = spec.get("minimum_should_match", 0)
        if isinstance(msm, str) and msm.strip().endswith("%"):
            pass  # percentage form resolved against the live term count
                  # by the executor (_n_required); int() would crash here
        else:
            msm = int(msm or 0)
        return Match(
            field=f,
            text=spec["query"],
            operator=spec.get("operator", "or").lower(),
            minimum_should_match=msm,
            boost=spec.get("boost", 1.0),
            analyzer=spec.get("analyzer"),
        )
    if kind == "common_terms":
        f, spec = next(iter(body.items()))
        if isinstance(spec, str):
            return CommonTerms(field=f, text=spec)
        lf_msm = spec.get("minimum_should_match", {}).get("low_freq") \
            if isinstance(spec.get("minimum_should_match"), dict) \
            else spec.get("minimum_should_match")
        hf_msm = spec.get("minimum_should_match", {}).get("high_freq") \
            if isinstance(spec.get("minimum_should_match"), dict) else None
        return CommonTerms(
            field=f,
            text=spec["query"],
            cutoff_frequency=float(spec.get("cutoff_frequency", 0.01)),
            low_freq_operator=spec.get("low_freq_operator", "or").lower(),
            high_freq_operator=spec.get("high_freq_operator", "or").lower(),
            low_freq_minimum_should_match=(int(lf_msm) if lf_msm else None),
            high_freq_minimum_should_match=(int(hf_msm) if hf_msm else None),
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
        clauses, fld = [], None
        for c in body["clauses"]:
            if "span_term" in c:
                f, v = next(iter(c["span_term"].items()))
                fld = fld or f
                clauses.append(v)
            elif "span_or" in c:  # inlined alternative set
                alts = []
                for sub in c["span_or"]["clauses"]:
                    f, v = next(iter(sub["span_term"].items()))
                    fld = fld or f
                    alts.append(v)
                clauses.append(alts)
            elif "span_gap" in c:  # {"span_gap": {"<field>": width}}
                _, w = next(iter(c["span_gap"].items()))
                clauses.append(SpanGap(width=int(w)))
            else:
                raise ValueError(f"unsupported span_near clause: {list(c)}")
        return SpanNear(field=fld, clauses=clauses, slop=body.get("slop", 0),
                        in_order=body.get("in_order", True),
                        boost=body.get("boost", 1.0))
    if kind == "span_first":
        f, v = next(iter(body["match"]["span_term"].items()))
        return SpanFirst(field=f, value=v, end=body.get("end", 3),
                         boost=body.get("boost", 1.0))
    if kind == "span_or":
        vals, fld = [], None
        for c in body["clauses"]:
            f, v = next(iter(c["span_term"].items()))
            fld = fld or f
            vals.append(v)
        return SpanOr(field=fld, values=vals, boost=body.get("boost", 1.0))
    if kind == "span_not":
        fi, vi = next(iter(body["include"]["span_term"].items()))
        fe, ve = next(iter(body["exclude"]["span_term"].items()))
        return SpanNot(field=fi, include=vi, exclude=ve,
                       pre=body.get("pre", body.get("dist", 0)),
                       post=body.get("post", body.get("dist", 0)))
    if kind == "span_term":
        f, spec = next(iter(body.items()))
        return Term(field=f, value=spec["value"] if isinstance(spec, dict) else spec)
    if kind == "span_multi":
        inner = from_dsl(body["match"])
        return SpanMulti(field=inner.field, match=inner)
    if kind in ("span_containing", "span_within"):
        cls = SpanContaining if kind == "span_containing" else SpanWithin
        bigq = from_dsl(body["big"])
        littleq = from_dsl(body["little"])
        if len(bigq.clauses) != 2 or not all(
                isinstance(c, str) for c in bigq.clauses):
            # the containing executor evaluates exactly a 2-term ordered
            # big span; silently truncating a longer clause list would
            # report false matches (round-4 review)
            raise NotImplementedError(
                f"{kind}: big must be a span_near of exactly 2 span_term "
                f"clauses (got {len(bigq.clauses)})")
        return cls(field=bigq.field, big=tuple(bigq.clauses),
                   slop=bigq.slop, little=littleq.value,
                   boost=body.get("boost", 1.0))
    if kind == "rank_feature":
        sat = body.get("saturation", {})
        return RankFeature(field=body["field"], pivot=sat.get("pivot", 1.0),
                           boost=body.get("boost", 1.0))
    if kind == "distance_feature":
        return DistanceFeature(field=body["field"],
                               origin=float(body.get("origin", 0.0)),
                               pivot=float(body.get("pivot", 1.0)),
                               boost=body.get("boost", 1.0))
    if kind == "intervals":
        f, spec = next(iter(body.items()))
        m = spec["match"]
        return Intervals(field=f, text=m["query"],
                         max_gaps=m.get("max_gaps", -1),
                         ordered=m.get("ordered", False))
    if kind == "multi_match":
        return MultiMatch(
            fields=body["fields"], text=body["query"],
            type=body.get("type", "best_fields"),
            tie_breaker=body.get("tie_breaker", 0.0), boost=body.get("boost", 1.0),
            slop=int(body.get("slop", 0)),
        )
    if kind == "term":
        f, spec = next(iter(body.items()))
        if isinstance(spec, dict):
            return Term(field=f, value=spec["value"],
                        boost=spec.get("boost", 1.0),
                        case_insensitive=bool(spec.get("case_insensitive",
                                                       False)))
        return Term(field=f, value=spec)
    if kind == "terms":
        f = next(k for k in body if k != "boost")
        return Terms(field=f, values=body[f], boost=body.get("boost", 1.0))
    if kind == "terms_set":
        f, spec = next(iter(body.items()))
        mss = spec.get("minimum_should_match_script")
        if isinstance(mss, dict) or "minimum_should_match_field" in spec:
            # the reference's script/field forms resolve msm PER DOC —
            # silently defaulting to 1 would match docs the query
            # rejects (round-4 review)
            raise NotImplementedError(
                "terms_set: minimum_should_match_script/_field forms are "
                "not supported — pass an integer minimum_should_match")
        return TermsSet(field=f, values=spec["terms"],
                        minimum_should_match=mss if isinstance(mss, int)
                        else spec.get("minimum_should_match", 1))
    if kind == "range":
        f, spec = next(iter(body.items()))
        return Range(field=f, gt=spec.get("gt"), gte=spec.get("gte"),
                     lt=spec.get("lt"), lte=spec.get("lte"),
                     boost=spec.get("boost", 1.0))
    if kind == "exists":
        return Exists(field=body["field"], boost=body.get("boost", 1.0))
    if kind == "ids":
        return Ids(values=body["values"], boost=body.get("boost", 1.0))
    if kind in ("prefix", "wildcard", "regexp"):
        cls = {"prefix": Prefix, "wildcard": Wildcard,
               "regexp": Regexp}[kind]
        f, spec = next(iter(body.items()))
        if isinstance(spec, dict):
            return cls(field=f, value=spec["value"],
                       max_expansions=spec.get("max_expansions"),
                       boost=spec.get("boost", 1.0))
        return cls(field=f, value=spec)
    if kind == "fuzzy":
        f, spec = next(iter(body.items()))
        if isinstance(spec, dict):
            fz = spec.get("fuzziness", "AUTO")
            if isinstance(fz, str) and fz.upper().startswith("AUTO"):
                if ":" in fz:
                    # AUTO:lo,hi (Fuzziness.java custom thresholds):
                    # resolvable at parse time from the value's length
                    lo, hi = (int(x) for x in fz.split(":", 1)[1].split(","))
                    n = len(spec["value"])
                    fuzz = 0 if n < lo else (1 if n < hi else 2)
                else:
                    fuzz = None  # default AUTO ladder (0-2, 3-5, 6+)
            else:
                fuzz = int(fz)
            return Fuzzy(field=f, value=spec["value"],
                         fuzziness=fuzz,
                         max_expansions=spec.get("max_expansions"),
                         boost=spec.get("boost", 1.0),
                         transpositions=bool(
                             spec.get("transpositions", True)))
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
                      tie_breaker=body.get("tie_breaker", 0.0),
                      boost=body.get("boost", 1.0))
    if kind == "boosting":
        return Boosting(positive=from_dsl(body["positive"]),
                        negative=from_dsl(body["negative"]),
                        negative_boost=body.get("negative_boost", 0.5),
                        boost=body.get("boost", 1.0))
    if kind == "function_score":
        fns = []
        for fd in body.get("functions", []):
            if "filter" in fd:
                # a per-function filter scopes the function to a doc
                # subset — silently applying it everywhere corrupts
                # ranking (round-4 review)
                raise NotImplementedError(
                    "function_score: per-function 'filter' is not "
                    "supported — compose with a bool query instead")
            if "field_value_factor" in fd:
                s = fd["field_value_factor"]
                fns.append(ScoreFunction(
                    kind="field_value_factor", field=s["field"],
                    factor=s.get("factor", 1.0),
                    modifier=s.get("modifier", "none"),
                    missing=s.get("missing", 0.0),
                    weight=fd.get("weight", 1.0)))
            elif "random_score" in fd:
                s = fd["random_score"]
                fns.append(ScoreFunction(kind="random_score",
                                         seed=s.get("seed", 0),
                                         weight=fd.get("weight", 1.0)))
            elif "script_score" in fd:
                # ScriptScoreFunctionBuilder: a script FUNCTION inside
                # function_score (combined per score_mode/boost_mode,
                # unlike the score-replacing script_score QUERY)
                fns.append(ScoreFunction(
                    kind="script",
                    script=_script_src(fd["script_score"].get("script", {})),
                    weight=fd.get("weight", 1.0)))
            else:
                for dk in ("gauss", "linear", "exp"):
                    if dk in fd:
                        f, s = next(iter(fd[dk].items()))
                        fns.append(ScoreFunction(
                            kind=dk, field=f, origin=s.get("origin", 0.0),
                            scale=s.get("scale", 10.0),
                            offset=s.get("offset", 0.0),
                            decay=s.get("decay", 0.5),
                            weight=fd.get("weight", 1.0)))
                        break
                else:
                    raise ValueError(f"unsupported function: {list(fd)}")
        return FunctionScore(query=from_dsl(body["query"]),
                             script=(_script_src(body["script"])
                                     if "script" in body else "score"),
                             functions=fns,
                             score_mode=body.get("score_mode", "multiply"),
                             boost_mode=body.get("boost_mode", "replace"))
    if kind == "script":
        if "script" not in body:
            raise ValueError("script query requires a nested 'script' key")
        return Script(script=_script_src(body["script"]),
                      boost=body.get("boost", 1.0))
    if kind == "script_score":
        src = _script_src(body.get("script", {}))
        return ScriptScore(query=from_dsl(body["query"]), script=src,
                           fields=tuple(body.get("fields", ())),
                           min_score=body.get("min_score"),
                           boost=body.get("boost", 1.0))
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


def resolve_field_aliases(q: Query, aliases: dict[str, str]) -> Query:
    """Field alias resolution (index/mapper/FieldAliasMapper.java): an
    ``alias`` field type is a query-time indirection — searches, aggs and
    sorts naming the alias hit its ``path`` target. Applied as a generic
    pre-execution AST rewrite: every ``field`` attribute and every name
    in a ``fields`` list maps through the alias table; sub-queries and
    clause lists recurse. Aliases never chain (the reference forbids an
    alias pointing at an alias), so one pass suffices."""
    import dataclasses

    def walk(node):
        if isinstance(node, (list, tuple)):
            out = [walk(x) for x in node]
            return type(node)(out) if isinstance(node, tuple) else out
        if not dataclasses.is_dataclass(node):
            return node
        kw = {}
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            if f.name in ("field", "inner_field") and isinstance(v, str):
                # inner_field: SpanFieldMasking reads the SIBLING field's
                # positions — an alias there must map too (round-4 review)
                v = aliases.get(v, v)
            elif f.name == "fields" and isinstance(v, (list, tuple)) \
                    and all(isinstance(x, str) for x in v):
                mapped = [aliases.get(x, x) for x in v]
                v = type(v)(mapped) if isinstance(v, tuple) else mapped
            else:
                v = walk(v)
            kw[f.name] = v
        return dataclasses.replace(node, **kw)

    return walk(q)
