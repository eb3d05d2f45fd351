"""Auxiliary reference APIs: _analyze, _validate/query, _search/template.

- ``analyze_api`` — ``TransportAnalyzeAction.java`` (indices/analyze):
  run an analyzer over text and return the token stream with positions.
  Spark-first: the analyzer is the same vectorized Arrow UDF the index
  build uses (identical-by-construction analysis), applied over a column
  — so the API doubles as a bulk token-stream inspector over any corpus
  slice, not just one string.
- ``validate_query`` — ``ValidateQueryAction`` / ``TransportValidateQueryAction.java``:
  parse a query-DSL body, report (valid, explanation) with the rewritten
  query rendered Lucene-explain-style; invalid bodies return the parse
  error instead of raising.
- ``render_search_template`` — ``script/mustache`` search templates
  (``TransportSearchTemplateAction``): ``{{param}}`` substitution into a
  JSON source, then the normal DSL parse. Only the interpolation subset
  of mustache (the overwhelmingly common case) — no sections/partials.
"""
from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from opensearch_spark.analysis.analyzer import analyze_udf
from opensearch_spark.search import queries as Q


def analyze_api(df: DataFrame, text_col: str, analyzer: str = "standard") -> DataFrame:
    """Token stream per row: (<id cols>, position, token) — the _analyze
    API over a column. Positions are the analyzer's (post-split) positions,
    as the index build records them — the same vectorized UDF chain, so
    API output and indexed tokens agree by construction."""
    toks = analyze_udf(analyzer)
    other = [c for c in df.columns if c != text_col]
    return (df.select(*other, F.posexplode(toks(F.col(text_col)))
                      .alias("position", "token")))


def _render_query(q) -> str:
    """Lucene-ish explain rendering of a parsed AST (ValidateQuery's
    `explanation` field analog)."""
    if isinstance(q, Q.Match):
        return " ".join(f"{q.field}:{t}" for t in q.text.split())
    if isinstance(q, Q.Term):
        return f"{q.field}:{q.value}"
    if isinstance(q, Q.Bool):
        parts = []
        parts += [f"+{_render_query(c)}" for c in q.must]
        parts += [_render_query(c) for c in q.should]
        parts += [f"-{_render_query(c)}" for c in q.must_not]
        parts += [f"#{_render_query(c)}" for c in q.filter]
        return " ".join(parts)
    return type(q).__name__


def validate_query(spark: SparkSession, bodies: dict[str, dict]) -> DataFrame:
    """One row per query body: (query_id, valid, explanation)."""
    rows = []
    for qid, body in bodies.items():
        try:
            ast = Q.from_dsl(body)
            rows.append((qid, True, _render_query(ast)))
        except (ValueError, KeyError, TypeError) as ex:
            rows.append((qid, False, f"parse_error: {ex}"))
    return spark.createDataFrame(
        rows, "query_id string, valid boolean, explanation string")


_PARAM = re.compile(r"\{\{\s*([a-zA-Z0-9_]+)\s*\}\}")


def render_search_template(source: str, params: dict) -> dict:
    """Substitute {{param}} placeholders (JSON-escaped for strings) and
    parse the result as a query body. Unknown params raise ValueError
    (the reference renders empty — failing loudly is safer in pipelines)."""
    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise ValueError(f"search template: missing param {name!r}")
        v = params[name]
        if isinstance(v, str):
            # JSON-escape the string BODY (no surrounding quotes — the
            # template supplies those): a raw quote/backslash/newline
            # would otherwise break the JSON or inject structure
            return json.dumps(v)[1:-1]
        # non-strings render as JSON literals (true, 3.5, [..]), never
        # Python reprs (True / single-quoted dicts are invalid JSON)
        return json.dumps(v)

    return json.loads(_PARAM.sub(sub, source))


def painless_execute(spark: SparkSession, source: str,
                     params: dict | None = None,
                     context: str = "painless_test",
                     document: dict | None = None):
    """``_scripts/painless/_execute`` (rest-api-spec
    ``scripts_painless_execute.json``; modules/lang-painless
    ``PainlessExecuteAction.java``): compile and run a script outside any
    index. The three reference contexts:

    - ``painless_test`` — script of params only, result returned as-is;
    - ``filter`` — boolean predicate over a caller-provided document;
    - ``score`` — double over a caller-provided document.

    The script compiles through the same Painless→Catalyst path the
    query engine uses (search/painless.py), evaluated against a one-row
    frame built from ``document`` — the reference likewise indexes the
    provided doc into an ephemeral single-doc shard. Returns the scalar
    result (bool for filter, float for score)."""
    from opensearch_spark.search.painless import painless_to_sql
    expr = painless_to_sql(source, params or {})
    if document:
        import pandas as pd

        row = spark.createDataFrame(pd.DataFrame([document]))
    else:
        row = spark.range(1)
    out = row.select(F.expr(expr).alias("result"))
    if context == "filter":
        out = out.select(F.col("result").cast("boolean").alias("result"))
    elif context == "score":
        out = out.select(F.col("result").cast("double").alias("result"))
    elif context != "painless_test":
        raise ValueError(f"painless_execute: unknown context {context!r}")
    return out.collect()[0]["result"]


class AliasRegistry:
    """Index aliases (`_aliases` API; AliasMetadata / IndicesAliasesRequest):
    alias → list of (index_name, searcher, optional filter query).

    A filtered alias rewrites every search against it into
    ``bool(must=[q], filter=[alias_filter])`` — the reference applies the
    alias filter in filter context (no score contribution), and a
    multi-index alias fans out per index and merge-sorts the bounded
    per-index top-k exactly like an index-pattern search."""

    def __init__(self):
        self._aliases: dict[str, list[tuple]] = {}

    def put(self, alias: str, searcher, flt=None, index_name: str = "index"):
        self._aliases.setdefault(alias, []).append((index_name, searcher, flt))
        return self

    def indices(self, alias: str) -> list[str]:
        return [name for name, _, _ in self._aliases[alias]]

    def search(self, alias: str, q, k: int = 10, **kw) -> DataFrame:
        """(_index, doc_id, score) global top-k across the alias targets."""
        outs = []
        for name, searcher, flt in self._aliases[alias]:
            eff = Q.Bool(must=[q], filter=[flt]) if flt is not None else q
            hits = searcher.search(eff, k=k, **kw)
            outs.append(hits.select(F.lit(name).alias("_index"),
                                    "doc_id", "score"))
        merged = outs[0]
        for o in outs[1:]:
            merged = merged.unionByName(o)
        return merged.orderBy(F.desc("score"), "_index", "doc_id").limit(k)


def track_total_hits(matching: DataFrame, n: int | bool = 10_000):
    """``track_total_hits`` (TopDocsCollectorContext.createTotalHitCount
    Collector / rest layer's ``TotalHits.Relation``): counting stops at
    the threshold — a total ≤ n reports (total, "eq"), beyond it reports
    (n, "gte"). ``True`` means exact (track fully), ``False`` the default
    10k threshold.

    Spark-first: ``limit(n+1).count()`` — the scan short-circuits once
    n+1 rows are produced (CollectLimit), so the cost is bounded by the
    threshold, not the corpus, exactly the reference's early-termination
    contract. Returns (value, relation).
    """
    if n is True:
        return int(matching.count()), "eq"
    n = 10_000 if n is False else int(n)
    c = matching.limit(n + 1).count()
    if c <= n:
        return c, "eq"
    return n, "gte"


# --- stored scripts (_scripts API) ---------------------------------------
# PutStoredScriptRequest / StoredScriptSource.java: the cluster state keeps
# {id -> (lang, source)}; a request-time Script carries ScriptType.STORED
# with an `id` and its OWN `params` (params are never stored —
# Script.java's stored-script parse rejects them). Here the "cluster
# state" is a process-level registry; scripts validate at put time by
# compiling (the reference compiles into the script cache on put).
_STORED_SCRIPTS: dict[str, dict] = {}


def put_stored_script(script_id: str, source: str,
                      lang: str = "painless") -> None:
    """Store {id: {lang, source}}, validating compilable langs by
    compiling them now (put-time failure, like the reference's
    ScriptService.putStoredScript compile check)."""
    if lang in ("painless", "expression"):
        from opensearch_spark.search.painless import (_AnyParams, _lex,
                                                      _Parser,
                                                      expression_to_sql)

        if lang == "expression":
            # the expression adapter needs params as a permissive map
            # too: bare variables bind as params at put time
            expression_to_sql(source, _AnyParams(), "score")
        else:
            # parser invoked directly: painless_to_sql would dict()-copy
            # the permissive mapping back into a strict one
            _Parser(_lex(source), _AnyParams(), "score").parse()
    _STORED_SCRIPTS[script_id] = {"lang": lang, "source": source}


def get_stored_script(script_id: str) -> dict:
    try:
        return _STORED_SCRIPTS[script_id]
    except KeyError:
        raise KeyError(f"stored script not found: {script_id!r}") from None


def delete_stored_script(script_id: str) -> None:
    _STORED_SCRIPTS.pop(script_id, None)
