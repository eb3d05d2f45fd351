"""Fetch sub-phases over the top-k hit frame.

The reference registers a fixed FetchSubPhase chain in SearchModule.java
(`createFetchSubPhases`): FetchSourcePhase (``_source`` include/exclude
filtering — search/fetch/subphase/FetchSourcePhase.java +
FetchSourceContext.java), FetchDocValuesPhase (``docvalue_fields`` —
FetchDocValuesPhase.java; text fields are rejected because they carry no
doc values), FetchFieldsPhase (``fields`` — FetchFieldsPhase.java +
FieldFetcher.java: wildcard patterns resolved against the mapping, date
fields rendered through the requested format), and ScriptFieldsPhase
(``script_fields`` — ScriptFieldsPhase.java: one scripted value per hit).

Spark-first re-expression: every sub-phase is column pruning + Catalyst
expressions over the *bounded* top-k frame broadcast-joined back to the
docs table — the same second-round-trip shape as ``Searcher.fetch``. No
phase ever touches unfetched rows; wildcard resolution happens driver-side
against the schema (it is mapping metadata, not data), so the projected
column set reaches the parquet scan (ReadSchema pruning). Scripted fields
compile through the Painless subset compiler (search/painless.py) into
whole-stage codegen — never Python.

The corpus has no date column, so — exactly like the geo/ip families — a
deterministic ``ts`` DATE is derived from doc_id (calendar-day arithmetic,
timezone-free by construction); the DuckDB oracles inline the identical
expression, making the derivation part of the gated contract.
"""

from __future__ import annotations

from fnmatch import fnmatchcase

from pyspark.sql import Column, DataFrame, functions as F

from opensearch_spark.search.painless import painless_to_sql

# Spark-SQL / DuckDB twin expressions for the derived date field: DATE
# arithmetic (not timestamp) keeps every render session-timezone-invariant
TS_SPARK_SQL = "date_add(date'2024-01-01', cast(doc_id % 365 as int))"
TS_DUCK_SQL = "(DATE '2024-01-01' + CAST(doc_id % 365 AS INT))"

# mapping metadata for the docs table (IpFieldMapper-style field types);
# ``text``/``title`` are analyzed text: no doc values in the reference
FIELD_TYPES = {
    "doc_id": "long",
    "text": "text",
    "title": "text",
    "lang": "keyword",
    "source": "keyword",
    "n_chars": "long",
    "dl": "long",
    "content_sha256": "keyword",
    "ts": "date",
}
_INTERNAL = {"dl", "content_sha256"}  # engine columns, not user fields


def with_derived(docs: DataFrame) -> DataFrame:
    """Attach the derived ``ts`` date column (the geo/ip-family trick)."""
    return docs.withColumn("ts", F.expr(TS_SPARK_SQL))


def resolve_patterns(patterns: list[str], *, docvalues: bool = False) -> list[str]:
    """Resolve field patterns against the mapping, preserving request
    order and de-duplicating (FieldFetcher.create). Unmapped patterns
    resolve to nothing — the reference skips them silently. With
    ``docvalues=True`` an *explicit* text field raises like
    FetchDocValuesPhase ("no doc values for text"); a wildcard simply
    skips text fields."""
    fields = [f for f in FIELD_TYPES if f not in _INTERNAL]
    out: list[str] = []
    for pat in patterns:
        if any(ch in pat for ch in "*?["):
            hits = [f for f in fields if fnmatchcase(f, pat)]
            if docvalues:
                hits = [f for f in hits if FIELD_TYPES[f] != "text"]
        else:
            hits = [pat] if pat in fields else []
            if docvalues and hits and FIELD_TYPES[pat] == "text":
                raise ValueError(
                    f"cannot load doc values on text field [{pat}]: "
                    "text fields are not stored as doc values "
                    "(FetchDocValuesPhase)")
        for f in hits:
            if f not in out:
                out.append(f)
    return out


def _format_col(field: str, fmt: str | None) -> Column:
    """Render one field, applying a date format where requested
    (FieldFetcher uses the mapper's DocValueFormat; format on a non-date
    field is a 400 in the reference)."""
    col = F.col(field)
    if fmt is None:
        return col
    if FIELD_TYPES[field] != "date":
        raise ValueError(
            f"field [{field}] of type [{FIELD_TYPES[field]}] does not "
            "support custom formats (FieldFetcher)")
    return F.date_format(col, fmt)


def _norm_specs(specs: list) -> list[tuple[str, str | None]]:
    """``fields``/``docvalue_fields`` accept bare strings or
    {"field": ..., "format": ...} objects (SearchSourceBuilder)."""
    out = []
    for s in specs:
        if isinstance(s, str):
            out.append((s, None))
        else:
            out.append((s["field"], s.get("format")))
    return out


def fetch_fields(docs: DataFrame, hits: DataFrame, specs: list,
                 *, docvalues: bool = False) -> DataFrame:
    """``fields`` (or ``docvalue_fields``) over the top-k frame: broadcast
    the bounded hits onto the docs table projecting exactly the resolved
    columns — the projection reaches the scan's ReadSchema."""
    docs = with_derived(docs)
    cols: list[Column] = []
    # doc_id is the join key; any column already on the hit frame (a
    # prior _source phase, a sort key) must not be emitted twice
    seen: set[str] = set(hits.columns)
    overrides: list[tuple[str, str]] = []
    for pat, fmt in _norm_specs(specs):
        for f in resolve_patterns([pat], docvalues=docvalues):
            if f == "doc_id":
                continue
            if f in seen:
                # already on the hit frame (a sort key, a prior phase):
                # don't emit twice, but DO honor a requested date format
                # by re-rendering the existing column in place
                if fmt is not None:
                    overrides.append((f, fmt))
                continue
            seen.add(f)
            cols.append(_format_col(f, fmt).alias(f))
    out = F.broadcast(hits).join(docs.select("doc_id", *cols), "doc_id")
    for f, fmt in overrides:
        out = out.withColumn(f, _format_col(f, fmt))
    return out


def source_filter(docs: DataFrame, hits: DataFrame,
                  includes: list[str] | None = None,
                  excludes: list[str] | None = None) -> DataFrame:
    """``_source`` filtering (FetchSourceContext.filter): include
    patterns select, exclude patterns veto — excludes win on overlap.
    Source filtering is pure column pruning here: the unselected columns
    never leave the parquet reader."""
    fields = [f for f in FIELD_TYPES if f not in _INTERNAL and f != "ts"]
    inc = includes if includes else ["*"]
    keep = [f for f in fields
            if any(fnmatchcase(f, p) for p in inc)
            and not any(fnmatchcase(f, p) for p in (excludes or []))]
    keep = [f for f in keep if f != "doc_id"]
    return F.broadcast(hits).join(docs.select("doc_id", *keep), "doc_id")


def script_fields(docs: DataFrame, hits: DataFrame,
                  scripts: dict[str, dict]) -> DataFrame:
    """``script_fields``: each entry {name: {script: {source, params}}}
    compiles through the Painless subset compiler to one Catalyst
    expression per hit (ScriptFieldsPhase runs the script per fetched
    doc; here it is a codegen projection over the joined top-k)."""
    docs = with_derived(docs)
    # hit frames may already carry doc columns (a prior _source phase):
    # drop the docs-side duplicates so references stay unambiguous — the
    # surviving hits-side copy holds the identical value
    dup = [c for c in docs.columns
           if c != "doc_id" and c in set(hits.columns)]
    if dup:
        docs = docs.drop(*dup)
    cols = []
    for name, spec in scripts.items():
        script = spec.get("script", spec)
        sql = painless_to_sql(script["source"], script.get("params"))
        cols.append(F.expr(sql).alias(name))
    joined = F.broadcast(hits).join(docs, "doc_id")
    return joined.select(*[F.col(c) for c in hits.columns], *cols)


def apply_indices_boost(legs: dict[str, DataFrame],
                        boosts: dict[str, float], k: int) -> DataFrame:
    """``indices_boost`` (SearchSourceBuilder.indexBoosts → QueryPhase
    applies the per-index factor before the coordinator merge): each
    index's bounded top-k is scaled by its boost, then merge-sorted into
    the global top-k tagged with ``_index``. Wildcard patterns match
    index names; the first matching pattern wins (reference semantics:
    ObjectFloatHashMap first-write)."""
    out = None
    for idx, frame in legs.items():
        boost = 1.0
        for pat, b in boosts.items():
            if fnmatchcase(idx, pat):
                boost = float(b)
                break
        leg = frame.select(
            F.lit(idx).alias("_index"), "doc_id",
            (F.col("score") * F.lit(boost)).alias("score"))
        out = leg if out is None else out.unionByName(leg)
    assert out is not None, "indices_boost requires at least one leg"
    return out.orderBy(F.desc("score"), "_index", "doc_id").limit(k)
