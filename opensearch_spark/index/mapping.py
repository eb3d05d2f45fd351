"""Dynamic mapping inference (DocumentParser.java / the `_mapping` API).

The reference infers a field type the first time a document introduces
the field (DocumentParser.java:65,229 — dynamic type detection: boolean,
long, double, date-detection on strings, object recursion, else text)
and rejects later conflicting values. Re-expressed as a distributed
corpus operation: parse every document's JSON generically into (key,
value-string) pairs, detect each value's type with the reference's
detection order, then aggregate per key — per-type counts plus a
resolved mapping type (numeric widening long→double, exactly the
reference's coercion; any incompatible mix degrades to text, surfacing
what the reference would have thrown as a mapper conflict).

One deliberate divergence: the generic map parse erases the JSON
string-vs-scalar distinction, so a QUOTED "123" / "true" classifies as
long/boolean — i.e. this implements the reference with
``numeric_detection: true`` (DocumentParser's opt-in string coercion);
with the default ``numeric_detection: false`` the reference would map
those as text. The DuckDB oracle shares the same posture by
construction (json_extract_string also strips quotes).

Scale design: from_json(map<string,string>) + explode + regexp CASE is
all whole-stage codegen (no UDF); the per-key aggregation is ONE
hash-shuffle groupBy with map-side partial aggregation — key cardinality
(the mapping size) is tiny, so the shuffle is negligible at 100 TB. The
same generic-map parse is what Spark's own schema inference does in a
first pass over JSON sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# detection order (DocumentParser dynamic detection): boolean, long,
# double, date (date_detection default format yyyy-MM-dd), object,
# array, else text
TYPE_RULES = [
    ("boolean", r"^(true|false)$"),
    ("long", r"^-?\d+$"),
    # decimal point OR bare exponent ('1e5' — Spark's generic map parse
    # preserves the raw token while DuckDB normalizes it to '100000.0';
    # both forms must classify double for engine/oracle parity)
    ("double", r"^-?\d+(\.\d+([eE][+-]?\d+)?|[eE][+-]?\d+)$"),
    ("date", r"^\d{4}-\d{2}-\d{2}$"),
    ("object", r"^\{"),
    ("array", r"^\["),
]
TYPES = [t for t, _ in TYPE_RULES] + ["text"]


def detect_type_col(value: F.Column) -> F.Column:
    expr = None
    for tname, pat in TYPE_RULES:
        cond = value.rlike(pat)
        expr = F.when(cond, tname) if expr is None else expr.when(cond, tname)
    return expr.otherwise("text")


def detect_type_sql(value: str = "value") -> str:
    cases = " ".join(
        f"WHEN regexp_matches({value}, '{pat}') THEN '{t}'"
        for t, pat in TYPE_RULES)
    return f"CASE {cases} ELSE 'text' END"


_RESOLVE_SQL = """CASE
  WHEN n_text > 0 THEN 'text'
  WHEN n_object > 0 AND n_object = n_vals THEN 'object'
  WHEN n_array > 0 AND n_array = n_vals THEN 'array'
  WHEN n_date > 0 AND n_date = n_vals THEN 'date'
  WHEN n_boolean > 0 AND n_boolean = n_vals THEN 'boolean'
  WHEN n_long + n_double = n_vals AND n_double > 0 THEN 'double'
  WHEN n_long = n_vals THEN 'long'
  ELSE 'text' END"""


def infer_mapping(df: DataFrame, json_col: str = "doc") -> DataFrame:
    """(key, resolved_type, per-type counts, n_vals) — the dynamic
    mapping the reference would build, plus the evidence for it."""
    kv = df.select(
        F.explode(F.from_json(json_col, "map<string,string>"))
        .alias("key", "value"))
    typed = kv.where(F.col("value").isNotNull()).withColumn(
        "t", detect_type_col(F.col("value")))
    aggs = [F.sum(F.when(F.col("t") == t, 1).otherwise(0))
            .cast("long").alias(f"n_{t}") for t in TYPES]
    out = (typed.groupBy("key")
           .agg(*aggs, F.count("*").cast("long").alias("n_vals")))
    return out.withColumn("resolved_type", F.expr(_RESOLVE_SQL)).select(
        "key", "resolved_type", *[f"n_{t}" for t in TYPES], "n_vals")


def infer_mapping_sql(docs_cte: str) -> str:
    """The identical inference as DuckDB SQL; ``docs_cte`` must yield a
    column ``doc`` of JSON text."""
    count_cols = ", ".join(
        f"CAST(sum(CASE WHEN t = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in TYPES)
    sel_cols = ", ".join(f"n_{t}" for t in TYPES)
    return f"""
WITH docs AS ({docs_cte}),
keys AS (SELECT doc, unnest(json_keys(doc)) AS key FROM docs),
kv AS (SELECT key,
              -- quote the key inside the JSON path so metacharacters
              -- ('.', '[') extract the literal key like the Spark
              -- map<string,string> side does (round-4 review)
              json_extract_string(
                  doc, '$."' || replace(key, '"', '\\"') || '"') AS value
       FROM keys),
typed AS (SELECT key, {detect_type_sql('value')} AS t
          FROM kv WHERE value IS NOT NULL),
agg AS (SELECT key, {count_cols}, CAST(count(*) AS BIGINT) AS n_vals
        FROM typed GROUP BY key)
SELECT key, {_RESOLVE_SQL} AS resolved_type, {sel_cols}, n_vals
FROM agg ORDER BY key
"""


# --------------------------------------------------------------------------
# derived JSON documents (corpus events.props has one fixed int key, too
# uniform to exercise inference — the geo/ip/ua derivation precedent)
# --------------------------------------------------------------------------

def derived_doc_expr():
    """A deterministic JSON doc per event: four shapes sharing the
    'count' key with long/double values (widening), plus name/active/
    when/nested/tags — exercising every detection rule."""
    eid = F.col("event_id")
    i = (eid % 1000).cast("string")
    d = F.concat(((eid % 90) + 10).cast("string"), F.lit("."),
                 ((eid % 9) + 1).cast("string"))
    day = F.lpad(((eid % 28) + 1).cast("string"), 2, "0")
    uid = F.col("user_id").cast("string")
    shapes = [
        F.concat(F.lit('{"count": '), i, F.lit(', "name": "u'), uid,
                 F.lit('", "active": true}')),
        F.concat(F.lit('{"count": '), d, F.lit(', "when": "2024-01-'), day,
                 F.lit('", "name": "x"}')),
        F.concat(F.lit('{"nested": {"depth": '), i,
                 F.lit('}, "active": false}')),
        F.concat(F.lit('{"tags": ["a", "b'), i, F.lit('"], "count": '), i,
                 F.lit("}")),
    ]
    expr = F.when(eid % 4 == 0, shapes[0])
    for j in range(1, 4):
        expr = expr.when(eid % 4 == j, shapes[j])
    return expr


def with_size_field(df, string_cols: list[str],
                    fixed_cols: list[str] = ()):
    """mapper-size plugin: the ``_size`` metadata field
    (MapperSizePlugin → SizeFieldMapper.java stores source.length() as an
    indexed long so documents can be filtered/sorted/aggregated by size).

    The reference measures the raw JSON ``_source`` envelope; our
    _source is a parquet row, so the columnar equivalent is
    _size = Σ octet_length(string fields) + 8 bytes per fixed-width
    numeric field. Pure codegen (octet_length + adds) — at 100 TB this
    is a free projection on the ingest scan, and the resulting long
    column range-filters with ordinary parquet min/max pruning, exactly
    what SizeFieldMapper's LongPoint buys Lucene."""
    size = F.lit(8 * len(list(fixed_cols)))
    for c in string_cols:
        # NULL strings contribute 0 bytes — one NULL column must not
        # NULL the whole _size and vanish the doc from every size
        # filter/sort (round-4 review; SizeFieldMapper always stores)
        size = size + F.coalesce(F.octet_length(F.col(c)), F.lit(0))
    return df.withColumn("_size", size.cast("long"))


DERIVED_DOC_SQL = """CASE
  WHEN event_id % 4 = 0 THEN concat('{"count": ', CAST(event_id % 1000 AS STRING),
       ', "name": "u', CAST(user_id AS STRING), '", "active": true}')
  WHEN event_id % 4 = 1 THEN concat('{"count": ', CAST((event_id % 90) + 10 AS STRING),
       '.', CAST((event_id % 9) + 1 AS STRING), ', "when": "2024-01-',
       lpad(CAST((event_id % 28) + 1 AS STRING), 2, '0'), '", "name": "x"}')
  WHEN event_id % 4 = 2 THEN concat('{"nested": {"depth": ', CAST(event_id % 1000 AS STRING),
       '}, "active": false}')
  ELSE concat('{"tags": ["a", "b', CAST(event_id % 1000 AS STRING),
       '"], "count": ', CAST(event_id % 1000 AS STRING), '}')
  END"""


# ---------------------------------------------------------------------------
# Query-time mapping rewrites: field aliases + constant_keyword
# (FieldAliasMapper.java:52-104, ConstantKeywordFieldMapper.java:35-160,
# ConstantFieldType.java:74-140)
# ---------------------------------------------------------------------------

def simple_match(pattern: str, value: str, case_insensitive: bool = False) -> bool:
    """Regex.simpleMatch semantics (org.opensearch.common.regex.Regex):
    ``*`` is the only wildcard — ``?`` is a literal character (the
    reference's ConstantFieldType routes wildcardQuery through
    simpleMatch, so a ``?`` in a wildcard query on a constant_keyword
    field matches only a literal '?', faithfully reproduced here)."""
    if case_insensitive:
        pattern, value = pattern.lower(), value.lower()
    parts = pattern.split("*")
    if len(parts) == 1:
        return value == pattern
    if not value.startswith(parts[0]):
        return False
    pos = len(parts[0])
    for mid in parts[1:-1]:
        i = value.find(mid, pos)
        if i < 0:
            return False
        pos = i + len(mid)
    last = parts[-1]
    return len(value) - pos >= len(last) and value.endswith(last)


def resolve_constant_fields(q, constants: dict):
    """constant_keyword query rewrite: a leaf on a constant_keyword field
    folds to MatchAll/MatchNone at rewrite time, never touching per-doc
    storage — exactly the reference's ConstantFieldType.termQuery /
    wildcardQuery / prefixQuery (matches via Regex.simpleMatch; prefix
    appends ``*``; exists is always MatchAll) with the leaf's boost
    preserved on the fold. Pure dataclass surgery ahead of planning: the
    matching branch plans byte-identically to the query without the
    constant leaf, the mismatching branch to an empty relation — zero
    run-time cost at any corpus size. (Alias indirection is the separate
    pre-pass ``queries.resolve_field_aliases``.)
    """
    import dataclasses as _dc

    from opensearch_spark.search import queries as Q

    def fold(leaf, const_val: str):
        boost = getattr(leaf, "boost", 1.0)
        if isinstance(leaf, Q.Exists):
            return Q.MatchAll(boost=boost)
        if isinstance(leaf, Q.Term):
            # termQuery routes through matches() -> Regex.simpleMatch
            # unconditionally, so a '*' in a term VALUE is a wildcard on a
            # constant field (reference quirk, reproduced)
            ok = simple_match(str(leaf.value), const_val,
                              getattr(leaf, "case_insensitive", False))
        elif isinstance(leaf, Q.Match):
            # a match query on a keyword-family field delegates to the
            # type's termQuery (this engine's executor does the same
            # Match->Term degeneration on keyword columns)
            ok = simple_match(str(leaf.text), const_val)
        elif isinstance(leaf, Q.Terms):
            # termsQuery is a disjunction of matches() calls
            # (ConstantFieldType.java:104-113) — each value gets the same
            # simpleMatch treatment, always case-sensitive
            ok = any(simple_match(str(v), const_val) for v in leaf.values)
        elif isinstance(leaf, Q.Prefix):
            ok = simple_match(str(leaf.value) + "*", const_val,
                              getattr(leaf, "case_insensitive", False))
        elif isinstance(leaf, Q.Wildcard):
            ok = simple_match(str(leaf.value), const_val,
                              getattr(leaf, "case_insensitive", False))
        else:
            raise ValueError(
                f"{type(leaf).__name__} is not supported on a "
                "constant_keyword field (ConstantFieldType implements "
                "term/terms/match/prefix/wildcard/exists only)")
        return Q.MatchAll(boost=boost) if ok else Q.MatchNone(boost=boost)

    def walk(node):
        if isinstance(node, list):
            out = [walk(n) for n in node]
            # preserve identity when nothing folded so the parent's
            # `w is not v` fast path actually triggers for containers
            return node if all(a is b for a, b in zip(out, node)) else out
        if not _dc.is_dataclass(node) or isinstance(node, type):
            return node
        changes = {}
        for f in _dc.fields(node):
            v = getattr(node, f.name)
            if isinstance(v, (list, Q.Query)) or _dc.is_dataclass(v):
                w = walk(v)
                if w is not v:
                    changes[f.name] = w
        out = _dc.replace(node, **changes) if changes else node
        fld = getattr(out, "field", None)
        if isinstance(fld, str) and fld in constants:
            return fold(out, str(constants[fld]))
        return out

    return walk(q)
