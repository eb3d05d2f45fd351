"""annotated_text field type (plugins/mapper-annotated-text).

AnnotatedTextFieldMapper.java:190-240 parses markdown-like markup —
``"New mayor is [John Smith](type=person&value=John%20Smith)"`` with
pattern ``\\[([^]\\[]*)]\\(([^)(]*)\\)`` (AnnotatedTextFieldMapper.java:200)
— into (a) the plain text with markup stripped and (b) annotation values
injected as extra tokens at the position of the covered text, so a query
can match either the visible words or the annotation value.

The corpus has no markup, so the annotated source is DERIVED (the
geo/ip/ua precedent): an annotated mention ``[<source>](entity=
<source>_<lang>)`` is prepended to ``text`` — the shape of the
reference's own doc example. The PARSE is the real operator: the
reference's exact markdown regex strips ALL markup back to plain text
and the first annotation value is extracted and queryable as a term.
Code text that happens to contain markup-shaped substrings (``a[i](x)``)
is parsed as annotations too — exactly what the reference's parser does
with that input, so the engine and the oracle agree by shared semantics,
not by special-casing.

Scale: derivation, strip, and extraction are regexp_replace /
regexp_extract projections — whole-stage codegen, no UDFs, no shuffle.
An annotation-term query is a pushable equality filter on the extracted
column; with the annotation indexed (the engine's normal build path) it
is a postings lookup like any other term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# AnnotatedTextFieldMapper.java:200 — the exact markdown pattern
MARKDOWN_RE = r"\[([^]\[]*)]\(([^)(]*)\)"


def with_annotated(docs: DataFrame) -> DataFrame:
    """Derive the markup source: prepend an annotated mention of the
    doc's source, ``[src3](entity=src3_en) <text>``."""
    return docs.withColumn(
        "annotated",
        F.concat(F.lit("["), F.col("source"), F.lit("](entity="),
                 F.col("source"), F.lit("_"), F.col("lang"), F.lit(") "),
                 F.col("text")))


def annotated_sql_cte(table: str = "documents") -> str:
    """The identical derivation as a DuckDB CTE body (oracle side)."""
    return (f"SELECT doc_id, text, source, lang, "
            f"concat('[', source, '](entity=', source, '_', lang, ') ', text)"
            f" AS annotated FROM {table}")


def parse_annotated(df: DataFrame, col: str = "annotated") -> DataFrame:
    """AnnotatedText.parse: markup-stripped plain text, the first
    annotation's value ('key=value' → value), and the total count of
    annotations found (the prepended one plus any markup-shaped
    substrings already in the text)."""
    c = F.col(col)
    return (df
            .withColumn("plain", F.regexp_replace(c, MARKDOWN_RE, "$1"))
            .withColumn("anno",
                        F.regexp_extract(
                            F.regexp_extract(c, MARKDOWN_RE, 2),
                            r"entity=(.*)", 1))
            .withColumn("n_annos",
                        F.size(F.regexp_extract_all(c, F.lit(MARKDOWN_RE), 0))
                        .cast("long")))


def parse_annotated_sql(col: str = "annotated") -> str:
    """The identical parse as DuckDB SELECT fragments. DuckDB backrefs
    are \\1-style (RE2) where Spark's are $1 — the only dialect split."""
    return (f"regexp_replace({col}, '{MARKDOWN_RE}', '\\1', 'g') AS plain, "
            f"regexp_extract(regexp_extract({col}, '{MARKDOWN_RE}', 2),"
            f" 'entity=(.*)', 1) AS anno, "
            f"CAST(len(regexp_extract_all({col}, '{MARKDOWN_RE}', 0)) AS BIGINT)"
            f" AS n_annos")
