"""Derived fields — script-defined fields queryable at search time.

Reference: ``index/mapper/DerivedFieldMapper.java`` + ``DerivedField.java``
(mapping / search-request ``derived`` section), ``DerivedFieldSupportedTypes
.java`` (boolean/date/double/long/keyword/ip/geo_point),
``index/query/DerivedFieldQuery.java`` (executes the inner query per doc by
materializing the scripted value into a single-doc Lucene MemoryIndex), and
``script/DerivedFieldScript.java`` (the emit() script contract).

Spark-first re-expression: a derived field is one Catalyst column — the
script compiles through the Painless subset compiler and is cast to the
declared mapping type. Queries/aggregations/sorts over it are ordinary
DataFrame ops; Catalyst collapses the projection into the scan's
whole-stage-codegen stage, so where the reference pays a per-document
MemoryIndex build + query execution (its documented performance caveat),
this pays one fused vectorized expression over the column batch — the
derived column is never materialized to storage, exactly like the
reference's index-time-nothing / query-time-everything contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from opensearch_spark.search.painless import painless_to_sql

# DerivedFieldSupportedTypes → Spark cast targets. ip and geo_point are
# covered by the dedicated ipfield/geo modules' derivation helpers.
SUPPORTED_TYPES = {
    "boolean": "boolean",
    "date": "date",
    "double": "double",
    "long": "long",
    "keyword": "string",
}


def with_derived_fields(docs: DataFrame, derived: dict) -> DataFrame:
    """Attach the ``derived`` mapping section: {name: {"type": ...,
    "script": {"source": ..., "params": ...} | str}}. Each script
    compiles to one Catalyst expression cast to the declared type;
    unsupported types raise like DerivedFieldSupportedTypes.getFieldMapper
    (IllegalArgumentException for unknown types)."""
    out = docs
    for name, spec in derived.items():
        ftype = spec.get("type")
        if ftype not in SUPPORTED_TYPES:
            raise ValueError(
                f"derived field [{name}]: unsupported type [{ftype}] "
                f"(DerivedFieldSupportedTypes: {sorted(SUPPORTED_TYPES)})")
        if name in docs.columns:
            # the reference rejects a derived field shadowing a mapped
            # field; withColumn would silently REPLACE the physical
            # column for every downstream consumer (round-4 review)
            raise ValueError(
                f"derived field [{name}] conflicts with an existing "
                "column — derived fields cannot shadow mapped fields")
        script = spec["script"]
        if isinstance(script, str):
            script = {"source": script}
        sql = painless_to_sql(script["source"], script.get("params"))
        expr = F.expr(sql)
        if ftype == "date":
            # DerivedFieldScript's date contract emits epoch MILLIS —
            # Spark refuses a numeric→date cast, so route numerics
            # through timestamp_millis (strings/timestamps cast direct;
            # round-4 review: conforming long scripts crashed)
            dtype = out.select(expr.alias("_probe")).schema[0] \
                .dataType.simpleString()
            if dtype in ("bigint", "int", "smallint", "tinyint",
                         "double", "float", "decimal"):
                expr = F.timestamp_millis(expr.cast("long"))
        out = out.withColumn(name, expr.cast(SUPPORTED_TYPES[ftype]))
    return out
