"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship query (BM25 top-10 via the block-max-WAND engine)
               over the sf0.001 documents table.
``queries``  — one entry per implemented operator from SURVEY.md §2
               (full-text search, aggregations, joins, ingest functions,
               dedup/similarity/text-analysis pipeline ops).
``oracle_sql`` — DuckDB twins; keys without an oracle are genuinely
               non-SQL-expressible (LSH probing, engine-internal paths) and
               get the driver's rows-only check; their semantics are
               verified in tests/ against brute-force baselines instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 match query with block-max WAND over sf0.001."""
    from opensearch_spark.entry_queries import get_searcher
    from opensearch_spark.search import Match

    s = get_searcher(spark, "/root/testdata/sf0.001")
    return s.search(
        Match(field="text", text="spark table merge"), k=10, mode="wand",
        round_scores=4,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from opensearch_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from opensearch_spark.entry_queries import ORACLES

    return dict(ORACLES)
