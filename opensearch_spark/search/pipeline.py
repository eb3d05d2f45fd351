"""Search pipelines (SURVEY §2.10): request/response processors.

Reference: ``modules/search-pipeline-common/.../SearchPipelineCommonModulePlugin
.java:37-55`` registers request processors (``filter_query``, ``script``,
``oversample``) and response processors (``rename_field``, ``truncate_hits``,
``collapse``). In Spark these are plan rewrites: request processors transform
the query AST / k before execution; response processors transform the hits
DataFrame after.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Window as W

from opensearch_spark.search import queries as Q


@dataclass
class FilterQueryProcessor:
    """filter_query: AND an extra filter into every request."""

    filter: Q.Query

    def process_request(self, query: Q.Query, k: int) -> tuple[Q.Query, int]:
        return Q.Bool(must=[query], filter=[self.filter]), k


@dataclass
class OversampleProcessor:
    """oversample: multiply requested size (to feed collapse/rerank)."""

    sample_factor: float = 2.0

    def process_request(self, query: Q.Query, k: int) -> tuple[Q.Query, int]:
        return query, int(k * self.sample_factor)


@dataclass
class CollapseProcessor:
    """collapse response processor: keep best hit per key."""

    field: str

    def process_response(self, hits: DataFrame, searcher) -> DataFrame:
        docs = searcher.index.docs(searcher.spark).select("doc_id", self.field)
        w = W.partitionBy(self.field).orderBy(F.desc("score"), F.asc("doc_id"))
        return (hits.join(docs, "doc_id")
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn"))


@dataclass
class TruncateHitsProcessor:
    """truncate_hits: cap the response size."""

    target_size: int

    def process_response(self, hits: DataFrame, searcher) -> DataFrame:
        return (hits.orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(self.target_size))


@dataclass
class RenameFieldProcessor:
    field: str
    target_field: str

    def process_response(self, hits: DataFrame, searcher) -> DataFrame:
        return hits.withColumnRenamed(self.field, self.target_field)


class SearchPipeline:
    """Ordered processor chain around ``Searcher.search``."""

    def __init__(self, processors: list):
        self.processors = processors

    def search(self, searcher, query: Q.Query, k: int = 10,
               mode: str = "auto", round_scores: int | None = None) -> DataFrame:
        for p in self.processors:
            if hasattr(p, "process_request"):
                query, k = p.process_request(query, k)
        hits = searcher.search(query, k=k, mode=mode, round_scores=round_scores)
        for p in self.processors:
            if hasattr(p, "process_response"):
                hits = p.process_response(hits, searcher)
        return hits
