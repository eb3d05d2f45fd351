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


def hybrid_search(
    searcher,
    queries: list,
    k: int = 10,
    top_n: int = 50,
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
    weights: list[float] | None = None,
    round_scores: int | None = None,
) -> DataFrame:
    """Hybrid query + normalization processor (the search-pipeline
    normalization processor: per-sub-query score normalization, then
    weighted combination — the mechanism behind lexical+semantic hybrid
    ranking).

    Each sub-query contributes its bounded top-``top_n`` hits; scores
    normalize per sub-query (``min_max``: (s-min)/(max-min) with the min
    hit clamped to 0.001 — the reference's MIN_SCORE — and single-score
    lists → 1.0; ``l2``: s/√Σs²), then combine per doc with missing
    sub-query scores as 0: ``arithmetic_mean`` Σwᵢsᵢ/Σw, or
    ``geometric_mean`` / ``harmonic_mean`` (docs missing any sub-query →
    0 under both, the zero-annihilation the means imply).

    Scale shape: every frame after the sub-searches is ≤ top_n rows —
    the normalizing aggregates and the outer joins are driver-trivial
    regardless of corpus size; the corpus cost is exactly the N
    sub-searches."""
    ws = list(weights or [1.0] * len(queries))
    if len(ws) != len(queries):
        raise ValueError("weights must match queries")
    frames = []
    for i, q in enumerate(queries):
        h = searcher.search(q, k=top_n, round_scores=6) \
            .select("doc_id", F.col("score").alias(f"_s{i}"))
        if normalization == "min_max":
            agg = h.agg(F.min(f"_s{i}").alias("_mn"),
                        F.max(f"_s{i}").alias("_mx"))
            # the sub-query's min-scoring hit clamps to MIN_SCORE=0.001,
            # not 0 (reference MinMaxScoreNormalizationTechnique): under
            # geometric/harmonic combination an exact 0 would annihilate
            # a doc that matched EVERY sub-query, making it
            # indistinguishable from one missing a leg entirely
            h = (h.crossJoin(F.broadcast(agg))
                 .withColumn(
                     f"_s{i}",
                     F.when(F.col("_mx") == F.col("_mn"), F.lit(1.0))
                     .when(F.col(f"_s{i}") == F.col("_mn"), F.lit(0.001))
                     .otherwise((F.col(f"_s{i}") - F.col("_mn"))
                                / (F.col("_mx") - F.col("_mn"))))
                 .drop("_mn", "_mx"))
        elif normalization == "l2":
            agg = h.agg(F.sqrt(F.sum(F.col(f"_s{i}") ** 2)).alias("_l2"))
            h = (h.crossJoin(F.broadcast(agg))
                 .withColumn(f"_s{i}", F.col(f"_s{i}") / F.col("_l2"))
                 .drop("_l2"))
        else:
            raise ValueError(f"unknown normalization: {normalization}")
        frames.append(h)
    out = frames[0]
    for h in frames[1:]:
        out = out.join(h, "doc_id", "full_outer")
    cols = [F.coalesce(F.col(f"_s{i}"), F.lit(0.0)) for i in range(len(ws))]
    wsum = float(sum(ws))
    if combination == "arithmetic_mean":
        score = sum((w * c for w, c in zip(ws, cols)), F.lit(0.0)) / wsum
    elif combination == "geometric_mean":
        prod = cols[0] ** F.lit(ws[0])
        for w, c in zip(ws[1:], cols[1:]):
            prod = prod * (c ** F.lit(w))
        score = prod ** F.lit(1.0 / wsum)
    elif combination == "harmonic_mean":
        any_zero = cols[0] == 0
        for c in cols[1:]:
            any_zero = any_zero | (c == 0)
        denom = sum((F.lit(w) / c for w, c in zip(ws[1:], cols[1:])),
                    F.lit(ws[0]) / cols[0])
        score = F.when(any_zero, F.lit(0.0)).otherwise(F.lit(wsum) / denom)
    else:
        raise ValueError(f"unknown combination: {combination}")
    out = out.select("doc_id", score.alias("score"))
    if round_scores is not None:
        out = out.withColumn("score", F.round("score", round_scores))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
