"""Rank evaluation (SURVEY §2.4): Precision@K / Recall@K / MRR / DCG.

Reference: ``modules/rank-eval/src/main/java/org/opensearch/index/rankeval/
{PrecisionAtK,RecallAtK,MeanReciprocalRank,DiscountedCumulativeGain}.java``.
The metrics operate on a ranked hits frame (doc_id, rank) joined against a
relevance frame (doc_id, relevant/grade) — pure DataFrame aggregation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def with_ranks(hits: DataFrame) -> DataFrame:
    """Attach 1-based rank to a top-k frame already ordered by
    (score desc, doc_id asc) — deterministic, no window over the corpus."""
    rows = hits.select("doc_id").collect()
    spark = hits.sparkSession
    return spark.createDataFrame(
        [(int(r["doc_id"]), i + 1) for i, r in enumerate(rows)],
        "doc_id long, rank int")


def rank_metrics(ranked: DataFrame, relevant: DataFrame, k: int = 10) -> DataFrame:
    """One-row frame: precision_at_k, recall_at_k, mrr, dcg_at_k.

    ``ranked``: (doc_id, rank 1-based); ``relevant``: (doc_id) binary
    relevance (grade=1), the PrecisionAtK/MRR model; DCG uses
    rel_i/log2(rank+1) like DiscountedCumulativeGain.java.
    """
    rel = relevant.select("doc_id").distinct().withColumn("_rel", F.lit(1))
    top = ranked.where(F.col("rank") <= k)
    j = top.join(rel, "doc_id", "left")
    n_rel_total = rel.count()
    agg = j.agg(
        F.count("*").alias("_n"),
        F.sum(F.coalesce("_rel", F.lit(0))).alias("_hits"),
        F.min(F.when(F.col("_rel") == 1, F.col("rank"))).alias("_first"),
        F.sum(F.when(F.col("_rel") == 1,
                     1.0 / F.log2(F.col("rank") + 1.0)).otherwise(0.0)).alias("_dcg"),
    )
    return agg.select(
        # truePositives / retrieved (PrecisionAtK.java), NOT /k: when fewer
        # than k docs are retrieved the denominator is the retrieved count
        F.round(F.col("_hits") / F.greatest(F.col("_n"), F.lit(1)), 6)
         .alias("precision_at_k"),
        F.round(F.col("_hits") / F.lit(float(max(n_rel_total, 1))), 6).alias("recall_at_k"),
        F.round(F.coalesce(1.0 / F.col("_first"), F.lit(0.0)), 6).alias("mrr"),
        F.round(F.col("_dcg"), 6).alias("dcg_at_k"),
    )


def ideal_dcg(n_relevant: int, k: int) -> float:
    return sum(1.0 / math.log2(i + 2) for i in range(min(n_relevant, k)))
