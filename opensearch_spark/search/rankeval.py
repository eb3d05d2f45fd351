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


def graded_metrics(ranked: DataFrame, grades: DataFrame, k: int = 10,
                   max_grade: int = 3) -> DataFrame:
    """Graded metrics: ERR + NDCG@k.

    ``grades``: (doc_id, grade int 0..max_grade). ERR follows
    ``ExpectedReciprocalRank.java``: R_i = (2^g - 1) / 2^max_grade,
    ERR = Σ_i (R_i / i) Π_{j<i} (1 - R_j) — the cascade product is an
    exp-of-sum-of-logs window over the (≤k)-row ranked frame (R < 1
    always, so the log is defined). NDCG = DCG with the 2^g - 1 gain
    over the ideal DCG of the k best grades.
    """
    from pyspark.sql import Window as W

    g = grades.select("doc_id", F.col("grade").cast("int").alias("grade"))
    # the reference (ExpectedReciprocalRank.java) rejects ratings above
    # maxRelevance; without this, R >= 1 makes log(1-R) null and the
    # window SUM silently drops the document from the cascade
    top_grade = g.agg(F.max("grade")).collect()[0][0]
    if top_grade is not None and int(top_grade) > max_grade:
        raise ValueError(
            f"graded_metrics: grade {top_grade} exceeds max_grade {max_grade}")
    top = (ranked.where(F.col("rank") <= k)
           .join(g, "doc_id", "left").fillna(0, subset=["grade"]))
    r_i = (F.pow(F.lit(2.0), F.col("grade")) - 1.0) / float(2 ** max_grade)
    top = top.withColumn("_r", r_i)
    w = W.orderBy("rank").rowsBetween(W.unboundedPreceding, -1)
    prior = F.coalesce(F.exp(F.sum(F.log(1.0 - F.col("_r"))).over(w)),
                       F.lit(1.0))
    per = top.withColumn("_err_i", (F.col("_r") / F.col("rank")) * prior) \
             .withColumn("_gain", (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
                         / F.log2(F.col("rank") + 1.0))
    agg = per.agg(F.sum("_err_i").alias("_err"), F.sum("_gain").alias("_dcg"))
    wi = W.orderBy(F.desc("grade"), F.asc("doc_id"))
    ideal = (g.withColumn("_rn", F.row_number().over(wi))
             .where(F.col("_rn") <= k)
             .agg(F.sum((F.pow(F.lit(2.0), F.col("grade")) - 1.0)
                        / F.log2(F.col("_rn") + 1.0)).alias("_idcg")))
    return agg.crossJoin(ideal).select(
        F.round("_err", 6).alias("err"),
        F.round(F.col("_dcg") / F.greatest("_idcg", F.lit(1e-12)), 6)
         .alias("ndcg_at_k"))
