"""Sharded terms aggregation with the reference's approximation contract.

Reference: ``server/src/main/java/org/opensearch/search/aggregations/
bucket/terms/TermsAggregator.java`` (per-shard ``shard_size`` over-fetch),
``InternalTerms.java`` (coordinator merge: ``reduce()`` sums per-shard
counts and accumulates ``docCountError`` from the smallest count each
truncating shard reported), ``InternalMultiBucketAggregation`` /
``AbstractInternalTerms`` (``sum_other_doc_count``,
``doc_count_error_upper_bound``). A single-pass exact groupBy (the
``agg_terms`` gate) has no error; this operator reproduces the
DISTRIBUTED contract — documents are routed to shards, each shard
returns only its local top ``shard_size``, and the merged counts are an
under-approximation with a provable bound:

    exact_count(term) <= doc_count(term) + doc_count_error(term)

where ``doc_count_error(term)`` = sum over shards that did NOT report
the term of that shard's smallest reported count (a shard that returned
fewer than ``shard_size`` buckets reported everything it had, so its
contribution is 0 — same special case as the reference), and the global
``doc_count_error_upper_bound`` is the sum over all truncating shards.

Spark plan (scale notes): the corpus-sized stage is ONE partial-agg
shuffle (groupBy shard × term). The per-shard top-N window runs over the
already-aggregated (shard, term, cnt) frame — cardinality = distinct
terms × shards, far below corpus size; with few shards the window stage
has bounded parallelism but tiny input. Everything after the top lists
(≤ nshards × shard_size rows) is broadcast-sized scalar algebra — no
further corpus scans, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def sharded_terms(df: DataFrame, term_col: str, shard: Column,
                  nshards: int, shard_size: int, size: int) -> DataFrame:
    """Top-``size`` terms merged from per-shard top-``shard_size`` lists.

    ``shard`` is the document-routing expression (the reference routes by
    the id/routing hash, NOT by the term — a term's documents spread
    across shards, which is exactly why the merged counts approximate).

    Returns (term, doc_count, doc_count_error, sum_other_doc_count,
    error_upper_bound), ordered by doc_count desc then term asc.
    """
    per_shard = (df.groupBy(shard.alias("shard"),
                            F.col(term_col).alias("term"))
                 .agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("term"))
    top = (per_shard.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") <= shard_size))
    # a shard with fewer than shard_size buckets reported all its terms:
    # it cannot hide anything, so it contributes 0 to any error bound
    shard_min = top.groupBy("shard").agg(
        F.when(F.count("*") >= shard_size, F.min("cnt"))
        .otherwise(F.lit(0)).alias("mincnt"))
    total_min = shard_min.agg(
        F.coalesce(F.sum("mincnt"), F.lit(0)).alias("s"))
    merged = (top.join(shard_min, "shard")
              .groupBy("term")
              .agg(F.sum("cnt").cast("long").alias("doc_count"),
                   F.sum("mincnt").alias("present_min"))
              .crossJoin(F.broadcast(total_min))
              .withColumn("doc_count_error",
                          (F.col("s") - F.col("present_min")).cast("long")))
    topk = (merged.orderBy(F.desc("doc_count"), F.asc("term")).limit(size)
            .select("term", "doc_count", "doc_count_error", "s"))
    top_sum = topk.agg(F.sum("doc_count").alias("top_sum"))
    # total docs from the already-aggregated per-shard frame — a second
    # df.agg(count(*)) was a full second corpus scan (round-4 review)
    n_total = per_shard.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_total"))
    return (topk.crossJoin(F.broadcast(top_sum))
            .crossJoin(F.broadcast(n_total))
            .select("term", "doc_count", "doc_count_error",
                    (F.col("n_total") - F.col("top_sum")).cast("long")
                    .alias("sum_other_doc_count"),
                    F.col("s").cast("long").alias("error_upper_bound"))
            .orderBy(F.desc("doc_count"), F.asc("term")))
