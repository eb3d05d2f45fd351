"""NRT streaming ingest: Structured Streaming → per-micro-batch segment
append, mirroring the reference's refresh model (new searchable segment
every refresh_interval, default 1 s — ``IndexSettings.java:353-357``;
seq_no/checkpoint ≈ streaming state checkpoint).

Each micro-batch is indexed by the SAME segment builder as the batch path
(``foreachBatch`` → build_segments-style write + manifest), then
``merge_segments`` = the background merge. No new operator semantics — by
design, like the reference (SURVEY §2.12: OpenSearch is NRT-batch)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from opensearch_spark.analysis import analyze_udf
from opensearch_spark.index.build import IndexConfig, _atomic_write_json


def index_microbatch(batch_df: DataFrame, epoch_id: int, out_dir: str,
                     config: IndexConfig) -> None:
    """foreachBatch sink: one write-once segment per micro-batch epoch."""
    cfg = config
    if batch_df.rdd.isEmpty():
        return
    analyzed = batch_df.withColumn(
        "_tokens", analyze_udf(cfg.analyzer)(F.col(cfg.field)))
    seg_dir = os.path.join(out_dir, "segments", f"seg_{epoch_id}")
    docs = analyzed.select(
        F.col(cfg.id_col).cast("long").alias("doc_id"),
        *[c for c in batch_df.columns if c != cfg.id_col],
        F.size("_tokens").alias("dl"),
        F.sha2(F.col(cfg.field), 256).alias("content_sha256"),
    )
    docs.write.mode("overwrite").parquet(os.path.join(seg_dir, "docs"))
    flat = (
        analyzed.select(F.col(cfg.id_col).cast("long").alias("doc_id"),
                        F.posexplode("_tokens").alias("pos", "term"))
        .groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
        .join(analyzed.select(F.col(cfg.id_col).cast("long").alias("doc_id"),
                              F.size("_tokens").alias("dl")), "doc_id")
    )
    flat.write.mode("overwrite").parquet(os.path.join(seg_dir, "postings"))
    n = docs.count()
    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)
    _atomic_write_json(
        os.path.join(out_dir, "manifest", f"seg_{epoch_id}.json"),
        {"segment_id": int(epoch_id), "rows": int(n), "status": "committed",
         "attempt": 1, "sha256_xor_sig": 0},
    )


def start_streaming_index(
    spark: SparkSession,
    source_dir: str,
    schema,
    out_dir: str,
    config: IndexConfig,
    trigger_seconds: int = 1,
):
    """readStream over a parquet drop-dir → segment-per-batch index sink.
    Returns the StreamingQuery; call merge_segments(out_dir) to 'refresh'
    the merged global index."""
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    return (
        stream.writeStream
        .foreachBatch(lambda df, eid: index_microbatch(df, eid, out_dir, config))
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
