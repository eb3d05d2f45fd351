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

from opensearch_spark.index.build import IndexConfig, _atomic_write_json


def index_microbatch(batch_df: DataFrame, epoch_id: int, out_dir: str,
                     config: IndexConfig) -> None:
    """foreachBatch sink: one write-once segment per micro-batch epoch.

    Uses ``write_segment_tables`` — the SAME single author as the batch
    and datastream paths — so the streaming segment layout can never
    drift from what ``merge_segments`` expects (a hand-rolled copy here
    previously ignored with_positions/index_options, crashed on the
    default id_col=None config, faked the sha256_xor_sig integrity
    signature, and re-ran the analyze UDF once per consumer)."""
    cfg = config
    if batch_df.isEmpty():
        return
    import json

    from opensearch_spark.index.segments import (read_manifest,
                                                 write_segment_tables)

    # stream segment ids live at a PERSISTED offset above any segments
    # that already existed when the stream first wrote (epoch 0 would
    # otherwise overwrite a batch-built seg_0 — round-4 review). The
    # base is recorded once so crash/replay maps each epoch to the SAME
    # segment id.
    base_path = os.path.join(out_dir, "manifest", "_stream_base.json")
    if os.path.exists(base_path):
        with open(base_path) as fh:
            seg_base = int(json.load(fh)["base"])
    else:
        existing = read_manifest(out_dir)
        seg_base = max((int(m["segment_id"]) for m in existing.values()),
                       default=-1) + 1
        os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)
        _atomic_write_json(base_path, {"base": int(seg_base)})
    seg = seg_base + int(epoch_id)
    seg_dir = os.path.join(out_dir, "segments", f"seg_{seg}")
    own_pin = False
    if cfg.id_col is not None:
        part = batch_df.withColumn("doc_id", F.col(cfg.id_col).cast("long"))
    else:
        # dense local ids offset by the stream's committed doc count
        # (docBase discipline; Structured Streaming runs epochs serially).
        # The sum EXCLUDES this epoch's own manifest entry: after a crash
        # between manifest write and checkpoint commit, the epoch is
        # REPLAYED and counting its own previous attempt would shift the
        # replayed ids, leaving two segments with overlapping doc_ids
        # (round-4 review).
        from opensearch_spark.index.build import assign_doc_ids

        doc_base = sum(int(m["rows"])
                       for sid, m in read_manifest(out_dir).items()
                       if sid != seg)
        batch_df = batch_df.persist()
        own_pin = True
        part = (assign_doc_ids(batch_df, list(cfg.order_cols) or [],
                               mode="local", cache=False)
                .withColumn("doc_id", F.col("doc_id") + F.lit(doc_base)))
        # the same loud row-conservation invariant as datastream.append:
        # never commit a lossy segment if AQE relaid partitions between
        # the id-assignment jobs (round-4 review — only the datastream
        # copy carried this check)
        n_in, n_ids = batch_df.count(), part.count()
        if n_ids != n_in:
            raise RuntimeError(
                f"streaming ingest lost rows: batch={n_in} "
                f"with_ids={n_ids} — partition layout changed between "
                "id-assignment jobs")
    # keep = part.columns — the SAME keep rule as the batch path, so a
    # mixed batch+streaming tree has one docs schema (the id_col was
    # previously dropped here, diverging the schemas — round-4 review)
    keep = list(part.columns)
    try:
        analyzed, docs = write_segment_tables(part, keep, seg_dir, cfg)
        try:
            sig = docs.agg(
                F.expr("bit_xor(cast(conv(substr(content_sha256, 1, 15),"
                       " 16, 10) as bigint))").alias("sig"),
                F.count("*").alias("rows")).collect()[0]
            os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)
            _atomic_write_json(
                os.path.join(out_dir, "manifest", f"seg_{seg}.json"),
                {"segment_id": int(seg), "rows": int(sig["rows"]),
                 "sha256_xor_sig": int(sig["sig"])
                 if sig["sig"] is not None else 0,
                 "status": "committed", "attempt": 1},
            )
        finally:
            analyzed.unpersist()
    finally:
        if own_pin:
            batch_df.unpersist()


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
