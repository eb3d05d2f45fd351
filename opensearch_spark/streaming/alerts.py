"""Streaming percolation: the percolator's production shape — stored
queries as standing ALERTS evaluated against a document stream.

Reference: the percolator module (``modules/percolator/``) is OpenSearch's
alerting primitive (the alerting plugin percolates monitor queries against
incoming docs). Here the same stored-query set drives a Structured
Streaming ``foreachBatch``: every micro-batch is percolated with the
identical batch operator (``search/percolate.py`` — broadcast term
prefilter + exact verify), so batch and streaming answers agree by
construction, the same single-code-path discipline as the NRT segment
ingest (``streaming/ingest.py``).

At scale: the stored-query broadcast is per-batch O(queries) bytes; each
micro-batch pays one scan. State is external (the sink), so the stream
is stateless and resumable from the source checkpoint — WHEN the caller
passes ``checkpoint_dir`` (otherwise Spark's temporary checkpoint dies
with the stream and a restart re-alerts on all historical data).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from opensearch_spark.search.percolate import PercQuery, percolate


def percolate_microbatch(
    spark: SparkSession,
    queries: list[PercQuery],
    on_matches: Callable[[list[tuple], int], None],
    id_col: str = "doc_id",
    analyzer: str = "standard",
):
    """Build the foreachBatch function: percolate each micro-batch and hand
    (doc_id, query_id, epoch) rows to ``on_matches`` (the alert sink)."""

    def _fn(batch_df: DataFrame, epoch_id: int) -> None:
        rows = [tuple(r) for r in
                percolate(spark, queries, batch_df, id_col=id_col,
                          analyzer=analyzer).collect()]
        if rows:
            on_matches(rows, int(epoch_id))

    return _fn


def start_streaming_percolate(
    spark: SparkSession,
    stream_df: DataFrame,
    queries: list[PercQuery],
    on_matches: Callable[[list[tuple], int], None],
    id_col: str = "doc_id",
    analyzer: str = "standard",
    trigger_once: bool = True,
    checkpoint_dir: str | None = None,
):
    """Wire a streaming DataFrame into the percolator. ``trigger_once``
    processes the currently-available data and stops (test/NRT-batch
    mode); pass False for a continuous micro-batch trigger.

    ``checkpoint_dir`` makes the alert stream RESUMABLE: without it
    Spark uses a temporary checkpoint deleted on stop, and a restarted
    stream re-reads the source from the beginning — every historical
    (doc, query) match alerts AGAIN with reused epoch ids (round-4
    review). Pass a durable path for any production alerting flow; the
    default stays None for the ephemeral test/demo shape."""
    writer = (stream_df.writeStream
              .foreachBatch(percolate_microbatch(
                  spark, queries, on_matches, id_col=id_col,
                  analyzer=analyzer))
              .outputMode("append"))
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
