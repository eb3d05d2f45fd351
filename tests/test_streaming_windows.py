"""Watermarked windowed aggregation: late-data drop across micro-batches
(checkpointed watermark survives restart) and batch/streaming plan parity."""
import os
import time

import pytest
from pyspark.sql import functions as F

from opensearch_spark.streaming.windows import windowed_event_counts

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _write_batch(spark, d, rows):
    from datetime import datetime
    rows = [(i, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), et, v)
            for i, ts, et, v in rows]
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("append").parquet(d)


def _run_available(spark, src, ckpt, sink: list):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = windowed_event_counts(stream, window="10 minutes",
                                watermark="10 minutes")

    def emit(batch_df, _bid):
        sink.extend(batch_df.collect())

    q = (agg.writeStream.foreachBatch(emit)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_late_rows_dropped_after_watermark(spark, tmp_path):
    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    t = "2024-01-01 10:{:02d}:00"

    rows: list = []
    _write_batch(spark, src, [
        (1, t.format(0), "click", 1.0),
        (2, t.format(5), "click", 2.0),
        (3, t.format(30), "view", 3.0),   # advances watermark to 10:20
    ])
    _run_available(spark, src, ckpt, rows)

    # second micro-batch: one VALID row (10:25) and one LATE row (10:02,
    # before the 10:20 watermark) that must be dropped
    _write_batch(spark, src, [
        (4, t.format(25), "view", 5.0),
        (5, t.format(2), "click", 100.0),
    ])
    _run_available(spark, src, ckpt, rows)

    by_key = {}
    for r in rows:  # update mode re-emits: keep the latest per (window, key)
        by_key[(str(r["window_start"]), r["event_type"])] = (
            r["n_events"], r["value_sum"])
    # the late click (value=100) must NOT appear in the 10:00 window
    assert by_key[("2024-01-01 10:00:00", "click")] == (2, 3.0)
    assert by_key[("2024-01-01 10:30:00", "view")] == (1, 3.0)
    assert by_key[("2024-01-01 10:20:00", "view")] == (1, 5.0)


def test_batch_mode_matches_plain_groupby(spark, sf_dir):
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    out = windowed_event_counts(events, window="1 hour",
                                keys=["event_type"]).collect()
    ref = (events.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s"))
        .collect())
    got = {(r["window_start"], r["event_type"]): (r["n_events"], r["value_sum"])
           for r in out}
    want = {(r["window_start"], r["event_type"]): (r["n"], r["s"]) for r in ref}
    assert got == want


def test_session_windows_batch_semantics(spark):
    from datetime import datetime as dt

    from opensearch_spark.streaming.windows import session_event_counts

    T = lambda m: dt(2024, 1, 1, 10, m)  # noqa: E731
    rows = [
        # key 'a': events at 10:00, 10:03, 10:06 -> ONE session (gaps < 5m)
        (T(0), "a", 1.0), (T(3), "a", 2.0), (T(6), "a", 3.0),
        # then 10:20 -> a second session
        (T(20), "a", 4.0),
        # key 'b': single event -> session of exactly one gap length
        (T(1), "b", 10.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {(r["event_type"], str(r["session_start"])): (r["n_events"], r["value_sum"],
                                                        str(r["session_end"]))
           for r in session_event_counts(df, gap="5 minutes").collect()}
    assert out[("a", "2024-01-01 10:00:00")] == (3, 6.0, "2024-01-01 10:11:00")
    assert out[("a", "2024-01-01 10:20:00")] == (1, 4.0, "2024-01-01 10:25:00")
    assert out[("b", "2024-01-01 10:01:00")] == (1, 10.0, "2024-01-01 10:06:00")


def test_session_windows_streaming_merge(spark, tmp_path):
    """Sessions merge across micro-batches while open; append mode emits
    a session once the watermark passes its end (Spark restricts session
    streams to append/complete — merging state can't re-emit updates)."""
    from opensearch_spark.streaming.windows import session_event_counts

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src, exist_ok=True)

    def run(rows_out):
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        agg = session_event_counts(stream, gap="5 minutes",
                                   watermark="20 minutes")
        q = (agg.writeStream
             .foreachBatch(lambda b, _i: rows_out.extend(b.collect()))
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    t = "2024-01-01 {:02d}:{:02d}:00"
    rows = []
    _write_batch(spark, src, [(1, t.format(10, 0), "a", 1.0)])
    run(rows)
    _write_batch(spark, src, [(2, t.format(10, 3), "a", 2.0)])
    run(rows)
    assert rows == []  # session still open: nothing emitted yet
    # an 11:10 event advances the watermark to 10:50 > session end 10:08
    _write_batch(spark, src, [(3, t.format(11, 10), "a", 3.0)])
    run(rows)
    got = {(r["event_type"], str(r["session_start"])): (
        r["n_events"], str(r["session_end"])) for r in rows}
    # the 10:03 event extended the 10:00 session, not a new one
    assert got[("a", "2024-01-01 10:00:00")] == (2, "2024-01-01 10:08:00")


def test_stream_stream_correlation_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (correlate_events_stream):
    pairs across micro-batches must equal the batch correlate_events
    output on the same data; the join must not be a nested-loop."""
    from opensearch_spark.search.correlation import (correlate_events,
                                                     correlate_events_stream)

    src_a = str(tmp_path / "a")
    src_b = str(tmp_path / "b")
    ckpt = str(tmp_path / "ck2")
    os.makedirs(src_a, exist_ok=True)
    os.makedirs(src_b, exist_ok=True)
    t = "2024-01-01 10:{:02d}:00"
    # batch 1: A events; batch 2 adds B events pairing back across batches
    _write_batch(spark, src_a, [(1, t.format(0), "err", 1.0),
                                (2, t.format(20), "err", 1.0)])
    _write_batch(spark, src_b, [(10, t.format(3), "buy", 1.0)])

    rows = []

    def run():
        sa = spark.readStream.schema(SCHEMA).parquet(src_a)
        sb = spark.readStream.schema(SCHEMA).parquet(src_b)
        out = correlate_events_stream(sa, sb, window_sec=300,
                                      watermark="30 minutes")
        q = (out.writeStream
             .foreachBatch(lambda b, _i: rows.extend(b.collect()))
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    _write_batch(spark, src_b, [(11, t.format(22), "buy", 1.0),
                                (12, t.format(40), "buy", 1.0)])
    run()
    got = sorted((r["a_id"], r["b_id"], r["dt_us"]) for r in rows)

    ba = spark.read.parquet(src_a)
    bb = spark.read.parquet(src_b)
    want = sorted((r["a_id"], r["b_id"], r["dt_us"]) for r in
                  correlate_events(ba, bb, window_sec=300).collect())
    assert got == want and len(got) == 2  # (1,10) and (2,11); 12 too far

    # batch-mode parity of the streaming builder itself
    same = sorted((r["a_id"], r["b_id"], r["dt_us"]) for r in
                  correlate_events_stream(ba, bb, window_sec=300).collect())
    assert same == want
