"""Watermarked windowed aggregation over event streams (SURVEY §2.12
extension).

The reference has no streaming operators — its closest analog is the
date_histogram aggregation re-run per refresh. The Spark-native
continuous form is Structured Streaming's event-time window + watermark:
per-(window, key) counts maintained incrementally in the state store,
late rows beyond the watermark DROPPED (bounded state — the property
that lets the operator run forever at 100 TB/day, unlike an unbounded
re-aggregation).

State scale: rows are hash-partitioned by (window, key); state per
partition is the open-window set only, bounded by
``watermark / window_size`` windows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "20 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Event-time windowed counts + value sum with late-data policy.

    Works on streaming AND batch frames (the batch plan is the identical
    groupBy — handy for backfill jobs sharing the streaming code path).
    Returns (window_start, window_end, *keys, n_events, value_sum).
    ``value_col=None`` skips the sum (value_sum NULL) so streams without
    a value column still get windowed counts.
    """
    keys = keys if keys is not None else ["event_type"]
    df = stream_df
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide) if slide \
        else F.window(F.col(ts_col), window)
    vsum = (F.sum(value_col) if value_col is not None
            else F.lit(None).cast("double"))
    agg = (df.groupBy(win.alias("w"), *keys)
           .agg(F.count("*").alias("n_events"),
                vsum.alias("value_sum")))
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys, "n_events",
        F.round("value_sum", 4).alias("value_sum"))


def session_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    gap: str = "5 minutes",
    watermark: str = "20 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Session windows (``F.session_window``): per-key activity sessions
    that close after ``gap`` of inactivity — dynamic-length windows the
    fixed/sliding form can't express (the Spark analog of a per-user
    activity rollup; no reference counterpart, SURVEY §2.12 extension).

    State scale: merging session state is per (key, open session); the
    watermark closes sessions whose end is older, so state stays bounded
    by active keys — the property that matters at 100 TB/day. Works on
    streaming AND batch frames like ``windowed_event_counts``.

    Returns (session_start, session_end, *keys, n_events, value_sum).
    """
    keys = keys if keys is not None else ["event_type"]
    df = stream_df
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    vsum = (F.sum(value_col) if value_col is not None
            else F.lit(None).cast("double"))
    agg = (df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                      *keys)
           .agg(F.count("*").alias("n_events"),
                vsum.alias("value_sum")))
    return agg.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *keys, "n_events",
        F.round("value_sum", 4).alias("value_sum"))
