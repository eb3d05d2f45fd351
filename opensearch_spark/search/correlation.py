"""Events correlation engine (reference: plugins/events-correlation-engine).

Reference semantics (behavioral spec only):
- ``CorrelationRule.java:27-44`` — a rule is a named list of per-index
  "correlate" legs, each a ``CorrelationQuery`` (index, query string,
  timestampField, tags) (``CorrelationQuery.java:26-36``).
- ``EventsCorrelationSettings.java:34-41`` — a single global
  ``correlation_time_window`` (default 5 minutes): events matching two
  different legs correlate when their timestamps lie within that window.

Spark-first re-expression: each leg is an ordinary filtered DataFrame over
its source table (any engine query can produce it); pairing is a
time-bucketed equi-join, never a theta/cross join:

  bucket = floor(epoch_us / window_us).  Two events within `window` of
  each other sit in the same or adjacent buckets, so leg B is expanded to
  (bucket-1, bucket, bucket+1) and the join is a plain hash equi-join on
  bucket followed by the exact |tA - tB| <= window filter.  Each
  qualifying pair matches exactly ONE of the three offsets (bucketB -
  bucketA is uniquely determined), so no dedup pass is needed.

Scale: the equi-join shuffles on the time bucket — time-uniform streams
give balanced partitions; a wall-clock hot spike concentrates one bucket,
which AQE skew-join splits.  The 3x expansion of the (already filtered,
small) leg B is the price of turning a range predicate into an equi-key —
the standard interval-join trick, O(|A| + 3|B| + pairs) instead of
O(|A| x |B|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_WINDOW_SEC = 300  # EventsCorrelationSettings.java:37-41 (5 minutes)


def _epoch_us_sql(df: DataFrame, c: str) -> str:
    """SQL snippet: microseconds since the epoch, computed in the
    column's OWN type (timestampdiff on two NTZ — or two TS — operands is
    pure arithmetic), so the value is session-timezone-invariant;
    unix_micros(cast) would shift by the session offset on a non-UTC
    driver. Shared by the batch and streaming engines so the epoch rule
    can never drift between them again (it did once: 62ed3cf had to
    retrofit the NTZ fix into the streaming twin)."""
    lit = ("TIMESTAMP_NTZ'1970-01-01 00:00:00'"
           if dict(df.dtypes)[c] == "timestamp_ntz"
           else "CAST(0 AS TIMESTAMP)")
    return f"timestampdiff(MICROSECOND, {lit}, {c})"


def _bucket_sql(us: str, w_us: int) -> str:
    """SQL snippet: window bucket of a microsecond expression by EXACT
    integer division (`div`), not floor(double /): float division is only
    ~1e-6-bucket accurate at epoch-microsecond magnitudes, and a boundary
    event rounding the wrong way would put a true pair at bucket distance
    2 — outside the ±1 expansion. Floored toward -inf for pre-epoch
    values so the adjacency invariant holds for any timestamp sign."""
    return (f"CASE WHEN {us} >= 0 THEN {us} div {w_us} "
            f"ELSE -((-{us} + {w_us} - 1) div {w_us}) END")


def correlate_events(
    leg_a: DataFrame,
    leg_b: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_sec: int = DEFAULT_WINDOW_SEC,
) -> DataFrame:
    """Pair events of two rule legs within ``window_sec`` of each other.

    Returns (a_id, b_id, dt_us) where dt_us = t_b - t_a in microseconds
    (signed; |dt_us| <= window).  Ordered output is the caller's job.
    """
    w_us = int(window_sec) * 1_000_000
    a = leg_a.select(
        F.col(id_col).alias("a_id"),
        F.expr(_epoch_us_sql(leg_a, ts_col)).alias("ta"),
    ).withColumn("bkt", F.expr(_bucket_sql("ta", w_us)))
    b = leg_b.select(
        F.col(id_col).alias("b_id"),
        F.expr(_epoch_us_sql(leg_b, ts_col)).alias("tb"),
    )
    # expand B to its bucket and both neighbors; exactly one offset can
    # pair with any given A-bucket, so the join emits no duplicates
    b3 = (b.withColumn("_off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
            .withColumn("bkt", F.expr(_bucket_sql("tb", w_us)) + F.col("_off"))
            .drop("_off"))
    pairs = (a.join(b3, "bkt")
              .where(F.abs(F.col("tb") - F.col("ta")) <= w_us)
              .select("a_id", "b_id", (F.col("tb") - F.col("ta")).alias("dt_us")))
    return pairs


def correlate_events_stream(
    leg_a: DataFrame,
    leg_b: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_sec: int = DEFAULT_WINDOW_SEC,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of :func:`correlate_events`: a watermarked
    stream-stream inner join (SURVEY §2.12 extension — the continuous
    form of the events-correlation rule engine).

    Same bucket trick as batch — leg B explodes to (bucket-1, 0, +1) so
    the shuffle is a hash equi-join on the time bucket — but the join
    CONDITION also carries the raw event-time range predicate, which is
    what lets Spark derive state eviction: each side keeps only rows
    within ``watermark`` + ``window_sec`` of the global watermark, so
    state is bounded regardless of stream length (the property that
    matters at 100 TB/day; an unbounded-state join would OOM on day 2).

    Works on batch frames too (identical output to correlate_events,
    tested) — the watermark call is skipped when not streaming.
    """
    w_us = int(window_sec) * 1_000_000

    a = leg_a.select(F.col(id_col).alias("a_id"),
                     F.col(ts_col).alias("ta"))
    b = leg_b.select(F.col(id_col).alias("b_id"),
                     F.col(ts_col).alias("tb"))
    if a.isStreaming:
        a = a.withWatermark("ta", watermark)
    if b.isStreaming:
        b = b.withWatermark("tb", watermark)

    # the SAME shared epoch + exact-div bucket rule as the batch path
    # (timestamps stay raw columns here — the join condition needs the
    # event-time range predicate for watermark state eviction)
    def bkt(df, c):
        return F.expr(_bucket_sql(_epoch_us_sql(df, c), w_us))

    a = a.withColumn("bkt", bkt(a, "ta"))
    b3 = (b.withColumn("_off",
                       F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
          .withColumn("bkt", bkt(b, "tb") + F.col("_off"))
          .drop("_off"))
    cond = ((a["bkt"] == b3["bkt"])
            & (b3["tb"] >= a["ta"] - F.expr(f"INTERVAL {window_sec} SECOND"))
            & (b3["tb"] <= a["ta"] + F.expr(f"INTERVAL {window_sec} SECOND")))
    return (a.join(b3, cond)
            .select("a_id", "b_id",
                    F.expr("timestampdiff(MICROSECOND, ta, tb)")
                    .alias("dt_us")))
