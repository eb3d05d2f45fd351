"""Randomized aggregation checks vs pure-Python brute force.

The agg gates pin FIXED parameter choices against DuckDB oracles; these
seeded tests sweep the parameter space (random intervals, offsets,
bucket widths) and compare the engine's bucketing expressions — the
same timestampdiff/timestampadd epoch-arithmetic pattern the gates use
(entry_queries.agg_date_histogram_offset; timezone-proof by
construction) — against an independent Python datetime evaluation of
the collected rows."""

import math
import random

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _bucket_expr(ev, off: int, interval: int):
    lit = ("TIMESTAMP_NTZ'1970-01-01 00:00:00'"
           if dict(ev.dtypes)["ts"] == "timestamp_ntz"
           else "CAST(0 AS TIMESTAMP)")
    return F.expr(
        f"date_format(timestampadd(SECOND, CAST("
        f"((timestampdiff(SECOND, {lit}, ts) - {off}) div {interval}) "
        f"* {interval} + {off} AS BIGINT), {lit}), "
        f"'yyyy-MM-dd HH:mm:ss')").alias("bucket")


def test_date_histogram_randomized_intervals_offsets(spark, events):
    """Random fixed_interval × offset combinations: engine bucket labels
    and counts must equal a Python datetime evaluation — catches
    timezone leakage, truncation-vs-floor drift, and label formatting
    across the parameter space (the gates pin only interval=1d,
    off=6h)."""
    import datetime as dt

    rows = [r["ts"] for r in events.select("ts").collect()]
    epochs = [int(t.replace(tzinfo=dt.timezone.utc).timestamp())
              if t.tzinfo is None else int(t.timestamp()) for t in rows]
    rng = random.Random(0xA66)
    for case in range(10):
        interval = rng.choice([3600, 3 * 3600, 86400, 7 * 86400])
        off = rng.randrange(0, interval)
        got = {(r["bucket"], r["doc_count"]) for r in
               events.groupBy(_bucket_expr(events, off, interval))
               .agg(F.count("*").alias("doc_count")).collect()}
        from collections import Counter
        c = Counter(
            ((e - off) // interval) * interval + off for e in epochs)
        want = {
            (dt.datetime.fromtimestamp(b, dt.timezone.utc)
             .strftime("%Y-%m-%d %H:%M:%S"), n)
            for b, n in c.items()}
        assert got == want, f"case {case}: interval={interval} off={off}"


def test_numeric_histogram_randomized_widths(spark, events):
    """Random histogram bucket widths over the value column: floor-based
    bucketing (incl. negative values, where floor != trunc) must equal
    Python's floor division."""
    from collections import Counter

    vals = [r["value"] for r in events.select("value").collect()
            if r["value"] is not None]
    rng = random.Random(0x4157)
    for case in range(8):
        width = rng.choice([7.0, 25.0, 50.0, 33.5])
        got = {(r["b"], r["n"]) for r in
               events.where(F.col("value").isNotNull())
               .groupBy((F.floor(F.col("value") / F.lit(width))
                         * F.lit(width)).alias("b"))
               .agg(F.count("*").alias("n")).collect()}
        c = Counter(math.floor(v / width) * width for v in vals)
        want = set(c.items())
        assert got == want, f"case {case}: width={width}"


def test_terms_agg_randomized_size_order(spark, events):
    """Random terms-agg size/order specs (count desc / key asc, the
    reference's tie rules: count ties break by key ascending) vs a
    Python reduction."""
    from collections import Counter

    rng = random.Random(0x7E55)
    rows = [r["event_type"] for r in events.select("event_type").collect()]
    counts = Counter(rows)
    for case in range(8):
        size = rng.randint(1, len(counts))
        by_key = rng.random() < 0.5
        if by_key:
            want = sorted(counts.items())[:size]
            order = [F.asc("key")]
        else:
            want = sorted(counts.items(),
                          key=lambda kv: (-kv[1], kv[0]))[:size]
            order = [F.desc("doc_count"), F.asc("key")]
        got = [(r["key"], r["doc_count"]) for r in
               events.groupBy(F.col("event_type").alias("key"))
               .agg(F.count("*").alias("doc_count"))
               .orderBy(*order).limit(size).collect()]
        assert got == want, f"case {case}: size={size} by_key={by_key}"
