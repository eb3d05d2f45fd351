#!/usr/bin/env python
"""events_correlation at real size: the bucketed range join's linearity.

The sf0.1 events table (100k rows) can't show the plan property that
matters at 10^12 events: runtime linear in |events| + |pairs|, never the
O(|A| x |B|) of a theta join. This run synthesizes a deterministic event
stream at CONSTANT RATE (2 events/sec, types round-robin), so doubling n
doubles the wall-clock span, the bucket count, and the expected pair
count — a linear operator shows ~linear seconds; a cross join would go
quadratic.

Usage: python scripts/correlation_scale_bench.py [sizes...]
Defaults: 1_000_000 10_000_000.  Prints one JSON line per size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
WINDOW_SEC = 5


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    from pyspark.sql import functions as F

    from opensearch_spark.search.correlation import correlate_events
    from opensearch_spark.session import get_spark

    spark = get_spark("correlation_scale_bench", master=f"local[{CPUS}]")
    spark.range(32_000).repartition(int(CPUS)).count()  # warm

    for n in sizes:
        # 2 events/sec wall-clock rate; type = id % 5; value spread 0-100
        ev = (spark.range(n)
              .select(F.col("id").alias("event_id"),
                      F.timestamp_seconds(F.lit(1700000000)
                                          + (F.col("id") / 2.0)).alias("ts"),
                      (F.col("id") % 5).alias("tcode"),
                      ((F.col("id") * 37) % 101).cast("double").alias("value")))
        leg_a = ev.where(F.col("tcode") == 0)
        leg_b = ev.where((F.col("tcode") == 1) & (F.col("value") > 50))
        best = None
        pairs = None
        for _ in range(2):
            t0 = time.perf_counter()
            pairs = correlate_events(leg_a, leg_b,
                                     window_sec=WINDOW_SEC).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({"n_events": n, "window_sec": WINDOW_SEC,
                          "pairs": pairs, "sec": round(best, 3),
                          "cpus": int(CPUS)}))
    spark.stop()


if __name__ == "__main__":
    main()
