#!/usr/bin/env python
"""geoip enrichment at real size: the bucketed range-lookup's linearity.

The gate runs on 500 events; the plan property that matters at 10^12
events is that enrichment stays a broadcast HASH equi-join on the /8
bucket (one scan, zero shuffles of the event side) — never a
BroadcastNestedLoopJoin whose cost is |events| x |ranges|. This run
synthesizes ids at increasing n with the same Knuth-spread ip derivation
the gate uses, enriches against the range table, and reports wall
seconds: linear in n, with the range-table size not a factor.

Usage: python scripts/enrich_scale_bench.py [sizes...]
Defaults: 10_000_000 100_000_000.  Prints one JSON line per size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000_000, 100_000_000]
    from pyspark.sql import functions as F

    from opensearch_spark import enrich as EN
    from opensearch_spark.search import ipfield as IPF
    from opensearch_spark.session import get_spark

    spark = get_spark("enrich_scale_bench", master=f"local[{CPUS}]")
    spark.range(32_000).repartition(int(CPUS)).count()  # warm

    ranges = EN.geoip_table(spark)
    for n in sizes:
        ev = IPF.with_ip(
            spark.range(n).withColumnRenamed("id", "event_id"),
            id_col="event_id")
        out = EN.geoip_enrich(ev, ranges)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        best = matched = None
        for _ in range(2):
            t0 = time.perf_counter()
            matched = out.where(F.col("country_iso_code").isNotNull()).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({
            "n_events": n, "matched": matched,
            "match_rate": round(matched / n, 4),
            "sec": round(best, 3),
            "events_per_sec": round(n / best),
            "cpus": int(CPUS)}))
    spark.stop()


if __name__ == "__main__":
    main()
