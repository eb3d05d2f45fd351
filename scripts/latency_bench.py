#!/usr/bin/env python
"""Query-latency distribution (p50/p99) for the north rule's
"query p50/p99" metric: repeated executions of the reference-style query
set against a warm searcher at $SPARK_GRAFT_SF_DIR.

Usage: python scripts/latency_bench.py [n_reps]
Prints one JSON line: {"queries": {name: {"p50": s, "p99": s, "n": n}}, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def pct(xs: list[float], p: float) -> float:
    ys = sorted(xs)
    k = min(len(ys) - 1, max(0, round(p / 100.0 * (len(ys) - 1))))
    return ys[k]


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    from opensearch_spark.entry_queries import get_searcher
    from opensearch_spark.search import Bool, Match, MatchPhrase, Term
    from opensearch_spark.session import get_spark

    spark = get_spark("latency_bench", master=f"local[{CPUS}]")
    s = get_searcher(spark, SF_DIR)

    qset = {
        "match_or_wand": lambda: s.search(
            Match(field="text", text="spark table merge"), k=10, mode="wand"),
        "match_and_wand": lambda: s.search(
            Match(field="text", text="spark table", operator="and"), k=10,
            mode="wand"),
        "match_exhaustive": lambda: s.search(
            Match(field="text", text="spark table merge"), k=10,
            mode="exhaustive"),
        "bool_filtered": lambda: s.search(
            Bool(should=[Match(field="text", text="spark vector")],
                 filter=[Term(field="lang", value="en")]), k=10,
            mode="exhaustive"),
        "phrase": lambda: s.search(
            MatchPhrase(field="text", text="spark table"), k=10,
            mode="exhaustive"),
    }
    out = {}
    for name, fn in qset.items():
        fn().collect()  # warm
        times = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            fn().collect()
            times.append(time.perf_counter() - t0)
        out[name] = {
            "p50": round(pct(times, 50), 4),
            "p99": round(pct(times, 99), 4),
            "min": round(min(times), 4),
            "n": n_reps,
        }
    print(json.dumps({"sf_dir": SF_DIR, "cpus": int(CPUS), "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
