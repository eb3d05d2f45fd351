#!/usr/bin/env python
"""Percolator standing-range-query scale experiment (round 4).

Measures the new grid-bucketed interval join (bounded range legs above
``broadcast_max_queries``) against the broadcast theta-join it replaces,
over the same 600k-doc code corpus the other real-size benches use:

- equality: grid pairs == theta pairs at a theta-feasible query count
- scale: grid wall-clock at a query count where the theta join
  (q × 600k BroadcastNestedLoop probes) is the reference engine's
  documented no-go zone

Queries are deterministic ranges over n_chars with a mixed width
distribution (p90-width grid step exercises both 1-bucket and
multi-bucket explodes), a 2% wide tail and ~1% half-plane
(lo-only / hi-only) queries — the latter two land on the r5 doc-domain
sweep grid, so the forced-grid posture has ZERO BroadcastNestedLoop.

Usage: python scripts/percolate_scale_bench.py [n_docs] [n_small] [n_big]
Prints one JSON line; recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def make_queries(n: int):
    from opensearch_spark.search.percolate import PercQuery

    qs = []
    for i in range(n):
        # deterministic LCG-ish spread, no RNG (bench reproducibility)
        base = 200.0 + (i * 9973) % 1500
        width = 10.0 + (i * 31) % 40          # narrow majority
        if i % 97 == 0:                        # ~1% half-planes -> r5
            if i % 194 == 0:                   # sweep-grid leg (was the
                qs.append(PercQuery(i, "range", "n_chars",  # theta leg)
                                    lo=float(base)))
            else:
                qs.append(PercQuery(i, "range", "n_chars",
                                    hi=float(base)))
            continue
        if i % 50 == 0:
            width = 5000.0                     # 2% wide tail -> sweep leg
        qs.append(PercQuery(i, "range", "n_chars",
                            lo=float(base), hi=float(base + width)))
    return qs


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000

    from pyspark.sql import functions as F

    from opensearch_spark.datagen import generate_corpus
    from opensearch_spark.search.percolate import percolate
    from opensearch_spark.session import get_spark

    spark = get_spark("percolate_scale_bench", master=f"local[{CPUS}]")

    corpus_path = f"/tmp/opensearch_spark_realsize_corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        generate_corpus(spark, n_docs, n_partitions=64) \
            .write.mode("overwrite").parquet(corpus_path)
    docs = (spark.read.parquet(corpus_path)
            .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
            .withColumn("n_chars", F.length("content"))
            .select("doc_id", "n_chars")
            .persist())
    docs.count()

    def run(qs, forced_grid: bool) -> tuple[float, int, int]:
        t0 = time.perf_counter()
        out = percolate(spark, qs, docs,
                        broadcast_max_queries=(
                            0 if forced_grid else len(qs) + 1))
        # xor signature: overflow-free over 64-bit hashed doc ids, and
        # (doc, query) pairs are unique so xor loses nothing
        agg = out.agg(F.count("*").alias("n"),
                      F.bit_xor(F.col("doc_id")
                                 .bitwiseXOR(F.col("query_id")))
                       .alias("sig")).collect()[0]
        return (round(time.perf_counter() - t0, 2),
                int(agg["n"]), int(agg["sig"] or 0))

    small = make_queries(n_small)
    theta_t, theta_n, theta_sig = run(small, forced_grid=False)
    grid_t, grid_n, grid_sig = run(small, forced_grid=True)
    match = (theta_n, theta_sig) == (grid_n, grid_sig)

    big = make_queries(n_big)
    big_t, big_n, _ = run(big, forced_grid=True)

    out = {
        "metric": "percolator range-leg grid join vs broadcast theta (sec)",
        "value": big_t,
        "unit": "sec",
        "queries": {
            f"theta_{n_small}q": theta_t,
            f"grid_{n_small}q": grid_t,
            f"grid_{n_big}q": big_t,
        },
        "n_docs": n_docs,
        "extra": {
            "cpus": int(CPUS),
            "pairs_small": theta_n,
            "pairs_big": big_n,
            "grid_equals_theta": match,
            "speedup_at_small": round(theta_t / grid_t, 2) if grid_t else None,
        },
    }
    print(json.dumps(out))
    if not match:
        raise SystemExit("grid join diverged from broadcast theta join")
    spark.stop()


if __name__ == "__main__":
    main()
