#!/usr/bin/env python
"""ML-family operators at REAL corpus size (default 600k docs).

The r3 real-size run covered the 5 headline ops (match/phrase/minhash/
chunks/percolate); this sweep extends the evidence to the broader
training-data family — one scan text analytics, the model-based
curation filters, and the 64-bit SimHash banding posture (the round-4
scale fix: 32-bit band keys are 8 bits wide and go quadratic beyond
~10k docs; 64-bit keys are 16 bits and stay sparse).

Every op is materialized through a checksum aggregate over ALL of its
output columns (xor of xxhash64) — a bare count() lets Catalyst prune
the computed columns and time nothing (BENCH.md methodology).

Usage: python scripts/ml_family_scale_bench.py [n_docs] [n_reps] [only]
``only`` is an optional comma-separated op-name filter (re-record a
subset without paying the full sweep). Prints one JSON line; recorded
in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    from pyspark.sql import functions as F

    from opensearch_spark.datagen import generate_corpus
    from opensearch_spark.ml import curation as C, dedup as D, textstats as T
    from opensearch_spark.session import get_spark

    spark = get_spark("ml_family_scale_bench", master=f"local[{CPUS}]")

    def _ident(it):
        for p in it:
            yield p

    spark.range(32_000).repartition(int(CPUS)) \
        .mapInPandas(_ident, "id long").count()

    corpus_path = f"/tmp/opensearch_spark_realsize_corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        generate_corpus(spark, n_docs, n_partitions=64) \
            .write.mode("overwrite").parquet(corpus_path)
    docs = (spark.read.parquet(corpus_path)
            .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
            .persist())
    docs.count()
    # target-domain sample for DSIR: one language's slice
    target = docs.where(F.col("lang") == "py").limit(20_000)

    def checksum(df):
        cols = [F.col(c) for c in df.columns]
        return df.agg(F.bit_xor(F.xxhash64(*cols)).alias("sig")) \
                 .collect()[0]["sig"]

    ops = {
        "text_token_stats": lambda: checksum(T.token_stats(docs, "content")),
        "text_quality": lambda: checksum(T.quality_score(docs, "content")),
        "text_fingerprint": lambda: checksum(T.fingerprint(docs, "content")),
        "text_lang_id": lambda: checksum(T.lang_id(docs, "content")),
        "text_pii_scrub": lambda: checksum(T.pii_scrub(docs, "content")),
        "curation_repetition": lambda: checksum(
            C.repetition_stats(docs, "content")),
        "curation_quality_classifier": lambda: checksum(
            C.quality_classifier(docs, "content")),
        "curation_dsir": lambda: checksum(
            C.dsir_log_importance(docs, target, "content")),
        # bits=None: the auto posture must resolve to 64 at this corpus
        # size (>SIMHASH_64BIT_MIN_DOCS) — exercising the switch itself
        "dedup_simhash64_pairs": lambda: checksum(
            D.simhash_pairs(D.simhash(docs, "content"), max_hamming=3)),
    }

    timings: dict[str, float] = {}
    for name, fn in ops.items():
        if only is not None and name not in only:
            continue
        reps = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            fn()
            reps.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(reps)

    out = {
        "metric": "ML-family operator wall-clock at real corpus size (sec)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "n_docs": n_docs,
        "extra": {
            "cpus": int(CPUS),
            "statistic": f"min of {n_reps} reps per op, checksum-"
                         "materialized over all output columns",
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
