#!/usr/bin/env python
"""Query p50/p99 at REAL corpus size: the north star's "query latency on
the source-code corpus" metric, measured against a 600k-doc code corpus
(the same datagen + standard_code analyzer as the scaling runs) instead
of the 5k-doc sf0.1 documents table.

Exercises exactly the regimes that matter at scale:
- hot-term WAND (terms like 'import'/'def' hit >60% of docs — the
  block-max pruning case; exhaustive twin measured for contrast)
- selective AND over mid-df terms
- rare-term point lookup (uniq_<id> markers)

Usage: python scripts/code_corpus_latency.py [n_docs] [n_reps]
The built index is cached under /tmp and reused across runs.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def pct(xs: list[float], p: float) -> float:
    ys = sorted(xs)
    k = min(len(ys) - 1, max(0, round(p / 100.0 * (len(ys) - 1))))
    return ys[k]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    from opensearch_spark.datagen import generate_corpus
    from opensearch_spark.index.build import IndexConfig, InvertedIndex, build_index
    from opensearch_spark.search import Bool, Match, Searcher, Term
    from opensearch_spark.session import get_spark

    spark = get_spark("code_latency", master=f"local[{CPUS}]")
    out_dir = f"/tmp/opensearch_spark_code_idx_{n_docs}"
    cfg = IndexConfig(field="content", analyzer="standard_code",
                      order_cols=("repo", "path", "commit"),
                      keyword_cols=("lang",), n_parts=16,
                      bucket_span=1 << 13, with_positions=False)
    build_sec = None
    if not os.path.exists(os.path.join(out_dir, "meta.json")):
        corpus = generate_corpus(spark, n_docs, n_partitions=64)
        corpus = corpus.persist()
        corpus.count()
        t0 = time.perf_counter()
        build_index(spark, corpus, out_dir, cfg)
        build_sec = time.perf_counter() - t0
        corpus.unpersist()
    idx = InvertedIndex(out_dir)
    idx.cache(spark)
    s = Searcher(spark, idx)

    uniq = f"uniq_{n_docs // 2}"
    qset = {
        "hot_wand": lambda: s.search(
            Match(field="content", text="import def return"), k=10, mode="wand"),
        "hot_exhaustive": lambda: s.search(
            Match(field="content", text="import def return"), k=10,
            mode="exhaustive"),
        "and_mid": lambda: s.search(
            Match(field="content", text="merge shard", operator="and"), k=10,
            mode="wand"),
        "bool_filtered": lambda: s.search(
            Bool(should=[Match(field="content", text="flush segment")],
                 filter=[Term(field="lang", value="py")]), k=10, mode="wand"),
        "rare_point": lambda: s.search(
            Match(field="content", text=uniq), k=10, mode="wand"),
    }
    out = {}
    for name, fn in qset.items():
        fn().collect()  # warm (plans + page cache), measured runs below
        times = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            rows = fn().collect()
            times.append(time.perf_counter() - t0)
        out[name] = {"p50": round(pct(times, 50), 3),
                     "p99": round(pct(times, 99), 3),
                     "n_hits": len(rows), "reps": n_reps}
    print(json.dumps({"n_docs": n_docs, "cpus": int(CPUS),
                      "build_sec": round(build_sec, 1) if build_sec else None,
                      "queries": out}))


if __name__ == "__main__":
    main()
