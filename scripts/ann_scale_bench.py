#!/usr/bin/env python
"""ANN at REAL vector count: latency + recall@10 for the whole similarity
family — exact cosine scan, LSH (materialized sign-bucket partitions),
IVF (materialized coarse-assignment partitions), PQ ADC (codes-only
scan), IVF-PQ (coarse-pruned codes scan) — over a deterministic 500k×64
clustered cloud (the sf0.1 embeddings table is 5k rows: fixed-overhead
dominated, can't show the partition-pruning story).

Vectors are generated distributed (mapInPandas, per-partition numpy RNG
seeded by partition id — no driver materialization) around 64 md5-derived
cluster centers with sigma=0.15 noise: a realistic ANN workload where
inverted lists are meaningful, not a uniform cloud.

Recall ground truth: exact cosine top-10 for the cosine-ranked paths
(LSH/IVF), exact squared-L2 top-10 for the L2-ranked quantized paths
(PQ/IVF-PQ). Indexes cache under /tmp and are reused across runs.

Usage: python scripts/ann_scale_bench.py [n_vecs] [n_reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
DIM = 64
N_CLUSTERS = 64


def centers():
    import hashlib

    import numpy as np

    out = np.empty((N_CLUSTERS, DIM))
    for c in range(N_CLUSTERS):
        for d in range(DIM):
            h = int(hashlib.md5(f"annc:{c}:{d}".encode()).hexdigest()[:8], 16)
            out[c, d] = (h / float(2 ** 32)) * 2.0 - 1.0
    return out


def generate_vectors(spark, n_rows: int, n_partitions: int = 64):
    import pandas as pd

    rows_per = (n_rows + n_partitions - 1) // n_partitions
    seed_df = spark.range(0, n_partitions, 1, n_partitions)
    C = centers()

    def gen(batches):
        import numpy as np

        for pdf in batches:
            for pid in pdf["id"]:
                start = int(pid) * rows_per
                end = min(start + rows_per, n_rows)
                if start >= end:
                    continue
                rng = np.random.default_rng(1234 + int(pid))
                ids = np.arange(start, end)
                base = C[ids % N_CLUSTERS]
                vecs = base + rng.normal(0.0, 0.15, size=base.shape)
                yield pd.DataFrame({
                    "vec_id": ids,
                    "embedding": [v.tolist() for v in vecs]})

    return seed_df.mapInPandas(gen, "vec_id long, embedding array<double>")


def best_of(fn, reps: int) -> float:
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from pyspark.sql import functions as F

    from opensearch_spark.ml import similarity as S
    from opensearch_spark.session import get_spark

    spark = get_spark("ann_scale", master=f"local[{CPUS}]")
    root = f"/tmp/opensearch_spark_ann_scale_{n_vecs}"
    pq_dir, ivfpq_dir, ann_dir, vec_dir = (
        os.path.join(root, s) for s in ("pq", "ivfpq", "ann", "vecs"))

    build_sec = {}
    if not os.path.exists(os.path.join(vec_dir, "_SUCCESS")):
        t0 = time.perf_counter()
        generate_vectors(spark, n_vecs).write.mode("overwrite").parquet(vec_dir)
        build_sec["datagen"] = round(time.perf_counter() - t0, 3)
    emb = spark.read.parquet(vec_dir)

    # TRAINED quantizers — the serving config (the gates' fixed md5
    # codebooks exist for SQL-oracle parity, not recall; random codebooks
    # on a clustered cloud give ~0 recall@10 by construction). PQ8x64:
    # 8 subspaces × 64 codewords over dim 64; coarse = kmeans++ 16 lists.
    if not os.path.exists(os.path.join(ann_dir, "meta.json")):
        t0 = time.perf_counter()
        S.AnnIndex.build(emb, ann_dir, n_planes=8, n_centroids=16)
        build_sec["ann_lsh_ivf"] = round(time.perf_counter() - t0, 3)
    # training feeds ONLY the two build branches — skip the 500k-vector
    # training scans entirely on warm-cache runs (both indexes persist
    # their codebooks/centroids in meta.json)
    need_pq = not os.path.exists(os.path.join(pq_dir, "meta.json"))
    need_ivfpq = not os.path.exists(os.path.join(ivfpq_dir, "meta.json"))
    if need_pq or need_ivfpq:
        t0 = time.perf_counter()
        books = S.pq_train(emb, n_sub=8, ksub=64, n_iters=3)
        cents = S.kmeanspp_centroids(emb, 16)
        build_sec["train"] = round(time.perf_counter() - t0, 3)
    if need_pq:
        t0 = time.perf_counter()
        S.PqIndex.build(emb, pq_dir, books, store_vec=True)
        build_sec["pq"] = round(time.perf_counter() - t0, 3)
    if need_ivfpq:
        t0 = time.perf_counter()
        S.IvfPqIndex.build(emb, ivfpq_dir, cents, books, store_vec=True)
        build_sec["ivfpq"] = round(time.perf_counter() - t0, 3)
    # per-segment HNSW graphs (ml/hnsw.py): 64 segments keep each
    # python-side graph build ~8k vectors; build is one applyInPandas
    # wave, cached like the other indexes
    from opensearch_spark.ml.hnsw import HnswIndex

    hnsw_dir = os.path.join(root, "hnsw")
    if not os.path.exists(os.path.join(hnsw_dir, "meta.json")):
        t0 = time.perf_counter()
        HnswIndex.build(emb, hnsw_dir, m=8, ef_construction=64,
                        n_segments=64)
        build_sec["hnsw"] = round(time.perf_counter() - t0, 3)
    ann = S.AnnIndex(ann_dir)
    pq = S.PqIndex(pq_dir)
    ivfpq = S.IvfPqIndex(ivfpq_dir)
    hnsw = HnswIndex(hnsw_dir)

    # 3 query vectors drawn from the corpus (doc 0 / mid / last cluster)
    qids = [0, n_vecs // 2, n_vecs - 1]
    qvecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
             for r in emb.where(F.col("vec_id").isin(qids)).collect()}

    import numpy as np

    timings: dict[str, float] = {}
    recall: dict[str, float] = {}
    cprec: dict[str, float] = {}
    K = 10

    def ids(df):
        return [r["vec_id"] for r in df.collect()]

    for qi in qids:
        qv = qvecs[qi]
        q = np.array(qv)

        exact_cos = ids(S.cosine_topk(emb, qv, k=K, exclude_id=qi))
        # exact L2 ground truth for the quantized paths
        d2col = (F.aggregate(
            F.zip_with(F.col("embedding"),
                       F.array(*[F.lit(float(x)) for x in qv]),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda a, v: a + v))
        exact_l2 = ids(emb.where(F.col("vec_id") != qi)
                       .select("vec_id", d2col.alias("d2"))
                       .orderBy(F.asc("d2"), F.asc("vec_id")).limit(K))

        ops = {
            "exact_cosine": lambda: ids(S.cosine_topk(emb, qv, k=K, exclude_id=qi)),
            "lsh": lambda: ids(ann.lsh_topk(spark, qv, k=K, multiprobe=1,
                                            exclude_id=qi)),
            "ivf": lambda: ids(ann.ivf_topk(spark, qv, k=K, nprobe=4,
                                            exclude_id=qi)),
            "pq_adc": lambda: ids(pq.topk(spark, qv, k=K, exclude_id=qi)),
            # rerank=100: the faiss IndexRefineFlat serving config — ADC
            # (or coarse-pruned ADC) shortlists 100, exact distances on
            # the stored vectors rank the final 10. Raw ADC recall on
            # THIS workload is ~0 by construction (64 dense clusters,
            # sigma 0.15: within-cluster ranking is below PQ8x64's
            # quantization floor), which is exactly why the refine path
            # exists — report both so the floor stays visible.
            "pq_rerank100": lambda: ids(pq.topk(spark, qv, k=K,
                                                exclude_id=qi, rerank=100)),
            "ivfpq": lambda: ids(ivfpq.topk(spark, qv, k=K, nprobe=4,
                                            exclude_id=qi)),
            "ivfpq_rerank100": lambda: ids(ivfpq.topk(spark, qv, k=K,
                                                      nprobe=4,
                                                      exclude_id=qi,
                                                      rerank=100)),
            "hnsw": lambda: ids(hnsw.topk(spark, qv, k=K, ef_search=100,
                                          exclude_id=qi)),
        }
        truth = {"exact_cosine": exact_cos, "lsh": exact_cos,
                 "ivf": exact_cos, "pq_adc": exact_l2, "ivfpq": exact_l2,
                 "pq_rerank100": exact_l2, "ivfpq_rerank100": exact_l2,
                 "hnsw": exact_cos}
        for name, fn in ops.items():
            got = fn()  # warm + recall measurement
            r = len(set(got) & set(truth[name])) / float(K)
            recall[name] = recall.get(name, 0.0) + r / len(qids)
            # cluster-precision@10: fraction of returns from the query's
            # true generative cluster (vec_id % N_CLUSTERS) — separates
            # "captures the coarse structure" from exact-rank recall,
            # which the quantized paths cannot express on this workload
            cp = sum(1 for g in got if g % N_CLUSTERS == qi % N_CLUSTERS) \
                / float(max(len(got), 1))
            cprec[name] = cprec.get(name, 0.0) + cp / len(qids)
            t = best_of(fn, n_reps)
            timings[name] = max(timings.get(name, 0.0), t)  # worst query

    out = {
        "metric": "ann_scale",
        "n_vecs": n_vecs,
        "dim": DIM,
        "cpus": int(CPUS),
        "build_sec": build_sec,
        "latency_sec_worst_query_best_of_reps": timings,
        "recall_at_10_mean": {k: round(v, 2) for k, v in recall.items()},
        "cluster_precision_at_10_mean": {k: round(v, 2)
                                         for k, v in cprec.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
