"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. The
  dot/norm fold runs JVM-side via ``F.zip_with`` + ``F.aggregate`` (no
  explode shuffle, no Python); global top-k is Spark's
  TakeOrderedAndProject, so at 100 TB this is one scan + a tiny merge.
- ``lsh_topk``: random-hyperplane LSH bucket path — candidates share the
  query's sign-bucket (multi-probe over 1-bit flips), exact re-rank inside.
  Hyperplanes are deterministic (md5-hash-derived), no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_scores(df: DataFrame, query_vec: list[float],
                  vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    dot = _dot(F.col(vec_col), q)
    norm_a = F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    norm_q = F.sqrt(F.aggregate(q, F.lit(0.0), lambda acc, v: acc + v * v))
    return df.select(
        F.col(id_col),
        F.round(dot / (norm_a * norm_q), 4).alias("cosine"),
    )


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                exclude_id: int | None = None) -> DataFrame:
    s = cosine_scores(df, query_vec, vec_col, id_col)
    if exclude_id is not None:
        s = s.where(F.col(id_col) != exclude_id)
    return s.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (j, d) derived
    from md5 — uniform in [-1, 1], no RNG."""
    import hashlib

    out = []
    for j in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{j}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h / float(2 ** 32)) * 2.0 - 1.0)
        out.append(row)
    return out


def _bucket_expr(vec_col: str, planes: list[list[float]]):
    """Sign-pattern bucket id of a vector column."""
    bucket = F.lit(0)
    for j, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        d = _dot(F.col(vec_col), arr)
        bucket = bucket + F.when(d > 0, F.lit(2 ** j)).otherwise(F.lit(0))
    return bucket.cast("int")



def sign_bucket(vec, planes: list[list[float]]) -> int:
    """Driver-side sign-pattern bucket of one vector — the Python twin of
    ``_bucket_expr`` (strictly ``> 0``, bit j = plane j). ONE authoring
    site: lsh_topk and AnnIndex probe with this; a drifted copy would
    silently probe the wrong buckets (recall -> 0)."""
    b = 0
    for j, p in enumerate(planes):
        if sum(x * y for x, y in zip(vec, p)) > 0:
            b |= 1 << j
    return b


def probe_buckets(qb: int, n_planes: int, multiprobe: int) -> list[int]:
    """Multiprobe set: the query bucket plus all 1-bit (and, at
    multiprobe >= 2, 2-bit) flips, sorted."""
    probes = {qb}
    if multiprobe >= 1:
        probes |= {qb ^ (1 << j) for j in range(n_planes)}
    if multiprobe >= 2:
        probes |= {qb ^ (1 << i) ^ (1 << j)
                   for i in range(n_planes) for j in range(i + 1, n_planes)}
    return sorted(probes)


def lsh_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             n_planes: int = 8, vec_col: str = "embedding",
             id_col: str = "vec_id", multiprobe: int = 1,
             exclude_id: int | None = None) -> DataFrame:
    """ANN: restrict to the query's LSH bucket (± multiprobe 1-bit flips),
    exact cosine re-rank inside. Recall measured in tests vs cosine_topk."""
    dim = len(query_vec)
    planes = hyperplanes(n_planes, dim)
    probes = probe_buckets(sign_bucket(query_vec, planes), n_planes,
                           multiprobe)
    bucketed = df.withColumn("_bkt", _bucket_expr(vec_col, planes))
    cand = bucketed.where(F.col("_bkt").isin(probes))
    return cosine_topk(cand, query_vec, k, vec_col, id_col, exclude_id)


def ivf_centroids(df: DataFrame, n_centroids: int = 16,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  n_iters: int = 2) -> list[list[float]]:
    """Deterministic IVF coarse quantizer: seed centroids = the first
    ``n_centroids`` vectors by id (deterministic, no RNG), refined with
    ``n_iters`` Lloyd iterations as distributed DataFrame aggs (assign =
    argmin distance via one expression; update = groupBy(centroid).avg).
    Centroid list is tiny (n_centroids × dim floats) — broadcast state."""
    seeds = (df.orderBy(id_col).limit(n_centroids)
             .select(vec_col).collect())
    cents = [[float(x) for x in r[vec_col]] for r in seeds]
    for _ in range(n_iters):
        assigned = df.withColumn("_c", _nearest_centroid_expr(vec_col, cents))
        dim = len(cents[0])
        means = (assigned.groupBy("_c")
                 .agg(*[F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"m{i}")
                        for i in range(dim)])
                 .collect())
        new = {int(r["_c"]): [float(r[f"m{i}"]) for i in range(dim)] for r in means}
        cents = [new.get(j, cents[j]) for j in range(len(cents))]
    return cents


def _nearest_centroid_expr(vec_col: str, cents: list[list[float]]):
    """argmin_j ||v - c_j||² as a single Catalyst expression: since ||v||²
    is common, argmax_j (2·v·c_j - ||c_j||²).

    Linear-size ``array_max`` struct fold (the ``_pq_code_expr``
    discipline) — the earlier when-chain duplicated its running best at
    every step, an O(2^k) expression tree that stalls the driver around
    16 centroids. struct-max over (score, -j) keeps the same semantics:
    first maximum, ties to the smallest j."""
    entries = []
    for j, c in enumerate(cents):
        arr = F.array(*[F.lit(float(x)) for x in c])
        c2 = sum(x * x for x in c)
        s = 2.0 * _dot(F.col(vec_col), arr) - F.lit(float(c2))
        entries.append(F.struct(s.alias("s"), F.lit(-j).alias("nj")))
    best = F.array_max(F.array(*entries))
    return (-best["nj"]).cast("int")


def ivf_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             exclude_id: int | None = None,
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` centroids nearest to the query, exact
    cosine re-rank inside their inverted lists. At scale the assignment
    column is precomputed once and the scan is partition-pruned on it;
    recall vs cosine_topk asserted in tests."""
    cents = centroids or ivf_centroids(df, n_centroids, vec_col, id_col)

    def d2(c):
        return sum((x - y) ** 2 for x, y in zip(query_vec, c))

    order = sorted(range(len(cents)), key=lambda j: (d2(cents[j]), j))
    probes = order[:nprobe]
    assigned = df.withColumn("_c", _nearest_centroid_expr(vec_col, cents))
    cand = assigned.where(F.col("_c").isin(probes))
    return cosine_topk(cand, query_vec, k, vec_col, id_col, exclude_id)


def kmeanspp_centroids(df: DataFrame, n_centroids: int = 16,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       n_iters: int = 2,
                       oversample: int | None = None) -> list[list[float]]:
    """Deterministic k-means||-style seeding (Bahmani et al., "Scalable
    k-means++", VLDB 2012 — the RNG-free variant): ONE distributed pass
    draws an oversampled candidate pool (the ``oversample`` ≥ 8·k rows
    ranked first by md5(id), a deterministic stand-in for the uniform
    pre-sample), then the classic farthest-point traversal (the
    deterministic analog of D² re-sampling) runs DRIVER-SIDE on the tiny
    collected pool — O(pool·k) numpy work on ≤ a few hundred vectors.
    Then ``n_iters`` distributed Lloyd refinements (assign = one argmin
    expression, update = groupBy().avg).

    Total table scans: 1 (pool) + n_iters (Lloyd) — independent of k.
    The previous farthest-point-over-the-table loop ran k sequential
    whole-table aggregations with an O(k²)-growing least() expression;
    at 10⁹ vectors that build is k full scans, this is one."""
    pool_n = int(oversample or max(8 * n_centroids, 64))
    pool_rows = (df.select(id_col, vec_col)
                 .withColumn("_r", F.md5(F.col(id_col).cast("string")))
                 .orderBy("_r", id_col).limit(pool_n)
                 .select(id_col, vec_col).collect())
    # deterministic order inside the pool: by id (collect order already
    # deterministic via the global sort, but be explicit)
    pool_rows.sort(key=lambda r: r[id_col])
    import numpy as np

    pool = np.asarray([[float(x) for x in r[vec_col]] for r in pool_rows],
                      dtype=np.float64)
    if pool.shape[0] == 0:
        return []
    k = min(n_centroids, pool.shape[0])
    chosen = [0]  # seed 1 = smallest id in the pool
    d2 = ((pool - pool[0]) ** 2).sum(axis=1)
    while len(chosen) < k:
        j = int(d2.argmax())  # np.argmax takes the FIRST max → ties by id
        chosen.append(j)
        d2 = np.minimum(d2, ((pool - pool[j]) ** 2).sum(axis=1))
    cents = [[float(x) for x in pool[j]] for j in chosen]
    for _ in range(n_iters):
        assigned = df.withColumn("_c", _nearest_centroid_expr(vec_col, cents))
        dim = len(cents[0])
        means = (assigned.groupBy("_c")
                 .agg(*[F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"m{i}")
                        for i in range(dim)])
                 .collect())
        new = {int(r["_c"]): [float(r[f"m{i}"]) for i in range(dim)] for r in means}
        cents = [new.get(j, cents[j]) for j in range(len(cents))]
    return cents


class AnnIndex:
    """Build-time-materialized ANN state — the 100 TB serving path.

    The round-1 ``lsh_topk``/``ivf_topk`` recomputed the bucket /
    assignment expression over the FULL scan per query; here the
    embeddings table is written once with its LSH sign-bucket and IVF
    assignment as parquet partition columns, so a query's probe set
    becomes directory-level partition pruning (``PartitionFilters`` in
    the scan — asserted in tests) and only the probed lists are read.

    Layout under ``out_dir``: ``lsh/`` partitioned by ``_bkt``, ``ivf/``
    partitioned by ``_c``, ``meta.json`` carrying planes + centroids
    (tiny broadcastable state, same discipline as the inverted index).
    """

    def __init__(self, path: str):
        import json
        import os

        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        self.planes = self.meta["planes"]
        self.centroids = self.meta["centroids"]
        self.vec_col = self.meta["vec_col"]
        self.id_col = self.meta["id_col"]

    @staticmethod
    def build(df: DataFrame, out_dir: str, n_planes: int = 8,
              n_centroids: int = 16, vec_col: str = "embedding",
              id_col: str = "vec_id", n_iters: int = 2) -> "AnnIndex":
        import json
        import os

        dim = int(df.select(F.size(vec_col).alias("d")).first()["d"])
        planes = hyperplanes(n_planes, dim)
        cents = kmeanspp_centroids(df, n_centroids, vec_col, id_col, n_iters)
        base = df.select(id_col, vec_col)
        (base.withColumn("_bkt", _bucket_expr(vec_col, planes))
         .write.mode("overwrite").partitionBy("_bkt")
         .parquet(os.path.join(out_dir, "lsh")))
        (base.withColumn("_c", _nearest_centroid_expr(vec_col, cents))
         .write.mode("overwrite").partitionBy("_c")
         .parquet(os.path.join(out_dir, "ivf")))
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump({"planes": planes, "centroids": cents,
                       "vec_col": vec_col, "id_col": id_col,
                       "n_planes": n_planes, "n_centroids": n_centroids}, f)
        return AnnIndex(out_dir)

    def _probes_lsh(self, query_vec: list[float], multiprobe: int) -> list[int]:
        return probe_buckets(sign_bucket(query_vec, self.planes),
                             len(self.planes), multiprobe)

    def lsh_topk(self, spark, query_vec: list[float], k: int = 10,
                 multiprobe: int = 1, exclude_id: int | None = None) -> DataFrame:
        import os

        cand = (spark.read.parquet(os.path.join(self.path, "lsh"))
                .where(F.col("_bkt").isin(self._probes_lsh(query_vec, multiprobe))))
        return cosine_topk(cand, query_vec, k, self.vec_col, self.id_col, exclude_id)

    def ivf_topk(self, spark, query_vec: list[float], k: int = 10,
                 nprobe: int = 4, exclude_id: int | None = None) -> DataFrame:
        import os

        def d2(c):
            return sum((x - y) ** 2 for x, y in zip(query_vec, c))

        order = sorted(range(len(self.centroids)),
                       key=lambda j: (d2(self.centroids[j]), j))
        cand = (spark.read.parquet(os.path.join(self.path, "ivf"))
                .where(F.col("_c").isin(order[:nprobe])))
        return cosine_topk(cand, query_vec, k, self.vec_col, self.id_col, exclude_id)


def knn_join_exact(queries: DataFrame, corpus: DataFrame, k: int = 5,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   exclude_self: bool = True) -> DataFrame:
    """Batch kNN join: for EVERY query vector, its top-k cosine neighbors
    from the corpus — (query_id, neighbor_id, cosine, rank). Exact
    baseline: blocked cross join with the JVM zip_with/aggregate fold and
    a per-query window top-k. O(|Q|·|C|) — the correctness oracle;
    ``knn_join_lsh`` is the bucketed scale path.

    ``exclude_self`` drops neighbor rows whose id EQUALS the query id —
    correct when queries and corpus are the same table (the self-join
    case). Pass False when the two frames are independent tables whose
    id spaces merely overlap: a corpus row sharing an id value with a
    query is a legitimate neighbor there."""
    from pyspark.sql import Window as W

    qa = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("_qv"))
    ca = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("_cv"))
    dot = _dot(F.col("_qv"), F.col("_cv"))
    nq = F.sqrt(_dot(F.col("_qv"), F.col("_qv")))
    nc = F.sqrt(_dot(F.col("_cv"), F.col("_cv")))
    scored = qa.crossJoin(ca)
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select("query_id", "neighbor_id",
                           F.round(dot / (nq * nc), 4).alias("cosine"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def knn_join_lsh(df: DataFrame, k: int = 5, n_planes: int = 8,
                 multiprobe: int = 1,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate batch kNN join at scale: self-join on the shared LSH
    sign-bucket (candidates only, never |D|²), exact cosine re-rank per
    query inside its candidate set. ``multiprobe=1`` additionally probes
    every 1-bit-flip bucket on the query side (n_planes+1 probes per
    query, linear candidate cost); ``multiprobe>=2`` adds the 2-bit
    flips (the ``probe_buckets`` semantics). Recall vs ``knn_join_exact`` asserted
    in tests."""
    from pyspark.sql import Window as W

    first = df.select(F.size(vec_col).alias("d"))
    planes = hyperplanes(n_planes, int(first.first()["d"]))
    b = df.withColumn("_bkt", _bucket_expr(vec_col, planes))
    # same probe semantics as probe_buckets/lsh_topk: 1-bit flips at
    # multiprobe>=1, 2-bit flips added at multiprobe>=2 (was: >=2
    # silently behaved like 1 — round-4 review)
    probe_cols = [F.col("_bkt")]
    if multiprobe >= 1:
        probe_cols += [F.col("_bkt").bitwiseXOR(F.lit(1 << j))
                       for j in range(n_planes)]
    if multiprobe >= 2:
        probe_cols += [F.col("_bkt").bitwiseXOR(F.lit((1 << i) | (1 << j)))
                       for i in range(n_planes)
                       for j in range(i + 1, n_planes)]
    qa = (b.select(F.col(id_col).alias("query_id"),
                   F.col(vec_col).alias("_qv"),
                   F.explode(F.array(*probe_cols)).alias("_bkt")))
    ca = b.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
                  "_bkt")
    dot = _dot(F.col("_qv"), F.col("_cv"))
    nq = F.sqrt(_dot(F.col("_qv"), F.col("_qv")))
    nc = F.sqrt(_dot(F.col("_cv"), F.col("_cv")))
    # no dedup pass needed: the probe values are pairwise DISTINCT
    # (qb, qb^2^j, qb^2^i^2^j) and each neighbor carries exactly one
    # bucket, so a (query, neighbor) pair joins at most once — the old
    # .distinct() here was a full shuffle of the largest intermediate
    # for nothing (round-4 review)
    scored = (qa.join(ca, "_bkt")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(dot / (nq * nc), 4).alias("cosine")))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                             n_planes: int = 8, vec_col: str = "embedding",
                             id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH-bucket self-join + exact
    verify (the embedding analog of minhash_lsh_pairs)."""
    first = df.select(F.size(vec_col).alias("d")).first()
    planes = hyperplanes(n_planes, int(first["d"]))
    b = df.withColumn("_bkt", _bucket_expr(vec_col, planes))
    norm = F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    b = b.withColumn("_nrm", norm)
    l = b.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
                 F.col("_nrm").alias("na"), "_bkt")
    r = b.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
                 F.col("_nrm").alias("nb"), "_bkt")
    cand = l.join(r, "_bkt").where(F.col("a") < F.col("b"))
    return (
        cand.withColumn(
            "cosine", F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def hybrid_rrf(searcher, q, emb_df: DataFrame, query_vec: list[float],
               k: int = 10, n_candidates: int = 50, rrf_k: int = 60,
               id_col: str = "vec_id") -> DataFrame:
    """Hybrid lexical+vector retrieval with reciprocal-rank fusion — the
    hybrid query + score-normalization processor of the reference
    ecosystem's neural-search pipeline, fused the rank-based way (RRF:
    score = Σ 1/(rrf_k + rank_i) over the lists containing the doc).

    Scale shape: each leg is its own bounded top-n (BM25 via the posting
    engine, cosine via the ANN/brute-force operators); fusion joins two
    ≤n_candidates-row frames — the rank windows and the outer join never
    touch the corpus. Returns (doc_id, rrf_score).
    """
    from pyspark.sql import Window as W

    bm = searcher.search(q, k=n_candidates, mode="exhaustive",
                         round_scores=4)
    wb = W.orderBy(F.desc("score"), F.asc("doc_id"))
    bm_r = bm.select("doc_id", F.row_number().over(wb).alias("r_bm"))
    cos = cosine_topk(emb_df, query_vec, k=n_candidates)
    wc = W.orderBy(F.desc("cosine"), F.asc(id_col))
    cos_r = cos.select(F.col(id_col).alias("doc_id"),
                       F.row_number().over(wc).alias("r_cos"))
    j = bm_r.join(cos_r, "doc_id", "full_outer")
    rrf = (
        F.coalesce(1.0 / (F.lit(rrf_k) + F.col("r_bm")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("r_cos")), F.lit(0.0)))
    return (j.select("doc_id", F.round(rrf, 6).alias("rrf_score"))
            .orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(k))


def hybrid_minmax(searcher, q, emb_df: DataFrame, query_vec: list[float],
                  k: int = 10, n_candidates: int = 50,
                  w_lexical: float = 0.5, w_vector: float = 0.5,
                  id_col: str = "vec_id") -> DataFrame:
    """Hybrid retrieval with min-max score normalization — the other
    normalization mode of the reference ecosystem's hybrid pipeline
    (normalization-processor technique=min_max, arithmetic mean
    combination): each leg's top-n scores are rescaled to [0, 1] over
    that leg's candidate set, then combined as a weighted sum (docs
    missing from a leg contribute 0). Same bounded-frames fusion shape
    as hybrid_rrf. Returns (doc_id, hybrid_score)."""
    bm = searcher.search(q, k=n_candidates, mode="exhaustive",
                         round_scores=4).select("doc_id", "score")
    cos = cosine_topk(emb_df, query_vec, k=n_candidates).select(
        F.col(id_col).alias("doc_id"), F.col("cosine").alias("score"))

    def norm(df):
        # bounded frame (<= n_candidates rows): the min/max agg is tiny.
        # The leg's min-scoring hit clamps to MIN_SCORE=0.001 instead of
        # 0 (reference MinMaxScoreNormalizationTechnique) — a doc that
        # MATCHED a leg must stay distinguishable from one absent from it
        mm = df.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
        return (df.crossJoin(F.broadcast(mm))
                .select("doc_id",
                        F.when(F.col("hi") > F.col("lo"),
                               F.when(F.col("score") == F.col("lo"),
                                      F.lit(0.001))
                               .otherwise((F.col("score") - F.col("lo"))
                                          / (F.col("hi") - F.col("lo"))))
                        .otherwise(F.lit(1.0)).alias("n")))

    j = (norm(bm).withColumnRenamed("n", "n_bm")
         .join(norm(cos).withColumnRenamed("n", "n_cos"), "doc_id",
               "full_outer"))
    score = (F.coalesce(F.col("n_bm"), F.lit(0.0)) * w_lexical
             + F.coalesce(F.col("n_cos"), F.lit(0.0)) * w_vector)
    return (j.select("doc_id", F.round(score, 6).alias("hybrid_score"))
            .orderBy(F.desc("hybrid_score"), F.asc("doc_id")).limit(k))


def radius_search(df: DataFrame, query_vec: list[float], min_cosine: float,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  exclude_id: int | None = None) -> DataFrame:
    """Radial search (k-NN plugin 'radial search': min_score / max_distance
    bounded retrieval instead of top-k — KNNQueryBuilder.java's minScore
    path). The inclusion decision is made on the 4-decimal-rounded cosine
    so it is reproducible across engines; plan = the same single-scan
    JVM fold as cosine_scores + a filter (no shuffle at all)."""
    s = cosine_scores(df, query_vec, vec_col, id_col)  # cosine pre-rounded(4)
    if exclude_id is not None:
        s = s.where(F.col(id_col) != exclude_id)
    return s.where(F.col("cosine") >= min_cosine)


# ---------------------------------------------------------------------------
# int8 scalar quantization (the reference's knn_vector byte/quantized path;
# Lucene 9.9-style scalar quantizer, simplified to a global [min,max] range)
# ---------------------------------------------------------------------------

def sq8_stats(df: DataFrame, vec_col: str = "embedding") -> tuple[float, float]:
    """Global component range — ONE metadata-light aggregation pass; at
    100 TB this is the whole training cost of the quantizer (vs k-means
    for IVF/PQ)."""
    row = df.select(
        F.min(F.array_min(vec_col)).alias("mn"),
        F.max(F.array_max(vec_col)).alias("mx"),
    ).first()
    return float(row["mn"]), float(row["mx"])


def _sq8_dequant_col(vec_col, mn: float, scale: float):
    # quantize to 0..255 then de-quantize: the scored vector is exactly what
    # an int8-stored index would reconstruct (4x smaller storage at scale;
    # round() is HALF_UP on both Spark and DuckDB for non-negative inputs)
    return F.transform(
        vec_col,
        lambda x: F.lit(mn)
        + F.least(F.lit(255.0), F.greatest(F.lit(0.0), F.round(
            (x.cast("double") - F.lit(mn)) / F.lit(scale)).cast("double")))
        * F.lit(scale),
    )


def sq8_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             exclude_id: int | None = None,
             stats: tuple[float, float] | None = None) -> DataFrame:
    """Approximate cosine top-k over int8 scalar-quantized vectors.

    Both sides of the dot product are quantize→dequantize round-tripped, so
    the score is the one a byte-vector index computes. Plan shape is
    identical to cosine_topk (scan + codegen fold + TakeOrderedAndProject);
    only the per-component reconstruction differs."""
    import math

    mn, mx = stats or sq8_stats(df, vec_col)
    scale = (mx - mn) / 255.0
    if scale == 0.0:
        raise ValueError("sq8: constant corpus (max == min), nothing to quantize")
    # floor(v+0.5) == HALF_UP for the non-negative (x-mn)/scale; the code
    # is CLAMPED to [0, 255] — a query component outside the corpus
    # [mn, mx] range would otherwise dequantize to a value no int8 index
    # can store, breaking the byte-vector-index score contract
    dq = [mn + min(255, max(0, math.floor((float(x) - mn) / scale + 0.5)))
          * scale
          for x in query_vec]
    deq = _sq8_dequant_col(F.col(vec_col), mn, scale)
    qarr = F.array(*[F.lit(float(v)) for v in dq])
    dot = F.aggregate(F.zip_with(deq, qarr, lambda x, y: x * y),
                      F.lit(0.0), lambda a, v: a + v)
    nx = F.aggregate(deq, F.lit(0.0), lambda a, v: a + v * v)
    ny = float(sum(v * v for v in dq))
    s = df.select(
        F.col(id_col),
        F.round(dot / (F.sqrt(nx) * F.lit(math.sqrt(ny))), 4).alias("cosine"),
    )
    if exclude_id is not None:
        s = s.where(F.col(id_col) != exclude_id)
    return s.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def semantic_dedup(df: DataFrame, threshold: float = 0.42, n_planes: int = 8,
                   vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic deduplication",
    arXiv:2303.09540): partition the embedding space into clusters, find
    within-cluster pairs whose cosine similarity exceeds the threshold,
    and keep exactly one representative (the minimum id) from every
    near-duplicate group. Returns the SURVIVING rows of ``df``.

    Spark-first shape: the cluster assignment is the deterministic LSH
    sign-bucket (pure codegen arithmetic — the paper's k-means clustering
    serves the same role: bound the pairwise comparison to within-cluster),
    the pairwise step is the bucketed self-join of
    ``embedding_near_dup_pairs`` (never |D|²), and the drop is one
    anti-join. Every join side scales with the corpus, so the anti-join
    carries the same explicit merge hint as the dedup pipelines —
    Catalyst must never auto-broadcast a corpus-scaled side (see
    tests/test_plans.py::test_dedup_pipelines_never_broadcast...).
    """
    pairs = embedding_near_dup_pairs(df, threshold, n_planes, vec_col, id_col)
    removed = pairs.select(F.col("b").alias(id_col)).distinct()
    return df.join(removed.hint("merge"), id_col, "left_anti")


# ---------------------------------------------------------------------------
# product quantization (the k-NN plugin's faiss IVF-PQ encoder path —
# `PQ<m>x<b>` encoder in the reference ecosystem's method spec; algorithm:
# Jegou et al., "Product Quantization for Nearest Neighbor Search",
# TPAMI 2011)
# ---------------------------------------------------------------------------


def pq_codebooks_fixed(n_sub: int, ksub: int,
                       subdim: int) -> list[list[list[float]]]:
    """Deterministic md5-derived per-subspace codebooks — the same
    fixed-constants posture as ``hyperplanes``: the identical literals
    inline into the engine's Catalyst expressions and the DuckDB oracle
    SQL, so the PQ gate is fully hash-checked (the Lloyd-trained
    ``pq_train`` codebooks stay rows-only / recall-tested, mirroring the
    ivf_topk / ivf_fixed_topk split)."""
    import hashlib

    books = []
    for m in range(n_sub):
        book = []
        for j in range(ksub):
            row = []
            for d in range(subdim):
                h = int(hashlib.md5(
                    f"pq:{m}:{j}:{d}".encode()).hexdigest()[:8], 16)
                row.append((h / float(2 ** 32)) * 2.0 - 1.0)
            book.append(row)
        books.append(book)
    return books


def pq_train(df: DataFrame, n_sub: int = 4, ksub: int = 8,
             vec_col: str = "embedding", id_col: str = "vec_id",
             n_iters: int = 2,
             oversample: int | None = None) -> list[list[list[float]]]:
    """Train per-subspace PQ codebooks deterministically, k-means||-style
    (same discipline as ``kmeanspp_centroids``): ONE distributed pass
    collects an md5-ranked oversampled pool, farthest-point seeding + the
    Lloyd refinements run per subspace over the tiny pool DRIVER-SIDE in
    numpy — O(pool · ksub · n_sub) work on ≤ a few hundred vectors.

    Scale shape: table scans = 1, independent of n_sub and ksub (the
    classic faiss recipe also trains on a bounded sample, not the corpus).
    Returns ``codebooks[m][j][d]`` with d over ``dim / n_sub``.
    """
    import numpy as np

    pool_n = int(oversample or max(8 * ksub, 64))
    pool_rows = (df.select(id_col, vec_col)
                 .withColumn("_r", F.md5(F.col(id_col).cast("string")))
                 .orderBy("_r", id_col).limit(pool_n)
                 .select(id_col, vec_col).collect())
    pool_rows.sort(key=lambda r: r[id_col])
    pool = np.asarray([[float(x) for x in r[vec_col]] for r in pool_rows],
                      dtype=np.float64)
    if pool.shape[0] == 0:
        return []
    dim = pool.shape[1]
    if dim % n_sub:
        raise ValueError(f"pq_train: dim {dim} not divisible by n_sub {n_sub}")
    subdim = dim // n_sub
    books = []
    for m in range(n_sub):
        sub = pool[:, m * subdim:(m + 1) * subdim]
        k = min(ksub, sub.shape[0])
        chosen = [0]
        d2 = ((sub - sub[0]) ** 2).sum(axis=1)
        while len(chosen) < k:
            j = int(d2.argmax())  # first max -> deterministic tie-break
            chosen.append(j)
            d2 = np.minimum(d2, ((sub - sub[j]) ** 2).sum(axis=1))
        cents = sub[chosen].copy()
        for _ in range(n_iters):
            # Lloyd over the pool: assign by squared distance, re-mean
            dists = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = dists.argmin(axis=1)
            for j in range(k):
                sel = sub[assign == j]
                if len(sel):
                    cents[j] = sel.mean(axis=0)
        books.append([[float(x) for x in c] for c in cents])
    return books


def _pq_code_expr(vec_col: str, book: list[list[float]], m: int, subdim: int):
    """argmin_j ||sub_m(v) - c_j||² as a Catalyst expression over the
    subvector slice — argmax_j (2·sub·c_j − ||c_j||²), ties to the
    smallest j (the ``_nearest_centroid_expr`` semantics).

    Construction is ``array_max`` over struct(score, -j) — LINEAR
    expression size in ksub. The when-chain fold used for small coarse
    codebooks duplicates its running best at every step (O(2^k) tree);
    at PQ codebook sizes (16-256 codewords) that detonates the driver,
    while the struct-max lexicographic compare is one array of k
    entries."""
    sub = F.slice(F.col(vec_col), m * subdim + 1, subdim)
    entries = []
    for j, c in enumerate(book):
        arr = F.array(*[F.lit(float(x)) for x in c])
        c2 = sum(x * x for x in c)
        s = 2.0 * _dot(sub, arr) - F.lit(float(c2))
        entries.append(F.struct(s.alias("s"), F.lit(-j).alias("nj")))
    best = F.array_max(F.array(*entries))
    return (-best["nj"]).cast("int")


def pq_encode_batched(df: DataFrame, codebooks: list[list[list[float]]],
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      cents: list[list[float]] | None = None,
                      keep_vec: bool = False) -> DataFrame:
    """Arrow-batched numpy PQ encode — the build path for PRODUCTION-size
    codebooks (16×256 and up), where the literal argmin expression fold
    would put tens of thousands of nodes into one Catalyst projection.
    Per batch: one (rows × ksub) matmul per subspace, argmin row-wise —
    classic faiss encode, vectorized end-to-end (mapInPandas, zero per-row
    Python). With ``cents`` the encode is RESIDUAL (IVF-PQ): vectors are
    first assigned to their nearest coarse centroid and the codebooks
    quantize v − c. Ties go to the smallest codeword index (numpy argmin
    semantics), matching the expression path's tie rule; exact bit-parity
    with the expression encode is only guaranteed off ties (summation
    order differs), which is why the SQL-oracle gates keep the small
    expression encode and this path is recall-tested.
    ``keep_vec`` passes the raw vector through for rerank-capable indexes.
    """
    import numpy as np

    n_sub = len(codebooks)
    subdim = len(codebooks[0][0])
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    bnorm = [(b * b).sum(axis=1) for b in books]
    C = np.asarray(cents, dtype=np.float64) if cents is not None else None
    cnorm = (C * C).sum(axis=1) if C is not None else None

    # preserve the input id column's actual type (was: hardcoded 'long',
    # which made a string-id build crash at Arrow conversion — the
    # expression path pq_encode never had that restriction)
    id_type = dict(df.dtypes)[id_col]
    fields = [f"{id_col} {id_type}"]
    if C is not None:
        fields.append("_c int")
    fields += [f"code_{m} int" for m in range(n_sub)]
    if keep_vec:
        fields.append(f"{vec_col} array<double>")
    schema = ", ".join(fields)

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            out = {id_col: pdf[id_col].values}
            if C is not None:
                # nearest coarse centroid: argmin ||v-c||² = argmin(-2vc+c²)
                assign = (-2.0 * (V @ C.T) + cnorm).argmin(axis=1)
                out["_c"] = assign.astype("int32")
                R = V - C[assign]
            else:
                R = V
            for m in range(n_sub):
                sub = R[:, m * subdim:(m + 1) * subdim]
                d = -2.0 * (sub @ books[m].T) + bnorm[m]
                out[f"code_{m}"] = d.argmin(axis=1).astype("int32")
            if keep_vec:
                out[vec_col] = [v.tolist() for v in V]
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(encode, schema)


def pq_encode(df: DataFrame, codebooks: list[list[list[float]]],
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Encode vectors to their PQ codes: (id, code_0 … code_{M-1}), one
    small int per subspace. This is the 100 TB memory story — a 64-dim
    float32 vector (256 B) becomes M bytes (32× at M=8), and the codes
    table is materialized ONCE at build time (AnnIndex discipline) so
    query-time scoring never touches the raw vectors. Pure codegen: the
    per-subspace argmin folds run JVM-side in one scan, no shuffle."""
    subdim = len(codebooks[0][0])
    cols = [_pq_code_expr(vec_col, book, m, subdim).alias(f"code_{m}")
            for m, book in enumerate(codebooks)]
    return df.select(F.col(id_col), *cols)



def pq_distance_tables(query_vec: list[float],
                       codebooks: list[list[list[float]]]
                       ) -> list[list[float]]:
    """Driver-side M x ksub squared-L2 distance tables for ADC — the
    query-scale precompute shared by every PQ path."""
    subdim = len(codebooks[0][0])
    out = []
    for m, book in enumerate(codebooks):
        qsub = query_vec[m * subdim:(m + 1) * subdim]
        dists = []
        for c in book:
            s = 0.0
            for x, y in zip(qsub, c):
                s += (float(x) - float(y)) ** 2
            dists.append(s)
        out.append(dists)
    return out


def adc_lookup_sum(tables_m: list[list[float]]):
    """Sum_m element_at(literal table_m, code_m + 1): the ADC
    lookup-chain over the code columns. The distance-table literals and
    the LEFT-TO-RIGHT subspace sum order are load-bearing — they mirror
    the SQL twin so engine and oracle add identical doubles in identical
    order (hash-stable). ONE authoring site for all three PQ paths
    (pq_adc_topk, PqIndex.topk, IvfPqIndex.topk)."""
    s = None
    for m, dists in enumerate(tables_m):
        lookup = F.element_at(F.array(*[F.lit(float(d)) for d in dists]),
                              F.col(f"code_{m}") + 1)
        s = lookup if s is None else s + lookup
    return s


def pq_adc_topk(df: DataFrame, query_vec: list[float],
                codebooks: list[list[list[float]]], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                exclude_id: int | None = None) -> DataFrame:
    """Asymmetric-distance (ADC) top-k, ascending squared L2: the query
    builds an M×ksub distance table DRIVER-SIDE (M·ksub·subdim flops,
    query-scale not corpus-scale); each doc's distance is then
    Σ_m table[m][code_m] — a literal-array ``element_at`` lookup chain
    over the codes, zero per-row vector math at query time. Plan: one
    scan (of the materializable codes) + TakeOrderedAndProject; the
    lookup stays inside whole-stage codegen.

    Distance-table terms sum left-to-right per subspace, mirroring the
    SQL twin's literal order, so engine and oracle add identical doubles
    in identical order (hash-stable)."""
    codes = pq_encode(df, codebooks, vec_col, id_col)
    adc = adc_lookup_sum(pq_distance_tables(query_vec, codebooks))
    out = codes.select(F.col(id_col), F.round(adc, 6).alias("adc"))
    if exclude_id is not None:
        out = out.where(F.col(id_col) != exclude_id)
    return out.orderBy(F.asc("adc"), F.asc(id_col)).limit(k)


class PqIndex:
    """Build-time-materialized PQ codes — the serving posture of the
    ADC path (AnnIndex discipline): ``build`` encodes the corpus ONCE
    and writes only (id, code_0 … code_{M-1}) plus the codebooks in
    ``meta.json``; ``topk`` scans the codes table — M small ints per
    row, 32× under the raw float32 vectors at M=8 — and never touches
    embeddings at query time. At 100 TB the ADC scan is the smallest
    possible I/O for a full-corpus rank: a literal distance-table lookup
    chain inside whole-stage codegen + TakeOrderedAndProject."""

    def __init__(self, path: str):
        import json
        import os

        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        self.codebooks = self.meta["codebooks"]
        self.id_col = self.meta["id_col"]

    @staticmethod
    def build(df: DataFrame, out_dir: str,
              codebooks: list[list[list[float]]],
              vec_col: str = "embedding",
              id_col: str = "vec_id",
              store_vec: bool = False) -> "PqIndex":
        """``store_vec`` co-locates the raw vector column with the codes
        (faiss IndexRefineFlat posture) so ``topk(rerank=R)`` can refine
        ADC candidates with exact distances WITHOUT a join back to the
        source table. Parquet is columnar: the ADC scan still reads only
        the code columns (column pruning), so the query-time I/O story is
        unchanged — the vector column's pages are touched only by the
        rerank fetch, under a pushed-down ``id IN (...)`` filter.
        Codebooks past 512 total codewords encode via the Arrow-batched
        numpy path (the literal argmin fold is for oracle-parity sizes)."""
        import json
        import os

        big = len(codebooks) * len(codebooks[0]) > 512
        if big or store_vec:
            enc = pq_encode_batched(df, codebooks, vec_col, id_col,
                                    keep_vec=store_vec)
        else:
            enc = pq_encode(df, codebooks, vec_col, id_col)
        enc.write.mode("overwrite").parquet(os.path.join(out_dir, "codes"))
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump({"codebooks": codebooks, "id_col": id_col,
                       "vec_col": vec_col, "store_vec": store_vec}, f)
        return PqIndex(out_dir)

    def codes(self, spark) -> DataFrame:
        import os

        return spark.read.parquet(os.path.join(self.path, "codes"))

    def topk(self, spark, query_vec: list[float], k: int = 10,
             exclude_id: int | None = None,
             rerank: int | None = None) -> DataFrame:
        """ADC top-k over the materialized codes (ascending squared L2).
        Same distance-table literals and left-to-right sum as
        ``pq_adc_topk`` — byte-identical output, minus the encode scan.
        With ``rerank=R`` (R ≥ k; R < k raises): exact-distance refine of
        the ADC top-R (requires ``store_vec`` at build); returns (id, d2)
        exact. ``rerank=k`` refines exactly the top-k."""
        adc = adc_lookup_sum(
            pq_distance_tables(query_vec, self.codebooks))
        out = self.codes(spark).select(
            F.col(self.id_col), F.round(adc, 6).alias("adc"))
        if exclude_id is not None:
            out = out.where(F.col(self.id_col) != exclude_id)
        ranked = out.orderBy(F.asc("adc"), F.asc(self.id_col))
        if rerank is not None:
            return _exact_refine(self.codes(spark), self.meta, ranked,
                                 query_vec, k, rerank, self.id_col)
        return ranked.limit(k)


def _exact_refine(scan: DataFrame, meta: dict, ranked: DataFrame,
                  query_vec: list[float], k: int, rerank: int,
                  id_col: str) -> DataFrame:
    """faiss-refine step, shared by PqIndex and IvfPqIndex: take the ADC
    top-``rerank`` candidate ids (a BOUNDED driver-side list, ≤ rerank
    rows by construction), re-scan ``scan`` for ONLY those rows' stored
    vectors — the ``id IN (...)`` filter pushes down to the parquet scan
    (row-group stat pruning; IvfPq passes a scan already partition-pruned
    to the probe set) — and rank them by EXACT squared L2. This is what
    restores recall when quantization cells are coarser than the local
    neighbor structure (tight clusters collapse to one code and tie on
    ADC): the candidate set is cheap and approximate, the final order is
    exact. ``rerank == k`` is the legitimate refine-exactly-the-top-k
    config; ``rerank < k`` is a contradiction and raises rather than
    silently serving unrefined ADC distances."""
    if rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    if not meta.get("store_vec"):
        raise ValueError("rerank requires an index built with "
                         "store_vec=True")
    ids = [r[id_col] for r in
           ranked.limit(rerank).select(id_col).collect()]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    d2 = F.aggregate(
        F.zip_with(F.col(meta["vec_col"]), q, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda a, v: a + v)
    return (scan.where(F.col(id_col).isin(ids))
            .select(F.col(id_col), F.round(d2, 6).alias("d2"))
            .orderBy(F.asc("d2"), F.asc(id_col)).limit(k))


def _pq_res_code_expr(vec_col: str, book: list[list[float]], m: int,
                      subdim: int, cents: list[list[float]], c_col: str):
    """Residual-PQ code for subspace ``m``: argmin_j ||sub_m(v − c) − b_j||²
    where ``c`` is the row's coarse centroid (column ``c_col``). The
    residual never materializes: dot(sub(v)−sub(c), b_j) decomposes into
    dot(sub(v), b_j) − dot(sub(c), b_j), and the second term is a pure
    constant per (centroid, codeword) — inlined as an ``element_at`` over
    a literal array indexed by the assignment column. Folding ||b_j||²
    into the same constant leaves score_j = 2·dot(sub(v), b_j) − adj[c][j],
    the exact arithmetic the SQL oracle inlines. Linear-size struct-max
    argmax (``_pq_code_expr`` discipline), ties to the smallest j."""
    sub = F.slice(F.col(vec_col), m * subdim + 1, subdim)
    entries = []
    for j, b in enumerate(book):
        arr = F.array(*[F.lit(float(x)) for x in b])
        b2 = sum(x * x for x in b)
        adjs = [2.0 * sum(cx * bx for cx, bx in
                          zip(c[m * subdim:(m + 1) * subdim], b)) + b2
                for c in cents]
        adj = F.element_at(F.array(*[F.lit(float(a)) for a in adjs]),
                           F.col(c_col) + 1)
        s = 2.0 * _dot(sub, arr) - adj
        entries.append(F.struct(s.alias("s"), F.lit(-j).alias("nj")))
    best = F.array_max(F.array(*entries))
    return (-best["nj"]).cast("int")


def ivfpq_adc_tables(query_vec: list[float], cents: list[list[float]],
                     codebooks: list[list[list[float]]],
                     probes: list[int]) -> dict[int, list[list[float]]]:
    """Per-probe ADC distance tables, driver-side constants:
    table[p][m][j] = ||sub_m(q − cent_p) − b_j||². O(nprobe·M·ksub·subdim)
    flops — query-scale, never corpus-scale."""
    subdim = len(codebooks[0][0])
    out: dict[int, list[list[float]]] = {}
    for p in probes:
        tabs = []
        for m, book in enumerate(codebooks):
            qres = [float(q) - float(c) for q, c in
                    zip(query_vec[m * subdim:(m + 1) * subdim],
                        cents[p][m * subdim:(m + 1) * subdim])]
            dists = []
            for b in book:
                s = 0.0
                for x, y in zip(qres, b):
                    s += (float(x) - float(y)) ** 2
                dists.append(s)
            tabs.append(dists)
        out[p] = tabs
    return out


class IvfPqIndex:
    """IVF-PQ — the production ANN shape (faiss IndexIVFPQ; Jegou et al.
    TPAMI 2011; the k-NN plugin's faiss `ivf,pq` method): a coarse
    quantizer partitions the corpus into inverted lists, each vector's
    RESIDUAL against its coarse centroid is product-quantized, and a
    query scans only its ``nprobe`` nearest lists with per-list ADC
    distance tables.

    100 TB posture: codes are materialized ONCE at build as
    (id, code_0 … code_{M-1}) PARTITIONED BY the coarse assignment — a
    query's probe set is directory-level partition pruning (asserted in
    tests), and the pruned scan reads M small ints per row (32× under raw
    float32 at M=8, on top of reading only nprobe/n_centroids of the
    corpus). The ADC sum is a literal-array ``element_at`` chain inside
    whole-stage codegen + TakeOrderedAndProject — zero Python, zero
    shuffle, no raw vectors touched at query time."""

    def __init__(self, path: str):
        import json
        import os

        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        self.centroids = self.meta["centroids"]
        self.codebooks = self.meta["codebooks"]
        self.id_col = self.meta["id_col"]

    @staticmethod
    def build(df: DataFrame, out_dir: str, cents: list[list[float]],
              codebooks: list[list[list[float]]],
              vec_col: str = "embedding", id_col: str = "vec_id",
              store_vec: bool = False) -> "IvfPqIndex":
        """``store_vec`` co-locates raw vectors with the residual codes
        inside the coarse-assignment partitions (see ``PqIndex.build``) —
        the rerank fetch is then BOTH partition-pruned to the probe set
        and id-filtered, never a join. Large codebooks encode via the
        Arrow-batched numpy residual path."""
        import json
        import os

        subdim = len(codebooks[0][0])
        big = len(codebooks) * len(codebooks[0]) > 512
        if big or store_vec:
            enc = pq_encode_batched(df, codebooks, vec_col, id_col,
                                    cents=cents, keep_vec=store_vec)
        else:
            assigned = df.withColumn(
                "_c", _nearest_centroid_expr(vec_col, cents))
            code_cols = [
                _pq_res_code_expr(vec_col, book, m, subdim, cents, "_c")
                .alias(f"code_{m}") for m, book in enumerate(codebooks)]
            enc = assigned.select(F.col(id_col), F.col("_c"), *code_cols)
        (enc.write.mode("overwrite").partitionBy("_c")
         .parquet(os.path.join(out_dir, "codes")))
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump({"centroids": cents, "codebooks": codebooks,
                       "id_col": id_col, "vec_col": vec_col,
                       "store_vec": store_vec}, f)
        return IvfPqIndex(out_dir)

    def probes(self, query_vec: list[float], nprobe: int) -> list[int]:
        def d2(c):
            return sum((float(x) - float(y)) ** 2
                       for x, y in zip(query_vec, c))

        order = sorted(range(len(self.centroids)),
                       key=lambda j: (d2(self.centroids[j]), j))
        return order[:nprobe]

    def codes(self, spark) -> DataFrame:
        import os

        return spark.read.parquet(os.path.join(self.path, "codes"))

    def topk(self, spark, query_vec: list[float], k: int = 10,
             nprobe: int = 2, exclude_id: int | None = None,
             rerank: int | None = None) -> DataFrame:
        """Partition-pruned ADC top-k (ascending squared L2 on quantized
        residuals). The per-probe distance tables select by the row's
        coarse assignment via a when-chain over the (tiny) probe set;
        subspace lookups sum left-to-right, mirroring the SQL twin's
        literal order — hash-stable engine/oracle parity. With
        ``rerank=R``: exact refine of the ADC top-R from the stored
        vectors inside the probed partitions (build with store_vec)."""
        probes = self.probes(query_vec, nprobe)
        tables = ivfpq_adc_tables(query_vec, self.centroids,
                                  self.codebooks, probes)

        adc = adc_lookup_sum(tables[probes[-1]])
        for p in probes[:-1][::-1]:
            adc = F.when(F.col("_c") == p,
                         adc_lookup_sum(tables[p])).otherwise(adc)
        out = (self.codes(spark).where(F.col("_c").isin(probes))
               .select(F.col(self.id_col), F.round(adc, 6).alias("adc")))
        if exclude_id is not None:
            out = out.where(F.col(self.id_col) != exclude_id)
        ranked = out.orderBy(F.asc("adc"), F.asc(self.id_col))
        if rerank is not None:
            return _exact_refine(
                self.codes(spark).where(F.col("_c").isin(probes)),
                self.meta, ranked, query_vec, k, rerank, self.id_col)
        return ranked.limit(k)
