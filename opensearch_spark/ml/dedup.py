"""Deduplication operators for large-scale training-data pipelines.

All cross-engine-deterministic: the string→int hash is the first 8 hex
chars of md5 (identical in Spark, DuckDB, Python), and minhash permutations
use fixed literal (a, b) constants, so the DuckDB oracle can replicate every
step bit-for-bit.

Scale notes (100 TB): exact dedup is one hash-shuffle groupBy; minhash-LSH
is explode(shingles) → groupBy(doc) signatures → explode(bands) →
band-bucket self-join (candidates only — never the O(n²) cross join) →
exact-jaccard verify on candidates. Skewed buckets (boilerplate docs) are
bounded by banding; AQE skew-join handles the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: last persisted frame per operator tag — see :func:`persist_rotating`
_PERSIST_LAST: dict = {}


def persist_rotating(df: DataFrame, tag: str, level=None) -> DataFrame:
    """``df.persist(level)``, releasing the frame PREVIOUSLY persisted
    under ``tag`` first. Operators that materialize corpus-scale
    intermediates (shingle streams, band signatures, vocabulary counts)
    are called repeatedly in a long-lived session (gates, benches,
    serving); without rotation every call pins another copy in executor
    storage until session end. One generation per operator is the bound;
    a caller still holding the previous result frame just recomputes."""
    old = _PERSIST_LAST.get(tag)
    if old is not None:
        try:
            old.unpersist(False)
        except Exception:
            pass  # e.g. its SparkSession is already gone
    df = df.persist(level) if level is not None else df.persist()
    _PERSIST_LAST[tag] = df
    return df

# minhash permutation constants — fixed, shared with the SQL oracle
MOD_X = 1000003            # reduce 32-bit token hash into safe mul range
MOD_H = 999999937          # prime < 2^30
N_HASHES = 16
BAND_ROWS = 4              # 4 bands × 4 rows


def perm_constants(n: int = N_HASHES) -> list[tuple[int, int, int]]:
    """(j, a_j, b_j) — deterministic, no RNG (sandbox + reproducibility)."""
    out = []
    for j in range(n):
        a = (2654435761 * (j + 1) + 1) % MOD_H
        b = (40503 * (j + 1) + 7) % MOD_H
        out.append((j, a or 1, b))
    return out


def str_hash32(col):
    """First-8-hex-of-md5 as int64 ∈ [0, 2^32) — mirrors DuckDB
    ``('0x'||substr(md5(s),1,8))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one representative (min id) per distinct text."""
    return (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .select(id_col, "dup_count")
    )


def canonical_url(url) -> F.Column:
    """URL canonicalization (the CommonCrawl/web-pipeline normal form):
    drop the #fragment, strip ``utm_*`` tracking params, drop the scheme's
    default port (http :80 / https :443 — from the authority only, never
    from URLs embedded in query values), lowercase scheme+host (path/query
    stay case-sensitive), and collapse the trailing-slash-before-query
    form (``/p/?q`` → ``/p?q``, again only at the real path→query
    boundary). Every rule is separator-anchored so parameter names that
    merely CONTAIN ``utm_`` (e.g. ``xutm_source``) survive. Pure regexp /
    string codegen, no backrefs (runs identically in the DuckDB twin)."""
    x = F.regexp_replace(url, r"#.*$", "")
    # utm strip, applied to the QUERY part only ('&' is a legal unencoded
    # PATH character per RFC 3986 — rule A unanchored would rewrite
    # '/a&utm_source=x' paths and merge distinct URLs; round-4 review).
    # Three separator-anchored rules so no backref is needed:
    # (A) a non-first utm param drops with its own leading '&';
    # (B) a FIRST utm param followed by another drops, keeping the '?';
    # (C) a lone first utm param drops with its '?'.
    pre_q = F.regexp_extract(x, r"^[^?]*", 0)
    qp = F.substring(x, F.length(pre_q) + F.lit(1), F.length(x))
    qp = F.regexp_replace(qp, r"&utm_[a-z_]+=[^&#]*", "")
    qp = F.regexp_replace(qp, r"\?utm_[a-z_]+=[^&#]*&", "?")
    qp = F.regexp_replace(qp, r"\?utm_[a-z_]+=[^&#]*$", "")
    x = F.concat(pre_q, qp)
    head = F.lower(F.regexp_extract(x, r"^([^/]*//[^/]+)", 1))
    tail = F.regexp_replace(x, r"^[^/]*//[^/]+", "")
    head = (F.when(head.startswith("http://"),
                   F.regexp_replace(head, r":80$", ""))
            .when(head.startswith("https://"),
                  F.regexp_replace(head, r":443$", ""))
            .otherwise(head))
    # split the tail at the first '?' so the collapse can't touch '/?'
    # sequences inside query values
    path = F.regexp_extract(tail, r"^[^?]*", 0)
    query = F.substring(tail, F.length(path) + F.lit(1), F.length(tail))
    path = F.when(F.length(query) > 0,
                  F.regexp_replace(path, r"/$", "")).otherwise(path)
    return F.concat(head, path, query)


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """URL-level dedup: canonicalize, keep the smallest id per canonical
    URL. One hash-shuffle groupBy on the canonical key — the same scale
    shape as exact_dedup (no joins, no windows over the corpus)."""
    return (df.withColumn("canon_url", canonical_url(F.col(url_col)))
            .groupBy("canon_url")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_dups"))
            .select("canon_url", "keep_id", "n_dups"))


def shingles(df: DataFrame, text_col: str, n: int = 3,
             id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc (whitespace tokens).

    Two hot-path rules enforced here: (1) the token array is materialized
    ONCE per row before the shingle lambda — a split() inside the lambda
    body is re-evaluated per element (no CSE across lambda iterations),
    O(len²) regex work, measured ~10× on the 5k-doc gate; (2) a small
    input (single-file parquet → 1 partition) is re-spread to the
    session's parallelism so the explode runs wide — at cluster scale the
    source has many splits and the repartition is a no-op."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    pre = df.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"))
    if n == 1:
        sh = F.col("_toks")
    else:
        # shingle i = tokens[i..i+n-1]; docs shorter than n tokens emit
        # nothing (sequence(1, 0) is DESCENDING in Spark, not empty —
        # needs the explicit empty branch)
        sh = F.expr(
            f"CASE WHEN size(_toks) >= {n} "
            f"THEN transform(sequence(1, size(_toks) - {n - 1}), "
            f"i -> concat_ws(' ', slice(_toks, i, {n}))) "
            f"ELSE CAST(array() AS ARRAY<STRING>) END"
        )
    return (
        pre.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .where(F.col("shingle") != "")
        .distinct()
    )


#: hot-shingle doc-frequency cap for the exact-Jaccard path (standard
#: df-filtering in near-dup pipelines); mirrored in the DuckDB oracles
JACCARD_DF_CAP = 10_000


def jaccard_pairs(sh: DataFrame, threshold: float = 0.5,
                  id_col: str = "doc_id",
                  max_shingle_df: int | None = JACCARD_DF_CAP,
                  scale_posture: bool | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs among docs sharing ≥1 shingle.

    candidates via shingle-bucket self-join (never n²); |∪| from per-doc
    shingle counts: |A∪B| = |A| + |B| − |A∩B|.

    Hot-shingle guard: shingles with doc frequency > ``max_shingle_df``
    are dropped from the shingle sets BEFORE the self-join — a boilerplate
    shingle shared by 10⁶ docs would otherwise detonate into a 10¹²-pair
    bucket. Sizes are computed over the filtered sets so Jaccard stays
    internally consistent (both |∩| and |∪| exclude capped shingles).
    ``None`` disables the guard. MinHash-LSH (``lsh_candidates``) remains
    the documented scale route; this makes the exact operator safe too.
    """
    # posture-switched like minhash_lsh_pairs: under SCALE every side
    # (shingle sets, df filter, sizes) is corpus-scaled so the joins are
    # pinned sort-merge (a mis-estimated auto-broadcast OOMs the driver
    # at real size) and the shingle frame persists DISK_ONLY; at gate
    # scale AQE keeps its freedom. The shingle lineage (split/explode/
    # distinct — the dominant cost) is persisted ONCE and fanned out to
    # the df-cap aggregate, the sizes aggregate, and both self-join
    # sides (round-4 review: it was recomputed ~4x).
    from pyspark import StorageLevel

    scale = _scale_posture(sh, scale_posture)
    sh = persist_rotating(sh, "jaccard.shingles",
                          StorageLevel.DISK_ONLY if scale else None)
    if max_shingle_df is not None:
        dfc = (sh.groupBy("shingle").agg(F.count("*").alias("_sdf"))
               .where(F.col("_sdf") <= max_shingle_df).drop("_sdf"))
        sh = _mj(sh, scale).join(dfc, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        _mj(a, scale).join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    with_a = _mj(inter, scale).join(
        sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza")), "a")
    out = (
        _mj(with_a, scale)
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def banded_signatures(sh: DataFrame, id_col: str = "doc_id",
                      n_hashes: int = N_HASHES,
                      band_rows: int = BAND_ROWS) -> DataFrame:
    """(doc, band, sig) LSH band keys. One wide min-agg computes all
    n_hashes signatures in a single pass — no perm cross-join (16× row
    blowup) and no second (doc, band) shuffle: partial map-side mins make
    this one light shuffle of n_docs rows regardless of shingle count.

    Accepts either a raw (id, shingle) frame or one that already carries
    the 32-bit base hash under the sentinel name ``_mh_x``
    (minhash_lsh_pairs persists hashes, not strings — the md5 then runs
    once per shingle, not once per consumer). The sentinel is
    underscore-namespaced so a user frame with an ordinary column can
    never trip the pre-hashed path by accident."""
    perms = perm_constants(n_hashes)
    x = sh.withColumn("x", F.col("_mh_x")) if "_mh_x" in sh.columns else \
        sh.withColumn("x", str_hash32(F.col("shingle")) % MOD_X)
    sig_wide = x.groupBy(id_col).agg(
        *[F.min((F.lit(a) * F.col("x") + F.lit(b)) % MOD_H).alias(f"mh{j}")
          for j, a, b in perms]
    )
    n_bands = n_hashes // band_rows
    band_structs = [
        F.struct(
            F.lit(bnd).alias("band"),
            F.concat_ws(",", *[
                F.concat_ws(":", F.lit(j), F.col(f"mh{j}"))
                for j in range(bnd * band_rows, (bnd + 1) * band_rows)
            ]).alias("sig"),
        )
        for bnd in range(n_bands)
    ]
    return sig_wide.select(
        id_col, F.explode(F.array(*band_structs)).alias("_b")
    ).select(id_col, F.col("_b.band").alias("band"), F.col("_b.sig").alias("sig"))


#: band-bucket membership above which candidate enumeration switches from
#: all-pairs to star expansion (bucket-min ↔ member); mirrored in oracles
LSH_MAX_BUCKET = 64

#: corpora above this row count get the forced scale posture (sort-merge
#: joins + DISK_ONLY persists); at or below it the plan is left to
#: Catalyst/AQE (broadcast where cheap) with on-heap persists — measured
#: 3x faster at gate scale (12.2 s -> 4.2 s on the sf0.1 minhash gate)
#: where every forced shuffle is pure overhead
SCALE_POSTURE_MIN_DOCS = 100_000


def _scale_posture(df: DataFrame, override: bool | None) -> bool:
    """Join/persist posture for corpus-scaled dedup pipelines.

    True -> forced sort-merge joins + DISK_ONLY persists: the only
    posture that survives real size (a mis-estimated auto-broadcast of a
    corpus-scaled intermediate OOMed the 8g driver at 600k docs; on-heap
    caching of the shingle frame starved the executors — GCLocker thrash).
    False -> no join hints (AQE localizes / broadcasts small sides) +
    MEMORY_AND_DISK persists, the fast path for gate-scale inputs.

    ``override`` pins the posture without a count; ``None`` auto-decides
    with one count() job (metadata-cheap on parquet sources) against
    SCALE_POSTURE_MIN_DOCS — the same auto-posture pattern as Searcher's
    vocab preload and unigram_logppl's broadcast threshold. Output is
    identical either way; only plan shape switches. The auto count runs
    EAGERLY at pipeline-construction time; for a computed (non-source)
    input lineage that count materializes the lineage once uncached —
    pass an explicit ``scale_posture`` (or persist the input first) in
    that case.
    """
    if override is not None:
        return bool(override)
    return df.count() > SCALE_POSTURE_MIN_DOCS


def _mj(df: DataFrame, scale: bool) -> DataFrame:
    """Apply the merge-join hint under the scale posture, else pass through."""
    return df.hint("merge") if scale else df


def minhash_lsh_pairs(df: DataFrame, text_col: str, n: int = 3,
                      n_hashes: int = N_HASHES, band_rows: int = BAND_ROWS,
                      threshold: float = 0.5, id_col: str = "doc_id",
                      max_bucket: int | None = LSH_MAX_BUCKET,
                      scale_posture: bool | None = None) -> DataFrame:
    """MinHash + LSH banding → candidate pairs → exact-jaccard verify.

    Hot-bucket guard: a band bucket with m members contributes m²/2
    candidate pairs — a boilerplate cluster (or, on a small-vocabulary
    corpus, a min-shingle collision cluster) with m=10⁶ detonates into
    10¹² candidates before verify ever runs (measured: 26M candidates at
    600k docs, 98% from buckets >64, verify killing ~all of them).
    Buckets larger than ``max_bucket`` switch to STAR expansion — every
    member pairs with the bucket's min id, O(m) pairs — which preserves
    the connectivity a downstream dup_clusters() needs (any two members
    stay linked through the hub if they truly match) while bounding work;
    pair-level recall inside oversized buckets is intentionally partial
    (the all-pairs list is quadratic and no pair-level consumer can hold
    it anyway). ``None`` disables the guard.

    Every frame in this pipeline (band keys, candidate pairs, shingle
    hashes, per-doc sizes) scales with the CORPUS, so under the scale
    posture every join carries an explicit merge (sort-merge) hint:
    Catalyst's size estimates for multi-shuffle intermediates are
    unreliable, and a mis-estimated auto-broadcast of the candidate or
    size side OOMs the driver at real size (observed at 600k docs / 8g
    driver). The shared shingle frame is then persisted DISK_ONLY, not
    on-heap: it scales with the corpus (≈100 shingle rows per doc), and
    deserialized heap caching of it starved the executor heap at 600k
    docs (GCLocker thrash → OOM). ``scale_posture`` (None = auto by
    corpus count, see :func:`_scale_posture`) keeps that at-scale plan
    while letting gate-scale inputs skip the forced shuffles — 3x
    measured on the sf0.1 gate, byte-identical output."""
    from pyspark import StorageLevel

    scale = _scale_posture(df, scale_posture)
    level = StorageLevel.DISK_ONLY if scale else StorageLevel.MEMORY_AND_DISK_DESER
    # persist HASHES, not strings: every consumer needs only the 32-bit
    # minhash base (banded) or the 64-bit verify key (intersection) — the
    # shingle string exists in-flight inside the materialization stage
    # only, the persisted frame is 3 numeric columns (measured 46.4M
    # shingle rows at 600k docs: 28.9 s → materialization drops with the
    # payload, and the md5 runs once instead of per consumer)
    sh = persist_rotating(
        shingles(df, text_col, n, id_col).select(
            id_col,
            (str_hash32(F.col("shingle")) % MOD_X).alias("_mh_x"),
            F.xxhash64("shingle").alias("_h")),
        "minhash_lsh.shingles", level)
    # banded is consumed by the bucket-size agg AND both sides of the
    # pair self-join; unpersisted, each consumer recomputes the 16-column
    # wide min-agg over the full shingle stream (measured 190 s of a
    # 250 s pipeline at 600k docs). It is only n_docs × n_bands small
    # rows — materialize once.
    banded = persist_rotating(
        banded_signatures(sh, id_col, n_hashes, band_rows),
        "minhash_lsh.banded", level)
    if max_bucket is not None:
        bsz = banded.groupBy("band", "sig").agg(
            F.count("*").alias("_m"), F.min(id_col).alias("_minid"))
        tagged = _mj(banded, scale).join(bsz, ["band", "sig"])
        small = tagged.where(F.col("_m") <= max_bucket)
        a = small.select(F.col(id_col).alias("a"), "band", "sig")
        b = small.select(F.col(id_col).alias("b"), "band", "sig")
        pairs_small = (_mj(a, scale).join(b, ["band", "sig"])
                       .where(F.col("a") < F.col("b")).select("a", "b"))
        pairs_star = (tagged.where((F.col("_m") > max_bucket)
                                   & (F.col(id_col) != F.col("_minid")))
                      .select(F.col("_minid").alias("a"),
                              F.col(id_col).alias("b")))
        cand = pairs_small.unionByName(pairs_star).distinct()
    else:
        a = banded.select(F.col(id_col).alias("a"), "band", "sig")
        b = banded.select(F.col(id_col).alias("b"), "band", "sig")
        cand = (
            _mj(a, scale).join(b, ["band", "sig"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b").distinct()
        )
    # under the scale posture cand feeds the candidate-id semi-filter AND
    # the intersection join — unpersisted, the band self-join would run
    # twice (small posture keeps cand lazy: AQE localizes it cheaply)
    if scale:
        cand = persist_rotating(cand, "minhash_lsh.cand", level)
    # verify candidates with exact jaccard; the intersection join runs on
    # 64-bit shingle hashes, not strings — same multiset semantics
    # (collision odds ~n²/2⁶⁴) with a far smaller shuffle payload.
    # The shingle stream is first semi-filtered to CANDIDATE docs and
    # persisted once: the verify stage consumes the shingles three times
    # (two join sides + the size agg), and each consumer previously
    # sorted the FULL corpus-scale frame. The filtered frame is bounded
    # by min(corpus, candidate docs) — on a real corpus with a sparse
    # dup rate that is a small fraction and the win is ~3 sorts → 1 semi
    # pass; on the synthetic 600k bench corpus most docs ARE candidates
    # (543k pairs) so it measures as a wash there — the bound, not the
    # bench, is the design point
    if scale:
        cand_ids = (cand.select(F.col("a").alias(id_col))
                    .unionByName(cand.select(F.col("b").alias(id_col)))
                    .distinct())
        shc = persist_rotating(
            _mj(sh, scale).join(_mj(cand_ids, scale), id_col, "left_semi"),
            "minhash_lsh.cand_shingles", level)
    else:
        shc = sh  # gate scale: the three consumers are already cheap
    sizes = shc.groupBy(id_col).agg(F.count("*").alias("sz"))
    hashed = shc.select(id_col, "_h")
    sa = hashed.select(F.col(id_col).alias("a"), "_h")
    sb = hashed.select(F.col(id_col).alias("b"), "_h")
    inter = (
        _mj(_mj(cand, scale).join(sa, "a"), scale).join(sb, ["b", "_h"])
        .groupBy("a", "b").agg(F.count("*").alias("inter"))
    )
    withsza = _mj(
        _mj(inter, scale)
        .join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza")),
              "a"), scale)
    out = (
        withsza
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def dup_clusters(pairs: DataFrame, max_iters: int = 12) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id),
    cluster_id = min doc_id in the component. Dedup at scale needs the
    TRANSITIVE closure of pairwise matches (A~B, B~C ⇒ one cluster, keep
    one representative), not just the pair list.

    Algorithm: iterative min-label propagation with pointer jumping
    (the alternating-star / hash-to-min family used for web-scale
    connected components): each round every node takes the min label in
    its neighborhood, then labels chase their own labels (path halving),
    so convergence is O(log diameter) rounds — each round two hash joins,
    no driver-side graph. Stops early when a round changes nothing;
    RAISES if ``max_iters`` rounds pass without convergence (returning
    the intermediate labels would silently split true components —
    round-4 review; a path-shaped component of diameter d needs ~log2(d)
    rounds, so raise ``max_iters`` for extreme chain graphs)."""
    edges = pairs.select(F.col("a").cast("long").alias("a"),
                         F.col("b").cast("long").alias("b"))
    adj = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()
    # localCheckpoint (eager) each round: truncates the logical plan, which
    # otherwise grows EXPONENTIALLY (the pointer-jump self-join references
    # the previous round's plan twice) and stalls the analyzer by round ~8
    labels = (adj.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node")).localCheckpoint())
    for _ in range(max_iters):
        nbr = (adj.join(labels.select(F.col("node").alias("b"),
                                      F.col("label").alias("_nl")), "b")
               .groupBy("a").agg(F.min("_nl").alias("_minn")))
        new = (labels.join(nbr.select(F.col("a").alias("node"), "_minn"),
                           "node", "left")
               .select("node",
                       F.least(F.col("label"),
                               F.coalesce("_minn", F.col("label"))).alias("label")))
        # pointer jumping: label ← label(label)
        jumped = (new.alias("x")
                  .join(new.select(F.col("node").alias("label"),
                                   F.col("label").alias("_ll")).alias("y"),
                        "label", "left")
                  .select("node",
                          F.least(F.col("label"),
                                  F.coalesce("_ll", F.col("label"))).alias("label"))
                  .localCheckpoint())
        changed = (jumped.join(labels.withColumnRenamed("label", "_old"), "node")
                   .where(F.col("label") != F.col("_old")).limit(1).count())
        labels = jumped
        if changed == 0:
            break
    else:
        adj.unpersist()
        raise RuntimeError(
            f"dup_clusters: not converged after {max_iters} rounds — "
            "labels would split true components; raise max_iters "
            "(~log2(graph diameter) rounds are needed)")
    adj.unpersist()
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


#: Above this corpus size the 32-bit posture's 8-bit band keys saturate
#: (≤256 keys/band → every bucket goes hot → candidate enumeration turns
#: quadratic: ~2.8B candidate pairs measured at 600k docs in r4) and
#: ``bits=None`` auto-selects the 64-bit posture.  Deliberately far below
#: ``SCALE_POSTURE_MIN_DOCS``: band-key saturation bites two orders of
#: magnitude before shuffle-plan choice does.
SIMHASH_64BIT_MIN_DOCS = 10_000


def _simhash_bits_posture(df: DataFrame, bits: int | None) -> int:
    """Resolve ``simhash``'s bit-width posture: an explicit 32/64 wins
    (oracle-paired gates pin 32); ``None`` counts the corpus once and
    picks 64 above SIMHASH_64BIT_MIN_DOCS — the same auto-posture
    pattern as :func:`_scale_posture`, so callers at real corpus size
    cannot silently keep the quadratic 32-bit banding.
    (``simhash_pairs`` does NOT use this: it resolves from the
    fingerprint values instead, which tracks the producer's actual
    choice even when dropped null/empty docs shift the row count across
    the threshold.)"""
    if bits is not None:
        if bits not in (32, 64):
            raise ValueError("simhash: bits must be 32 or 64")
        return bits
    return 64 if df.count() > SIMHASH_64BIT_MIN_DOCS else 32


def simhash(df: DataFrame, text_col: str, bits: int | None = None,
            id_col: str = "doc_id") -> DataFrame:
    """SimHash over whitespace tokens; bit i of the fingerprint = sign of
    Σ_tokens (2·bit_i(h(token)) − 1).

    ``bits=32`` (md5-derived token hash — mirrors the DuckDB oracle
    constant-for-constant) is the GATE-SCALE posture; its 4-band keys
    are only 8 bits wide, so banding buckets saturate once the corpus
    outgrows ~10k docs and candidate enumeration goes quadratic (the
    LSH hot-bucket failure class). At real corpus size ``bits=64``
    (xxhash64 token hash, 16-bit band keys at k=3 — 65,536 keys/band
    keeps buckets sparse at millions of docs; measured at 600k in
    BENCH.md). The default ``bits=None`` auto-selects by corpus size
    (>SIMHASH_64BIT_MIN_DOCS → 64); pass the same ``bits`` to
    ``simhash_pairs``, or leave both ``None`` — its ``None`` resolves
    from the fingerprint values, so it follows whatever this call
    actually emitted."""
    bits = _simhash_bits_posture(df, bits)
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    hash_fn = str_hash32 if bits == 32 else (lambda c: F.xxhash64(c))
    h = toks.withColumn("h", hash_fn(F.col("tok")))
    aggs = [
        F.sum(
            (F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1))
             * 2 - 1)
        ).alias(f"s{i}")
        for i in range(bits)
    ]
    sums = h.groupBy(id_col).agg(*aggs)
    # assemble via two 32-bit halves: 2**63 would overflow the signed
    # long literal under ANSI, shiftleft is modular and safe
    lo = None
    for i in range(min(bits, 32)):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        lo = bit if lo is None else (lo + bit)
    fp = lo.cast("long")
    if bits == 64:
        hi = None
        for i in range(32, 64):
            bit = (F.when(F.col(f"s{i}") > 0, F.lit(2 ** (i - 32)))
                   .otherwise(F.lit(0)))
            hi = bit if hi is None else (hi + bit)
        fp = F.shiftleft(hi.cast("long"), 32).bitwiseOR(lo.cast("long"))
    return sums.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(fp: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id", bits: int | None = None,
                  scale_posture: bool | None = None) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ k via pigeonhole banding:
    split the fingerprint into k+1 bands — equal in ≥1 band guaranteed —
    then verify. (Never an O(n²) cross join.) ``bits`` MUST match the
    ``simhash`` call that produced ``fp``: 32 is the gate-scale posture,
    64 is the real-corpus posture (see ``simhash``'s docstring for the
    band-key-width arithmetic that makes 32 quadratic beyond ~10k docs).
    The default ``None`` auto-resolves from the fingerprint VALUES, not
    a row count: a 64-bit ``simhash`` output contains a negative or
    ≥ 2³² fingerprint with overwhelming probability, while the 32-bit
    posture can only emit [0, 2³²) — and in the astronomically unlikely
    corner where every 64-bit fingerprint fits 32 bits, their high bits
    are all EQUAL (zero), so banding only the low 32 is still exhaustive
    and the pairs stay exact. Row counts would be wrong here: ``simhash``
    resolves from the input doc count, but null-text / empty docs are
    dropped before fingerprinting, so the fingerprint frame can sit on
    the other side of the threshold (review r5). Value inspection cannot
    disagree with whatever the producer actually emitted. (Resolution
    costs one min/max agg over ``fp`` — persist ``fp`` or pass ``bits``
    explicitly to avoid recomputing an unpersisted fingerprint plan.)
    ``scale_posture`` as in :func:`_scale_posture`: forced sort-merge
    for the corpus-scaled band self-join above the doc threshold, AQE
    freedom at gate scale."""
    if bits is None:
        r = fp.agg(F.min("simhash").alias("mn"),
                   F.max("simhash").alias("mx")).first()
        bits = 64 if (r["mn"] is not None
                      and (r["mn"] < 0 or r["mx"] >= 1 << 32)) else 32
    elif bits not in (32, 64):
        raise ValueError("simhash_pairs: bits must be 32 or 64")
    n_bands = max_hamming + 1
    width = bits // n_bands
    bands = []
    for bidx in range(n_bands):
        shift = bidx * width
        w = width + (bits - n_bands * width if bidx == n_bands - 1 else 0)
        shifted = F.shiftrightunsigned(F.col("simhash"), shift)
        # w=64 (bits=64, max_hamming=0): (1<<64)-1 does not fit a long
        # literal — and no mask is needed, the shifted value IS the key
        key = shifted if w >= 64 else shifted.bitwiseAND(F.lit((1 << w) - 1))
        bands.append(
            fp.select(
                F.col(id_col),
                "simhash",
                F.lit(bidx).alias("band"),
                key.alias("key"),
            )
        )
    allb = bands[0]
    for x in bands[1:]:
        allb = allb.unionByName(x)
    a = allb.select(F.col(id_col).alias("a"), F.col("simhash").alias("fa"), "band", "key")
    b = allb.select(F.col(id_col).alias("b"), F.col("simhash").alias("fb"), "band", "key")
    scale = _scale_posture(fp, scale_posture)
    cand = (
        # posture-pinned: both sides are corpus-scaled (minhash_lsh_pairs)
        _mj(a, scale).join(b, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "fa", "fb").distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def dedup_chunks_global(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 10,
    scale_posture: bool | None = None,
) -> DataFrame:
    """Corpus-global chunk-granular exact dedup — the C4 / RefinedWeb
    "remove duplicated lines across the corpus" operator: every repeated
    chunk is dropped EXCEPT its first occurrence (min (doc_id, chunk_no)),
    and each document's surviving chunks are re-joined in order.

    Granularity is pluggable: real corpora split on newlines; this corpus
    has single-line docs, so chunks are fixed ``chunk_tokens``-token
    windows — the distributed shape (explode -> one hash-shuffle
    first-occurrence agg -> equi-join back -> per-doc ordered re-join) is
    identical either way and is the 100 TB path: no window over the whole
    corpus, no driver state; boilerplate chunks land on one reducer each
    (bounded by distinct-chunk cardinality, AQE-skew-splittable).

    Returns (doc_id, text_dedup, n_chunks, n_kept).
    """
    # materialize the token array ONCE per doc: Catalyst does not hoist
    # lambda-invariant subexpressions out of transform(), so splitting
    # inside the chunk lambda would re-tokenize the doc per chunk
    # (quadratic in doc length)
    toked = df.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"))
    chunks = toked.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, cast(ceil(size(_toks) "
                f"/ {chunk_tokens}.0) as int)), "
                f"i -> concat_ws(' ', slice(_toks, "
                f"(i - 1) * {chunk_tokens} + 1, {chunk_tokens})))"
            )
        ).alias("chunk_no", "chunk"),
    )
    nchunks_df = toked.select(
        F.col(id_col),
        F.ceil(F.size("_toks") / F.lit(chunk_tokens)).cast("int")
        .alias("n_chunks"))
    first = (
        chunks.groupBy("chunk")
        .agg(F.min(F.struct(F.col(id_col), F.col("chunk_no"))).alias("f"))
        .select("chunk", F.col(f"f.{id_col}").alias("_fid"),
                F.col("f.chunk_no").alias("_fno"))
    )
    # merge hints under the scale posture: chunks, first and nchunks_df
    # all scale with the corpus — a mis-estimated auto-broadcast OOMs the
    # driver at real size (same auto posture as minhash_lsh_pairs)
    scale = _scale_posture(df, scale_posture)
    kept = (
        _mj(chunks, scale).join(first, "chunk")
        .where((F.col(id_col) == F.col("_fid"))
               & (F.col("chunk_no") == F.col("_fno")))
        .select(id_col, "chunk_no", "chunk")
    )
    rejoined = kept.groupBy(id_col).agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct("chunk_no", "chunk"))
            ).getField("chunk"), " ").alias("text_dedup"),
        F.count("*").alias("n_kept"),
    )
    # LEFT join from the per-doc side: a doc whose EVERY chunk is a
    # duplicate has no kept rows — it must still report (n_kept=0,
    # text_dedup='') rather than silently vanish from the per-doc output
    return (
        _mj(nchunks_df, scale)
        .join(_mj(rejoined, scale), id_col, "left")
        .select(id_col,
                F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
                "n_chunks",
                F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"))
    )


def substring_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 8,
    scale_posture: bool | None = None,
) -> DataFrame:
    """ExactSubstr-style duplicated-span detection (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): every sliding ``window_tokens``-token window that
    occurs at >= 2 (doc, position) sites in the corpus — including twice
    within one doc — marks its token span as duplicated. Per doc we
    report the duplicated-window count and the number of token positions
    covered by the union of duplicated windows (the mass ExactSubstr
    would cut).

    The reference method builds a corpus-wide suffix array — inherently
    single-machine. The Spark-first re-expression: sliding windows
    (stride 1) → one hash-shuffle occurrence count → semi-join the
    duplicated set back → per-doc interval-union coverage with one
    lead() window function over ONLY the duplicated windows (bounded per
    doc by doc length, never corpus-wide). Same explode/agg/join shape
    as ``dedup_chunks_global``; no driver state. Windows are pre-hashed
    to 8-byte xxhash64 keys INSIDE the window lambda (the ~100-byte
    window string exists only transiently per row, never in the exploded
    frame or the shuffles) — the same discipline as
    ``minhash_lsh_pairs``' verify path; collision odds are ~n²/2⁶⁴
    (8e-5 at 54M windows) and a collision merely over-marks one span.
    Measured 67 s → 18-26 s at 600k docs (local[32]).

    Returns (doc_id, n_tokens, n_windows, n_dup_windows, dup_token_cov).
    """
    from pyspark.sql.window import Window as Win

    w = int(window_tokens)
    # posture decided on the RAW input (count before the repartition
    # below, so the decision job never pays the re-spread shuffle)
    scale = _scale_posture(df, scale_posture)
    # single-file parquet arrives as ONE partition — re-spread so the
    # window explode runs wide (no-op at cluster scale, same rule as
    # shingles())
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    # the token array is LET-BOUND as a lambda variable (single-element
    # transform) instead of a projected alias: with a plain alias the
    # generator's child expression is re-evaluated per emitted window
    # (measured 3x warm on the sf0.1 gate); a lambda variable is bound once
    # per row, so the split runs once per doc whatever Catalyst collapses
    split_sql = f"split(trim({text_col}), '\\\\s+')"
    wins_sql = (
        f"flatten(transform(array({split_sql}), t -> "
        f"CASE WHEN size(t) >= {w} THEN "
        f"transform(sequence(1, size(t) - {w} + 1), "
        f"i -> xxhash64(concat_ws(' ', slice(t, i, {w})))) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END))")
    # persist the PER-DOC frame (id, n_tokens, hashed-window array —
    # ~8 B/window): the tokenize+hash lambda is the expensive pass and
    # feeds three consumers (occurrence count, semi-join side, per-doc
    # stats); unpersisted it re-runs per consumer (measured 67 s → 30 s
    # at 600k docs from this persist alone). The explode itself re-runs
    # per consumer but reads the cached arrays — cheap.
    from pyspark import StorageLevel

    base = persist_rotating(
        df.select(
            id_col,
            F.expr(f"size({split_sql})").alias("n_tokens"),
            F.expr(wins_sql).alias("_wins")),
        "substring_dup.base",
        StorageLevel.DISK_ONLY if scale else StorageLevel.MEMORY_AND_DISK_DESER)
    wins = base.select(id_col, F.posexplode("_wins").alias("pos", "win"))
    dup = (wins.groupBy("win").agg(F.count("*").alias("occ"))
           .where(F.col("occ") >= 2).select("win"))
    # both sides scale with the corpus: the scale posture forces the
    # shuffle-join plan (mis-estimated auto-broadcast OOMs at real size —
    # the dedup-family rule, plan-asserted in tests/test_plans.py)
    dwin = (_mj(wins, scale).join(_mj(dup, scale), "win", "left_semi")
            .select(id_col, "pos"))
    nxt = F.lead("pos").over(Win.partitionBy(id_col).orderBy("pos"))
    cov = (dwin
           .withColumn("_c", F.least(F.lit(w),
                                     F.coalesce(nxt - F.col("pos"), F.lit(w))))
           .groupBy(id_col)
           .agg(F.count("*").alias("n_dup_windows"),
                F.sum("_c").cast("long").alias("dup_token_cov")))
    stats = base.select(id_col, "n_tokens", F.size("_wins").alias("n_windows"))
    # the re-attach join is corpus × contaminated-docs — both corpus-scaled
    return (_mj(stats, scale).join(_mj(cov, scale), id_col, "left")
            .select(id_col, "n_tokens", "n_windows",
                    F.coalesce("n_dup_windows", F.lit(0)).cast("long")
                    .alias("n_dup_windows"),
                    F.coalesce("dup_token_cov", F.lit(0)).cast("long")
                    .alias("dup_token_cov")))
