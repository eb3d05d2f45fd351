"""Training-data curation operators: eval-set decontamination and
token-budget sequence packing.

Both are standard steps in an LLM data pipeline that the reference engine
has no analog for (SURVEY §2 "beyond the reference" ops). Plans are
built-in-function only — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Deterministic uniform-ish value in [0, 2^32) from a string column — the
# one hash with bit-identical spellings in Spark and DuckDB, which keeps
# every sampling decision oracle-checkable.
from opensearch_spark.ml.dedup import str_hash32 as _md5_u32


def _ntokens_expr(text_col: str):
    """Whitespace token count with the NULL/blank guard: Spark's
    ``size(split(NULL))`` is the -1 sentinel and blank text tokenizes as
    ``['']`` (one phantom token) — unguarded counts corrupt every
    token-total downstream (tape positions, mix shares, keep rates).
    One authoring site for the guard (round-4 review)."""
    return F.when(
        F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""),
        F.lit(0),
    ).otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+"))) \
     .cast("long")


def _shingle_expr(text_col: str, n: int):
    """Word n-gram shingles as an array expression (NOT distinct, NOT
    exploded) — per-row, fully codegen."""
    if n == 1:
        return F.split(F.trim(F.col(text_col)), r"\s+")
    # NB: sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — docs
    # shorter than n tokens need an explicit empty-array branch.
    # bind the token array ONCE via a single-element-array lambda (no
    # `let` in Spark SQL): a split() in the shingle lambda body would be
    # re-evaluated per element — O(len²) regex work on long docs
    toks = f"split(trim({text_col}), '\\\\s+')"
    return F.expr(
        f"flatten(transform(array({toks}), _t -> "
        f"CASE WHEN size(_t) >= {n} "
        f"THEN transform(sequence(1, size(_t) - {n - 1}), "
        f"i -> concat_ws(' ', slice(_t, i, {n}))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END))"
    )


def decontaminate(df: DataFrame, eval_df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 8) -> DataFrame:
    """Eval-set decontamination by exact n-gram overlap (the GPT-3 /
    Pile-style "13-gram decontamination", here with configurable n):
    a training doc is contaminated if it shares ANY word n-gram with any
    eval document. Returns (id_col, n_contaminated) for flagged docs —
    anti-join against this to drop them.

    Scale shape: the eval set is small by construction (thousands of
    benchmark items vs 10^9 training docs), so its distinct shingle set
    is collected into a broadcast hash join against the exploded training
    shingles — the 100 TB side is never shuffled; the per-doc distinct
    count happens AFTER the join has shrunk it to contaminated rows only.
    """
    train_sh = df.select(
        F.col(id_col), F.explode(_shingle_expr(text_col, n)).alias("shingle")
    ).where(F.col("shingle") != "")
    eval_sh = (eval_df.select(F.explode(_shingle_expr(text_col, n)).alias("shingle"))
               .where(F.col("shingle") != "").distinct())
    return (train_sh.join(F.broadcast(eval_sh), "shingle")
            .groupBy(id_col)
            .agg(F.count_distinct("shingle").alias("n_contaminated")))


def pack_sequences(df: DataFrame, max_tokens: int, text_col: str = "text",
                   id_col: str = "doc_id", part_col: str | None = None) -> DataFrame:
    """Token-budget sequence packing (concat-and-split, the standard LLM
    pretraining packing): documents are laid out in ``id_col`` order on a
    contiguous token tape, which is then chunked into fixed
    ``max_tokens``-sized training sequences; a doc may span a boundary
    (it is split, not padded). Per doc returns

        (id_col, n_tokens, start_seq, end_seq, offset_in_seq)

    where start_seq/end_seq are the first/last sequence ids the doc lands
    in and offset_in_seq is its start offset inside start_seq.

    Scale shape: a single global cumulative sum is a one-partition
    bottleneck, so pass ``part_col`` (e.g. the lang column) to window the
    packing per group — each group is an independent tape with its own
    sequence numbering, exactly how a 1000-executor job packs per shard;
    ``part_col=None`` (the default) is ONE global tape, fine for tests
    and small corpora only. Sequence ids are (group, seq) pairs;
    downstream shuffles on them stay balanced.

    NULL text counts 0 tokens (Spark's size() of a null split is -1,
    which would silently shift every later doc's tape position).
    """
    out = df.select(F.col(id_col), _ntokens_expr(text_col).alias("n_tokens"),
                    *( [F.col(part_col)] if part_col else [] ))
    if part_col:
        w = Window.partitionBy(part_col).orderBy(id_col)
    else:
        w = Window.orderBy(id_col)
    end = F.sum("n_tokens").over(w)
    start = end - F.col("n_tokens")
    start_seq = F.floor(start / max_tokens).cast("long")
    # a zero-token doc occupies no tape cells: floor((end-1)/max) would
    # report end_seq < start_seq (even -1 at tape position 0) — pin it
    # to start_seq so first<=last always holds (round-4 review)
    end_seq = F.when(F.col("n_tokens") == 0, start_seq) \
        .otherwise(F.floor((end - 1) / max_tokens).cast("long"))
    return out.select(
        id_col,
        *( [part_col] if part_col else [] ),
        F.col("n_tokens"),
        start_seq.alias("start_seq"),
        end_seq.alias("end_seq"),
        (start % max_tokens).cast("long").alias("offset_in_seq"),
    )


def decontaminate_fuzzy(df: DataFrame, eval_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 2, threshold: float = 0.5) -> DataFrame:
    """Near-duplicate eval-set decontamination (the Llama-style MinHash
    variant of [[decontaminate]]'s exact n-gram overlap): training docs
    whose shingle-set jaccard with ANY eval doc is ≥ ``threshold``, found
    via MinHash LSH band-join candidates and verified exactly. Returns
    (``id_col``, eval_id, jaccard) — anti-join on ``id_col`` to drop.

    Scale shape: the corpus side is one signature pass (wide min-agg, one
    shuffle of n_docs rows); the eval side is tiny by construction, so its
    band keys AND its shingle hashes broadcast — candidate generation and
    verification never shuffle the corpus a second time.
    """
    from opensearch_spark.ml import dedup as D

    sh_t = D.persist_rotating(D.shingles(df, text_col, n, id_col),
                              "decontaminate_fuzzy.shingles")
    sh_e = D.shingles(eval_df, text_col, n, id_col)
    bt = D.banded_signatures(sh_t, id_col)
    be = D.banded_signatures(sh_e, id_col)
    cand = (bt.select(F.col(id_col).alias("a"), "band", "sig")
            .join(F.broadcast(be.select(F.col(id_col).alias("b"), "band", "sig")),
                  ["band", "sig"])
            .select("a", "b").distinct())
    sz_t = sh_t.groupBy(id_col).agg(F.count("*").alias("sza"))
    sz_e = sh_e.groupBy(id_col).agg(F.count("*").alias("szb"))
    ha = sh_t.select(F.col(id_col).alias("a"), F.xxhash64("shingle").alias("_h"))
    hb = sh_e.select(F.col(id_col).alias("b"), F.xxhash64("shingle").alias("_h"))
    inter = (cand.join(ha, "a")
             .join(F.broadcast(hb), ["b", "_h"])
             .groupBy("a", "b").agg(F.count("*").alias("inter")))
    return (inter
            .join(sz_t.select(F.col(id_col).alias("a"), "sza"), "a")
            .join(F.broadcast(sz_e.select(F.col(id_col).alias("b"), "szb")), "b")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select(F.col("a").alias(id_col), F.col("b").alias("eval_id"),
                    "jaccard"))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", top_n: int = 2,
                     dup_n: int = 2) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    §A1.1 "repetition removal"), as token fractions rather than Gopher's
    character fractions (documented divergence — same filtering intent,
    simpler cross-engine arithmetic):

    - ``top{top_n}gram_frac``: tokens covered by the single most frequent
      word ``top_n``-gram / total tokens (capped at 1.0 — overlapping
      occurrences are each counted).
    - ``dup{dup_n}gram_frac``: tokens covered by ``dup_n``-grams occurring
      more than once / total tokens (capped at 1.0).

    Scale shape: one explode + one (doc, gram) hash aggregation with
    map-side partial counts, then a per-doc agg — two narrow shuffles on
    keys that cannot be skewed worse than the document length itself.
    """
    if top_n != dup_n:
        raise ValueError("repetition_stats: top_n != dup_n requires two "
                         "passes; call twice and join")
    # guarded count (NULL → 0, blank → 0 — not -1 / 1 phantom) and gram
    # counting restricted to docs that can emit a real gram: blank docs
    # would otherwise contribute a phantom '' 1-gram (top1gram_frac=1.0)
    # and NULL docs a -1 n_tokens (round-4 review)
    grams = df.select(
        F.col(id_col), _ntokens_expr(text_col).alias("n_tokens"),
        F.explode(_shingle_expr(text_col, top_n)).alias("gram"),
    ).where(F.col("n_tokens") >= top_n)
    counts = grams.groupBy(id_col, "gram").agg(
        F.first("n_tokens").alias("n_tokens"), F.count("*").alias("cnt"))
    one = F.lit(1.0)
    stats = counts.groupBy(id_col).agg(
        F.round(F.least(one, F.max("cnt") * float(top_n) / F.first("n_tokens")),
                6).alias(f"top{top_n}gram_frac"),
        F.round(F.least(one, F.sum(F.when(F.col("cnt") >= 2, F.col("cnt"))
                                   .otherwise(F.lit(0)))
                        * float(dup_n) / F.first("n_tokens")),
                6).alias(f"dup{dup_n}gram_frac"),
    )
    # docs SHORTER than the gram width emit zero shingles and would drop
    # out of the explode entirely — report them with frac 0.0 so callers
    # joining/filtering on these stats never lose short docs silently
    base = df.select(F.col(id_col), _ntokens_expr(text_col).alias("n_tokens"))
    return (base.join(stats, id_col, "left")
            .na.fill({f"top{top_n}gram_frac": 0.0,
                      f"dup{dup_n}gram_frac": 0.0}))


def sample_stratified(df: DataFrame, strata_col: str, n_per_stratum: int,
                      id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic stratified sample: the ``n_per_stratum`` docs with the
    smallest ``md5(id || salt)`` rank inside each stratum — a reproducible
    eval-set / holdout builder (change ``salt`` to draw a fresh sample).

    Scale shape: one window per stratum key. Strata are things like
    ``source`` or ``lang`` (hundreds to thousands of groups), so the
    rank window parallelizes across strata; no global sort.
    """
    key = _md5_u32(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(key.asc(), F.col(id_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= n_per_stratum)
            .drop("_rk"))


def source_mix(df: DataFrame, target_shares: dict[str, float],
               source_col: str = "source", text_col: str = "text",
               id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Data-mixing rebalance: given target token shares per source (e.g.
    ``{"wiki": 0.3, "code": 0.7}``), compute each source's deterministic
    keep-rate so the *expected* kept-token mix matches the target (sources
    absent from the map get share 0 = dropped), then keep each doc iff
    ``md5(id || salt)`` falls under its source's rate. Returns the kept
    docs with ``keep_rate`` attached. Rates are capped at 1.0 —
    up-sampling (rate > 1) is epoch repetition, out of scope here.

    Scale shape: per-source token totals are a tiny aggregate collected to
    the driver (|sources| rows), re-broadcast as a literal map; the big
    side is a single filter scan — no shuffle of the corpus.
    """
    totals = {r[source_col]: r["tok"]
              for r in df.groupBy(source_col)
              .agg(F.sum(_ntokens_expr(text_col)).alias("tok"))
              .collect()}
    grand = sum(totals.get(s, 0) for s in target_shares)
    rates = {s: min(1.0, (share * grand) / totals[s])
             for s, share in target_shares.items()
             if totals.get(s) and share > 0}
    rate_col = F.lit(None).cast("double")
    for s, r in rates.items():
        rate_col = F.when(F.col(source_col) == s, F.lit(r)).otherwise(rate_col)
    u = _md5_u32(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return (df.withColumn("keep_rate", F.round(rate_col, 9))
            .where(F.col("keep_rate").isNotNull()
                   & (u / F.lit(float(2 ** 32)) < F.col("keep_rate"))))


def temperature_mix(df: DataFrame, alpha: float = 0.5,
                    source_col: str = "source",
                    text_col: str = "text") -> DataFrame:
    """Temperature-scaled source mixing (the multilingual/data-recipe
    smoothing used by LLaMA/PaLM-style pipelines): per-source sampling
    weight ``w_i = t_i^α / Σ t_j^α`` over token counts, α ∈ (0, 1]
    up-weights small sources (α=1 → natural mix, α→0 → uniform).
    Emits per source: token count, natural share, temperature share, and
    ``sample_factor`` = temp_share · grand / t_i — the relative over/
    under-sampling each source needs (>1 = repeat epochs).

    Scale shape: one token-count aggregate over the corpus (map-side
    partial sums), then pure arithmetic on the |sources|-row frame —
    the corpus itself is scanned exactly once, never shuffled."""
    per = df.groupBy(source_col).agg(
        F.sum(_ntokens_expr(text_col)).alias("tokens"))
    tot = per.agg(
        F.sum("tokens").alias("grand"),
        F.sum(F.pow(F.col("tokens").cast("double"), F.lit(alpha))).alias("z"))
    w = F.pow(F.col("tokens").cast("double"), F.lit(alpha)) / F.col("z")
    return (per.crossJoin(F.broadcast(tot))
            .select(
                source_col, "tokens",
                F.round(F.col("tokens") / F.col("grand"), 6)
                 .alias("natural_share"),
                F.round(w, 6).alias("temp_share"),
                F.round(w * F.col("grand") / F.col("tokens"), 6)
                 .alias("sample_factor"))
            .orderBy(source_col))


#: vocabulary size above which the probability table is joined by shuffle
#: instead of broadcast (mirrors Searcher.PRELOAD_VOCAB_MAX's auto posture)
LOGPPL_BROADCAST_VOCAB_MAX = 2_000_000


def unigram_logppl(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   broadcast_vocab_max: int = LOGPPL_BROADCAST_VOCAB_MAX
                   ) -> DataFrame:
    """Perplexity-proxy quality signal: per-doc mean negative
    log-likelihood under the corpus's own unigram LM (the classic
    CCNet-style perplexity filter, reduced to its order-0 public form —
    no external LM, fully deterministic). High ``logppl`` = the doc is
    lexically atypical for the corpus (often boilerplate, noise, or
    another language); curation pipelines drop or down-weight the tail.

    Scale shape: one explode of the token stream feeding two hash
    aggregates (term counts, then per-doc mean); the term-probability
    table joins back onto the token stream — BROADCAST while the
    vocabulary fits ``broadcast_vocab_max`` (code corpora: a few million
    terms), plain shuffle hash/merge join above it (open-web vocabularies
    run into the billions of distinct tokens and would OOM a broadcast).
    The posture is decided by the data — one cheap count over the
    already-needed cf frame — mirroring the Searcher's dictionary-preload
    auto threshold. The corpus itself is scanned once, never self-joined.
    """
    toks = df.select(
        id_col,
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    # cached (memory-and-disk, vocabulary-sized) so the posture-deciding
    # count materializes the same aggregate the join consumes — the
    # decision costs no extra corpus pass; rotation releases the
    # previous call's vocabulary cache (ml/dedup.persist_rotating)
    from opensearch_spark.ml.dedup import persist_rotating

    cf = persist_rotating(
        toks.groupBy("term").agg(F.count("*").alias("cf")),
        "unigram_logppl.cf")
    total = cf.agg(F.sum("cf").alias("total"))
    p = (cf.crossJoin(F.broadcast(total))
           .withColumn("p", F.col("cf") / F.col("total"))
           .select("term", "p"))
    if cf.count() <= broadcast_vocab_max:
        p = F.broadcast(p)
    else:
        # above the threshold the vocabulary is too big to broadcast BY
        # DECLARATION — pin a shuffle join so a mis-estimated
        # auto-broadcast can't OOM the driver (same posture discipline
        # as ml/dedup.py's corpus-scaled joins)
        p = p.hint("merge")
    scored = (toks.join(p, "term")
              .groupBy(id_col)
              .agg((-F.avg(F.log("p"))).alias("logppl"),
                   F.count("*").alias("n_tokens")))
    # token-less (NULL/blank) docs emit no token rows and would vanish
    # from the output — report them (logppl 0.0, n_tokens 0) instead of
    # silently dropping (the repetition_stats no-dropout discipline)
    return (df.select(id_col).join(scored, id_col, "left")
            .na.fill({"logppl": 0.0, "n_tokens": 0}))


def quality_classifier(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    dim: int = 1024,
    weights: DataFrame | None = None,
    bias: float = -0.1,
) -> DataFrame:
    """fastText-style linear quality classifier (the model-based filter of
    CCNet / LLaMA / FineWeb-Edu data pipelines): hashed bag of unigram +
    bigram features, per-feature weight lookup, mean-pooled logit,
    sigmoid.

    Scale shape (the part that matters at 100 TB): the corpus is scanned
    ONCE — tokens + bigrams are built as per-row array expressions (all
    codegen, no UDF), exploded, bucketed by the md5-prefix hash mod
    ``dim``, and joined against the ``dim``-row weight table, which is
    broadcast (a real fastText quality model is O(10⁵-10⁶) buckets — far
    under any broadcast threshold). One hash-agg by doc closes the plan.

    ``weights`` is (b BIGINT, w DOUBLE); when None, a deterministic
    stand-in table is generated (w(b) spread over [-1, 1] by a Knuth
    multiply — the sandbox ships no trained model artifact; the plumbing
    — explode, broadcast lookup, mean-pool, sigmoid — is the real path a
    loaded model would take).

    Returns (id_col, n_features, quality, keep).
    """
    spark = df.sparkSession
    if weights is None:
        weights = spark.range(dim).select(
            F.col("id").alias("b"),
            (((F.col("id") * F.lit(2654435761)) % F.lit(2000001))
             / F.lit(1000000.0) - F.lit(1.0)).alias("w"))
    # token array materialized once per row (a separate projection:
    # CollapseProject keeps multi-referenced non-trivial aliases, so the
    # split+filter runs once, not once per reference)
    toks = df.select(
        id_col,
        F.expr(f"filter(split(trim({text_col}), '\\\\s+'), x -> x != '')")
        .alias("_ts"))
    feats = toks.select(
        id_col,
        F.explode(F.concat(
            F.col("_ts"),
            F.expr("zip_with(slice(_ts, 1, greatest(size(_ts) - 1, 0)), "
                   "slice(_ts, 2, greatest(size(_ts) - 1, 0)), "
                   "(a, b) -> concat(a, '_', b))"),
        )).alias("f"))
    bucketed = feats.select(
        id_col, (_md5_u32(F.col("f")) % dim).alias("b"))
    # LEFT join + weight-0 default: a real exported linear model commonly
    # prunes zero-weight buckets from its table; features hashing to a
    # missing bucket must still count toward the mean-pool denominator
    # (fastText pools over ALL tokens), not silently vanish
    scored = (bucketed.join(F.broadcast(weights), "b", "left")
              .withColumn("w", F.coalesce("w", F.lit(0.0)))
              .groupBy(id_col)
              .agg(F.count("*").alias("n_features"),
                   F.avg("w").alias("_mean_w")))
    # token-less docs produce zero feature rows and would vanish from
    # the output — report them with n_features=0 and the bias-only logit
    # (mean pool over no features = 0) instead of silently dropping
    scored = (df.select(id_col).join(scored, id_col, "left")
              .na.fill({"n_features": 0, "_mean_w": 0.0}))
    z = F.col("_mean_w") + F.lit(float(bias))
    return scored.select(
        id_col, "n_features",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("quality"),
        ((F.lit(1.0) / (F.lit(1.0) + F.exp(-z))) >= 0.5).alias("keep"))


def dsir_log_importance(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169, the domain-targeting selector of modern pretraining
    pipelines): fit hashed-unigram distributions over the raw corpus and
    a target-domain sample, add-alpha smooth both, and score every raw
    document with its log importance weight
    ``Σ_tokens [ln p_target(bucket) − ln p_raw(bucket)]``.

    The paper's final Gumbel-top-k resampling draw is replaced by a
    deterministic importance threshold (``keep = score > 0``) — the
    documented sandbox divergence; everything up to the draw is the real
    estimator.

    Scale shape: two corpus scans (fit, score — exactly the paper's two
    passes) + one target scan; the bucket distributions are ``dim``-row
    aggregates joined broadcast at score time; totals stay in-plan as
    crossJoined 1-row aggregates (no driver collect). All tokenization is
    codegen split/explode; the md5-prefix bucket hash shares its spelling
    with the DuckDB oracle.

    Returns (id_col, n_tokens, log_importance, keep).
    """
    spark = df.sparkSession

    def _buckets(d: DataFrame) -> DataFrame:
        toks = d.select(
            F.expr(f"filter(split(trim({text_col}), '\\\\s+'), x -> x != '')")
            .alias("_ts"))
        return (toks.select(F.explode("_ts").alias("t"))
                .select((_md5_u32(F.col("t")) % dim).alias("b")))

    raw_b = _buckets(df).groupBy("b").agg(F.count("*").alias("n_raw"))
    tgt_b = _buckets(target).groupBy("b").agg(F.count("*").alias("n_tgt"))
    grid = spark.range(dim).select(F.col("id").alias("b"))
    dist = (grid.join(raw_b, "b", "left").join(tgt_b, "b", "left")
            .select("b",
                    F.coalesce("n_raw", F.lit(0)).alias("n_raw"),
                    F.coalesce("n_tgt", F.lit(0)).alias("n_tgt")))
    totals = dist.agg(F.sum("n_raw").alias("t_raw"),
                      F.sum("n_tgt").alias("t_tgt"))
    a, ad = F.lit(float(alpha)), F.lit(float(alpha * dim))
    weights = dist.crossJoin(F.broadcast(totals)).select(
        "b",
        (F.log((F.col("n_tgt") + a) / (F.col("t_tgt") + ad))
         - F.log((F.col("n_raw") + a) / (F.col("t_raw") + ad))).alias("w"))

    doc_toks = df.select(
        id_col,
        F.expr(f"filter(split(trim({text_col}), '\\\\s+'), x -> x != '')")
        .alias("_ts"))
    doc_b = doc_toks.select(
        id_col, F.explode("_ts").alias("t")).select(
        id_col, (_md5_u32(F.col("t")) % dim).alias("b"))
    scored = (doc_b.join(F.broadcast(weights), "b")
              .groupBy(id_col)
              .agg(F.count("*").cast("long").alias("n_tokens"),
                   F.sum("w").alias("log_importance")))
    # token-less docs emit no bucket rows — report (0, 0.0, keep=false)
    # instead of silently dropping them from the selection output
    scored = (df.select(id_col).join(scored, id_col, "left")
              .na.fill({"n_tokens": 0, "log_importance": 0.0}))
    return scored.select(
        id_col, "n_tokens", "log_importance",
        (F.col("log_importance") > 0).alias("keep"))


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 128,
                    overlap: int = 0) -> DataFrame:
    """RAG-ingestion chunking: split each document's whitespace-token
    stream into fixed-size chunks with ``overlap`` tokens of context
    carried between consecutive chunks (the standard retrieval-corpus
    prep step before embedding).

    Pure codegen: one sequence() over chunk starts + a transform/slice —
    no UDF, no shuffle (chunking is embarrassingly per-row; the explode
    multiplies rows ~n_tokens/stride, which IS the output). Chunk starts
    advance by ``chunk_tokens - overlap``; the last chunk may be short
    but is never empty; single-token docs produce exactly one chunk.

    Returns (id, chunk_id, start_token, n_chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # last start must still contribute NEW tokens (its fresh content
    # begins at start+overlap), so starts run to size - overlap - 1 —
    # otherwise a trailing chunk could be pure overlap of its predecessor
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(F.col("_toks")) - overlap - 1, F.lit(0)),
        F.lit(stride))
    chunk = F.col("start_token")
    return (df.where(F.trim(F.col(text_col)) != "")
            .select(F.col(id_col), toks.alias("_toks"))
            .select(id_col, F.col("_toks"),
                    F.posexplode(starts).alias("chunk_id", "start_token"))
            .select(
                id_col, "chunk_id", "start_token",
                F.slice(F.col("_toks"), chunk + 1, chunk_tokens)
                .alias("_chunk"))
            .select(
                id_col, "chunk_id", "start_token",
                F.size("_chunk").alias("n_chunk_tokens"),
                F.concat_ws(" ", "_chunk").alias("chunk_text")))
