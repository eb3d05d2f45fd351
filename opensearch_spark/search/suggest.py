"""Term suggester (SURVEY §2.4): spell-correction over the dictionary.

Reference: ``search/suggest/term/TermSuggestionBuilder.java`` (registered at
``SearchModule.java:863-888``) — Lucene DirectSpellChecker walks the term FST
with a Levenshtein automaton and ranks candidates by (score, frequency).
Spark-first re-expression: the dictionary IS a table, so candidate
generation is a length-banded ``levenshtein`` filter over it, ranked by
(distance asc, df desc, term asc) — one declarative plan, no FST.

``suggest_mode`` (reference default ``missing``): ``missing`` only suggests
for input terms absent from the index; ``popular`` requires candidates with
higher df than the input term; ``always`` suggests regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Window as W


def term_suggest(
    searcher,
    text: str,
    size: int = 3,
    max_edits: int = 2,
    suggest_mode: str = "missing",
) -> DataFrame:
    """One row per (input term, suggestion): columns
    (term, suggestion, distance, df, rank)."""
    terms = list(dict.fromkeys(searcher.analyze(text)))
    if not terms:
        return searcher.spark.createDataFrame(
            [], "term string, suggestion string, distance int, df long, rank int")
    dfs = searcher.term_dfs(terms)
    if suggest_mode == "missing":
        targets = [(t, 0) for t in terms if t not in dfs]
    elif suggest_mode == "popular":
        targets = [(t, dfs.get(t, 0)) for t in terms]
    else:
        targets = [(t, 0) for t in terms]
    if not targets:
        return searcher.spark.createDataFrame(
            [], "term string, suggestion string, distance int, df long, rank int")
    tdf = searcher.spark.createDataFrame(targets, "term string, min_df long")
    d = searcher.index.dictionary(searcher.spark).select(
        F.col("term").alias("suggestion"), "df")
    # length band prunes the cross join the same way the reference's
    # automaton bounds the FST walk
    cand = (F.broadcast(tdf).crossJoin(d)
            .where(F.abs(F.length("suggestion") - F.length("term")) <= max_edits)
            .where(F.col("suggestion") != F.col("term"))
            .withColumn("distance", F.levenshtein("suggestion", "term"))
            .where(F.col("distance") <= max_edits)
            .where(F.col("df") > F.col("min_df")))
    w = W.partitionBy("term").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("suggestion"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= size)
            .select("term", "suggestion", "distance", "df", "rank"))


def completion_suggest(
    inputs: DataFrame,
    prefix: str,
    size: int = 5,
    input_col: str = "input",
    weight_col: str | None = None,
    fuzziness: int = 0,
    skip_duplicates: bool = False,
    context_col: str | None = None,
    contexts: list | None = None,
) -> DataFrame:
    """Completion suggester (search/suggest/completion/
    CompletionSuggestionBuilder.java): weighted prefix autocomplete.

    The reference indexes completion inputs+weights into an in-memory FST
    (CompletionFieldMapper.java) and walks it by prefix
    (``CompletionSuggester.java``; fuzzy prefixes via
    ``FuzzyCompletionQuery``). Spark-first re-expression: the inputs ARE a
    table — a prefix is a ``startswith`` predicate (pushed to the parquet
    scan as a StartsWith/range filter; on an input table sorted by the
    completion field it prunes row groups via min/max), ranked by weight
    desc with a global TakeOrderedAndProject top-k — no FST, no state
    that has to fit one machine's heap.

    ``fuzziness`` allows that many edits against the same-length slice of
    the input (FuzzyCompletionQuery semantics approximation);
    ``skip_duplicates`` keeps the highest-weight entry per suggestion
    text. Returns (suggestion, weight, rank).

    ``contexts`` + ``context_col``: category contexts
    (``search/suggest/completion/context/CategoryContextMapping.java`` +
    ``CategoryQueryContext``): when query contexts are given, a
    suggestion must match one of them (filter), and its weight is
    multiplied by the highest boost among the matched contexts
    (``ContextMappings.java`` scores entries per matched context).
    Entries are plain values or {"value": ..., "boost": int}. The
    context here is a single-valued keyword column — the filter is a
    scan-pushable ``isin``, the boost a tiny literal map lookup, so
    contexts add zero shuffles.
    """
    p = prefix.lower()
    sug = F.lower(F.col(input_col)).alias("suggestion")
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long")).alias("weight")
    if contexts:
        if not context_col:
            raise ValueError("contexts given without a context_col")
        # only dicts carry a boost; any plain value (str, int id, bool
        # category) is a bare context with boost 1
        specs = [(c["value"], int(c.get("boost", 1))) if isinstance(c, dict)
                 else (c, 1) for c in contexts]
        boosts: dict = {}
        for v, b in specs:  # duplicate context values keep the max boost
            boosts[v] = max(b, boosts.get(v, b))
        bmap = F.create_map(
            *[x for v, b in boosts.items() for x in (F.lit(v), F.lit(b))])
        base = (inputs
                .where(F.col(context_col).isin(list(boosts)))
                .select(sug, w, F.col(context_col).alias("_ctx"))
                .withColumn("weight",
                            (F.col("weight")
                             * bmap[F.col("_ctx")]).cast("long"))
                .drop("_ctx"))
    else:
        base = inputs.select(sug, w)
    if fuzziness <= 0:
        cand = base.where(F.col("suggestion").startswith(p))
    else:
        # length lower bound prunes before the per-row edit distance; the
        # scale path for a large completion corpus is a materialized
        # substr(input, 1, K) partition column (the AnnIndex pattern) so
        # fuzzy probes touch only the adjacent prefix buckets
        cand = base.where(
            (F.length("suggestion") >= len(p) - fuzziness)
            & (F.levenshtein(F.substring("suggestion", 1, len(p)), F.lit(p))
               <= fuzziness))
    if skip_duplicates:
        cand = cand.groupBy("suggestion").agg(F.max("weight").alias("weight"))
    # global top-k FIRST (TakeOrderedAndProject — distributed partial
    # top-k, no single-partition sort), then rank the <=size survivors
    top = cand.orderBy(F.desc("weight"), F.asc("suggestion")).limit(size)
    w3 = W.orderBy(F.desc("weight"), F.asc("suggestion"))
    return (top.withColumn("rank", F.row_number().over(w3))
            .select("suggestion", "weight", "rank"))


def phrase_suggest(
    searcher,
    text: str,
    size: int = 3,
    max_edits: int = 1,
    num_candidates: int = 5,
) -> DataFrame:
    """Phrase suggester (search/suggest/phrase/PhraseSuggestionBuilder.java):
    per-token candidate generation (DirectCandidateGenerator analog: the
    length-banded levenshtein scan of ``term_suggest``, top
    ``num_candidates`` by (distance asc, cf desc, term asc), the input
    token itself included at distance 0 when indexed) scored by a
    Laplace-smoothed bigram language model over the corpus
    (LaplaceScorer.java): for a two-token phrase c1 c2,

        score = ln((cf(c1)+1)/(T+V)) + ln((bigram(c1,c2)+1)/(cf(c1)+V))

    with T = total tokens, V = vocabulary size. An n-token phrase chains
    the bigram term pairwise:

        score = ln((cf(c1)+1)/(T+V))
                + Σ_{i<n} ln((bigram(ci,ci+1)+1)/(cf(ci)+V))

    Bigram counts come from ONE positions-table adjacency self-join
    restricted to the union of all candidate terms — |cand|² pairs,
    bounded by (n·num_candidates)², never corpus-wide; candidate
    combinations are a chain of crossJoins bounded by num_candidates^n
    (n = query tokens, small by construction).

    Returns (suggestion, score, rank) — the top ``size`` corrected
    phrases.
    """
    spark = searcher.spark
    terms = searcher.analyze(text)
    out_schema = "suggestion string, score double, rank int"
    if len(terms) < 2:
        raise ValueError("phrase_suggest: at least two input tokens required")
    # the candidate lattice is num_candidates^n combinations and
    # n·num_candidates driver-collected strings — tiny at the defaults,
    # but charge the request breaker (expand_terms posture, 64 B/entry
    # estimate) so a caller raising num_candidates or feeding a long
    # phrase TRIPS cleanly before any Spark work. Scope note: the
    # reservation spans the candidate collect below and is released
    # before the caller materializes the (lazy) lattice crossJoin — it
    # is a per-request size gate, not an accounting of concurrently
    # executing lattices (the reference's request breaker has the same
    # estimate-at-construction character for multi-term expansions)
    from opensearch_spark.common.breaker import request_breaker

    lattice_bytes = 64 * (len(terms) * num_candidates
                          + num_candidates ** len(terms))
    d = searcher.index.dictionary(spark)
    V = int(searcher.index.meta.get("vocab_size") or d.count())
    T = searcher.sum_dl
    n = len(terms)

    def cands(tok: str, name: str):
        # length band BEFORE the per-row edit distance (same prune as
        # term_suggest and the search_suggest_term oracle): |len diff| >
        # max_edits implies distance > max_edits, so results are identical
        # and the levenshtein runs on a sliver of the vocabulary
        c = (d.select(F.col("term").alias(name), F.col("cf").alias(f"{name}_cf"))
             .where(F.abs(F.length(name) - F.lit(len(tok))) <= max_edits)
             .withColumn("_dist", F.levenshtein(F.col(name), F.lit(tok)))
             .where(F.col("_dist") <= max_edits))
        w2 = W.orderBy(F.asc("_dist"), F.desc(f"{name}_cf"), F.asc(name))
        return (c.withColumn("_rn", F.row_number().over(w2))
                .where(F.col("_rn") <= num_candidates).drop("_dist", "_rn"))

    frames = [cands(t, f"t{i + 1}") for i, t in enumerate(terms)]
    with request_breaker.reserve(lattice_bytes,
                                 "phrase_suggest candidate lattice"):
        term_lists = [[r[f"t{i + 1}"]
                       for r in cf.select(f"t{i + 1}").collect()]
                      for i, cf in enumerate(frames)]
    if any(not tl for tl in term_lists):
        return spark.createDataFrame([], out_schema)
    all_terms = sorted({t for tl in term_lists for t in tl})
    pos = searcher.index.positions(spark)
    a = (pos.where(F.col("term").isin(all_terms))
         .select(F.col("term").alias("lt"), "doc_id",
                 F.explode("positions").alias("p")))
    b = (pos.where(F.col("term").isin(all_terms))
         .select(F.col("term").alias("rt"), "doc_id",
                 F.explode("positions").alias("p2"))
         .select("rt", "doc_id", (F.col("p2") - F.lit(1)).alias("p")))
    big = (a.join(b, ["doc_id", "p"])
           .groupBy("lt", "rt").agg(F.count("*").alias("bc")))
    pairs = frames[0]
    for cf in frames[1:]:
        pairs = pairs.crossJoin(cf)
    score = F.log((F.col("t1_cf") + 1.0) / F.lit(float(T + V)))
    for i in range(1, n):
        bi = big.select(F.col("lt").alias(f"t{i}"),
                        F.col("rt").alias(f"t{i + 1}"),
                        F.col("bc").alias(f"bc{i}"))
        pairs = (pairs.join(bi, [f"t{i}", f"t{i + 1}"], "left")
                 .withColumn(f"bc{i}", F.coalesce(f"bc{i}", F.lit(0))))
        score = score + F.log((F.col(f"bc{i}") + 1.0)
                              / (F.col(f"t{i}_cf") + F.lit(float(V))))
    scored = pairs.select(
        F.concat_ws(" ", *[f"t{i + 1}" for i in range(n)]).alias("suggestion"),
        F.round(score, 6).alias("score"))
    w3 = W.orderBy(F.desc("score"), F.asc("suggestion"))
    return (scored.withColumn("rank", F.row_number().over(w3))
            .where(F.col("rank") <= size)
            .select("suggestion", "score", "rank"))
