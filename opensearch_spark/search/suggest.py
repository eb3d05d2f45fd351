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
