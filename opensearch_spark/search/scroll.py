"""Scroll / point-in-time cursor API.

Reference: ``action/search/SearchScrollRequest`` + ``search/internal/
ScrollContext.java`` — a scroll id pins a point-in-time reader over the
shards and each continuation returns the next ``size`` hits; PIT
(``action/search/OpenPointInTimeRequest``) is the same snapshot pinning
with client-driven ``search_after`` cursors.

Spark-first re-expression: the index directory IS an immutable snapshot
(write-once parquet + versioned meta), so point-in-time consistency
holds by construction — no reader refcounting needed. The scroll state
that remains is just the cursor: the last (score, doc_id) sort key. A
``Scroll`` handle stores it driver-side (a few bytes, like the
reference's scroll id) and each ``next()`` issues a keyset-paginated
top-k — WHERE (score, doc_id) after cursor ORDER BY ... LIMIT size —
which stays a TakeOrderedAndProject plan at any depth, never a deep
OFFSET scan.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass
class Scroll:
    """Stateful scroll cursor over a scored frame. ``scores`` must have
    (doc_id, score) columns; ordering is (score desc, doc_id asc) — the
    reference's default relevance sort with the id tie-break."""

    scores: DataFrame
    size: int = 10
    round_scores: int | None = None
    _cursor: tuple[float, int] | None = field(default=None, init=False)
    _exhausted: bool = field(default=False, init=False)

    def _frame(self) -> DataFrame:
        df = self.scores
        if self.round_scores is not None:
            df = df.withColumn("score", F.round("score", self.round_scores))
        return df

    def next(self) -> DataFrame:
        """The next page. Materializes the page (to advance the cursor)
        and returns it as a small local-relation DataFrame."""
        if self._exhausted:
            return self._frame().limit(0)
        df = self._frame()
        if self._cursor is not None:
            cs, cd = self._cursor
            df = df.where(
                (F.col("score") < F.lit(cs))
                | ((F.col("score") == F.lit(cs)) & (F.col("doc_id") > F.lit(cd))))
        page = df.orderBy(F.desc("score"), F.asc("doc_id")).limit(self.size)
        rows = page.collect()
        if len(rows) < self.size:
            self._exhausted = True
        if rows:
            self._cursor = (rows[-1]["score"], rows[-1]["doc_id"])
        spark = self.scores.sparkSession
        return spark.createDataFrame(rows, page.schema) if rows \
            else self._frame().limit(0)


def scroll(searcher, q, size: int = 10, round_scores: int | None = None) -> Scroll:
    """Open a scroll over a query's full result set (relevance order).

    The scored frame is pinned with ``localCheckpoint`` at open: each
    ``next()`` is a separate Spark job, and re-executing the scoring
    plan per page could reproduce a boundary doc's float score an ulp
    off (shuffle-merge addition order is not deterministic across
    jobs), making the keyset predicate skip or duplicate it (round-4
    review). Checkpointing materializes the scores ONCE — every page
    reads the same bits, the reference's pinned-reader semantics. The
    checkpoint lives until the session ends (the reference's scroll
    keep-alive analog); lazy, so an unused Scroll costs nothing."""
    return Scroll(searcher.score(q).localCheckpoint(eager=False),
                  size=size, round_scores=round_scores)
