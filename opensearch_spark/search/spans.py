"""Positional span algebra over the positions table (SURVEY §2.2 span_*).

Reference semantics: ``index/query/SpanNearQueryBuilder.java`` (+
``SpanFirst/SpanOr/SpanNotQueryBuilder.java``) and the interval queries in
``index/query/IntervalQueryBuilder.java``; Lucene enumerates candidate
spans with a sorted k-way merge over per-term position iterators.

Spark-first re-expression, and the fix for the round-1 scale bug: the old
plan joined exploded position lists on ``doc_id`` alone and filtered — a
doc with p occurrences of each of n terms materialized p^n rows (hot term
× long doc = blow-up). Here the positions rows for the query clauses are
grouped **per doc** (group size = #clauses rows, each holding one position
array), and a vectorized numpy merge enumerates matches in
O(Σ|positions|·log n) per doc inside ``applyInPandas``:

- ordered (``in_order=True``): for every start position of clause 0 the
  *greedy minimal chain* (each next clause's smallest position strictly
  greater than the previous) is computed with ``np.searchsorted`` across
  all starts at once; a chain matches when its total extra gap
  ``p_last - p_first - (n-1) <= slop``. Greedy-minimal is optimal: any
  valid chain from a start implies the minimal chain is valid too, so
  match existence AND the per-start match count are exact.
- unordered: classic minimal-window two-pointer sweep over the merged
  (position, clause) stream — a window matches when it covers every
  clause (with multiplicity, on distinct positions) within the slop.

The only shuffle is the ``groupBy(doc_id)``; per-group work is bounded by
the doc's length, so hot terms cost Σ doc lengths, never a product.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

SPAN_SCHEMA = "doc_id long, n_matches long"


def _greedy_ordered(arrs: list[np.ndarray], slop: int) -> int:
    """Number of clause-0 start positions whose greedy minimal ordered
    chain exists and fits the slop window. Vectorized across starts."""
    n = len(arrs)
    p0 = arrs[0]
    if n == 1:
        return int(len(p0))
    prev = p0.copy()
    valid = np.ones(len(p0), dtype=bool)
    for a in arrs[1:]:
        idx = np.searchsorted(a, prev + 1)
        ok = idx < len(a)
        valid &= ok
        prev = a[np.clip(idx, 0, len(a) - 1)]
    return int(np.count_nonzero(valid & (prev - p0 - (n - 1) <= slop)))


def _unordered_exists(arrs: list[list[np.ndarray]], slop: int) -> bool:
    """Minimal-window sweep: True iff some window of distinct positions
    covers every clause label with its multiplicity and spans <= slop +
    (n-1). ``arrs`` groups duplicate clauses: one entry per distinct label,
    each a (positions, need) pair folded into parallel lists."""
    labels = []
    needs = []
    events = []
    for li, (a, need) in enumerate(arrs):
        labels.append(li)
        needs.append(need)
        events.extend((int(p), li) for p in a)
    n_total = sum(needs)
    events.sort()
    have = [0] * len(labels)
    covered = 0
    left = 0
    for right, (pr, lr) in enumerate(events):
        have[lr] += 1
        if have[lr] == needs[lr]:
            covered += 1
        # shrink to the largest left keeping full coverage
        while left < right:
            pl, ll = events[left]
            if have[ll] > needs[ll]:
                have[ll] -= 1
                left += 1
            else:
                break
        if covered == len(labels):
            pl = events[left][0]
            if pr - pl - (n_total - 1) <= slop:
                return True
    return False


def _span_group_fn(n_clauses: int, slop: int, in_order: bool):
    empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "n_matches": pd.Series([], dtype="int64"),
    })

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        arrs: list[np.ndarray | None] = [None] * n_clauses
        for cl, ps in zip(pdf["clause"], pdf["positions"]):
            a = np.asarray(ps, dtype=np.int64)
            arrs[cl] = a if arrs[cl] is None else np.concatenate([arrs[cl], a])
        if any(a is None or len(a) == 0 for a in arrs):
            return empty
        arrs2 = [np.unique(a) for a in arrs]
        if in_order:
            m = _greedy_ordered(arrs2, slop)
        else:
            # fold duplicate clause position-sets into (positions, need)
            folded: dict[bytes, list] = {}
            for a in arrs2:
                key = a.tobytes()
                if key in folded:
                    folded[key][1] += 1
                else:
                    folded[key] = [a, 1]
            m = 1 if _unordered_exists(list(folded.values()), slop) else 0
        if not m:
            return empty
        return pd.DataFrame({"doc_id": [int(pdf["doc_id"].iloc[0])],
                             "n_matches": [int(m)]})

    return fn


def span_match_counts(searcher, clauses: list, slop: int,
                      in_order: bool) -> DataFrame:
    """(doc_id, n_matches) for a span_near over ``clauses``; each clause is
    a term string or a list of alternative terms (an inlined span_or).

    Plan: term-pruned positions scan → broadcast (term → clause) tag join →
    one groupBy(doc_id) applyInPandas. No position cartesian anywhere.
    """
    searcher._require_positions("span/interval queries")
    spark = searcher.spark
    mapping = []
    for i, c in enumerate(clauses):
        alts = [c] if isinstance(c, str) else list(c)
        for t in alts:
            mapping.append((t, i))
    terms = sorted({t for t, _ in mapping})
    map_df = spark.createDataFrame(mapping, "term string, clause int")
    pos = (searcher.index.positions(spark)
           .where(F.col("term").isin(terms))
           .join(F.broadcast(map_df), "term")
           .select("doc_id", "clause", "positions"))
    return pos.groupBy("doc_id").applyInPandas(
        _span_group_fn(len(clauses), slop, in_order), SPAN_SCHEMA)
