"""Highlighting (SURVEY §2.4): snippet extraction around query matches.

Reference: ``search/fetch/subphase/highlight/{UnifiedHighlighter,
PlainHighlighter,FastVectorHighlighter}.java`` — a fetch sub-phase that
re-analyzes (plain) or reuses offsets (unified/fvh) on the top-k hits only.

Spark projection: highlighting runs AFTER the top-k cut, on the fetched
hits frame — k rows, never the corpus — so a plain Catalyst
``regexp_replace`` (whole-field tagging) or the pandas fragmenter
(windowed snippets) are both O(k)."""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _term_pattern(terms: list[str]) -> str:
    alts = "|".join(re.escape(t)
                    for t in sorted(set(terms), key=lambda t: (-len(t), t)))
    if not alts:
        # \b()\b would match zero-width at EVERY word boundary, spraying
        # empty tag pairs through the text — no terms means no highlights
        return r"(?!)"  # never-matching pattern (valid in Java and re)
    return r"\b(" + alts + r")\b"


def highlight_field(hits: DataFrame, field: str, terms: list[str],
                    pre_tag: str = "<em>", post_tag: str = "</em>",
                    out_col: str = "highlight") -> DataFrame:
    """Whole-field tagging: wrap every term occurrence (case-sensitive over
    the analyzed lowercase field) in pre/post tags. Catalyst-native."""
    if not terms:
        return hits.withColumn(out_col, F.col(field))
    pat = _term_pattern(terms)
    return hits.withColumn(
        out_col, F.regexp_replace(F.col(field), pat, pre_tag + "$1" + post_tag))


def highlight_fragments(hits: DataFrame, field: str, terms: list[str],
                        fragment_size: int = 100, number_of_fragments: int = 3,
                        pre_tag: str = "<em>", post_tag: str = "</em>",
                        out_col: str = "fragments") -> DataFrame:
    """Windowed snippets (PlainHighlighter behavior): up to N fragments of
    ~fragment_size chars centered on match runs, best-first by match count.
    Pandas UDF over the k-row hits frame."""
    import bisect

    pat = re.compile(_term_pattern(terms))

    def frags(s: pd.Series) -> pd.Series:
        out = []
        for text in s:
            if text is None:
                out.append([])
                continue
            spans = [(m.start(), m.end()) for m in pat.finditer(text)]
            if not spans:
                out.append([])
                continue
            # finditer yields non-overlapping matches in order, so both
            # starts and ends are ascending — the fully-inside-[w0,w1]
            # span set is the contiguous slice [lo:hi] found by bisect
            # (was: two O(m) scans per window → O(m²) on hot terms)
            starts = [a for a, _ in spans]
            ends = [b for _, b in spans]
            windows: list[tuple[int, int, int, int, int]] = []
            consumed = 0  # spans[:consumed] already covered by a window
            for i, (st, _e) in enumerate(spans):
                if i < consumed:
                    continue
                w0 = max(0, st - fragment_size // 2)
                w1 = min(len(text), w0 + fragment_size)
                # only matches FULLY inside the window count as covered:
                # a term whose text extends past w1 would render
                # truncated and untagged, yet consuming it would stop
                # any later window from ever showing it whole
                lo = bisect.bisect_left(starts, w0)
                hi = bisect.bisect_right(ends, w1)
                n = max(0, hi - lo)
                consumed = max(consumed, hi)
                windows.append((n, w0, w1, lo, hi))
            windows.sort(key=lambda x: (-x[0], x[1]))
            sel = sorted(windows[:number_of_fragments], key=lambda x: x[1])

            def render(w0: int, w1: int, lo: int, hi: int) -> str:
                # tag the ORIGINAL matches inside the window — re-running
                # the \b pattern on the character slice would fabricate
                # word boundaries at the cut ('blue|berry' → a bogus
                # highlighted 'berry'; round-4 review)
                parts, cur = [], w0
                for a, b in spans[lo:hi]:
                    parts += [text[cur:a], pre_tag, text[a:b], post_tag]
                    cur = b
                parts.append(text[cur:w1])
                return "".join(parts)

            out.append([render(w0, w1, lo, hi)
                        for _n, w0, w1, lo, hi in sel])
        return pd.Series(out)

    udf = F.pandas_udf(frags, T.ArrayType(T.StringType()))
    return hits.withColumn(out_col, udf(F.col(field)))


def fvh_highlight(searcher, terms: list[str], doc_ids: list[int] | None = None,
                  window_tokens: int = 8, pre_tag: str = "<em>",
                  post_tag: str = "</em>") -> DataFrame:
    """FastVectorHighlighter analog (FastVectorHighlighter.java): fragment
    selection from stored TERM VECTORS — here the positions table — with
    no re-analysis of the source text (the plain highlighter's cost). The
    best fragment per doc is the ``window_tokens``-token window covering
    the most query-term positions (FieldPhraseList/SimpleFragListBuilder
    behavior), tagged token-wise.

    Plan shape: the positions scan is term- and doc-pruned, the window
    argmax is a self-equi-join on doc_id bounded by top-k × positions —
    never the corpus; the fragment slice + tagging is Catalyst
    ``slice``/``transform`` on the k fetched rows.

    Returns (doc_id, n_matches, fragment).
    """
    if doc_ids is None:
        # this is a FETCH sub-phase: without the top-k id list the window
        # self-join would run over every matching document in the corpus
        # (O(Σ matches²) pairs for a hot term) — refuse rather than ship
        # an accidental corpus scan under a "bounded" contract
        raise ValueError(
            "fvh_highlight requires the top-k doc_ids — highlighting is a "
            "fetch sub-phase over the bounded hit page, never the corpus")
    analyzed = [t for w in terms for t in searcher.analyze(w)]
    searcher._require_positions("fvh_highlight")
    pos = searcher.index.positions(searcher.spark)
    m = (pos.where(F.col("term").isin(analyzed))
         .select("doc_id", F.explode("positions").alias("p"))
         .where(F.col("doc_id").isin([int(d) for d in doc_ids])))
    a = m.select("doc_id", F.col("p").alias("start"))
    b = m.select("doc_id", F.col("p").alias("pb"))
    w = (a.join(b, "doc_id")
         .where((F.col("pb") >= F.col("start"))
                & (F.col("pb") < F.col("start") + window_tokens))
         .groupBy("doc_id", "start").agg(F.count("*").alias("n_matches")))
    from pyspark.sql import Window as W
    best = (w.withColumn(
        "_rn", F.row_number().over(
            W.partitionBy("doc_id").orderBy(F.desc("n_matches"),
                                            F.asc("start"))))
        .where(F.col("_rn") == 1).drop("_rn"))
    docs = searcher.index.docs(searcher.spark) \
        .select("doc_id", F.col(searcher.index.meta["field"]).alias("_txt"))
    # fragment rendering must use the SAME tokenization the positions were
    # built with — slicing a raw whitespace split at an analyzer position
    # misaligns whenever the analyzer splits differently (snake_case → 3
    # positions, 1 whitespace token). Positions carry no char offsets, so
    # the k best rows re-tokenize their text (O(k), the fetch-phase cost
    # bound) and the fragment is the analyzed-token window.
    analyzer_name = searcher.index.analyzer
    term_set = set(analyzed)

    def _frag(texts: pd.Series, starts: pd.Series) -> pd.Series:
        from opensearch_spark.analysis.analyzer import tokenize

        out = []
        for text, start in zip(texts, starts):
            toks = tokenize(text or "", analyzer_name)
            win = toks[int(start):int(start) + window_tokens]
            out.append(" ".join(
                f"{pre_tag}{t}{post_tag}" if t in term_set else t
                for t in win))
        return pd.Series(out)

    frag_udf = F.pandas_udf(_frag, T.StringType())
    return (best.join(docs, "doc_id")
            .select("doc_id", "n_matches",
                    frag_udf(F.col("_txt"), F.col("start")).alias("fragment")))
