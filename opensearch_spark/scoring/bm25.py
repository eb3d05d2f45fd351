"""Okapi BM25 — the reference's default similarity.

Behavioral spec (SURVEY.md §4.4; reference
``index/similarity/SimilarityProviders.java:274-281`` configures
``LegacyBM25Similarity(k1=1.2, b=0.75, discount_overlaps=true)``, validated
monotone at ``SimilarityService.java:213-313``):

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score    = boost * idf * (k1 + 1) * tf / (tf + k1 * (1 - b + b * dl / avgdl))
    avgdl    = sumTotalTermFreq / docCount

Two modes:

- ``exact``  — float64 throughout, true doc lengths. This is the mode the
  DuckDB oracle can reproduce bit-for-bit and what the driver correctness
  gate runs.
- ``lucene`` — float32 order-of-operations with 1-byte SmallFloat-quantized
  doc lengths and the per-norm cache, reproducing the reference's scores
  (the ``(k1+1)`` Legacy numerator and quantization are the two classic
  mismatch sources; fixtures pin them).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from opensearch_spark.scoring.smallfloat import NORM_TABLE, encode_norms

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


@dataclass(frozen=True)
class BM25Params:
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    mode: str = "exact"  # "exact" (float64) | "lucene" (float32 + quantized norms)


def bm25_idf(N: int, df, params: BM25Params = BM25Params()):
    """idf = ln(1 + (N - df + 0.5)/(df + 0.5)); vectorized over df."""
    df = np.asarray(df, dtype=np.float64)
    idf = np.log(1.0 + (N - df + 0.5) / (df + 0.5))
    if params.mode == "lucene":
        return idf.astype(np.float32)
    return idf


def norm_cache(avgdl: float, params: BM25Params = BM25Params()) -> np.ndarray:
    """Lucene-style 256-entry cache: cache[b] = k1*(1 - b + b*decode(b)/avgdl).

    (reference behavior: BM25Similarity precomputes this per segment so the
    per-doc work is one table lookup + one fma)
    """
    tbl = NORM_TABLE.astype(np.float32)
    return (params.k1 * (1.0 - params.b + params.b * tbl / np.float32(avgdl))).astype(
        np.float32
    )


def bm25_score(
    tf,
    dl,
    df,
    N: int,
    avgdl: float,
    boost: float = 1.0,
    params: BM25Params = BM25Params(),
):
    """Vectorized BM25 over parallel arrays (tf, dl, df)."""
    tf = np.asarray(tf)
    dl = np.asarray(dl)
    if params.mode == "lucene":
        cache = norm_cache(avgdl, params)
        norm_b = encode_norms(dl)
        denom_add = cache[norm_b]
        idf = bm25_idf(N, df, params)
        weight = (
            np.float32(boost) * idf * np.float32(params.k1 + 1.0)
        ).astype(np.float32)
        tf32 = tf.astype(np.float32)
        return (weight * (tf32 / (tf32 + denom_add))).astype(np.float32)
    tf64 = tf.astype(np.float64)
    dl64 = dl.astype(np.float64)
    idf = bm25_idf(N, df, params)
    return (
        boost
        * idf
        * (params.k1 + 1.0)
        * tf64
        / (tf64 + params.k1 * (1.0 - params.b + params.b * dl64 / avgdl))
    )


def bm25_sql_expr(
    tf: str, dl: str, df: str, N: str, avgdl: str, k1: float = K1_DEFAULT, b: float = B_DEFAULT
) -> str:
    """The exact-mode formula as a SQL string — used both by the Spark plan
    (Catalyst expression, stays in codegen) and the DuckDB oracle, so the two
    compute bit-identical float64 scores."""
    return (
        f"ln(1.0 + ({N} - {df} + 0.5) / ({df} + 0.5)) * ({k1} + 1.0) * {tf} "
        f"/ ({tf} + {k1} * (1.0 - {b} + {b} * {dl} / {avgdl}))"
    )
