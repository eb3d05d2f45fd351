"""Lucene SmallFloat 1-byte length-norm quantization (public Lucene semantics).

The reference stores each document's per-field length as one byte
(``intToByte4``: 4-bit mantissa float) and decodes it through a 256-entry
table at query time — one of the two classic BM25-mismatch sources called
out in SURVEY.md §4.4. Behavioral spec from public Lucene
``org.apache.lucene.util.SmallFloat``; OpenSearch wires it via
``index/similarity/SimilarityProviders.java`` (LegacyBM25Similarity).

Values 0..23 are exact; above that, value = (0b1mmm) << shift with a 3-bit
stored mantissa — monotone, decode(encode(x)) <= x, and idempotent on the
decoded lattice.
"""

from __future__ import annotations

import numpy as np

_MAX_INT4 = 231  # longToInt4(Integer.MAX_VALUE)
NUM_FREE_VALUES = 255 - _MAX_INT4  # 24


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("only non-negative")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop implicit leading 1-bit
    encoded |= (shift + 1) << 3
    return encoded


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to an unsigned byte 0..255 (monotone)."""
    if i < 0:
        raise ValueError("only non-negative")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode unsigned byte 0..255 back to the quantized int."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + _int4_to_long(b - NUM_FREE_VALUES)


# 256-entry decode table, mirrors Lucene's LENGTH_TABLE cache
NORM_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)

def encode_norms(dl: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over an int array (doc lengths)."""
    dl = np.asarray(dl, dtype=np.int64)
    # encode(x) = index of the largest table value <= x  (tables are monotone)
    idx = np.searchsorted(NORM_TABLE, dl, side="right") - 1
    return idx.astype(np.uint8)


def decode_norms(b: np.ndarray) -> np.ndarray:
    """Vectorized byte4ToInt."""
    return NORM_TABLE[np.asarray(b, dtype=np.int64)]
