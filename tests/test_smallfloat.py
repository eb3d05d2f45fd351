"""SmallFloat intToByte4/byte4ToInt parity (public Lucene semantics; the
1-byte norm quantization called out in SURVEY.md §4.4)."""

import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from opensearch_spark.scoring.smallfloat import (
    NORM_TABLE,
    byte4_to_int,
    decode_norms,
    encode_norms,
    int_to_byte4,
)


def test_known_values():
    # values < 24 are free/exact
    for i in range(24):
        assert int_to_byte4(i) == i
        assert byte4_to_int(i) == i
    assert int_to_byte4(24) == 24
    assert int_to_byte4(25) == 25
    assert byte4_to_int(40) == 40  # 24 + (8<<1)
    assert int_to_byte4(41) == 40  # rounds down to lattice


def test_monotone_and_round_trip_lattice():
    decoded = [byte4_to_int(b) for b in range(256)]
    assert decoded == sorted(decoded)
    assert len(set(decoded)) == 256  # strictly monotone
    for b in range(256):
        assert int_to_byte4(decoded[b]) == b  # idempotent on lattice


@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_decode_le_input_and_best(i):
    b = int_to_byte4(i)
    d = byte4_to_int(b)
    assert d <= i
    if b < 255:
        assert byte4_to_int(b + 1) > i  # largest lattice value <= i


def test_vectorized_matches_scalar():
    xs = np.array([0, 1, 23, 24, 39, 40, 41, 100, 255, 1000, 123456, 2**30])
    enc = encode_norms(xs)
    assert [int(e) for e in enc] == [int_to_byte4(int(x)) for x in xs]
    dec = decode_norms(enc)
    assert [int(d) for d in dec] == [byte4_to_int(int_to_byte4(int(x))) for x in xs]
    assert NORM_TABLE.shape == (256,)
