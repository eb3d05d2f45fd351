"""PNG/WAV codec correctness: bit-exact round trips (hypothesis), every
filter type exercised, malformed-input rejection, word-aligned RIFF."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from opensearch_spark.ml import codecs as C


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2),
       st.integers(0, 2**31 - 1))
def test_png_roundtrip_rgb_all_filters(w, h, mode, seed):
    rng = np.random.default_rng(seed)
    shape = {0: (h, w), 1: (h, w, 3), 2: (h, w, 4)}[mode]
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    for ft in [None, 0, 1, 2, 3, 4]:
        out = C.decode_png(C.encode_png(img, filter_type=ft))
        assert out.shape == img.shape
        assert np.array_equal(out, img), f"filter {ft}"


def test_png_paeth_reference_cases():
    # RFC 2083 predictor: closest of left/up/upleft to p = a + b - c
    assert C._paeth(0, 0, 0) == 0
    assert C._paeth(10, 0, 0) == 10      # p=10 → left
    assert C._paeth(0, 10, 0) == 10      # p=10 → up
    assert C._paeth(100, 200, 150) == 150  # p=150 → exact upleft
    assert C._paeth(4, 8, 6) == 6        # pa==pb but pc=0 → upleft wins


def test_png_rejects_garbage_and_bad_crc():
    with pytest.raises(ValueError):
        C.decode_png(b"not a png at all")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(C.encode_png(img))
    data[20] ^= 0xFF  # corrupt IHDR body → CRC mismatch
    with pytest.raises(ValueError):
        C.decode_png(bytes(data))


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 5000), st.integers(1, 2), st.integers(0, 2**31 - 1),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip(n, n_ch, seed, rate):
    rng = np.random.default_rng(seed)
    shape = (n,) if n_ch == 1 else (n, 2)
    samples = rng.integers(-32768, 32768, size=shape).astype(np.int16)
    got_rate, got = C.decode_wav(C.encode_wav(samples, rate))
    assert got_rate == rate
    assert got.shape == samples.shape
    assert np.array_equal(got, samples)


def test_wav_odd_length_chunk_alignment():
    """RIFF chunks are word-aligned; an odd-sized preceding chunk must
    not desync the walk."""
    samples = np.array([1, -2, 3], dtype=np.int16)
    wav = bytearray(C.encode_wav(samples))
    import struct
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd + pad
    out = wav[:12] + extra + wav[12:]
    out[4:8] = struct.pack("<I", len(out) - 8)
    rate, got = C.decode_wav(bytes(out))
    assert np.array_equal(got, samples)


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError):
        C.decode_wav(b"\x89PNG\r\n\x1a\nnope")
