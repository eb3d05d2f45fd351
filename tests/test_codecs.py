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


# ---------------------------------------------------------------------------
# baseline JPEG (ml/jpegcodec.py)
# ---------------------------------------------------------------------------


def _gradient(h, w, ch=None):
    import numpy as np

    base = (np.add.outer(np.arange(h), np.arange(w)) % 256)
    if ch is None:
        return base.astype(np.uint8)
    return np.stack([(base + 40 * c) % 256 for c in range(ch)],
                    -1).astype(np.uint8)


def test_jpeg_near_lossless_with_flat_tables():
    """With all-ones quant tables the only loss is DCT float rounding and
    the YCbCr transform: error bounded by 2 counts per channel."""
    import numpy as np
    from opensearch_spark.ml.jpegcodec import decode_jpeg, encode_jpeg

    ones = np.ones((8, 8), np.int32)
    rng = np.random.default_rng(11)
    for img in [_gradient(24, 40), _gradient(24, 40, 3),
                rng.integers(0, 256, (16, 16), dtype=np.uint8),
                rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)]:
        out = decode_jpeg(encode_jpeg(img, quant_luma=ones,
                                      quant_chroma=ones))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_annexk_tables_lossy_but_close_on_smooth_images():
    """Standard Annex K tables on smooth content: small error (the
    regime JPEG is designed for), exact dims restored incl. non-8-aligned."""
    import numpy as np
    from opensearch_spark.ml.jpegcodec import decode_jpeg, encode_jpeg

    for img in [_gradient(24, 40), _gradient(19, 29, 3)]:
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0


def test_jpeg_byte_stuffing_roundtrip():
    """The entropy stream of a noisy fixture contains stuffed 0xFF00
    sequences; the decoder must unstuff them (and the stream still
    round-trips)."""
    import numpy as np
    from opensearch_spark.ml.jpegcodec import decode_jpeg, encode_jpeg

    found = False
    for seed in range(40):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
        data = encode_jpeg(img)
        scan = data[data.find(b"\xFF\xDA"):-2]
        out = decode_jpeg(data)
        assert out.shape == img.shape
        if b"\xFF\x00" in scan:
            found = True
            break
    assert found  # stuffing actually exercised by at least one fixture


def test_jpeg_honest_failures():
    import numpy as np
    import pytest
    from opensearch_spark.ml.jpegcodec import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot-a-jpeg")
    # truncated entropy stream
    data = encode_jpeg(_gradient(16, 16))
    with pytest.raises(ValueError):
        decode_jpeg(data[:len(data) - 12] + b"\xFF\xD9")
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8), np.float64))  # not uint8


def test_real_decode_routes_jpeg():
    import numpy as np
    from opensearch_spark.ml.jpegcodec import encode_jpeg
    from opensearch_spark.ml.multimodal import real_decode

    img = _gradient(16, 24)
    out = real_decode(encode_jpeg(img), 24, 16)
    assert out.shape == (16, 24, 3)  # grey expanded to 3 channels


def test_avi_mjpg_roundtrip_and_honest_failures():
    import numpy as np
    import pytest
    from opensearch_spark.ml.codecs import decode_avi_mjpg, encode_avi_mjpg

    ones = np.ones((8, 8), np.int32)
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
              for _ in range(4)]
    data = encode_avi_mjpg(frames, fps=15, quant_luma=ones,
                           quant_chroma=ones)
    fps, out = decode_avi_mjpg(data)
    assert fps == 15 and len(out) == 4
    for f, o in zip(frames, out):
        assert o.shape == f.shape
        assert np.abs(o.astype(int) - f.astype(int)).max() <= 2
    with pytest.raises(ValueError):
        decode_avi_mjpg(b"RIFF\x00\x00\x00\x00WAVE")  # not AVI
    with pytest.raises(ValueError):
        encode_avi_mjpg([])  # no frames
    with pytest.raises(ValueError):
        encode_avi_mjpg([frames[0], frames[0][:8]])  # mixed shapes


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40), w=st.integers(1, 40),
    ch=st.sampled_from([None, 3]), seed=st.integers(0, 2 ** 16),
)
def test_jpeg_flat_table_roundtrip_property(h, w, ch, seed):
    """Property: any uint8 image (grey or RGB, any dims incl. non-8-
    aligned) round-trips through baseline JPEG with flat quant tables
    within 2 counts per channel (DCT float + YCbCr rounding only)."""
    import numpy as np
    from opensearch_spark.ml.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    ones = np.ones((8, 8), np.int32)
    out = decode_jpeg(encode_jpeg(img, quant_luma=ones, quant_chroma=ones))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_fill_bytes_and_standalone_markers():
    """T.81 B.1.1.2: 0xFF fill padding before a marker, and standalone
    (length-less) TEM markers, must not derail the segment walk."""
    import numpy as np
    from opensearch_spark.ml.jpegcodec import decode_jpeg, encode_jpeg

    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3 + 10)
    data = encode_jpeg(img)
    base = decode_jpeg(data)
    # inject two fill bytes + a TEM marker right after SOI
    padded = data[:2] + b"\xFF" + b"\xFF\x01" + data[2:]
    got = decode_jpeg(padded)
    assert np.array_equal(got, base)
