"""Real media codecs with zero external dependencies.

The container has no PIL/cv2/librosa, but PNG is zlib-deflated filtered
scanlines and WAV is a RIFF header over PCM — both fully decodable with
the Python stdlib (`zlib`, `struct`). These are complete, spec-correct
implementations for the subset they claim (PNG: 8-bit non-interlaced
RGB/RGBA/greyscale, all five filter types; WAV: PCM16 mono/stereo), so
the multimodal feature-extraction path runs a REAL decode — bit-exact
round-trip property-tested — rather than the former stub. Baseline
JPEG is implemented in ml/jpegcodec.py (numpy DCT + pure-Python
canonical Huffman), and video is covered by the AVI/MJPG container
codec below (RIFF walk + per-frame JPEG) — no stubs remain in the
image/audio/video decode path.

Used by ml/multimodal.py's `real_decode` and the `mm_png_features` /
`mm_wav_features` gates, whose DuckDB oracles recompute the expected
features CLOSED-FORM from the generative pixel/sample formulas — any
decoder defect breaks the hash match.

PNG spec: RFC 2083 (signature, IHDR/IDAT/IEND chunks, filter types
0-4 incl. Paeth). WAV: RIFF/WAVE fmt+data chunks, PCM LE.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(img: np.ndarray, filter_type: int | None = None) -> bytes:
    """8-bit PNG encoder. ``img``: (H, W) greyscale, (H, W, 3) RGB or
    (H, W, 4) RGBA uint8. ``filter_type``: fixed 0-4 per row, or None →
    row i uses filter i % 5 (exercises every decoder unfilter path)."""
    if img.dtype != np.uint8:
        raise ValueError("8-bit images only")
    if img.ndim == 2:
        color_type, ch = 0, 1
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, ch = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type, ch = 6, 4
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    h, w = img.shape[:2]
    raw = img.reshape(h, w * ch).astype(np.int16)
    prev = np.zeros(w * ch, dtype=np.int16)
    out = bytearray()
    for y in range(h):
        ft = (y % 5) if filter_type is None else filter_type
        row = raw[y]
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
            filt = row - left
        elif ft == 2:  # Up
            filt = row - prev
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
            filt = row - (left + prev) // 2
        elif ft == 4:  # Paeth
            left = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
            filt = row.copy()
            for x in range(w * ch):
                filt[x] = row[x] - _paeth(int(left[x]), int(prev[x]),
                                          int(upleft[x]))
        else:
            raise ValueError(f"bad filter {ft}")
        out.append(ft)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out)))
            + _chunk(b"IEND", b""))


def _guard_struct(fn):
    """Truncated/garbage containers surface as the documented ValueError
    family, not struct.error — callers skipping corrupt media with
    `except (ValueError, NotImplementedError)` must not crash the task
    (round-4 review)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        try:
            return fn(*a, **kw)
        except struct.error as e:
            raise ValueError(f"{fn.__name__}: truncated container ({e})")
    return wrapped


@_guard_struct
def decode_png(data: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG decoder (greyscale/RGB/RGBA): chunk walk,
    zlib inflate, per-row unfilter incl. Paeth. Returns uint8 (H, W[, C])."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r}")
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or color_type not in _CHANNELS:
                raise NotImplementedError(
                    f"depth {depth} / color type {color_type}")
            if interlace:
                raise NotImplementedError("interlaced PNG")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size mismatch")
    img = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int32)
        if ft == 0:
            row = line
        elif ft == 2:  # Up
            row = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth carry a left dependency
            row = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = row[x - ch] if x >= ch else 0
                up = prev[x]
                upleft = prev[x - ch] if x >= ch else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                elif ft == 4:
                    pred = _paeth(int(left), int(up), int(upleft))
                else:
                    raise ValueError(f"bad filter {ft}")
                row[x] = (line[x] + pred) & 0xFF
        img[y] = row.astype(np.uint8)
        prev = row
    img = img.reshape(height, width, ch)
    return img[:, :, 0] if ch == 1 else img


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """PCM16 WAV encoder. ``samples``: int16 (N,) mono or (N, 2) stereo."""
    if samples.dtype != np.int16:
        raise ValueError("int16 samples only")
    n_ch = 1 if samples.ndim == 1 else samples.shape[1]
    pcm = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate,
                      sample_rate * n_ch * 2, n_ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_guard_struct
def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """PCM16 WAV decoder: RIFF chunk walk. Returns (sample_rate,
    int16 array — (N,) mono or (N, n_ch))."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, n_ch, bits, pcm = 12, None, None, None, None
    while pos + 8 <= len(data):
        ctype = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        if ctype == b"fmt ":
            audio_fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH",
                                                              body[:16])
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("PCM16 only")
        elif ctype == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(pcm, dtype="<i2")
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch)
    return rate, samples


# ---------------------------------------------------------------------------
# AVI / MJPG (RIFF container over per-frame baseline JPEG)
# ---------------------------------------------------------------------------

def encode_avi_mjpg(frames: list[np.ndarray], fps: int = 10,
                    quant_luma: np.ndarray | None = None,
                    quant_chroma: np.ndarray | None = None) -> bytes:
    """Minimal AVI container with MJPG-compressed frames: RIFF('AVI ')
    with hdrl (avih + one 'vids'/'MJPG' stream) and a movi LIST of
    '00dc' chunks, each a baseline JPEG from ml/jpegcodec.py. Every
    frame must share one (H, W[, 3]) uint8 shape."""
    from opensearch_spark.ml.jpegcodec import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("all frames must share one shape")
    payloads = [encode_jpeg(f, quant_luma=quant_luma,
                            quant_chroma=quant_chroma) for f in frames]

    def chunk(cc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cc + struct.pack("<I", len(body)) + body + pad

    def lst(cc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", cc + body)

    avih = struct.pack("<14I", 1_000_000 // fps, 0, 0, 0, len(frames),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0, 1, fps, 0,
                          len(frames), 0, 0, -1, 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


@_guard_struct
def decode_avi_mjpg(data: bytes) -> tuple[int, list[np.ndarray]]:
    """Decode a minimal AVI/MJPG file: RIFF walk to the movi LIST,
    decode every '00dc'/'00db' chunk as baseline JPEG. Returns
    (fps, frames). Non-MJPG streams raise NotImplementedError."""
    from opensearch_spark.ml.jpegcodec import decode_jpeg

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    fps, frames = 0, []

    def walk(buf: bytes) -> None:
        nonlocal fps
        pos = 0
        while pos + 8 <= len(buf):
            cc = buf[pos:pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            body = buf[pos + 8:pos + 8 + ln]
            if cc == b"LIST":
                walk(body[4:])
            elif cc == b"avih":
                usec = struct.unpack("<I", body[:4])[0]
                fps = round(1_000_000 / usec) if usec else 0
            elif cc == b"strh":
                if body[:4] == b"vids" and body[4:8] not in (b"MJPG",
                                                             b"mjpg"):
                    raise NotImplementedError(
                        f"video codec {body[4:8]!r} (MJPG only)")
            elif cc in (b"00dc", b"00db"):
                frames.append(decode_jpeg(body))
            pos += 8 + ln + (ln & 1)

    walk(data[12:])
    if not frames:
        raise ValueError("no video frames found")
    return fps, frames
