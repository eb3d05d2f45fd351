"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed in Arrow-batched ``mapInPandas``.

The Spark-side machinery (schema, partitioning, UDF signature, batch shape)
is real and tested; the actual media decode is STUBBED behind
``decoder=`` hooks because the image/audio libraries are not in this
container — a deterministic fake decoder ships for tests, and passing a real
one (PIL/librosa/etc.) is a one-liner swap.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = "doc_id long, media_type string, payload binary, width int, height int"
FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes int, feat array<float>"


def fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for image decode: md5-seeded pixel block of the
    declared shape. Replace with a real decoder outside this sandbox."""
    seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def real_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    raise NotImplementedError(
        "media decoding libraries (PIL/av/librosa) are not available in this "
        "environment; pass decoder=fake_decode or your own callable"
    )


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes, int, int], np.ndarray] = fake_decode,
    grid: int = 2,
) -> DataFrame:
    """binary media column → fixed-size feature vector (mean RGB per grid
    cell), Arrow-batched. This is the real 100 TB pattern: mapInPandas keeps
    one decoded image at a time per batch row, partition-parallel, no
    driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = decoder(bytes(payload), int(w), int(h))
                gh, gw = max(1, img.shape[0] // grid), max(1, img.shape[1] // grid)
                cells = []
                for gy in range(grid):
                    for gx in range(grid):
                        cell = img[gy * gh:(gy + 1) * gh, gx * gw:(gx + 1) * gw]
                        cells.extend(cell.reshape(-1, 3).mean(axis=0).tolist())
                feats.append([float(x) for x in cells])
                nbytes.append(len(payload))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": nbytes,
                "feat": feats,
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_signatures(df: DataFrame, frame_bytes: int = 64,
                     every_n: int = 2) -> DataFrame:
    """Video-style frame sampling + per-frame fingerprint, Arrow-batched:
    treat the payload as fixed-size frames, sample every ``every_n``-th,
    md5 each frame's byte range. The decode step is byte-slicing (honest
    stub — a real decoder swaps in per ``extract_features``); the Spark
    plumbing (mapInPandas, per-row frame explode, deterministic sigs) is
    the real 100 TB shape and is oracle-checkable since md5-over-slice is
    reproducible in SQL."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max(1, len(raw) // frame_bytes)
                for i in range(0, n_frames, every_n):
                    ids.append(int(did))
                    idxs.append(i)
                    sigs.append(hashlib.md5(
                        raw[i * frame_bytes:(i + 1) * frame_bytes]).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame_sig": sigs})

    return df.mapInPandas(run, "doc_id long, frame_idx int, frame_sig string")


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling stub: keeps the plumbing (explode of
    sampled offsets) real; byte-range decode is the stubbed part."""
    from pyspark.sql import functions as F

    n_frames = (F.length("payload") / 1024).cast("int")  # fake: 1 KiB ≈ 1 frame
    return df.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)))
        .alias("frame_idx"),
    )
