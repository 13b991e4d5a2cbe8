"""Multimodal columns: opaque binary media + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; per-item work runs in Arrow-batched
``mapInPandas`` kernels sized by bytes (media batches must be bounded
by payload size, not row count — set
``spark.sql.execution.arrow.maxRecordsPerBatch`` low for wide media).

The actual codec work (JPEG decode, resampling, frame extraction) needs
libraries not present in this container, so the decode step is STUBBED:
``decode_media`` raises ``NotImplementedError`` unless
``fake=True``, which produces a deterministic fake decode (seeded by
content hash) with the real schema/batching/partitioning — everything
Spark-side is real and tested; only the pixel math is fake.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("meta", StructType(
            [
                StructField("width", IntegerType()),
                StructField("height", IntegerType()),
                StructField("duration_ms", IntegerType()),
                StructField("sample_rate", IntegerType()),
            ]
        )),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("byte_entropy", DoubleType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def byte_features(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """REAL (non-stub) content features computable without codecs:
    size, sha256, byte-histogram entropy, 16-bin byte histogram as a
    crude feature vector. One narrow Arrow pass."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in FEATURES_SCHEMA.fields}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                hist = np.bincount(b, minlength=256).astype(np.float64)
                p = hist / max(b.size, 1)
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum()) if nz.size else 0.0
                feat = hist.reshape(16, 16).sum(axis=1)
                feat = (feat / max(b.size, 1)).tolist()
                rows["media_id"].append(int(mid))
                rows["n_bytes"].append(int(b.size))
                rows["sha256"].append(hashlib.sha256(bytes(payload or b"")).hexdigest())
                rows["byte_entropy"].append(entropy)
                rows["feature"].append(feat)
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_feat, FEATURES_SCHEMA)


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", BinaryType()),  # row-major uint8 HxWxC
    ]
)


def decode_media(
    df: DataFrame,
    *,
    target_size: tuple[int, int] = (32, 32),
    fake: bool = False,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode+resize kernel (image bytes -> fixed-size RGB buffers).

    The real path uses Pillow WHEN IMPORTABLE on the executors (an
    optional dependency — not baked into this container); without it,
    the call degrades to NotImplementedError rather than a wrong
    answer. ``fake=True`` emits a deterministic content-hash-seeded
    pixel buffer with the IDENTICAL output schema and batch shape
    (contract-tested), so downstream plumbing (featurizers, ANN over
    image embeddings) is fully exercisable codec-free."""
    w, h = target_size

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            try:
                import io

                from PIL import Image
            except ImportError as e:  # optional dep absent in sandbox
                raise NotImplementedError(
                    "media codecs unavailable (pip install Pillow on the "
                    "executors); run with fake=True for the deterministic "
                    "schema-identical stub"
                ) from e
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "channels": [], "pixels": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if fake:
                    digest = hashlib.sha256(bytes(payload or b"")).digest()
                    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
                    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                else:
                    img = Image.open(io.BytesIO(bytes(payload)))
                    img = img.convert("RGB").resize((w, h))
                    px = np.asarray(img, dtype=np.uint8)
                rows["media_id"].append(int(mid))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(3)
                rows["pixels"].append(px.tobytes())
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_decode, DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", BinaryType()),  # row-major uint8 HxWxC rgb24
    ]
)

_FAKE_FRAME_W, _FAKE_FRAME_H = 16, 12


def frame_sample(
    df: DataFrame, every_ms: int = 1000, *, fake: bool = False,
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (media_id, frame_idx, ts_ms, width, height, channels, pixels).

    The real path uses PyAV WHEN IMPORTABLE on the executors (optional
    dependency, same contract as decode_media's Pillow path): a single
    sequential decode walk per video, emitting the first frame at or
    after each ``every_ms`` tick as an rgb24 buffer — deterministic,
    no codec-dependent seeking. Without PyAV the call degrades to
    NotImplementedError rather than a wrong answer. ``fake=True`` emits
    content-hash-seeded rgb24 buffers with the IDENTICAL schema and
    pixel-buffer shape (w*h*3 uint8), one frame per tick of
    ``meta.duration_ms`` — contract-tested so downstream featurizers
    run codec-free."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            try:
                import io

                import av
            except ImportError as e:  # optional dep absent in sandbox
                raise NotImplementedError(
                    "video codecs unavailable (pip install av on the "
                    "executors); run with fake=True for the deterministic "
                    "schema-identical stub"
                ) from e
        for pdf in batches:
            rows = {f.name: [] for f in FRAME_SCHEMA.fields}

            def emit(mid, k, ts, w, h, px_bytes):
                rows["media_id"].append(int(mid))
                rows["frame_idx"].append(k)
                rows["ts_ms"].append(int(ts))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(3)
                rows["pixels"].append(px_bytes)

            for mid, payload, meta in zip(
                pdf[id_col], pdf["payload"], pdf["meta"]
            ):
                if fake:
                    dur = int((meta or {}).get("duration_ms") or 0)
                    digest = hashlib.sha256(bytes(payload or b"")).digest()
                    w, h = _FAKE_FRAME_W, _FAKE_FRAME_H
                    for k, ts in enumerate(range(0, max(dur, 1), every_ms)):
                        rng = np.random.default_rng(
                            int.from_bytes(digest[:8], "big") + ts
                        )
                        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                        emit(mid, k, ts, w, h, px.tobytes())
                    continue
                with av.open(io.BytesIO(bytes(payload))) as container:
                    stream = container.streams.video[0]
                    next_tick, k = 0, 0
                    for frame in container.decode(stream):
                        t_ms = int((frame.time or 0.0) * 1000)
                        if t_ms < next_tick:
                            continue
                        arr = frame.to_ndarray(format="rgb24")
                        emit(mid, k, t_ms, arr.shape[1], arr.shape[0],
                             arr.tobytes())
                        k += 1
                        next_tick += every_ms
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload", "meta").mapInPandas(_sample, FRAME_SCHEMA)
