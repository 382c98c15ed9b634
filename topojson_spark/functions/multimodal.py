"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, batching, partition sizing) is real and tested.
The actual codec work is stubbed behind ``_decode_image`` because no
image/audio library ships in this container — swap the stub for PIL/ffmpeg
in production; the mapInPandas batch shape stays identical.

Design notes for 100 TB: payloads are *not* shuffled — every op below is a
narrow mapInPandas; ``spark.sql.files.maxPartitionBytes`` bounds the bytes
per task; metadata-only transforms project the binary column away first
(column pruning keeps the scan light).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
        T.StructField("payload_sha1", T.StringType()),
    ]
)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: deterministic fake decode (no image libs in this container).

    Production: replace with PIL.Image.open(io.BytesIO(payload)). The fake
    derives a (h, w) luminance plane from the payload bytes so the
    downstream plumbing (resize, feature extraction, batching) is fully
    exercised and reproducible.
    """
    if width <= 0 or height <= 0:
        raise NotImplementedError(
            "real image decode requires an imaging library (PIL/cv2); "
            "metadata must carry width/height for the deterministic stub"
        )
    seed = int.from_bytes(hashlib.sha1(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def _resize_plane(plane: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize in pure numpy (vectorized)."""
    h, w = plane.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return plane[np.ix_(ys, xs)]


def extract_features(
    media: DataFrame, out_size: int = 8
) -> DataFrame:
    """Decode -> resize -> flatten to a small float feature vector.
    Narrow mapInPandas; payload never shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = r.meta
                plane = _decode_image(
                    bytes(r.payload), int(meta["width"]), int(meta["height"])
                )
                small = _resize_plane(plane, out_size, out_size)
                feat = (small.astype(np.float32) / 255.0).ravel().tolist()
                rows.append(
                    (
                        r.media_id,
                        feat,
                        hashlib.sha1(bytes(r.payload)).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "feat", "payload_sha1"]
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands metadata to frame indices without
    touching payloads (codegen-only). The decode of selected frames is the
    stubbed step."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_ix"),
    )


def synth_media(spark, n: int, kind: str = "image", seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests/benchmarks."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{kind}:{i}".encode()).digest() * 4
        rows.append(
            (
                f"{kind}_{i:06d}",
                kind,
                bytearray(payload),
                (16, 12, 30 if kind == "video" else None,
                 16000 if kind == "audio" else None),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
