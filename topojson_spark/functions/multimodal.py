"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, batching, partition sizing) is real and tested.
Decoding: binary netpbm (P5/P6) decodes for REAL in pure numpy (header
parse + raster read + integer BT.601 luminance, byte-exact tests); every
other codec is stubbed behind a deterministic fake because no image/audio
library ships in this container — swap the fallback for PIL/ffmpeg in
production; the mapInPandas batch shape stays identical.

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


def _parse_netpbm_header(payload: bytes):
    """Parse a binary netpbm header (P5 grayscale / P6 RGB): magic, then
    whitespace-separated width, height, maxval with '#' comments allowed,
    then ONE whitespace byte before the raster. Returns
    (channels, width, height, maxval, raster_offset)."""
    magic = payload[:2]
    channels = 1 if magic == b"P5" else 3
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = vals
    return channels, w, h, maxval, pos


def encode_ppm(plane: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 luminance plane or (h, w, 3) RGB array as a
    binary netpbm payload (P5/P6) — the inverse of the real decode path,
    used by tests and the synthetic media generator."""
    a = np.asarray(plane, dtype=np.uint8)
    if a.ndim == 2:
        header = b"P5 %d %d 255\n" % (a.shape[1], a.shape[0])
    else:
        header = b"P6 %d %d 255\n" % (a.shape[1], a.shape[0])
    return header + a.tobytes()


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Decode to a (h, w) uint8 luminance plane.

    REAL path: binary netpbm (P5 grayscale, P6 RGB) decodes in pure numpy
    — header parse, frombuffer, and for P6 the integer ITU-R BT.601
    luminance (299 R + 587 G + 114 B) // 1000. Samples with maxval < 255
    are rescaled to the full 8-bit range (round-half-up) before the luma
    step. Header dimensions are the truth; the metadata width/height are
    advisory for real formats.

    STUB path: any other codec (JPEG/PNG/...) falls back to a
    deterministic fake plane derived from the payload sha1 — no imaging
    library ships in this container; swap for PIL/cv2 in production (the
    mapInPandas batch shape stays identical either way).
    """
    if payload[:2] in (b"P5", b"P6"):
        ch, w, h, maxval, off = _parse_netpbm_header(payload)
        if maxval > 255:
            raise NotImplementedError("16-bit netpbm rasters not supported")
        if maxval < 1:
            raise ValueError(f"invalid netpbm maxval {maxval}")
        raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch,
                               offset=off)
        if maxval != 255:
            # netpbm samples are fractions of maxval; rescale to the 8-bit
            # luminance range (round-half-up integer math) so downstream
            # /255 normalization is correct for e.g. maxval-15 payloads
            raster = (
                (raster.astype(np.uint32) * 255 + maxval // 2) // maxval
            ).clip(0, 255).astype(np.uint8)
        if ch == 1:
            return raster.reshape(h, w).copy()
        rgb = raster.reshape(h, w, 3).astype(np.uint32)
        lum = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1]
               + 114 * rgb[:, :, 2]) // 1000
        return lum.astype(np.uint8)
    if width <= 0 or height <= 0:
        raise NotImplementedError(
            "real decode of non-netpbm codecs requires an imaging library "
            "(PIL/cv2); metadata must carry width/height for the "
            "deterministic stub"
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
