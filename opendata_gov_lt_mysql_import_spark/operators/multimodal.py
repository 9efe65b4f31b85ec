"""Multimodal column plumbing (beyond-reference surface).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages. The decode step itself is
STUBBED in this environment (no image/audio libraries in the container)
behind ``NotImplementedError`` with a deterministic fake used by tests —
the Spark-side contract (schema, partitioning, UDF signature, batch
shape) is real and tested.

Scale notes: binary payloads ride in the same parquet row groups as their
metadata; ``spark.sql.files.maxPartitionBytes`` governs scan parallelism.
Feature extraction is a narrow mapInPandas (no shuffle); downstream joins
should carry only the extracted features, never the raw bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("fingerprint", StringType()),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real image decode — requires an imaging library not present in
    this container. The plumbing around it (schema, batching) is live;
    swap this implementation when Pillow/ffmpeg are available."""
    raise NotImplementedError(
        "image decode requires an imaging library; use fake_decode_features "
        "for deterministic pipeline testing"
    )


def fake_decode_features(payload: bytes) -> tuple[int, float, str]:
    """Deterministic stand-in for decode+feature-extract: byte length,
    byte mean, md5 fingerprint."""
    import hashlib

    n = len(payload)
    mean = (sum(payload) / n) if n else 0.0
    return n, mean, hashlib.md5(payload).hexdigest()


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic binary payload column from a text column —
    the test-fixture generator for the multimodal path."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage plumbing: Arrow-batched mapInPandas with a fixed
    output geometry. The pixel transform is stubbed (no imaging library in
    this container): the fake 'resized' payload is a deterministic
    truncation/padding of the source bytes to width*height, which keeps
    batch shapes, schema, and downstream contracts real."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for batch in batches:
            out = []
            for p in batch["payload"]:
                b = bytes(p) if p is not None else b""
                out.append(b[:target].ljust(target, b"\0"))
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "mime": batch["mime"],
                    "payload": out,
                    "width": [width] * len(batch),
                    "height": [height] * len(batch),
                }
            )

    return media.mapInPandas(resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: one input row fans out to ≤ max_frames
    rows (1:N mapInPandas — the video-keyframe shape). The frame extractor
    is a deterministic byte-slicer standing in for a real codec."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, nos, payloads = [], [], []
            for mid, p in zip(batch["media_id"], batch["payload"]):
                b = bytes(p) if p is not None else b""
                for i in range(min(max_frames, max(len(b) // every_n_bytes, 1))):
                    ids.append(mid)
                    nos.append(i)
                    payloads.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": payloads})

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)


def extract_media_features(media: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` receives an iterator of pandas batches — constant
    memory per task regardless of partition size; the output schema is
    fixed (FEATURE_SCHEMA) so downstream plans are fully typed."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = decode_image if use_real_decode else None
        for batch in batches:
            feats = [
                fake_decode_features(p if p is not None else b"")
                if decode is None
                else decode(p)
                for p in batch["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "mime": batch["mime"],
                    "n_bytes": [f[0] for f in feats],
                    "byte_mean": [f[1] for f in feats],
                    "fingerprint": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)
