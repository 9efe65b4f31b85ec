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
