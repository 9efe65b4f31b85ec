"""Streaming deduplication — bounded-state exactly-once filtering.

The batch dedup operators (operators/dedup.py) assume the full corpus is
visible; a stream cannot hold every fingerprint ever seen. Structured
Streaming bounds the dedup state with an event-time watermark: a
fingerprint is remembered only until the watermark passes it, so state
size is O(arrival rate × watermark horizon) regardless of stream age —
the property that keeps a 100 TB/day ingest from accumulating unbounded
state. Late rows beyond the horizon are treated as new (at-least-once
outside the horizon, exactly-once inside it).

Beyond-reference surface: the reference's incremental behavior is batch
re-sync + diff (SURVEY.md §2.8); this is the streaming analog of its
"skip rows already imported" guarantee.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate rows by ``key_cols`` with state expired past the
    watermark horizon (``dropDuplicatesWithinWatermark``: duplicates are
    suppressed whenever they arrive within the watermark delay of the
    first-seen row, and the key's state is dropped afterwards)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def streaming_content_dedup(
    stream: DataFrame,
    content_col: str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact-content streaming dedup: fingerprint the payload (md5, as in
    the batch exact_dedup) and keep the first arrival per fingerprint
    within the watermark horizon. The fingerprint column is retained so a
    downstream batch pass can reconcile across horizons."""
    fp = stream.withColumn("fp", F.md5(F.col(content_col)))
    return streaming_dedup(fp, ["fp"], ts_col=ts_col, watermark=watermark)
