"""Event-stream operators over the ``events`` table shape
(event_id, ts, user_id, event_type, value, props).

The reference has no streaming surface — its harvest queue processes
staged JSON objects independently (odgovlt.py:355-407); the closest
Spark analog is a file-source stream over the staging directory with
``foreachBatch`` upsert. These operators are the beyond-reference
extension: event-time windowed aggregation with watermarked late-data
handling, plus the streaming form of the staging-upsert pipeline.

Every transformation here works identically on a batch DataFrame and a
streaming DataFrame — tests validate streaming output against the batch
result of the same expression (availableNow trigger → memory sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


# JSON's default timestamp format truncates to milliseconds; fixture
# events carry microseconds. Kept for the JSON read path, but note the
# current Spark JSON *writer* ignores timestampFormat entirely (emits
# millis, no zone) — a JSON round-trip can never preserve microsecond
# event times, which is why staging uses parquet.
JSON_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream over an events directory (the streaming analog
    of the staging source S11).

    Default format is parquet — matching the S10/S11 staging contract —
    because it round-trips TimestampType at full microsecond fidelity.
    JSON staging is supported for interop but loses sub-millisecond
    precision on write (the writer ignores ``timestampFormat``)."""
    reader = spark.readStream.format(fmt).schema(EVENT_SCHEMA)
    if fmt == "json":
        reader = reader.option("timestampFormat", JSON_TS_FORMAT)
    return reader.load(path)


def stage_events(events: DataFrame, path: str, n_files: int = 4) -> None:
    """Stage a batch of events for streaming consumption (parquet,
    microsecond-exact — the writer half of :func:`read_event_stream`)."""
    events.coalesce(n_files).write.mode("append").parquet(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling/sliding window aggregation with late-data
    watermark. Works on batch and stream alike; on a stream the watermark
    bounds state so the query runs indefinitely."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        src.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    expect_input: bool = True,
) -> None:
    """Drain a stream into an in-memory table with the availableNow
    trigger (test/debug harness).

    ``expect_input`` is a format-regression canary: a source whose rows
    all fail to parse (e.g. a timestamp-format mismatch) yields an empty
    aggregate that downstream comparisons report confusingly; asserting
    the source actually delivered rows surfaces the real cause."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if expect_input:
        n_in = sum(p["numInputRows"] for p in (q.recentProgress or []))
        if n_in <= 0:
            # RuntimeError, not assert: the canary must survive python -O
            raise RuntimeError(
                f"stream '{query_name}' consumed 0 input rows — source "
                "path empty or schema/format mismatch dropped every row"
            )


def foreach_batch_upsert(
    stream_df: DataFrame,
    apply_fn,
    checkpoint_dir: str,
):
    """Streaming upsert sink: each micro-batch is handed to ``apply_fn(df,
    batch_id)`` — the streaming form of the diff-sync pipeline (pair with
    ``plans.sync.plan_sync`` inside the callback for MERGE semantics)."""
    return (
        stream_df.writeStream.foreachBatch(apply_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
