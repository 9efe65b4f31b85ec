"""Sessionization — gap-based event sessions, batch and streaming.

Two implementations, by design:

- ``sessionize``: the built-in ``session_window`` (Spark ≥3.2) — merges
  events closer than the gap into one window per user. Works identically
  on batch and watermarked streams; this is the declarative path and the
  one the DuckDB oracle checks (gaps-and-islands SQL).
- ``running_user_totals``: a custom stateful operator via
  ``applyInPandasWithState`` — the escape hatch for stateful semantics the
  built-ins can't express (reference has none; this is the
  beyond-reference demonstration of the pattern). State = per-user
  (count, total) carried across micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def sessionize(
    events: DataFrame, gap: str = "4 hours", watermark: str = "1 day"
) -> DataFrame:
    """Per-user gap-based sessions: (user_id, session_start, session_end,
    n_events, total_value). ``session_end`` = last event + gap (the
    built-in session_window contract)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


RUNNING_TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

RUNNING_TOTALS_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user running event count and
    value total, emitted every micro-batch the user appears in. State is a
    2-field tuple per user, updated incrementally — constant memory per
    key, no re-aggregation of history."""

    def update(key, pdf_iter, state):
        user_id = key[0]
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
