"""Stream-stream joins with event-time bounds.

Beyond-reference streaming surface (the reference harvest loop is
batch-only, odgovlt.py:355-407): pairing two live event streams — e.g.
each view with the clicks that follow it within a horizon — is the
streaming form of the funnel/attribution joins the batch side already
ships (operators/range_join.py, queries funnel_view_click_purchase).

Structured Streaming requirements baked in here:
- BOTH sides carry a watermark, and the join condition includes an
  event-time RANGE constraint; together they let Spark compute how long
  a buffered row can still match and evict join state — without them a
  stream-stream join's state grows forever.
- State size is therefore O(input-rate x (watermark + horizon)) per
  side, independent of stream lifetime — the property that keeps the
  query running at 100 TB/day ingest.

The construction is batch/stream agnostic: on batch frames the same
expression is a plain interval join, which is how the parity tests pin
streaming output against the batch twin on identical data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` to rows of ``left`` with the same ``key``
    where ``right_ts`` falls in ``[left_ts, left_ts + within]``.

    Columns must already be disambiguated (distinct names on the two
    sides apart from ``key``); the result carries left columns + right
    columns. Watermarks are applied only to streaming inputs, so the
    same call works as a batch interval join.
    """
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"interval {within}"))
    )
    return l.join(r, cond, how).drop(r[key])


def paired_view_clicks(
    events_views: DataFrame,
    events_clicks: DataFrame,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Attribution pairing over the events shape: every (view, click)
    pair for the same user where the click lands within ``within`` after
    the view. Output: user_id, view_id, click_id, view_ts, click_ts,
    lag_sec."""
    v = events_views.select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = events_clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = stream_interval_join(
        v, c, key="user_id", left_ts="view_ts", right_ts="click_ts",
        within=within, watermark=watermark,
    )
    return joined.select(
        "user_id",
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
        (F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts"))
        .cast("long")
        .alias("lag_sec"),
    )
