"""Time-series regularization: gap-filling an aggregated series onto a
dense calendar grid.

Beyond-reference surface (the reference syncs rows, it never reports), but
the canonical shape for any monitoring/rollup consumer of the events
table: aggregate first, then densify. The order matters at scale —

1. aggregate the raw events to (key, bucket) counts: the only fact-sized
   shuffle, with map-side partial aggregation;
2. derive each key's [min, max] bucket span from the AGGREGATED frame
   (dimension-sized);
3. explode ``sequence(lo, hi, step)`` per key to build the dense grid —
   grid size is |keys| x |buckets|, independent of fact row count;
4. left-join the sparse counts back onto the grid and zero-fill.

Never explode a calendar against the raw facts, and never generate the
grid driver-side: ``sequence``+``explode`` runs JVM-side per key row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket: str = "hour",
    step: str = "interval 1 hour",
    agg: Column | None = None,
    agg_name: str = "n",
) -> DataFrame:
    """Bucket ``ts_col`` per ``key_col``, then fill missing buckets in
    each key's observed span with the aggregate's zero value.

    Returns ``(key_col, bucket_ts timestamp, <agg_name>)`` dense per key.
    ``agg`` defaults to a row count (zero-filled with 0).
    """
    agg_expr = (agg if agg is not None else F.count(F.lit(1))).cast("long")
    sparse = (
        df.groupBy(
            F.col(key_col), F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
        )
        .agg(agg_expr.alias(agg_name))
    )
    span = sparse.groupBy(key_col).agg(
        F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi")
    )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(step))
        ).alias("bucket_ts"),
    )
    return grid.join(sparse, [key_col, "bucket_ts"], "left").select(
        key_col,
        "bucket_ts",
        F.coalesce(F.col(agg_name), F.lit(0)).cast("long").alias(agg_name),
    )


def build_calendar_dim(start: str, end: str, spark=None) -> "DataFrame":
    """Calendar dimension for [start, end] (inclusive, ISO dates):
    one row per day with year/quarter/month/day/day-of-week/ISO-week/
    weekend flag. Generated JVM-side from a single-row ``sequence``
    explode — no driver loop, no data source; |days| rows regardless of
    any fact's size, so it always broadcasts. Join it to a date-keyed
    fact for fiscal rollups the raw date functions can't express
    (trading-day logic slots in here as extra flag columns).

    ``spark`` falls back to the active session, then the default one:
    getActiveSession() is THREAD-LOCAL and returns None on a pool
    worker (found by the parallelized full-registry gate), while
    getOrCreate() returns the existing default session from any
    thread."""
    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.getActiveSession()
            or SparkSession.builder.getOrCreate()
        )
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("date")
    )
    dow = F.dayofweek("date")  # 1=Sunday ... 7=Saturday
    return days.select(
        "date",
        F.year("date").cast("long").alias("year"),
        F.quarter("date").cast("long").alias("quarter"),
        F.month("date").cast("long").alias("month"),
        F.dayofmonth("date").cast("long").alias("day"),
        dow.cast("long").alias("day_of_week"),
        F.weekofyear("date").cast("long").alias("iso_week"),
        dow.isin(1, 7).alias("is_weekend"),
    )


def make_lag_features(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    lags: tuple[int, ...] = (1, 2, 3),
    roll_windows: tuple[int, ...] = (3,),
) -> DataFrame:
    """Supervised-learning feature frame for per-key time series: lag
    columns (``lag_i``) and trailing rolling means (``roll_mean_w``,
    current row inclusive) over one shared window spec — ONE shuffle +
    ONE sort serves every feature column, however many lags are asked
    for (each feature is another expression over the same sorted
    partition stream, not another exchange). The standard forecasting /
    next-event training-set shape; early rows keep NULL lags so the
    consumer decides the warm-up policy instead of silently losing
    rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(order_col)
    out = df
    for i in lags:
        out = out.withColumn(f"lag_{i}", F.lag(value_col, i).over(w))
    for n in roll_windows:
        out = out.withColumn(
            f"roll_mean_{n}",
            F.avg(value_col).over(w.rowsBetween(-(n - 1), 0)),
        )
    return out
