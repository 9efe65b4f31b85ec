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
