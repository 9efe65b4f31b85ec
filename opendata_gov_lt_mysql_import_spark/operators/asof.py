"""As-of (temporal) join — latest right row at or before each left row.

Beyond-reference operator (the reference has no temporal joins,
SURVEY.md §2.3): the standard enrichment step for event pipelines —
"attach the most recent dimension state as of this event's timestamp".

Distributed shape: NOT a range join (which explodes to an O(n·m)
inequality join), but the union + running-last trick:

1. union left probe rows and right state rows into one stream, tagging
   each with a marker ordered so state sorts before probes at equal ts;
2. one shuffle: window partitioned by the join key, ordered by
   (ts, marker), computing ``last(payload, ignorenulls=True)`` over the
   unbounded-preceding frame — each probe row sees exactly the latest
   state row at-or-before its timestamp;
3. keep the probe rows, expand the carried payload struct.

Cost is a single hash shuffle + per-partition sort over |L| + |R| rows —
the same plan shape as a groupBy, with no pair blow-up, which is what
survives when both sides are fact-sized. Skewed keys fall under the same
salting/AQE remedies as any keyed shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    right_on: str | None = None,
    how: str = "left",
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for every left row, the right row with the
    greatest ``right_ts`` <= ``left_ts`` sharing the key.

    ``right_cols`` are carried over as ``{prefix}{col}``. Ties at equal
    ``right_ts`` within a key must be pre-deduplicated by the caller
    (deterministic engines disagree on tie winners otherwise).
    ``how='left'`` keeps probe rows with no prior state (null payload);
    ``'inner'`` drops them.
    """
    r_key = right_on or on
    payload = F.struct(*[F.col(c) for c in right_cols])

    probe = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__m"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    state = right.select(
        F.col(r_key).alias("__k"),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__m"),
        payload.alias("__payload"),
        F.lit(None).cast(probe.schema["__row"].dataType).alias("__row"),
    )

    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        probe.unionByName(state)
        .withColumn("__state", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__m") == 1)
    )
    if how == "inner":
        carried = carried.filter(F.col("__state").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")

    out_cols = [F.col(f"__row.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__state.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return carried.select(*out_cols)
