"""Bucketized range (interval) join.

A naive keyed inequality join (``l.k = r.k AND r.ts BETWEEN l.ts+lo AND
l.ts+hi``) hash-partitions on the key alone and then nested-loops every
key group — quadratic in group size, the classic 100 TB stall. The
bucketized form turns it into an equality join:

1. quantize time into buckets of width ``hi - lo``;
2. the point side lands in exactly one bucket; the interval side is
   duplicated into the (at most two) buckets its window overlaps;
3. equi-join on (key, bucket) — a plain hash shuffle — then refine with
   the exact BETWEEN predicate.

Duplication is bounded at 2× the interval side regardless of data, and
every pair is found because an interval of width w overlaps at most two
w-wide buckets. Beyond-reference operator (the reference has no
theta/range joins, SURVEY.md §2.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    right_cols: Sequence[str],
    right_on: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Pairs (left row, right row) sharing the key with
    ``right_ts`` ∈ [``left_ts`` + lower_s, ``left_ts`` + upper_s]
    (seconds; lower_s may be negative for a look-back window).

    Returns all left columns plus ``{prefix}{col}`` for ``right_cols``.
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    width = upper_s - lower_s
    r_key = right_on or on

    # Full-precision epochs (unix_micros / 1e6), NOT unix_timestamp: that
    # truncates to whole seconds, so the "exact" refine would evaluate on
    # truncated values and pairs within 1s of the window edge could be
    # wrongly included/excluded vs true interval semantics. Bucket
    # assignment only needs consistency, but the refine needs exactness.
    l_epoch = F.unix_micros(F.col(left_ts).cast("timestamp")) / F.lit(1e6)
    r_epoch = F.unix_micros(F.col(right_ts).cast("timestamp")) / F.lit(1e6)

    lo_bucket = F.floor((l_epoch + lower_s) / width)
    hi_bucket = F.floor((l_epoch + upper_s) / width)
    lhs = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
        F.col(on).alias("__k"),
        l_epoch.alias("__lts"),
        F.explode(F.array_distinct(F.array(lo_bucket, hi_bucket))).alias("__b"),
    )
    rhs = right.select(
        F.col(r_key).alias("__k"),
        r_epoch.alias("__rts"),
        F.floor(r_epoch / width).alias("__b"),
        *[F.col(c) for c in right_cols],
    )
    joined = lhs.join(rhs, on=["__k", "__b"]).filter(
        (F.col("__rts") >= F.col("__lts") + lower_s)
        & (F.col("__rts") <= F.col("__lts") + upper_s)
    )
    out = [F.col(f"__row.{c}").alias(c) for c in left.columns]
    out += [F.col(c).alias(f"{prefix}{c}") for c in right_cols]
    return joined.select(*out)
