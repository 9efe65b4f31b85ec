"""Count-min sketch — bounded-memory heavy-hitter counting.

Cormode & Muthukrishnan 2005: d hash rows x w buckets of additive
counters; every stream item increments one cell per row; a point
estimate is the MIN over its d cells, always >= the true count
(one-sided error <= 2N/w with probability 1 - (1/2)^d).

Relational form, built for map-side combine: the cell table has a FIXED
d*w key space (1024 cells at the defaults), so the groupBy collapses
almost entirely in the partial-aggregation stage — each task emits at
most d*w rows no matter how many tokens it saw, which is the entire
point of the sketch at 100 TB: a distinct-key-sized shuffle becomes a
constant-sized one. Hashing is md5-based (the repo's engine-portable
idiom), so a SQL oracle can rebuild the sketch bit-identically.

The cell builder accepts an optional pre-aggregated count column:
sketch cells are sums, and sums commute with pre-aggregation, so
building from (token, count) pairs yields the IDENTICAL sketch as
streaming raw occurrences — use whichever side of the tradeoff is
cheaper upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_cells", "cms_estimates", "CMS_WIDTH"]

#: bucket = first two hex digits of md5(token#row) — fixed width 256,
#: chosen so the oracle's nibble arithmetic stays simple and exact
CMS_WIDTH = 256


def _bucket(tok: Column, r: Column) -> Column:
    h = F.md5(F.concat_ws("#", tok, r.cast("string")))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def cms_cells(
    df: DataFrame,
    token_col: str,
    d: int = 4,
    count_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (r, bucket, cn) over the token stream (or over
    pre-aggregated (token, count) rows when ``count_col`` is given)."""
    if d < 1:
        raise ValueError(f"d must be >= 1, got {d}")
    weight = (
        F.col(count_col).cast("long") if count_col else F.lit(1).cast("long")
    )
    reps = df.select(
        F.col(token_col).alias("tok"),
        weight.alias("c"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    )
    return (
        reps.groupBy("r", _bucket(F.col("tok"), F.col("r")).alias("bucket"))
        .agg(F.sum("c").alias("cn"))
    )


def cms_estimates(
    cells: DataFrame, probes: DataFrame, token_col: str, d: int = 4
) -> DataFrame:
    """Point estimates for ``probes[token_col]``: min over the d cells.
    The cell table is d*CMS_WIDTH rows — always broadcastable."""
    ph = probes.select(
        F.col(token_col).alias("tok"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    ).select("tok", "r", _bucket(F.col("tok"), F.col("r")).alias("bucket"))
    joined = ph.join(F.broadcast(cells), ["r", "bucket"])
    return joined.groupBy("tok").agg(F.min("cn").alias("cms_n"))
