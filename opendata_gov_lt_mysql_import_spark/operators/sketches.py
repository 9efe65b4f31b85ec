"""Bounded-memory sketches: count-min (heavy hitters) and KMV (distinct
cardinality). Both hash with md5 so a SQL oracle rebuilds them exactly.

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

__all__ = [
    "cms_cells",
    "cms_estimates",
    "CMS_WIDTH",
    "kmv_hash",
    "kmv_distinct",
    "KMV_K",
    "KMV_SCALE",
]

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
    The cell table is d*CMS_WIDTH rows — always broadcastable.

    A probe hashing into a cell the stream never touched has a true
    CMS count of 0 for that cell, so the join is LEFT with missing
    cells coalesced to 0 before the min: probes absent from the stream
    estimate cms_n=0 instead of vanishing from the output (or being
    over-estimated from only their non-empty cells), keeping the
    one-sided CMS bound (estimate >= truth) for ALL probes."""
    ph = probes.select(
        F.col(token_col).alias("tok"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    ).select("tok", "r", _bucket(F.col("tok"), F.col("r")).alias("bucket"))
    joined = ph.join(F.broadcast(cells), ["r", "bucket"], "left")
    return joined.groupBy("tok").agg(
        F.min(F.coalesce(F.col("cn"), F.lit(0).cast("long"))).alias("cms_n")
    )


#: KMV sketch size: relative std error ~ 1/sqrt(k-2) ~ 6.3% at 256
KMV_K = 256
#: hash domain = 13 md5 hex digits = 52 bits. Chosen so the unbiased
#: estimator's numerator (k-1)*SCALE = 255 * 2^52 ~ 1.15e18 stays inside
#: BIGINT in BOTH engines (Spark wraps silently outside ANSI mode,
#: DuckDB errors) — the same overflow-headroom discipline as the
#: fixed-point pagerank. Collisions at 2^52 are ~D^2/2^53 (1e-4 at a
#: million distincts) and ENGINE-IDENTICAL (same md5 both sides), so
#: they can nudge accuracy but never parity.
KMV_SCALE = 1 << 52


def kmv_hash(val: Column) -> Column:
    """Engine-portable 52-bit uniform draw for a value string:
    first 13 hex digits of md5(val || '#kmv') as BIGINT. The DuckDB
    twin is ``CAST('0x' || substr(md5(v || '#kmv'), 1, 13) AS BIGINT)``
    (the kfold_assign idiom)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("#", val, F.lit("kmv"))), 1, 13),
        16,
        10,
    ).cast("long")


def kmv_distinct(
    tagged: DataFrame,
    tag_col: str = "col_name",
    val_col: str = "val",
    k: int = KMV_K,
    n_salts: int = 64,
) -> DataFrame:
    """KMV / bottom-k distinct-cardinality sketch (Bar-Yossef et al.
    RANDOM 2002; unbiased estimator (k-1)/h_(k) per Beyer et al. SIGMOD
    2007): hash every value uniformly, keep the k SMALLEST distinct
    hashes per tag, and estimate |distinct| from how densely the bottom
    of the hash space is populated. Returns one row per tag:
    (tag_col, n_sketch, kth_hash, kmv_estimate), all BIGINT.

    Unlike the engine-specific HLL++/DataSketches estimators (which the
    registry carries as rows-only entries), the KMV draw is md5 — so a
    SQL oracle rebuilds the IDENTICAL sketch and the estimate is
    hash-exact across engines. When a tag has fewer than k distinct
    hashes the sketch IS the exact count (n_sketch), the standard KMV
    small-cardinality branch; otherwise the estimate is the all-integer
    floor((k-1)*SCALE / kth_hash) — no float in either engine.

    Scale shape (three bounded exchanges): (1) the (tag, hash) dedup —
    partial aggregation collapses repeats map-side, so the shuffle is
    distinct-key-bounded, the unavoidable cost of set semantics; (2) a
    row_number window over (tag, salt = h mod n_salts) keeping the
    per-salt bottom-k — every post-dedup hash crosses once, and the
    global bottom-k is a subset of the union of per-salt bottom-k's, so
    nothing is lost while no single task ever sorts a whole tag (the
    skew guard: a window over bare tag would concentrate each tag's
    full distinct set on one task); (3) a final window over tag on the
    <= tags * n_salts * k survivors — constant-sized by construction.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql.window import Window

    hashes = tagged.select(
        F.col(tag_col).alias("tag"), kmv_hash(F.col(val_col)).alias("h")
    ).distinct()
    w1 = Window.partitionBy("tag", "salt").orderBy("h")
    stage1 = (
        hashes.withColumn("salt", F.pmod(F.col("h"), F.lit(n_salts)))
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= k)
        .select("tag", "h")
    )
    w2 = Window.partitionBy("tag").orderBy("h")
    sketch = (
        stage1.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .groupBy("tag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            F.max("h").alias("kth_hash"),
        )
    )
    est = F.when(F.col("n_sketch") < k, F.col("n_sketch")).otherwise(
        F.expr(f"{(k - 1) * KMV_SCALE}L div kth_hash")
    )
    return sketch.select(
        F.col("tag").alias(tag_col),
        "n_sketch",
        "kth_hash",
        est.cast("long").alias("kmv_estimate"),
    )
