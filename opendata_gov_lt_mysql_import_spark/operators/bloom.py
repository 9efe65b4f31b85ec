"""Distributed bloom-filter semi-join pre-filter.

The join-strategy tier between broadcast and shuffle: when the build
side's key set is too large to broadcast as rows but compresses into a
few-MB bit set, ship the bit set instead and drop non-matching probe
rows BEFORE the shuffle. Spark's own runtime row-level filtering does
this automatically for some plans (`spark.sql.optimizer.runtime.
bloomFilter.enabled`); this operator is the explicit, composable form
(`bloom_filter_agg` is not SQL-registered in PySpark 4.1).

Everything is JVM column arithmetic: k = 3 xxhash64 positions per key,
bitmap words built by `bit_or` partial aggregation (cells, not rows,
cross the wire), probe via `element_at` on a broadcast map literal.
The bloom pass is a PRE-filter with false positives; callers follow
with the exact semi-join (`bloom_semi_join`), so results are identical
to a plain LEFT SEMI — the bloom only shrinks what reaches its shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_N_BITS = 1 << 20  # 128 KiB of bitmap — ~1% fp at ~150k keys, k=3
DEFAULT_K = 3


def _positions(key: Column, n_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)) for i in range(k)
    ]


def build_bloom(
    keys: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Aggregate a key column into a one-row bloom bitmap
    (``bloom`` map<long, long>: word index → 64-bit word). Shuffle
    volume is the number of DISTINCT touched words (≤ n_bits/64),
    independent of key count — partial `bit_or` combines map-side."""
    pos = F.explode(F.array(*_positions(F.col(key_col), n_bits, k))).alias(
        "pos"
    )
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            # F.shiftleft needs a literal int shift; the per-row shift
            # distance forces the SQL form
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "bits"))
        ).alias("bloom")
    )


def bloom_probe(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Keep fact rows whose key tests positive in the bloom (may keep
    false positives, never drops a true match). Map-side only: the
    bitmap broadcasts, no shuffle is added to the fact."""
    probed = fact.crossJoin(F.broadcast(bloom))
    tests = [
        f"(coalesce(element_at(bloom, cast(pmod(xxhash64(`{key_col}`, {i}),"
        f" {n_bits}) / 64 as long)), 0L)"
        f" & shiftleft(1L, cast(pmod(pmod(xxhash64(`{key_col}`, {i}),"
        f" {n_bits}), 64) as int))) != 0"
        for i in range(k)
    ]
    return probed.filter(F.expr(" AND ".join(tests))).drop("bloom")


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = DEFAULT_N_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exact LEFT SEMI join with a bloom pre-filter: bloom pass drops
    the bulk of non-matching fact rows before the shuffle, the semi
    join removes the false positives. Result ≡ plain LEFT SEMI."""
    bloom = build_bloom(dim_keys, dim_key, n_bits, k)
    pre = bloom_probe(fact, bloom, fact_key, n_bits, k)
    return pre.join(
        dim_keys.select(F.col(dim_key).alias(fact_key)).distinct(),
        on=fact_key,
        how="left_semi",
    )
