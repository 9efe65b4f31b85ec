"""Entity resolution (record linkage): blocked candidate generation →
pairwise similarity scoring → transitive clustering → canonical ids.

The reference's sync pipeline assumes exact-key identity (MySQL ids map
1:1 to CKAN objects, odgovlt.py:355-367); real reference data has the
OTHER problem too — the same organization/user arriving twice with
drifted spellings. This module is the standard three-stage linkage
pipeline, built from the same scale primitives as the dedup family:

1. **Blocking** bounds the candidate space: pairs are generated only
   within a blocking key (here a dimension column; at 100 TB a cheap
   phonetic/LSH key). Never all-pairs — cost is Σ block², controlled by
   the block key's granularity, and hot blocks get the same occupancy
   capping as LSH buckets (operators/dedup.lsh_drop_hot_buckets).
2. **Scoring** is pure JVM column algebra: character-trigram Jaccard on
   the name plus a numeric-proximity gate — no Python, stays in
   whole-stage codegen.
3. **Clustering**: similarity links are transitive in intent (A~B~C is
   one entity), so matched pairs feed the shared
   ``connected_components`` min-label propagation and every member maps
   to the component's canonical (minimum) id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components


def char_ngrams_expr(colname: str, n: int = 3) -> Column:
    """Distinct character n-grams via SQL transform over offsets."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({colname}) - {n - 1}, 1)),"
        f" i -> substring({colname}, i, {n})))"
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
    numeric_col: str | None = None,
    min_name_sim: float = 0.7,
    max_numeric_delta: float | None = 1.0,
) -> DataFrame:
    """Map every record to its canonical entity id.

    Returns ``(entity_id, canonical_id, is_duplicate)`` — one row per
    input record; singletons are their own canonical. A pair links when
    trigram-Jaccard(name) >= ``min_name_sim`` AND (when given)
    |numeric_a - numeric_b| <= ``max_numeric_delta`` — the numeric gate
    kills the false positives serial-number-style names create (two ids
    differing in one digit share most trigrams).
    """
    prepped = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        char_ngrams_expr(name_col).alias("grams"),
        *(
            [F.col(numeric_col).cast("double").alias("num")]
            if numeric_col
            else []
        ),
    )
    a, b = prepped.alias("a"), prepped.alias("b")
    cond = (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id"))
    pairs = a.join(b, cond).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        (
            F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
            / F.size(F.array_union(F.col("a.grams"), F.col("b.grams"))).cast("double")
        ).alias("name_sim"),
        *(
            [(F.abs(F.col("a.num") - F.col("b.num"))).alias("num_delta")]
            if numeric_col
            else []
        ),
    )
    matched = pairs.filter(F.col("name_sim") >= min_name_sim)
    if numeric_col and max_numeric_delta is not None:
        matched = matched.filter(F.col("num_delta") <= max_numeric_delta)
    comp = connected_components(matched.select("id_a", "id_b"))
    ids = df.select(F.col(id_col).alias("entity_id"))
    return ids.join(
        comp.select(F.col("id").alias("entity_id"), F.col("cluster")),
        "entity_id",
        "left",
    ).select(
        "entity_id",
        F.coalesce(F.col("cluster"), F.col("entity_id"))
        .cast("long")
        .alias("canonical_id"),
        F.col("cluster").isNotNull().alias("is_duplicate"),
    )
