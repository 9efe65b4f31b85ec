"""Scale-technique joins: skew salting and bucketed co-location.

These verify the two join strategies that matter once neither side
broadcasts: result equivalence for the salted join, and the executed
plan's exchange elision for bucketed tables (the whole point of paying
the shuffle at write time).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.operators.joins import salted_join
from opendata_gov_lt_mysql_import_spark.sources.bucketed import (
    colocated_join,
    write_bucketed,
)


def _skewed_fact(spark, n_rows=10_000, hot_share=0.9):
    """90% of rows carry key 1 (the stalling-partition scenario)."""
    return spark.range(n_rows).select(
        F.when(F.col("id") < int(n_rows * hot_share), F.lit(1))
        .otherwise((F.col("id") % 50) + 1)
        .alias("k"),
        (F.col("id") * 2).alias("payload"),
    )


def _dim(spark, n_keys=50):
    return spark.range(1, n_keys + 1).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )


def test_salted_join_matches_plain_join(spark):
    fact = _skewed_fact(spark)
    dim = _dim(spark)
    plain = fact.join(dim, on="k").select("k", "payload", "name")
    salted = salted_join(fact, dim, on="k", n_salts=8).select("k", "payload", "name")
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_left_join_keeps_unmatched_rows(spark):
    fact = _skewed_fact(spark).withColumn(
        "k", F.when(F.col("payload") % 100 == 0, F.lit(9999)).otherwise(F.col("k"))
    )
    dim = _dim(spark)
    plain = fact.join(dim, on="k", how="left").select("k", "payload", "name")
    salted = salted_join(fact, dim, on="k", n_salts=8, how="left").select(
        "k", "payload", "name"
    )
    assert sorted(plain.collect(), key=str) == sorted(salted.collect(), key=str)


def test_salted_join_spreads_hot_key(spark):
    fact = _skewed_fact(spark)
    dim = _dim(spark)
    salted = salted_join(fact, dim, on="k", n_salts=8)
    # the hot key's rows must actually land in >1 salt bucket pre-drop
    salts = (
        fact.withColumn("__salt", (F.rand(42) * 8).cast("int"))
        .filter(F.col("k") == 1)
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts > 1
    assert salted.count() == fact.join(dim, on="k").count()


@pytest.fixture()
def bucketed_pair(spark):
    left = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("b")
    )
    write_bucketed(left, "t_bucket_left", "k", 8, sort_cols="k")
    write_bucketed(right, "t_bucket_right", "k", 8, sort_cols="k")
    yield "t_bucket_left", "t_bucket_right"
    for t in ("t_bucket_left", "t_bucket_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _final_plan(df) -> str:
    df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    lt, rt = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, lt, rt, on="k")
        assert joined.count() == 5_000
        plan = _final_plan(colocated_join(spark, lt, rt, on="k"))
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # contrast: the same join over non-bucketed data must shuffle
        plain = (
            spark.range(5_000).select(F.col("id").alias("k"))
            .join(spark.range(5_000).select(F.col("id").alias("k")), on="k")
        )
        assert "Exchange" in _final_plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    lt, _ = bucketed_pair
    agg = spark.table(lt).groupBy("k").agg(F.sum("a").alias("s"))
    plan = _final_plan(agg)
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pre-filter
# ---------------------------------------------------------------------------

def test_bloom_probe_never_drops_true_matches(spark):
    from opendata_gov_lt_mysql_import_spark.operators.bloom import (
        bloom_probe,
        build_bloom,
    )

    dim = spark.range(0, 1000, 7).select(F.col("id").alias("k"))
    fact = spark.range(5000).select(F.col("id").alias("k"))
    bloom = build_bloom(dim, "k")
    kept = {r["k"] for r in bloom_probe(fact, bloom, "k").collect()}
    true_keys = {r["k"] for r in dim.collect()}
    assert true_keys <= kept  # zero false negatives, ever


def test_bloom_probe_prunes_most_non_matches(spark):
    from opendata_gov_lt_mysql_import_spark.operators.bloom import (
        bloom_probe,
        build_bloom,
    )

    dim = spark.range(100).select(F.col("id").alias("k"))
    fact = spark.range(100_000).select(F.col("id").alias("k"))
    bloom = build_bloom(dim, "k")
    kept = bloom_probe(fact, bloom, "k").count()
    # 100 true + ~1% fp of 99_900; generous bound still proves pruning
    assert kept < 3000


def test_bloom_semi_join_equals_plain_semi(spark):
    from opendata_gov_lt_mysql_import_spark.operators.bloom import (
        bloom_semi_join,
    )

    dim = spark.range(0, 2000, 13).select((F.col("id") + 5).alias("dk"))
    fact = spark.range(10_000).select(
        F.col("id").alias("fk"), (F.col("id") % 97).alias("payload")
    )
    got = bloom_semi_join(fact, dim, "fk", "dk")
    want = fact.join(
        dim.select(F.col("dk").alias("fk")).distinct(), "fk", "left_semi"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
