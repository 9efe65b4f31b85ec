"""Contiguous global-id assignment tests (operators/global_ids.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.operators.global_ids import (
    assign_contiguous_ids,
)


class TestAssignContiguousIds:
    def test_matches_global_window(self, spark):
        # shuffled input, 40k rows across many partitions
        df = (
            spark.range(0, 40000, 1, 16)
            .withColumn("key", F.xxhash64("id"))
            .withColumnRenamed("id", "orig")
        )
        got = assign_contiguous_ids(df, ["key"], num_partitions=8)
        w = Window.orderBy("key")
        want = df.withColumn("row_id", F.row_number().over(w) - 1)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_dense_and_start_offset(self, spark):
        df = spark.range(0, 1000).withColumnRenamed("id", "k")
        out = assign_contiguous_ids(df, ["k"], start=100, num_partitions=4)
        rows = sorted((r.k, r.row_id) for r in out.collect())
        assert rows == [(i, 100 + i) for i in range(1000)]

    def test_uses_many_partitions(self, spark):
        # the point of the operator: the id pass must not collapse to one task
        df = spark.range(0, 10000).withColumnRenamed("id", "k")
        out = assign_contiguous_ids(df, ["k"], num_partitions=8)
        assert out.rdd.getNumPartitions() == 8

    def test_empty_frame(self, spark):
        df = spark.range(0, 0).withColumnRenamed("id", "k")
        assert assign_contiguous_ids(df, ["k"], num_partitions=4).count() == 0


class TestPrefixSum:
    def test_matches_global_window(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.global_ids import (
            prefix_sum,
        )

        df = (
            spark.range(0, 20000, 1, 16)
            .withColumn("key", F.xxhash64("id"))
            .withColumn("v", (F.col("id") % 97).cast("long"))
            .drop("id")
        )
        got = prefix_sum(df, "v", ["key"], out_col="rt", num_partitions=8)
        w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, 0)
        want = df.withColumn("rt", F.sum("v").over(w))
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_exclusive_starts_at_zero(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.global_ids import (
            prefix_sum,
        )

        df = spark.range(0, 100).withColumn("v", F.lit(5).cast("long"))
        out = prefix_sum(df, "v", ["id"], out_col="rt", exclusive=True,
                         num_partitions=4)
        rows = sorted((r.id, r.rt) for r in out.collect())
        assert rows == [(i, 5 * i) for i in range(100)]

    def test_no_single_partition_exchange(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.global_ids import (
            prefix_sum,
        )

        df = spark.range(0, 5000, 1, 8).withColumn("v", F.lit(1).cast("long"))
        out = prefix_sum(df, "v", ["id"], num_partitions=8)
        out.collect()
        # the cumsum pass rides the checkpointed range layout: no global
        # single-partition funnel anywhere, parallelism preserved
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan
        assert out.rdd.getNumPartitions() == 8


class TestShardByBudget:
    def test_shards_respect_budget_start(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.global_ids import (
            shard_by_budget,
        )

        df = spark.range(0, 1000).withColumn(
            "tok", (F.col("id") % 50 + 1).cast("long")
        )
        out = shard_by_budget(df, "tok", ["id"], budget=500, num_partitions=4)
        rows = out.collect()
        # every row starts in the shard its exclusive running total maps to
        agg = (
            out.groupBy("shard_id")
            .agg(F.sum("tok").alias("s"), F.max("tok").alias("m"))
            .collect()
        )
        # a shard never exceeds budget by more than one row's payload
        for r in agg:
            assert r["s"] <= 500 + r["m"]
        # shards are contiguous 0..K
        ids = sorted(r["shard_id"] for r in agg)
        assert ids == list(range(len(ids)))


class TestReservedColumns:
    def test_internal_names_are_rejected_not_overwritten(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.global_ids import (
            assign_contiguous_ids,
            prefix_sum,
            shard_by_budget,
        )
        import pytest

        df = spark.range(0, 10).withColumn("_pid", F.lit(7))
        with pytest.raises(ValueError, match="_pid"):
            assign_contiguous_ids(df, ["id"])
        with pytest.raises(ValueError, match="_pid"):
            prefix_sum(df.withColumn("v", F.lit(1)), "v", ["id"])
        df2 = spark.range(0, 10).withColumn("v", F.lit(1)).withColumn(
            "_cum_excl", F.lit(0)
        )
        with pytest.raises(ValueError, match="_cum_excl"):
            shard_by_budget(df2, "v", ["id"], budget=10)
