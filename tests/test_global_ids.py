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
