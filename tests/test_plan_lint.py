"""The plan linter's detectors must themselves be trustworthy: a lint
that never fires is indistinguishable from a clean registry."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tools.plan_lint import lint_plan


def _plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_detects_true_global_window(spark):
    df = spark.range(1000).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert "global_window" in lint_plan("x", _plan(df))


def test_ignores_partitioned_window(spark):
    df = (
        spark.range(1000)
        .withColumn("p", F.col("id") % 10)
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("p").orderBy("id"))
        )
    )
    assert lint_plan("x", _plan(df)) == []


def test_detects_unconditioned_join(spark):
    # a small crossJoin plans as BroadcastNestedLoopJoin; either smell
    # marks the quadratic shape (CartesianProduct appears when neither
    # side is broadcastable)
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "j")
    smells = lint_plan("x", _plan(a.crossJoin(b)))
    assert "bnl_join" in smells or "cartesian" in smells
