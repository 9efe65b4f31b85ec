"""Incrementally-maintained materialized aggregates (plans/matview.py):
the invariant is refresh-after-appends == full recompute, plus
idempotent no-op refreshes and the compaction fallback."""

import pytest
from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.plans.matview import (
    AggSpec,
    IncrementalAggregate,
)
from opendata_gov_lt_mysql_import_spark.sources.snapshots import (
    commit_snapshot,
    compact_snapshot,
    current_version,
    snapshot_history,
)


def _orders(spark, rows):
    return spark.createDataFrame(rows, "k string, amount double")


def _view(tmp_path):
    return IncrementalAggregate(
        source_dir=str(tmp_path / "src"),
        view_dir=str(tmp_path / "view"),
        group_cols=["k"],
        aggs=[
            AggSpec("n", "count"),
            AggSpec("total", "sum", "amount"),
            AggSpec("lo", "min", "amount"),
            AggSpec("hi", "max", "amount"),
        ],
    )


def _expected(spark, src_dir):
    from opendata_gov_lt_mysql_import_spark.sources.snapshots import read_snapshot

    full = (
        read_snapshot(spark, src_dir)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("amount").alias("total"),
            F.min("amount").alias("lo"),
            F.max("amount").alias("hi"),
        )
    )
    return {tuple(r) for r in full.collect()}


class TestIncrementalAggregate:
    def test_refresh_tracks_appends(self, spark, tmp_path):
        mv = _view(tmp_path)
        assert mv.refresh(spark) is None  # source doesn't exist yet

        commit_snapshot(
            _orders(spark, [("a", 1.0), ("a", 3.0), ("b", 10.0)]),
            mv.source_dir,
        )
        mv.refresh(spark)
        assert {tuple(r) for r in mv.read(spark).collect()} == _expected(
            spark, mv.source_dir
        )

        # two more appends, refresh after each — incremental path
        commit_snapshot(_orders(spark, [("a", -2.0), ("c", 7.0)]), mv.source_dir)
        mv.refresh(spark)
        assert {tuple(r) for r in mv.read(spark).collect()} == _expected(
            spark, mv.source_dir
        )

        commit_snapshot(_orders(spark, [("b", 0.5), ("b", 100.0)]), mv.source_dir)
        mv.refresh(spark)
        got = {tuple(r) for r in mv.read(spark).collect()}
        assert got == _expected(spark, mv.source_dir)
        # spot-check the merged min/max/count survived three folds
        by_k = {r["k"]: r for r in mv.read(spark).collect()}
        assert by_k["a"]["n"] == 3 and by_k["a"]["lo"] == -2.0
        assert by_k["b"]["hi"] == 100.0 and by_k["b"]["n"] == 3

    def test_refresh_is_idempotent_per_source_version(self, spark, tmp_path):
        mv = _view(tmp_path)
        commit_snapshot(_orders(spark, [("a", 1.0)]), mv.source_dir)
        v1 = mv.refresh(spark)
        assert mv.is_fresh()
        assert mv.refresh(spark) == v1  # no new view version
        assert current_version(mv.view_dir) == v1
        assert len(snapshot_history(mv.view_dir)) == 1

    def test_compaction_falls_back_to_full_recompute(self, spark, tmp_path):
        mv = _view(tmp_path)
        commit_snapshot(_orders(spark, [("a", 1.0), ("b", 2.0)]), mv.source_dir)
        mv.refresh(spark)
        commit_snapshot(_orders(spark, [("a", 5.0)]), mv.source_dir)
        # compaction rewrites the file set: CDC lineage broken
        compact_snapshot(spark, mv.source_dir, target_files=1)
        commit_snapshot(_orders(spark, [("c", 9.0)]), mv.source_dir)
        mv.refresh(spark)
        assert {tuple(r) for r in mv.read(spark).collect()} == _expected(
            spark, mv.source_dir
        )
        assert mv.is_fresh()

    def test_materialized_through_marker(self, spark, tmp_path):
        mv = _view(tmp_path)
        assert mv.materialized_through() is None
        commit_snapshot(_orders(spark, [("a", 1.0)]), mv.source_dir)
        mv.refresh(spark)
        assert mv.materialized_through() == current_version(mv.source_dir)
        assert not IncrementalAggregate(
            mv.source_dir, mv.view_dir, ["k"], [AggSpec("n", "count")]
        ).is_fresh() or mv.is_fresh()

    def test_bad_agg_kind_rejected(self):
        with pytest.raises(ValueError, match="self-mergeable"):
            AggSpec("bad", "avg", "amount")
