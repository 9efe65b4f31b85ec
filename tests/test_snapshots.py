"""Snapshot table format: atomic manifest commits, time travel,
append/overwrite semantics (sources/snapshots.py)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.sources.snapshots import (
    commit_snapshot,
    current_version,
    read_snapshot,
    snapshot_history,
)


class TestSnapshots:
    def test_commit_read_time_travel(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        v0 = commit_snapshot(
            spark.range(0, 100).withColumn("v", F.lit("a")), t
        )
        v1 = commit_snapshot(
            spark.range(100, 150).withColumn("v", F.lit("b")), t
        )
        assert (v0, v1) == (0, 1)
        assert current_version(t) == 1
        # latest sees both commits (append default)
        assert read_snapshot(spark, t).count() == 150
        # time travel to v0
        old = read_snapshot(spark, t, version=0)
        assert old.count() == 100
        assert old.agg(F.max("id")).collect()[0][0] == 99

    def test_overwrite_resets_file_list(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        commit_snapshot(spark.range(0, 100), t)
        commit_snapshot(spark.range(0, 7), t, mode="overwrite")
        assert read_snapshot(spark, t).count() == 7
        # parent version still fully readable (copy-on-write)
        assert read_snapshot(spark, t, version=0).count() == 100
        hist = snapshot_history(t)
        assert [h["mode"] for h in hist] == ["append", "overwrite"]

    def test_reader_ignores_uncommitted_files(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        commit_snapshot(spark.range(0, 10), t)
        # a torn/in-flight writer drops files outside any manifest
        stray = os.path.join(t, "data", "inflight")
        spark.range(0, 999).write.parquet(stray)
        assert read_snapshot(spark, t).count() == 10

    def test_schema_is_pinned_per_version(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        commit_snapshot(spark.range(0, 5).withColumn("q", F.lit(1.5)), t)
        df = read_snapshot(spark, t)
        assert [f.name for f in df.schema.fields] == ["id", "q"]

    def test_missing_version_raises(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        with pytest.raises(FileNotFoundError):
            read_snapshot(spark, t)
        commit_snapshot(spark.range(0, 1), t)
        with pytest.raises(FileNotFoundError):
            read_snapshot(spark, t, version=5)

    def test_vacuum_frees_only_unreferenced_files(self, spark, tmp_path):
        from opendata_gov_lt_mysql_import_spark.sources.snapshots import vacuum

        t = str(tmp_path / "tbl")
        commit_snapshot(spark.range(0, 50), t)                      # v0
        commit_snapshot(spark.range(50, 60), t)                     # v1 (refs v0 files)
        commit_snapshot(spark.range(0, 5), t, mode="overwrite")     # v2
        commit_snapshot(spark.range(5, 9), t)                       # v3
        deleted = vacuum(t, keep_last=2)  # keep v2, v3
        # v0/v1 data (not referenced by v2/v3) is gone; v2/v3 intact
        assert deleted
        assert read_snapshot(spark, t).count() == 9
        assert read_snapshot(spark, t, version=2).count() == 5
        with pytest.raises(FileNotFoundError):
            read_snapshot(spark, t, version=0)
        assert [h["version"] for h in snapshot_history(t)] == [2, 3]

    def test_streaming_foreach_batch_commits(self, spark, sf_dir, tmp_path):
        """The production export path: a stream lands in the snapshot
        table one atomic commit per micro-batch."""
        from opendata_gov_lt_mysql_import_spark.streaming.events import (
            foreach_batch_upsert,
            read_event_stream,
            stage_events,
        )
        from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table

        ev = load_table(spark, sf_dir, "events")
        src = str(tmp_path / "src")
        stage_events(ev, src)
        t = str(tmp_path / "tbl")

        def commit_batch(df, batch_id):
            commit_snapshot(df, t)

        q = foreach_batch_upsert(
            read_event_stream(spark, src), commit_batch, str(tmp_path / "ckpt")
        )
        q.awaitTermination()
        assert read_snapshot(spark, t).count() == ev.count()
        assert current_version(t) >= 0

    def test_vacuum_twice_and_after_new_commits(self, spark, tmp_path):
        """Periodic maintenance: vacuum must be re-runnable after earlier
        vacuums removed old manifests (regression: second vacuum crashed
        loading already-deleted manifests)."""
        from opendata_gov_lt_mysql_import_spark.sources.snapshots import vacuum

        t = str(tmp_path / "tbl")
        for i in range(3):
            commit_snapshot(spark.range(i * 10, (i + 1) * 10), t, mode="overwrite")
        vacuum(t, keep_last=2)       # removes v0
        commit_snapshot(spark.range(99, 101), t, mode="overwrite")  # v3
        deleted = vacuum(t, keep_last=2)  # must not crash on missing v0
        assert deleted  # v1's files are now unreferenced
        assert read_snapshot(spark, t).count() == 2
        assert vacuum(t, keep_last=2) == []  # idempotent when clean


class TestSnapshotDataSource:
    """format('snapshot') — the Spark 4 Python DataSource tier over the
    same manifests (sources/snapshot_datasource.py)."""

    @pytest.fixture()
    def table(self, spark, tmp_path):
        from opendata_gov_lt_mysql_import_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        spark.dataSource.register(SnapshotDataSource)
        t = str(tmp_path / "tbl")
        commit_snapshot(
            spark.range(0, 200).withColumn("grp", F.col("id") % 4), t
        )
        commit_snapshot(
            spark.range(200, 260).withColumn("grp", F.col("id") % 4), t
        )
        return t

    def test_reads_latest_and_pinned_versions(self, spark, table):
        latest = spark.read.format("snapshot").option("path", table).load()
        assert latest.count() == 260
        v0 = (
            spark.read.format("snapshot")
            .option("path", table)
            .option("version", 0)
            .load()
        )
        assert v0.count() == 200
        native = read_snapshot(spark, table, version=0)
        assert v0.exceptAll(native).count() == 0
        assert native.exceptAll(v0).count() == 0

    def test_filters_and_projection_still_correct(self, spark, table):
        df = (
            spark.read.format("snapshot")
            .option("path", table)
            .load()
            .filter((F.col("id") >= 100) & (F.col("id") < 150))
            .select("id")
        )
        got = sorted(r["id"] for r in df.collect())
        assert got == list(range(100, 150))

    def test_drifted_files_nullfill_under_declared_schema(self, spark, tmp_path):
        """A later commit adds a column: reading the append version must
        null-fill the older files (regression: projecting the manifest
        schema against the old file's own schema raised ArrowInvalid)."""
        from opendata_gov_lt_mysql_import_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        spark.dataSource.register(SnapshotDataSource)
        t = str(tmp_path / "tbl")
        commit_snapshot(spark.range(0, 20), t)
        commit_snapshot(
            spark.range(20, 30).withColumn("grp", F.lit(3)), t
        )
        df = spark.read.format("snapshot").option("path", t).load()
        assert df.count() == 30
        assert df.filter(F.col("grp").isNull()).count() == 20
        assert df.filter(F.col("grp") == 3).count() == 10

    def test_float_filters_keep_spark_nan_semantics(self, spark, tmp_path):
        """Spark orders NaN above everything; arrow comparisons drop it.
        Filters on float columns must NOT be pushed down (regression:
        an accepted filter is removed from Spark's own evaluation, so
        the arrow semantics silently won)."""
        import math

        from opendata_gov_lt_mysql_import_spark.sources.snapshot_datasource import (
            SnapshotDataSource,
        )

        spark.dataSource.register(SnapshotDataSource)
        t = str(tmp_path / "tbl")
        commit_snapshot(
            spark.createDataFrame(
                [(1, 1.0), (2, float("nan")), (3, 200.0)], "id long, x double"
            ),
            t,
        )
        got = (
            spark.read.format("snapshot")
            .option("path", t)
            .load()
            .filter(F.col("x") > 100.0)
            .collect()
        )
        ids = sorted(r["id"] for r in got)
        assert ids == [2, 3]  # NaN > 100.0 is TRUE in Spark semantics
        # non-float pushdown still prunes correctly
        got2 = (
            spark.read.format("snapshot")
            .option("path", t)
            .load()
            .filter(F.col("id") >= 3)
            .collect()
        )
        assert [r["id"] for r in got2] == [3]
