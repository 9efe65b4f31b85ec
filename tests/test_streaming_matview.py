"""End-to-end incremental pipeline: stream -> snapshot table (exactly-once
micro-batch appends) -> CDC-refreshed materialized aggregate.

This is the composed 100 TB ingestion shape: each micro-batch lands as
one atomic snapshot version via the idempotent txn commit, and the
downstream rollup refreshes from the CDC delta of exactly that version —
no rescan of history at any step. The invariant is the same as
test_matview.py's but driven through Structured Streaming's foreachBatch
with simulated replays."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.plans.matview import (
    AggSpec,
    IncrementalAggregate,
)
from opendata_gov_lt_mysql_import_spark.sources.snapshots import (
    commit_snapshot_idempotent,
    current_version,
    read_snapshot,
    snapshot_history,
)


class TestStreamingMatviewPipeline:
    # `full` tier (round-16): see pytest.ini — excluded from the default driver-window run
    @pytest.mark.full
    def test_stream_to_snapshot_to_view(self, spark, tmp_path):
        src_stage = tmp_path / "stage"
        src_stage.mkdir()
        table_dir = str(tmp_path / "events_table")
        mv = IncrementalAggregate(
            source_dir=table_dir,
            view_dir=str(tmp_path / "rollup"),
            group_cols=["k"],
            aggs=[
                AggSpec("n", "count"),
                AggSpec("total_cents", "sum", "cents"),
            ],
        )

        # three staged files = three file-source micro-batches
        batches = [
            [("a", 100), ("b", 250)],
            [("a", 50)],
            [("c", 999), ("b", 1)],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, "k string, cents long").coalesce(
                1
            ).write.mode("append").parquet(str(src_stage / f"b{i}"))

        stream = (
            spark.readStream.schema("k string, cents long")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src_stage) + "/*")
        )

        def sink(batch_df, batch_id):
            # exactly-once append + immediate CDC refresh of the rollup
            commit_snapshot_idempotent(batch_df, table_dir, f"q-{batch_id}")
            # replayed batch (sink crash simulation): must be a no-op
            commit_snapshot_idempotent(batch_df, table_dir, f"q-{batch_id}")
            mv.refresh(batch_df.sparkSession)

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        # one snapshot version per micro-batch despite the double commit
        assert len(snapshot_history(table_dir)) == current_version(table_dir) + 1
        # the rollup equals a one-shot aggregate over the whole table
        want = {
            tuple(r)
            for r in read_snapshot(spark, table_dir)
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("cents").alias("total_cents"),
            )
            .collect()
        }
        got = {tuple(r) for r in mv.read(spark).collect()}
        assert got == want
        assert {r[0] for r in want} == {"a", "b", "c"}
        assert mv.is_fresh()
