"""Stream enrichment against a VERSIONED dimension: each micro-batch
joins the event stream to the snapshot table's then-current version —
the slowly-changing-dimension join done right. A naive static-DataFrame
join pins the dim at stream start (stale forever); reloading a plain
parquet dir mid-write can read a torn state. Re-resolving the snapshot
per batch gives every batch one atomic, consistent dim version."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.sources.snapshots import (
    commit_snapshot,
    merge_snapshot,
    read_snapshot,
)


class TestStreamDimEnrichment:
    # `full` tier (round-16): see pytest.ini — excluded from the default driver-window run
    @pytest.mark.full
    def test_batches_see_dim_versions_atomically(self, spark, tmp_path):
        dim_dir = str(tmp_path / "dim")
        commit_snapshot(
            spark.createDataFrame(
                [(1, "bronze"), (2, "silver")], "user_id long, tier string"
            ),
            dim_dir,
        )

        stage = tmp_path / "stage"
        stage.mkdir()
        for i, rows in enumerate([[(100, 1), (101, 2)], [(102, 1), (103, 3)]]):
            spark.createDataFrame(rows, "event_id long, user_id long").coalesce(
                1
            ).write.mode("append").parquet(str(stage / f"b{i}"))

        seen: list[tuple] = []

        def enrich(batch_df, batch_id):
            # re-resolve the dim EVERY batch: atomic pinned version
            dim = F.broadcast(read_snapshot(batch_df.sparkSession, dim_dir))
            out = batch_df.join(dim, "user_id", "left").select(
                "event_id", "user_id", "tier"
            )
            seen.extend((r["event_id"], r["tier"]) for r in out.collect())
            # dim EVOLVES between batches (SCD upsert lands atomically)
            if batch_id == 0:
                merge_snapshot(
                    batch_df.sparkSession,
                    dim_dir,
                    batch_df.sparkSession.createDataFrame(
                        [(1, "gold"), (3, "bronze")], "user_id long, tier string"
                    ),
                    on=["user_id"],
                )

        q = (
            spark.readStream.schema("event_id long, user_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stage) + "/*")
            .writeStream.foreachBatch(enrich)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = dict(seen)
        # batch 0 saw the v0 dim; batch 1 saw the post-merge dim:
        # user 1 upgraded to gold, user 3 newly known
        assert got[100] == "bronze" and got[101] == "silver"
        assert got[102] == "gold" and got[103] == "bronze"
