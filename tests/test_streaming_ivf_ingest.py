"""Streaming twin of the warm-index IVFADC ingest: embedding crawl
slices arrive as a file stream, each micro-batch is assigned to the
FROZEN coarse cells, residual-encoded against the FROZEN codebook, and
appended to the codes snapshot EXACTLY-ONCE (txn = batch id — the
foreachBatch sink contract commit_snapshot_idempotent was built for).
The final index must equal the one-shot encode of the full batch union
code-for-code — the streaming path IS the batch path (the reconcile
discipline of test_streaming_recipe, applied to index maintenance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.queries_ml import (
    _ivfadc_batch_codes,
    _ivfadc_jittered_batch,
    _rescl_corpus,
    _rescl_frames,
)
from opendata_gov_lt_mysql_import_spark.sources.snapshots import (
    commit_snapshot,
    commit_snapshot_idempotent,
    current_version,
    read_snapshot,
)

SF = "/root/testdata/sf0.001"
CODE_COLS = ["vec_id", "pid", "m", "cid"]
BATCH_SCHEMA = "vec_id long, e array<double>"


class TestStreamingIvfIngest:
    def test_streamed_slices_reconcile_with_oneshot(self, spark, tmp_path):
        # --- one-time offline build: base codes + frozen parameters
        cl, piv0, asgc, rcb, rasg, _ccb, _casg = _rescl_frames(spark, SF)
        codes_dir = str(tmp_path / "codes")
        commit_snapshot(
            rasg, codes_dir, cluster_by=["pid"], target_files=16
        )
        piv0 = piv0.localCheckpoint(eager=True)
        rcb = rcb.localCheckpoint(eager=True)
        base_count = read_snapshot(spark, codes_dir).count()

        # --- two crawl slices of the jittered ingest staged as files
        bcl = _ivfadc_jittered_batch(cl)
        stage = tmp_path / "stage"
        stage.mkdir()
        bcl.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(
            str(stage / "b1")
        )
        bcl.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(
            str(stage / "b2")
        )

        stream = (
            spark.readStream.schema(BATCH_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stage) + "/*")
        )

        seen = []

        def sink(batch_df, batch_id):
            batch_df = batch_df.localCheckpoint(eager=True)
            if batch_df.isEmpty():
                return
            seen.append(batch_id)
            commit_snapshot_idempotent(
                _ivfadc_batch_codes(batch_df, piv0, rcb),
                codes_dir,
                txn_id=f"ivf-stream-{batch_id}",
                mode="append",
                cluster_by=["pid"],
                target_files=4,
            )

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert len(seen) == 2  # one commit per slice

        # --- exactly-once: replaying the LAST micro-batch (the crash
        # recovery case the txn id exists for) must be a no-op
        v = current_version(codes_dir)
        last = spark.read.parquet(str(stage / "b2"))
        commit_snapshot_idempotent(
            _ivfadc_batch_codes(last, piv0, rcb),
            codes_dir,
            txn_id=f"ivf-stream-{seen[-1]}",
            mode="append",
            cluster_by=["pid"],
            target_files=4,
        )
        assert current_version(codes_dir) == v

        # --- the streaming path IS the batch path: final index equals
        # base codes + one-shot encode of the full jittered batch
        got = read_snapshot(spark, codes_dir)
        assert got.count() == got.select(CODE_COLS).distinct().count()
        expected = rasg.select(CODE_COLS).unionByName(
            _ivfadc_batch_codes(bcl, piv0, rcb).select(CODE_COLS)
        )
        assert got.count() == base_count + expected.count() - rasg.count()
        diff = got.select(CODE_COLS).exceptAll(expected).unionAll(
            expected.exceptAll(got.select(CODE_COLS))
        )
        assert not diff.limit(5).collect()
