"""End-to-end incremental ingestion with near-dup gating: stream ->
probe the persisted LSH index -> append only novel docs to the corpus
snapshot AND extend the index with exactly those docs.

This composes the daily-increment pieces into the realistic 100 TB
shape: the historical corpus text is NEVER re-read (only its banded
signature index is probed, batch side broadcast), each admitted batch
lands as one atomic snapshot version, and the index append makes batch
N+1 dedup against batch N's admissions — cross-batch, not just
batch-vs-initial-history."""

from __future__ import annotations

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.operators.dedup import (
    incremental_minhash_neardup,
    minhash_history_index,
)
from opendata_gov_lt_mysql_import_spark.sources.snapshots import (
    commit_snapshot,
    read_snapshot,
    snapshot_history,
)

DOC_SCHEMA = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


class TestStreamingNearDupIngest:
    def test_stream_gated_ingest(self, spark, tmp_path):
        corpus_dir = str(tmp_path / "corpus")
        index_dir = str(tmp_path / "lsh_index")
        stage = tmp_path / "stage"
        stage.mkdir()

        base = [
            (1, "the quick brown fox jumps over the lazy dog near the river"),
            (2, "spark plans shuffle data across executors with hash joins"),
            (3, "training corpora need careful dedup before tokenization"),
        ]
        commit_snapshot(_docs(spark, base), corpus_dir)
        commit_snapshot(
            minhash_history_index(_docs(spark, base), "text", "doc_id"),
            index_dir,
        )

        # batch 0: one exact clone of history (reject) + one novel doc
        # batch 1: one clone OF BATCH 0's admitted doc (reject — proves
        #          the index append works) + one novel doc
        novel0 = "completely fresh content about morton curves and file stats"
        novel1 = "yet another unrelated document mentioning tokenizers only"
        batches = [
            [(101, base[0][1]), (102, novel0)],
            [(201, novel0), (202, novel1)],
        ]
        for i, rows in enumerate(batches):
            _docs(spark, rows).coalesce(1).write.mode("append").parquet(
                str(stage / f"b{i}")
            )

        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stage) + "/*")
        )

        def sink(batch_df, batch_id):
            batch_df = batch_df.localCheckpoint(eager=True)
            idx = read_snapshot(spark, index_dir)
            hits = incremental_minhash_neardup(
                batch_df, idx, "text", "doc_id"
            ).filter(F.col("n_match") >= 12)
            clean = batch_df.join(
                hits.select(F.col("new_id").alias("doc_id")).distinct(),
                "doc_id",
                "left_anti",
            ).localCheckpoint(eager=True)
            if clean.isEmpty():
                return
            commit_snapshot(clean, corpus_dir)
            commit_snapshot(
                minhash_history_index(clean, "text", "doc_id"), index_dir
            )

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        corpus = read_snapshot(spark, corpus_dir)
        ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
        # clones 101 (of history) and 201 (of batch-0 admission 102)
        # rejected; novel docs admitted exactly once
        assert ids == {1, 2, 3, 102, 202}
        # each admitted batch is one atomic append version
        assert [h["mode"] for h in snapshot_history(corpus_dir)] == [
            "append",
            "append",
            "append",
        ]
        # the index covers exactly the corpus (8 band rows per doc)
        idx = read_snapshot(spark, index_dir)
        assert idx.count() == 8 * len(ids)
        assert {
            r["doc_id"] for r in idx.select("doc_id").distinct().collect()
        } == ids
