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

import pytest

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
    # `full` tier (round-16): see pytest.ini — excluded from the default driver-window run
    @pytest.mark.full
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


class TestStreamingSubstringGate:
    # `full` tier (round-16): see pytest.ini — excluded from the default driver-window run
    @pytest.mark.full
    def test_stream_gated_on_verbatim_overlap(self, spark, tmp_path):
        """The exact-substring twin of the LSH gate: each micro-batch's
        window fingerprints LEFT-SEMI probe the persisted span index;
        a doc whose history-covered token share exceeds 50% is
        rejected, admitted docs extend BOTH the corpus and the index
        (so batch N+1 screens against batch N's admissions). Same
        100 TB shape: history text never re-read, index probe is the
        only cross-state touch, one atomic snapshot append per batch."""
        from opendata_gov_lt_mysql_import_spark.operators.substring import (
            incremental_span_dedup,
            span_fingerprints,
        )
        from opendata_gov_lt_mysql_import_spark.operators.textanalysis import (
            token_count,
        )

        K = 10
        corpus_dir = str(tmp_path / "corpus")
        index_dir = str(tmp_path / "span_index")
        stage = tmp_path / "stage"
        stage.mkdir()

        def words(prefix, n):
            return " ".join(f"{prefix}{i}" for i in range(n))

        hist_span = words("h", 14)  # 14-token block living in history
        base = [(1, words("a", 4) + " " + hist_span)]
        commit_snapshot(_docs(spark, base), corpus_dir)
        commit_snapshot(
            span_fingerprints(_docs(spark, base), "text", "doc_id", k=K),
            index_dir,
        )

        novel0 = words("n", 16)
        novel1 = words("m", 16)
        batches = [
            # 101: 2 novel tokens + the full 14-token history block ->
            #      14/16 tokens covered (87%) -> reject
            # 102: novel -> admit
            [(101, "x1 x2 " + hist_span), (102, novel0)],
            # 201: clone of 102's content behind 2 novel tokens ->
            #      covered by the batch-0 index append -> reject
            # 202: novel -> admit
            [(201, "y1 y2 " + novel0), (202, novel1)],
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
            screen = incremental_span_dedup(
                batch_df, idx, "text", "doc_id", k=K
            )
            lengths = batch_df.select(
                F.col("doc_id").alias("id"),
                token_count(F.col("text")).alias("n_tokens"),
            )
            reject = (
                screen.join(lengths, "id")
                .filter(F.col("n_covered") * 2 > F.col("n_tokens"))
                .select(F.col("id").alias("doc_id"))
            )
            clean = batch_df.join(reject, "doc_id", "left_anti").localCheckpoint(
                eager=True
            )
            if clean.isEmpty():
                return
            commit_snapshot(clean, corpus_dir)
            commit_snapshot(
                span_fingerprints(clean, "text", "doc_id", k=K), index_dir
            )

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        ids = {
            r["doc_id"]
            for r in read_snapshot(spark, corpus_dir).select("doc_id").collect()
        }
        assert ids == {1, 102, 202}
        # index rows = sum over admitted docs of (n_tokens - K + 1)
        idx = read_snapshot(spark, index_dir)
        expected = (18 - K + 1) + (16 - K + 1) + (16 - K + 1)
        assert idx.count() == expected
