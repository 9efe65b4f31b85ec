"""Structured Streaming surface: the streaming windowed aggregation must
agree with the batch form of the same expression on the same data."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table
from opendata_gov_lt_mysql_import_spark.streaming.events import (
    EVENT_SCHEMA,
    foreach_batch_upsert,
    read_event_stream,
    run_to_memory,
    stage_events,
    windowed_counts,
)


@pytest.fixture(scope="module")
def events_stage_dir(spark, sf_dir, tmp_path_factory):
    # parquet staging: microsecond-exact ts round-trip (JSON staging
    # can't preserve it — the JSON writer ignores timestampFormat)
    path = str(tmp_path_factory.mktemp("events_stage"))
    stage_events(load_table(spark, sf_dir, "events"), path)
    return path


class TestStagingRoundTrip:
    """Format-regression canary (round-3 lesson): the previous JSON
    staging parsed every ts to NULL because the JSON writer ignores
    timestampFormat, and the parity tests failed with a confusing
    691-session diff. These asserts fail with the real cause."""

    def test_ts_roundtrip_microsecond_exact(self, spark, sf_dir, events_stage_dir):
        ev = load_table(spark, sf_dir, "events")
        stream = read_event_stream(spark, events_stage_dir)
        run_to_memory(
            stream.select("event_id", "ts"), "raw_events", output_mode="append"
        )
        out = spark.table("raw_events")
        assert out.filter(F.col("ts").isNull()).count() == 0
        assert out.count() == ev.count()
        # microsecond fidelity: every staged ts equals its batch twin
        mismatched = (
            out.alias("s")
            .join(ev.alias("b"), "event_id")
            .filter(F.col("s.ts") != F.col("b.ts"))
            .count()
        )
        assert mismatched == 0

    def test_empty_source_trips_input_canary(self, spark, tmp_path):
        empty = str(tmp_path / "empty_events")
        spark.createDataFrame([], EVENT_SCHEMA).write.mode("overwrite").parquet(empty)
        stream = read_event_stream(spark, empty)
        with pytest.raises(RuntimeError, match="0 input rows"):
            run_to_memory(stream.groupBy("event_type").count(), "empty_canary")


class TestWindowedCounts:
    def test_stream_matches_batch(self, spark, sf_dir, events_stage_dir):
        batch = windowed_counts(load_table(spark, sf_dir, "events"))
        stream = windowed_counts(read_event_stream(spark, events_stage_dir))
        assert stream.isStreaming
        run_to_memory(stream, "win_counts")
        got = {
            (r["bucket"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.table("win_counts").collect()
        }
        want = {
            (r["bucket"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in batch.collect()
        }
        assert got == want
        assert len(want) > 0

    def test_sliding_window(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        tumbling = windowed_counts(ev, window="1 hour")
        sliding = windowed_counts(ev, window="1 hour", slide="30 minutes")
        # a sliding window emits ~2x the buckets of the tumbling one
        assert sliding.count() > tumbling.count()


class TestForeachBatchUpsert:
    def test_microbatch_callback(self, spark, events_stage_dir, tmp_path):
        stream = read_event_stream(spark, events_stage_dir)
        out_dir = str(tmp_path / "out")

        def apply_fn(df, batch_id):
            df.groupBy("event_type").count().write.mode("overwrite").parquet(out_dir)

        q = foreach_batch_upsert(stream, apply_fn, str(tmp_path / "ckpt"))
        q.awaitTermination()
        result = spark.read.parquet(out_dir)
        assert result.count() > 0
        assert set(result.columns) == {"event_type", "count"}


class TestStreamingDedup:
    def test_duplicated_stream_dedupes_to_batch_distinct(
        self, spark, sf_dir, tmp_path
    ):
        from opendata_gov_lt_mysql_import_spark.streaming.dedup import streaming_dedup

        # events written twice -> every row has exactly one duplicate
        ev = load_table(spark, sf_dir, "events")
        dup_dir = str(tmp_path / "dup_events")
        for i in range(2):
            stage_events(ev, dup_dir, n_files=2)

        keys = ["ts", "user_id", "event_type"]
        stream = read_event_stream(spark, dup_dir)
        deduped = streaming_dedup(stream, keys, ts_col="ts", watermark="1 hour")
        assert deduped.isStreaming
        run_to_memory(deduped, "dedup_out", output_mode="append")

        got = spark.table("dedup_out").select(*keys).distinct().count()
        total = spark.table("dedup_out").count()
        want = ev.select(*keys).distinct().count()
        assert got == want
        # no key emitted twice
        assert total == got

    def test_content_dedup_fingerprints(self, spark, sf_dir, tmp_path):
        from opendata_gov_lt_mysql_import_spark.streaming.dedup import (
            streaming_content_dedup,
        )

        ev = load_table(spark, sf_dir, "events")
        d = str(tmp_path / "ev_stage")
        stage_events(ev, d, n_files=2)
        stream = read_event_stream(spark, d)
        deduped = streaming_content_dedup(stream, "event_type", ts_col="ts")
        run_to_memory(deduped, "content_dedup_out", output_mode="append")
        out = spark.table("content_dedup_out")
        # one survivor per distinct event_type payload
        assert out.count() == ev.select("event_type").distinct().count()
        assert "fp" in out.columns
