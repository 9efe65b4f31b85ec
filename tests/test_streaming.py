"""Structured Streaming surface: the streaming windowed aggregation must
agree with the batch form of the same expression on the same data."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table
from opendata_gov_lt_mysql_import_spark.streaming.events import (
    foreach_batch_upsert,
    read_event_stream,
    run_to_memory,
    windowed_counts,
)


@pytest.fixture(scope="module")
def events_json_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_json"))
    from opendata_gov_lt_mysql_import_spark.streaming.events import JSON_TS_FORMAT

    load_table(spark, sf_dir, "events").coalesce(4).write.mode("overwrite").option(
        "timestampFormat", JSON_TS_FORMAT
    ).json(path)
    return path


class TestWindowedCounts:
    def test_stream_matches_batch(self, spark, sf_dir, events_json_dir):
        batch = windowed_counts(load_table(spark, sf_dir, "events"))
        stream = windowed_counts(read_event_stream(spark, events_json_dir))
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
    def test_microbatch_callback(self, spark, events_json_dir, tmp_path):
        stream = read_event_stream(spark, events_json_dir)
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
        from opendata_gov_lt_mysql_import_spark.streaming.events import JSON_TS_FORMAT

        # events written twice -> every row has exactly one duplicate
        ev = load_table(spark, sf_dir, "events")
        dup_dir = str(tmp_path / "dup_events")
        for i in range(2):
            ev.coalesce(2).write.mode("append").option(
                "timestampFormat", JSON_TS_FORMAT
            ).json(dup_dir)

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
        from opendata_gov_lt_mysql_import_spark.streaming.events import JSON_TS_FORMAT

        ev = load_table(spark, sf_dir, "events")
        d = str(tmp_path / "ev_json")
        ev.coalesce(2).write.mode("overwrite").option(
            "timestampFormat", JSON_TS_FORMAT
        ).json(d)
        stream = read_event_stream(spark, d)
        deduped = streaming_content_dedup(stream, "event_type", ts_col="ts")
        run_to_memory(deduped, "content_dedup_out", output_mode="append")
        out = spark.table("content_dedup_out")
        # one survivor per distinct event_type payload
        assert out.count() == ev.select("event_type").distinct().count()
        assert "fp" in out.columns
