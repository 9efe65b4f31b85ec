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
