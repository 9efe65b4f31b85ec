"""Stream-stream interval joins (streaming/joins.py): streaming output
must equal the batch interval join on the same staged data, and the
time-range condition must produce a state-bounded streaming plan."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table
from opendata_gov_lt_mysql_import_spark.streaming.events import (
    read_event_stream,
    run_to_memory,
    stage_events,
)
from opendata_gov_lt_mysql_import_spark.streaming.joins import (
    paired_view_clicks,
    stream_interval_join,
)


@pytest.fixture(scope="module")
def events_stage(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ssj_events"))
    stage_events(load_table(spark, sf_dir, "events"), path)
    return path


def _pairs_key(df):
    return {
        (r["user_id"], r["view_id"], r["click_id"], r["lag_sec"])
        for r in df.collect()
    }


class TestStreamStreamJoin:
    def test_stream_matches_batch(self, spark, sf_dir, events_stage):
        ev = load_table(spark, sf_dir, "events")
        batch = paired_view_clicks(
            ev.filter(F.col("event_type") == "view"),
            ev.filter(F.col("event_type") == "click"),
        )
        stream_src = read_event_stream(spark, events_stage)
        stream = paired_view_clicks(
            stream_src.filter(F.col("event_type") == "view"),
            stream_src.filter(F.col("event_type") == "click"),
        )
        assert stream.isStreaming
        run_to_memory(stream, "ssj_pairs", output_mode="append")
        got = _pairs_key(spark.table("ssj_pairs"))
        want = _pairs_key(batch)
        assert got == want
        assert len(want) > 0

    def test_interval_bounds_inclusive(self, spark):
        base = datetime(2024, 1, 1, 12, 0, 0)
        v = spark.createDataFrame(
            [(1, 100, base)], "user_id long, event_id long, ts timestamp"
        ).select("user_id", F.col("event_id").alias("view_id"),
                 F.col("ts").alias("view_ts"))
        clicks = [
            (1, 200, datetime(2024, 1, 1, 12, 0, 0)),   # same instant: in
            (1, 201, datetime(2024, 1, 1, 12, 30, 0)),  # boundary: in
            (1, 202, datetime(2024, 1, 1, 12, 30, 1)),  # past horizon: out
            (1, 203, datetime(2024, 1, 1, 11, 59, 59)), # before view: out
            (2, 204, datetime(2024, 1, 1, 12, 1, 0)),   # other user: out
        ]
        c = spark.createDataFrame(
            clicks, "user_id long, event_id long, ts timestamp"
        ).select("user_id", F.col("event_id").alias("click_id"),
                 F.col("ts").alias("click_ts"))
        out = stream_interval_join(
            v, c, key="user_id", left_ts="view_ts", right_ts="click_ts",
            within="30 minutes",
        )
        assert sorted(r["click_id"] for r in out.collect()) == [200, 201]

    def test_streaming_plan_is_state_bounded(self, spark, events_stage):
        """The analyzed streaming plan must carry watermarks on both
        sides of the join — the precondition for state eviction."""
        src = read_event_stream(spark, events_stage)
        stream = paired_view_clicks(
            src.filter(F.col("event_type") == "view"),
            src.filter(F.col("event_type") == "click"),
        )
        plan = stream._jdf.queryExecution().analyzed().toString()
        assert plan.count("EventTimeWatermark") == 2
