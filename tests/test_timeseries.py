"""Gap-filling (operators/timeseries.py): dense grid per key, zero fill,
custom aggregates."""

from datetime import datetime

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.operators.timeseries import gap_fill


def _events(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 15), 1.0),
        ("a", datetime(2024, 1, 1, 0, 45), 2.0),
        ("a", datetime(2024, 1, 1, 3, 10), 4.0),   # hours 1,2 missing
        ("b", datetime(2024, 1, 1, 5, 0), 10.0),    # single bucket
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


class TestGapFill:
    def test_counts_zero_fill(self, spark):
        out = {
            (r["k"], r["bucket_ts"].hour): r["n"]
            for r in gap_fill(_events(spark), "k", "ts").collect()
        }
        assert out == {
            ("a", 0): 2, ("a", 1): 0, ("a", 2): 0, ("a", 3): 1,
            ("b", 5): 1,
        }

    def test_custom_aggregate(self, spark):
        out = {
            (r["k"], r["bucket_ts"].hour): r["total"]
            for r in gap_fill(
                _events(spark), "k", "ts",
                agg=F.sum("v"), agg_name="total",
            ).collect()
        }
        # sum zero-fills to 0 via coalesce; hour 0 totals 1+2
        assert out[("a", 0)] == 3 and out[("a", 1)] == 0 and out[("a", 3)] == 4

    def test_daily_bucket(self, spark):
        rows = [
            ("x", datetime(2024, 1, 1, 12), 1.0),
            ("x", datetime(2024, 1, 4, 1), 1.0),
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        out = gap_fill(df, "k", "ts", bucket="day", step="interval 1 day")
        days = sorted(r["bucket_ts"].day for r in out.collect())
        assert days == [1, 2, 3, 4]
        assert out.filter(F.col("n") == 0).count() == 2


class TestLagFeatures:
    def test_single_window_exchange(self, spark, sf_dir):
        """However many lag/roll features are requested, the frame must
        ride ONE exchange + ONE sort."""
        import re

        import __spark_entry__ as entrymod

        df = entrymod.queries()["events_lag_features"](spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # exchanges: one for the daily groupBy, one for the window
        assert final.count("Exchange hashpartitioning") <= 2
        assert len(re.findall(r"\bSort \[", final)) == 1

    def test_lag_semantics(self, spark):
        from datetime import datetime

        from opendata_gov_lt_mysql_import_spark.operators.timeseries import (
            make_lag_features,
        )

        rows = [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("b", 1, 5.0)]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        out = {
            (r["k"], r["t"]): (r["lag_1"], r["roll_mean_3"])
            for r in make_lag_features(
                df, "k", "t", "v", lags=(1,), roll_windows=(3,)
            ).collect()
        }
        assert out[("a", 1)] == (None, 10.0)
        assert out[("a", 2)] == (10.0, 15.0)
        assert out[("a", 3)] == (20.0, 20.0)
        assert out[("b", 1)] == (None, 5.0)  # window never crosses keys
