"""Unit tests for the one-pass declarative data-quality engine
(operators/validation.py)."""

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.operators.validation import (
    check_constraints,
    foreign_key_check,
    in_range,
    in_set,
    matches,
    min_rows,
    non_negative,
    not_null,
    unique,
    validation_report,
)


def _frame(spark):
    rows = [
        (1, "a", 10.0, "OK"),
        (2, "b", -5.0, "OK"),      # out of range + negative
        (2, "c", 20.0, "BAD!"),    # dup id + regex violation
        (None, "d", 999.0, "OK"),  # null id + out of range (hi)
        (4, None, 30.0, "ok"),     # null name (unchecked) + set violation
    ]
    return spark.createDataFrame(rows, "id int, name string, v double, status string")


class TestCheckConstraints:
    def test_violation_counts(self, spark):
        df = _frame(spark)
        report = check_constraints(
            df,
            [
                not_null("id"),
                unique("id"),
                in_range("v", 0, 100),
                in_set("status", ["OK"]),
                matches("status", "^[A-Za-z]+$"),
                min_rows(3),
                min_rows(10, name="min_rows_10"),
                non_negative("v"),
            ],
        )
        got = {r["check_name"]: (r["violations"], r["passed"]) for r in report.collect()}
        assert got["id_not_null"] == (1, False)
        assert got["id_unique"] == (1, False)       # one excess duplicate of id=2
        assert got["v_in_range"] == (2, False)      # -5 and 999
        assert got["status_in_set"] == (2, False)   # BAD! and ok
        assert got["status_matches"] == (1, False)  # BAD!
        assert got["min_rows"] == (0, True)         # 5 >= 3
        assert got["min_rows_10"] == (5, False)     # shortfall of 5
        assert got["v_non_negative"] == (1, False)

    def test_all_green_gate(self, spark):
        df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id int, v double")
        report = check_constraints(df, [not_null("id"), unique("id"), in_range("v", 0, 10)])
        assert report.filter(~F.col("passed")).isEmpty()

    def test_single_scan_plan(self, spark):
        """All scalar checks must collapse into one aggregate over one
        scan — the whole point of compiling them together."""
        df = spark.range(100).select(
            F.col("id"), (F.col("id") % 7).alias("v")
        )
        report = check_constraints(
            df, [not_null("id"), unique("id"), in_range("v", 0, 6), non_negative("v")]
        )
        plan = report._jdf.queryExecution().executedPlan().toString()
        # one shuffle (the 1-row final agg exchange), no joins
        assert plan.count("Exchange") <= 2  # partial->final pair at most
        assert "Join" not in plan

    def test_fk_and_union_report(self, spark):
        fact = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 99), (4, None)], "k int, fk int"
        )
        dim = spark.createDataFrame([(10,), (20,)], "d int")
        fk = foreign_key_check(fact, "fk", dim, "d")
        row = fk.collect()[0]
        assert (row["violations"], row["passed"]) == (1, False)  # 99; NULL skipped
        report = validation_report(fact, [not_null("fk")], fk_checks=[fk])
        names = [r["check_name"] for r in report.collect()]
        assert names == ["fk_not_null", "fk_fk"]
