"""Tests for the asymmetric deep-diff (F5) — pure and DataFrame forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.functions.diff import changed_rows, was_changed


class TestWasChanged:
    def test_scalar(self):
        assert was_changed(1, 2)
        assert not was_changed(1, 1)

    def test_dict_new_keys_only(self):
        # keys dropped from the old side are ignored (asymmetry)
        assert not was_changed({"a": 1}, {"a": 1, "b": 2})
        assert was_changed({"a": 1, "b": 2}, {"a": 1})

    def test_list_longer_new_changed(self):
        assert was_changed([1, 2, 3], [1, 2])
        # extra old elements ignored (asymmetry)
        assert not was_changed([1, 2], [1, 2, 3])

    def test_nested(self):
        new = {"tags": [{"name": "a"}], "title": "t"}
        assert not was_changed(new, {"tags": [{"name": "a"}], "title": "t", "extra": 1})
        assert was_changed(new, {"tags": [{"name": "b"}], "title": "t"})

    def test_missing_old_branch(self):
        assert was_changed({"a": {"b": 1}}, {})


class TestChangedRows:
    def test_create_update_split(self, spark):
        new = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id int, s string, v double"
        )
        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "XX", 20.0)], "id int, s string, v double"
        )
        out = {r["id"]: r["_change_kind"] for r in changed_rows(new, old, "id").collect()}
        assert out == {2: "update", 3: "create"}

    def test_old_extra_columns_ignored(self, spark):
        new = spark.createDataFrame([(1, "a")], "id int, s string")
        old = spark.createDataFrame([(1, "a", 99)], "id int, s string, extra int")
        assert changed_rows(new, old, "id", compare_fields=["s"]).count() == 0

    def test_unchanged_rows_pruned(self, spark):
        df = spark.range(100).withColumn("v", F.col("id") * 2)
        assert changed_rows(df, df, "id").count() == 0
