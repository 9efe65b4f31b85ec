"""Bad-record quarantine (sources/quarantine.py): nothing silently
dropped, good rows schema-typed, bad rows keep their raw payload."""

from pyspark.sql.types import LongType, StringType, StructField, StructType

from opendata_gov_lt_mysql_import_spark.sources.quarantine import (
    quarantine_report,
    read_with_quarantine,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
    ]
)


def _write_mixed_json(tmp_path):
    lines = [
        '{"id": 1, "name": "ok"}',
        '{"id": "not-a-number", "name": "bad-type"}',
        "this is not json at all",
        '{"id": 3, "name": "fine"}',
        '{"id": 4}',  # missing field: legal in PERMISSIVE (null-filled)
    ]
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part-0.json").write_text("\n".join(lines) + "\n")
    return str(p)


class TestQuarantine:
    def test_split_preserves_every_row(self, spark, tmp_path):
        path = _write_mixed_json(tmp_path)
        good, bad = read_with_quarantine(spark, path, SCHEMA)
        ids = sorted(r["id"] for r in good.collect())
        assert ids == [1, 3, 4]  # missing-field row is clean, null-filled
        raws = [r["raw"] for r in bad.collect()]
        assert len(raws) == 2
        # quarantine keeps the ORIGINAL payload for replay
        assert any("not-a-number" in r for r in raws)
        assert any("not json at all" in r for r in raws)
        assert good.count() + bad.count() == 5

    def test_report(self, spark, tmp_path):
        path = _write_mixed_json(tmp_path)
        good, bad = read_with_quarantine(spark, path, SCHEMA)
        rep = {r["channel"]: r["n"] for r in quarantine_report(good, bad).collect()}
        assert rep == {"good": 3, "quarantine": 2}

    def test_all_clean_input(self, spark, tmp_path):
        p = tmp_path / "clean"
        p.mkdir()
        (p / "a.json").write_text('{"id": 9, "name": "x"}\n')
        good, bad = read_with_quarantine(spark, str(p), SCHEMA)
        assert good.count() == 1 and bad.isEmpty()
