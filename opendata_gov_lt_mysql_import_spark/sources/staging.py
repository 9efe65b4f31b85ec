"""JSON staging hop (S10/S11) — the reference's per-object IR.

The reference serializes each dataset row to JSON and stores it keyed by
guid in Postgres (``HarvestObject(guid, job, content)``,
/root/reference/odgovlt.py:363-366), reloading with ``json.loads`` on
import (odgovlt.py:378). In a lazy-DAG engine the hop is optional, but it
remains valuable as a restartable checkpoint, so we keep it as a parquet
dataset of ``(guid, content)`` — splittable, compressed, schema-carrying,
and readable by any downstream stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.json_codec import DATETIME_FORMAT, rows_to_json


def stage_write(df: DataFrame, path: str, guid_col: str, mode: str = "overwrite") -> None:
    """Persist rows as (guid, content-JSON) parquet — the S10 sink."""
    staged = rows_to_json(df).select(
        F.col(guid_col).cast("string").alias("guid"), F.col("content")
    )
    staged.write.mode(mode).parquet(path)


def stage_read(spark: SparkSession, path: str, schema) -> DataFrame:
    """Reload staged payloads into typed rows — the S11 source."""
    raw = spark.read.parquet(path)
    parsed = raw.select(
        "guid",
        F.from_json("content", schema, {"timestampFormat": DATETIME_FORMAT}).alias("row"),
    )
    return parsed.select("guid", "row.*")


def read_csv_legacy_encoding(
    spark: SparkSession,
    path: str,
    schema,
    encoding: str,
    **options: str,
) -> DataFrame:
    """CSV read in a legacy single-byte charset (the upstream
    opendata.gov.lt catalog is Lithuanian text that historically shipped
    as windows-1257/ISO-8859-13 exports).

    Spark 4 restricts CSV ``encoding`` to a short allow-list unless
    ``spark.sql.legacy.javaCharsets`` is on; this helper enables that
    session flag (left enabled — it only WIDENS the accepted charset
    set, it never changes the decoding of the allow-listed ones) and
    reads under the declared schema. Decoding happens in the JVM scan,
    so the path stays distributed and pushdown-capable."""
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    reader = spark.read.schema(schema).option("encoding", encoding)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)
