"""Bad-record quarantine for semi-structured ingestion.

The reference tolerates malformed upstream objects by catching per-row
errors inside the harvest loop and moving on
(/root/reference/odgovlt.py:355-367) — correct policy, wrong mechanism
at scale: a Python try/except per row serializes ingestion. The
Spark-first mechanism is PERMISSIVE parsing with a corrupt-record
column: the parser itself routes unparseable rows into
``_corrupt_record`` during the normal distributed scan (zero extra
passes), and one filter splits the stream into clean rows and a
quarantine channel that preserves the ORIGINAL raw payload for
replay/debugging.

Scale notes:
- The split is two lazy filters over ONE cached scan; good rows flow on
  schema-typed, bad rows keep raw bytes. Neither side re-parses.
- Spark requires the corrupt column to be selected for it to be
  populated AND the parsed frame to be cached/materialized before
  filtering on it (a known semantic of PERMISSIVE mode: filtering on
  the corrupt column alone over a pure scan raises); ``read_with_
  quarantine`` handles both.
- FAILFAST is the right mode for pipelines with an upstream contract;
  this module is for the reference's situation — an upstream you don't
  control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "json",
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """Read ``path`` under ``schema`` in PERMISSIVE mode and split into
    ``(good, quarantine)``.

    ``good`` carries the declared columns for rows that parsed clean;
    ``quarantine`` carries the raw unparsed payload (one string column
    ``raw``) for rows that didn't. The union of counts equals the input
    row count — nothing is silently dropped (the reference's skip-loop
    loses the bad objects entirely unless separately logged).
    """
    full_schema = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    reader = (
        spark.read.format(fmt)
        .schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    parsed = reader.load(path)
    # PERMISSIVE semantics: referencing only the corrupt column over the
    # raw scan is disallowed (Spark can't know which rows failed without
    # materializing the parse) — cache the parsed frame first.
    parsed = parsed.cache()
    good = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, quarantine


def quarantine_report(good: DataFrame, quarantine: DataFrame) -> DataFrame:
    """One-row ingestion health report: clean/bad counts and bad rate —
    the gate a pipeline checks before promoting the batch."""
    g = good.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("good").alias("channel"), "n"
    )
    b = quarantine.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("quarantine").alias("channel"), "n"
    )
    return g.unionByName(b)
