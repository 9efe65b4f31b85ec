"""Parquet fixture sources.

The driver fixtures (/root/testdata/sf*/) are one parquet file per table.
At 100 TB these become partitioned parquet datasets; reads stay identical
(``spark.read.parquet`` handles directory datasets, partition pruning, and
predicate pushdown the same way), so nothing here is local-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark refuses by
        # default; read nanos as long and convert losslessly to the
        # microsecond timestamp type (fixture sub-second components are
        # µs-resolution). Integer division — double division would lose
        # precision above 2^53 ns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_partitioned(
    df,
    path: str,
    partition_cols,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write parquet hive-partitioned on low-cardinality layout keys
    (date, source, status) so downstream predicates prune whole
    directories instead of reading-and-filtering — the layout that makes
    a 100 TB table queryable. ``max_records_per_file`` caps file size
    against the small-files/giant-files extremes."""
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    w = df.write.mode(mode).partitionBy(*cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)
