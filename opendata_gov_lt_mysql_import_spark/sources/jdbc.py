"""JDBC source/sink wrappers (S1/S2, the BASELINE "spark_approach").

The reference reflects the MySQL schema at runtime
(``meta.reflect()``, /root/reference/odgovlt.py:147-156) and then issues
row-at-a-time SELECTs. Spark's JDBC relation does the reflection natively
(schema from JDBC metadata) and Catalyst pushes predicates and column
pruning into the remote ``WHERE``/select list — so the reference's entire
"optimizer story" is configuration here, not code.

Scale design:
- fact tables read with ``partitionColumn/lowerBound/upperBound/
  numPartitions`` so a 1000-executor cluster issues N parallel range
  scans instead of one session-pinned cursor;
- ``zeroDateTimeBehavior=CONVERT_TO_NULL`` normalizes the MySQL
  ``0000-00-00 00:00:00`` sentinel at the source (the reference handles it
  at JSON-encode time instead, odgovlt.py:137-138);
- dimension tables read unpartitioned and broadcast at join sites.

No MySQL server exists in the test environment; the wrappers are
integration-tested end-to-end against the embedded Derby engine Spark
ships for its Hive metastore (tests/test_jdbc_derby.py) — a real JDBC
write → read → pushdown cycle — and the parquet fixtures stand in for the
bulk data path (FIXTURES.md role mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# The five reference tables (odgovlt.py:149-156) — names kept for the
# pipeline assembly in plans/pipeline.py.
REFERENCE_TABLES = {
    "user": "t_user",
    "istaiga": "t_istaiga",
    "rinkmena": "t_rinkmena",
    "kategorija": "t_kategorija",
    "kategorija_rinkmena": "t_kategorija_rinkmena",
}


def mysql_url(host: str, db: str, port: int = 3306) -> str:
    return (
        f"jdbc:mysql://{host}:{port}/{db}"
        "?useUnicode=true&characterEncoding=utf8"
        "&zeroDateTimeBehavior=CONVERT_TO_NULL"
    )


def jdbc_read_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
    fetch_size: int = 10_000,
    driver: str | None = None,
) -> dict[str, str]:
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
        # push LIMIT/aggregates/sample down when the dialect supports it
        "pushDownLimit": "true",
        "pushDownAggregate": "true",
    }
    if driver:
        opts["driver"] = driver
    if partition_column:
        if lower_bound is None or upper_bound is None or not num_partitions:
            raise ValueError("partitioned read needs bounds and numPartitions")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc_table(spark: SparkSession, **options) -> DataFrame:
    reader = spark.read.format("jdbc")
    for k, v in jdbc_read_options(**options).items():
        reader = reader.option(k, v)
    return reader.load()


def read_reference_tables(
    spark: SparkSession,
    url: str,
    fact_partitions: int = 64,
    driver: str | None = None,
    fact_upper_bound: int = 1 << 31,
) -> dict[str, DataFrame]:
    """S1 analog: bind the five source tables; the fact table partitioned
    on its integer PK, dimensions as single-cursor reads (they are tiny and
    get broadcast downstream)."""
    out: dict[str, DataFrame] = {}
    for alias, table in REFERENCE_TABLES.items():
        if alias == "rinkmena":
            # bounds are cheap min/max pushdown queries at real scale;
            # callers can override after inspecting the PK range
            out[alias] = read_jdbc_table(
                spark,
                url=url,
                table=table,
                partition_column="ID",
                lower_bound=0,
                upper_bound=fact_upper_bound,
                num_partitions=fact_partitions,
                driver=driver,
            )
        else:
            out[alias] = read_jdbc_table(spark, url=url, table=table, driver=driver)
    return out


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    driver: str | None = None,
    column_types: str | None = None,
) -> None:
    """``column_types`` maps to ``createTableColumnTypes`` — e.g.
    ``"STATUSAS VARCHAR(1)"``. Without it Spark lets the dialect choose,
    and some engines (Derby) map StringType to CLOB, which cannot be used
    in pushed-down equality predicates."""
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    if driver:
        w = w.option("driver", driver)
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    w.mode(mode).save()
