"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the operator inventory (SURVEY.md §2 + the
beyond-reference training-data surface) for DuckDB-oracle equivalence
checks at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from opendata_gov_lt_mysql_import_spark.queries import all_oracles, all_queries
import opendata_gov_lt_mysql_import_spark.queries_ml  # noqa: F401  (registers ML queries)
import opendata_gov_lt_mysql_import_spark.queries_sql  # noqa: F401  (registers SQL-surface queries)
import opendata_gov_lt_mysql_import_spark.queries_suites  # noqa: F401  (registers suite queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    q = all_queries()["q1_pricing_summary"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → driver records rows-only check)."""
    return all_oracles()
