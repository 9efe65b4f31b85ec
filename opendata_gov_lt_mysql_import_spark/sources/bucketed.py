"""Bucketed parquet tables — shuffle-free co-located joins.

Bucketing pre-shuffles a table at write time: rows are hash-distributed
into a fixed number of buckets on the join/aggregation key and the layout
is recorded in the catalog. Two tables bucketed on the same key with the
same bucket count then join with NO exchange on either side — at 100 TB
that removes the single largest cost of a fact-fact join (re-shuffling
both inputs every query) and pays it once at ingest.

The reference has no analog (it joins row-at-a-time over JDBC); this is
the Spark-native answer to its N+1 pattern for fact-to-fact volumes where
broadcasting (operators/joins.py) no longer applies.

Bucketed writes must go through the session catalog (``saveAsTable``) —
bucket metadata lives there, not in the parquet files. Plain
``.parquet(path)`` writes silently drop bucketing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | Sequence[str],
    n_buckets: int,
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog-managed parquet table bucketed (and
    optionally sorted) on the join key.

    Sorting within buckets lets the sort-merge join skip its sort step as
    well, leaving a pure zip of pre-sorted bucket files. Choose
    ``n_buckets`` so one bucket of the LARGER table fits an executor
    core's working memory at target scale (e.g. 100 TB / 8192 buckets ≈
    12 GB per bucket pre-compression).
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *cols)
    if sort_cols is not None:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*s)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the scan reports the bucket spec so
    Catalyst plans bucket-local joins/aggregations without an exchange."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-bucket-count tables bucket-to-bucket.

    The resulting physical plan contains no Exchange under the join — scan
    tasks are aligned bucket-for-bucket (verified by tests asserting the
    executed plan is exchange-free below the join)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=on, how=how
    )
