"""Contiguous global row-id assignment (beyond-reference surface).

Every training pipeline eventually needs dense 0..N-1 ids (shard
indexes, example ids, embedding-matrix rows). The naive Spark spelling
``row_number() OVER (ORDER BY key)`` is THE classic scale trap: a
global window has one partition, so 100 TB funnels through a single
task. The scale-safe shape — what RDD ``zipWithIndex`` does under the
hood, re-expressed on the DataFrame API — is:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order key
   (one range shuffle; every partition holds a contiguous key range);
2. count rows per partition (a per-partition 1-row aggregate — the only
   driver-side data is one long per partition);
3. cumulative-sum those counts into per-partition offsets and add each
   row's within-partition index (an Arrow-batched ``mapInPandas`` with
   a running counter — no Python per-row work, just one vectorized
   ``arange`` per batch).

The result is byte-identical to the single-partition window whenever
the order key is unique (ids among tied keys would be
partition-arbitrary; pass a tiebreaker column to make the order total).

The sorted frame is pinned with ``localCheckpoint(eager=True)`` because
it feeds two consumers (the count pass and the id pass) — under AQE a
lazy persist does not stop the two subplans racing through the
un-materialized range shuffle twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _reject_reserved(df: DataFrame, *names: str) -> None:
    """Fail loudly instead of silently overwriting a user column with an
    internal one (withColumn REPLACES same-named columns)."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"input already has column(s) {clash} — rename them or pick a "
            "different output column name"
        )


def assign_contiguous_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "row_id",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` with dense ids ``start..start+N-1`` in the global
    order of ``order_cols`` (must form a total order for determinism).
    """
    _reject_reserved(df, "_pid", id_col)
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    # per-partition occupancy: one row per partition reaches the driver
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField(id_col, LongType(), False)]
    )
    in_cols = [f.name for f in df.schema.fields]

    def gen(batches):
        import numpy as np

        pos = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pos is None:
                pos = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf[in_cols].copy()
            out[id_col] = np.arange(pos, pos + len(pdf), dtype="int64")
            pos += len(pdf)
            yield out

    return ranged.mapInPandas(gen, schema=out_schema)


def prefix_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    out_col: str = "running_total",
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed running sum of ``value_col`` in the global order of
    ``order_cols`` — ``sum() OVER (ORDER BY ...)`` without the
    single-partition global window. Same two-pass shape as
    :func:`assign_contiguous_ids`: range shuffle, per-partition subtotal
    to the driver (one long per partition), vectorized within-partition
    cumsum plus the partition's exclusive offset. ``exclusive=True``
    yields the sum of strictly-preceding rows (0 for the first row).
    ``value_col`` must be integral (token/char/byte counts); NULLs count
    as 0 on both the subtotal and cumsum passes."""
    _reject_reserved(df, "_pid", out_col)
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    subtotals = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid")
        .agg(F.sum(F.col(value_col)).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(subtotals):
        offsets[pid] = acc
        acc += subtotals[pid] or 0

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField(out_col, LongType(), False)]
    )
    in_cols = [f.name for f in df.schema.fields]

    def gen(batches):
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            vals = pdf[value_col].fillna(0).astype("int64")
            cum = vals.cumsum()
            out = pdf[in_cols].copy()
            out[out_col] = base + (cum - vals if exclusive else cum)
            base += int(vals.sum())
            yield out

    return ranged.mapInPandas(gen, schema=out_schema)


def shard_by_budget(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    budget: int,
    shard_col: str = "shard_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Budget-balanced shard assignment for training-data export: rows
    are laid out in ``order_cols`` order and cut into shards of
    ~``budget`` total ``value_col`` (tokens/chars/bytes) — each row
    lands in the shard where its EXCLUSIVE running total falls, so no
    shard starts past its budget and shard sizes stay within one row of
    the target. Row-count repartition can't do this: 1000 tiny docs and
    1000 book-length docs are "balanced" by count and 100x apart by
    tokens. Cost: the prefix-sum range shuffle — nothing else."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    _reject_reserved(df, "_cum_excl", shard_col)
    cum = prefix_sum(
        df,
        value_col,
        order_cols,
        out_col="_cum_excl",
        exclusive=True,
        num_partitions=num_partitions,
    )
    # integer division, NOT float-divide-then-cast: Spark's double→long
    # cast truncates while DuckDB's rounds, so only `DIV`/`//` gives the
    # same shard id on both engines
    return cum.withColumn(
        shard_col, F.expr(f"_cum_excl DIV {int(budget)}")
    ).drop("_cum_excl")
