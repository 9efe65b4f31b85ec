"""Small-file compaction — the table-maintenance pass every long-lived
100 TB dataset needs.

Streaming sinks, incremental syncs, and over-parallel writers leave
thousands of KB-sized parquet files; scans then pay per-file open/footer
costs and the driver pays listing. Compaction rewrites a directory into
files near a target size, optionally range-clustering rows so min/max
file statistics become selective (the poor man's Z-order: one clustering
dimension via ``repartitionByRange`` + ``sortWithinPartitions``).

Sizing uses the actual on-disk bytes of the input (not a row-count
guess), so the output file count adapts to the table's true density.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _dataset_bytes(path: str) -> int:
    total = 0
    for f in glob.glob(os.path.join(path, "**"), recursive=True):
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", ".")):
            total += os.path.getsize(f)
    return total


def plan_file_count(path: str, target_bytes: int = DEFAULT_TARGET_BYTES) -> int:
    return max(1, -(-_dataset_bytes(path) // target_bytes))  # ceil


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    cluster_by: list[str] | None = None,
) -> DataFrame:
    """Rewrite ``src`` (parquet file or directory) into ``dst`` with
    ~``target_bytes`` files. With ``cluster_by``, rows are range-
    partitioned and sorted on those columns so each output file covers a
    narrow value range — filters on the cluster columns then skip whole
    files via parquet min/max stats. Returns the reloaded result."""
    n = plan_file_count(src, target_bytes)
    df = spark.read.parquet(src)
    if cluster_by:
        out = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst)


def zorder_key(c1, c2, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns —
    multi-dimensional clustering for `compact_parquet(cluster_by=...)`:
    sorting by the interleaved key keeps BOTH dimensions locally dense,
    so min/max file stats stay selective for filters on either column
    (1-D clustering helps only its own column). Pure JVM bit arithmetic,
    codegen'd; columns must fit in ``bits`` bits (pre-scale/rank wider
    domains)."""
    from pyspark.sql import functions as F

    a = F.col(c1) if isinstance(c1, str) else c1
    b = F.col(c2) if isinstance(c2, str) else c2
    z = F.lit(0).cast("long")
    for i in range(bits):
        # Column | Column is LOGICAL or in PySpark — bitwiseOR is the
        # integer form
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(1), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(1), 2 * i + 1)
        )
    return z
