"""Spark-native access to snapshot tables: a Python DataSource (the
Spark 4 ``pyspark.sql.datasource`` API) so versioned reads compose with
the normal reader surface —

    spark.dataSource.register(SnapshotDataSource)
    spark.read.format("snapshot").option("path", t) \
         .option("version", 2).load()

and with SQL via ``CREATE TABLE ... USING snapshot OPTIONS (...)``.

The reader maps one input partition per manifest data file (the natural
parallelism unit of the format), yields **pyarrow RecordBatches** (the
Arrow fast path of the DataSource API — no per-row Python), and pushes
supported comparison filters into pyarrow's parquet reader where they
prune row groups via min/max statistics before any bytes decode.
Because a reader that implements ``pushFilters`` hard-fails when
``spark.sql.python.filterPushdown.enabled`` is false, the repo's
session factory (session.py) sets that conf; sessions built elsewhere
must do the same to use this source.

This is the interop/SQL surface; for raw scan throughput the primary
path remains :func:`..sources.snapshots.read_snapshot`, which hands the
JVM parquet reader the explicit file list (whole-stage codegen, no
Python in the loop). Same manifest, same files, two access tiers —
mirroring how real table formats expose both a native reader and a
catalog-integrated one.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType


class SnapshotDataSource(DataSource):
    """``format("snapshot")`` — options: ``path`` (table dir, required),
    ``version`` (int, default latest)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def _manifest(self) -> dict:
        import os

        from .snapshots import _load_manifest, current_version

        table_dir = self.options.get("path")
        if not table_dir:
            raise ValueError("snapshot source requires option('path', ...)")
        v = self.options.get("version")
        v = current_version(table_dir) if v is None else int(v)
        if v is None:
            raise FileNotFoundError(f"no snapshot versions in {table_dir}")
        m = _load_manifest(table_dir, v)
        m["_abs_files"] = [os.path.join(table_dir, f) for f in m["files"]]
        return m

    def schema(self) -> StructType:
        import json

        return StructType.fromJson(json.loads(self._manifest()["schema"]))

    def reader(self, schema: StructType) -> "SnapshotReader":
        return SnapshotReader(self._manifest()["_abs_files"], schema)


def _to_arrow_filter(f):
    """Translate a pushed Spark filter to a pyarrow dataset expression;
    None = not translatable (Spark re-applies every filter anyway, so
    pushdown is purely an optimization, never a correctness risk)."""
    import pyarrow.dataset as pads

    if len(f.attribute) != 1:
        return None  # nested column paths not handled
    col = pads.field(f.attribute[0])
    if isinstance(f, EqualTo):
        return col == f.value
    if isinstance(f, GreaterThan):
        return col > f.value
    if isinstance(f, GreaterThanOrEqual):
        return col >= f.value
    if isinstance(f, LessThan):
        return col < f.value
    if isinstance(f, LessThanOrEqual):
        return col <= f.value
    if isinstance(f, IsNull):
        return col.is_null()
    if isinstance(f, IsNotNull):
        return ~col.is_null()
    return None


class SnapshotFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SnapshotReader(DataSourceReader):
    def __init__(self, files: list[str], schema: StructType):
        self._files = files
        self._schema = schema
        self._arrow_filter = None

    def pushFilters(self, filters):
        accepted = []
        for f in filters:
            expr = None
            try:
                expr = _to_arrow_filter(f)
            except Exception:  # noqa: BLE001 — pushdown is best-effort
                expr = None
            if expr is None:
                yield f  # unsupported: Spark keeps evaluating it
            else:
                accepted.append(expr)
        if accepted:
            combined = accepted[0]
            for e in accepted[1:]:
                combined = combined & e
            self._arrow_filter = combined

    def partitions(self):
        return [SnapshotFilePartition(p) for p in self._files]

    def read(self, partition: SnapshotFilePartition):
        import pyarrow.dataset as pads

        ds = pads.dataset(partition.path, format="parquet")
        # row groups whose min/max exclude the filter never decode
        scanner = ds.scanner(
            columns=[f.name for f in self._schema.fields],
            filter=self._arrow_filter,
        )
        yield from scanner.to_batches()
