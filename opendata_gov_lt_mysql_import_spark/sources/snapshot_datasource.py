"""Spark-native access to snapshot tables: a Python DataSource (the
Spark 4 ``pyspark.sql.datasource`` API) so versioned reads compose with
the normal reader surface —

    spark.dataSource.register(SnapshotDataSource)
    spark.read.format("snapshot").option("path", t) \
         .option("version", 2).load()

and with SQL via ``CREATE TABLE ... USING snapshot OPTIONS (...)``.

The version is resolved ONCE per data source instance (schema and file
list always come from the same manifest — a concurrent commit between
planning and execution cannot mix versions). The reader maps one input
partition per manifest data file, yields **pyarrow RecordBatches** (the
Arrow fast path of the DataSource API — no per-row Python) under the
manifest's DECLARED schema, so files from older commits that lack
later-added columns null-fill and int32→int64 drifts upcast, exactly
like :func:`..sources.snapshots.read_snapshot`.

Filter pushdown prunes parquet row groups via pyarrow min/max stats.
IMPORTANT CONTRACT: a filter accepted by ``pushFilters`` is REMOVED
from Spark's post-scan evaluation, so pushdown must be exact — and
IEEE comparisons in pyarrow disagree with Spark on NaN (Spark orders
NaN greater than everything and NaN = NaN true; arrow drops it), so
filters touching float/double columns are never accepted. Because a
reader that implements ``pushFilters`` hard-fails when
``spark.sql.python.filterPushdown.enabled`` is false, the repo's
session factory (session.py) sets that conf; sessions built elsewhere
must do the same to use this source.

This is the interop/SQL surface; for raw scan throughput the primary
path remains ``read_snapshot``, which hands the JVM parquet reader the
explicit file list (whole-stage codegen, no Python in the loop). Same
manifest resolution (``snapshots.resolve_snapshot``), two access tiers
— mirroring how real table formats expose both a native reader and a
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

    def _resolved(self) -> dict:
        if getattr(self, "_m", None) is None:
            from .snapshots import resolve_snapshot

            table_dir = self.options.get("path")
            if not table_dir:
                raise ValueError("snapshot source requires option('path', ...)")
            v = self.options.get("version")
            self._m = resolve_snapshot(table_dir, None if v is None else int(v))
        return self._m

    def schema(self) -> StructType:
        return self._resolved()["_struct"]

    def reader(self, schema: StructType) -> "SnapshotReader":
        return SnapshotReader(self._resolved()["_abs_files"], schema)


def _to_arrow_filter(f):
    """Translate a pushed Spark filter to a pyarrow dataset expression;
    None = refuse (Spark then keeps evaluating it itself). Refusal is
    the only safe answer for anything whose arrow semantics could
    differ — accepted filters are NOT re-checked by Spark."""
    import pyarrow.dataset as pads

    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1:
        # Not/And/Or wrappers carry no `attribute`; nested paths unhandled
        return None
    col = pads.field(attr[0])
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
        from pyspark.sql.pandas.types import to_arrow_schema

        self._files = files
        self._schema = schema
        self._arrow_schema = to_arrow_schema(schema)
        # NaN ordering/equality differs between Spark and arrow — never
        # accept pushdown on floating-point columns
        self._float_cols = {
            f.name
            for f in schema.fields
            if f.dataType.typeName() in ("float", "double")
        }
        self._arrow_filter = None

    def pushFilters(self, filters):
        accepted = []
        for f in filters:
            expr = None
            # Spark may push shapes with no `attribute` at all (Not/And/Or
            # wrappers from != or negated predicates) — anything we can't
            # positively identify as a single non-float column is refused,
            # never raised on, because a pushFilters error fails the read.
            attr = getattr(f, "attribute", None)
            if (
                attr is not None
                and len(attr) == 1
                and attr[0] not in self._float_cols
            ):
                try:
                    expr = _to_arrow_filter(f)
                except Exception:  # noqa: BLE001 — pushdown is best-effort
                    expr = None
            if expr is None:
                yield f  # refused: Spark keeps evaluating it
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

        # the DECLARED schema, not the file's own: older files null-fill
        # added columns and upcast compatible drifts, matching
        # read_snapshot's declared-schema semantics
        ds = pads.dataset(
            partition.path, format="parquet", schema=self._arrow_schema
        )
        # row groups whose min/max exclude the filter never decode
        scanner = ds.scanner(
            columns=[f.name for f in self._schema.fields],
            filter=self._arrow_filter,
        )
        yield from scanner.to_batches()
