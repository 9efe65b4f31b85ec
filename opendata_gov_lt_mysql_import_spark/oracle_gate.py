"""Cross-engine correctness gate: every registry query vs its DuckDB
oracle, the same comparison the driver runs (row count, sorted column
names, order-insensitive value multiset) plus the driver-canonicalizer
hazard check (pandas sort over result columns — unhashable cells like
raw arrays turn a row red even when values match; round-1 lesson).

The driver's own gate records rows for only the FIRST 50 registry
entries (observed in CORRECTNESS_r01/r02: both runs contain exactly the
first 50 names in registration order). This module is the in-repo gate
that covers the ENTIRE registry, so queries curated past position 50
stay verified in CI with the same rigor.
"""

from __future__ import annotations

import datetime
import math
from collections import Counter

from .sources.parquet import TABLES


def _normalize(v):
    import numpy as np

    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_normalize(x) for x in v) + "]"
    return repr(v)


def _row_key(vals) -> str:
    return "|".join(_normalize(v) for v in vals)


def duckdb_connect(sf_dir: str):
    """DuckDB connection with the fixture tables registered as views —
    the driver does the same before running oracle SQL.

    Fixtures are loaded as TABLES, not parquet views, and threads are
    capped at 8 (default = one per core, 32 here). Measured round-12
    failure mode behind both choices: DuckDB INLINES each CTE
    reference instead of materializing it, so a recipe-sized oracle
    (nested CTEs referencing ``documents`` down a 10-stage chain)
    expands to ~10,800 simultaneous parquet scan instances — each
    holding its own open file handle on documents.parquet — and with
    the gate running 8 such oracles concurrently the process blew the
    20k fd rlimit ("Too many open files"). In-memory tables are read
    from parquet exactly once per connection and hold ZERO file
    handles at query time; results are identical (same rows, same
    types) and the recipe oracles run faster to boot."""
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads TO 8")
    for t in TABLES:
        con.execute(
            f"CREATE TABLE {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def check_query(spark, con, sf_dir: str, fn, oracle: str | None):
    """Run one query on both engines and compare. Returns
    ``(None, spark_row_count)`` on success, else
    ``(failure_description, spark_row_count_or_-1)``."""
    try:
        sdf = fn(spark, sf_dir)
        spark_cols = sorted(sdf.columns)
        srows = sdf.collect()
    except Exception as e:  # noqa: BLE001
        return f"spark error: {e}", -1

    # driver-canonicalizer hazards: its pandas path (a) sorts over all
    # result columns — unhashable cells like raw arrays turn a row red
    # even when values match (round-1 lesson) — and (b) coerces datetime
    # columns to datetime64[ns] — timestamps past 2262-04-11 raise
    # OutOfBoundsDatetime before any comparison runs (round-3 lesson:
    # the scd2 9999-12-31 sentinel)
    try:
        import pandas as pd

        pdf = pd.DataFrame(
            [[r[c] for c in spark_cols] for r in srows], columns=spark_cols
        )
        if len(pdf):
            pdf.sort_values(by=spark_cols)
        dt_cols = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("timestamp", "timestamp_ntz", "date")
        ]
        for c in dt_cols:
            pd.to_datetime(pdf[c], errors="raise")
    except (TypeError, ValueError) as e:
        # pd.errors.OutOfBoundsDatetime subclasses ValueError
        return f"driver-canonicalizer hazard: {e}", len(srows)

    if oracle is None:
        return None, len(srows)  # rows-only query; reason pinned in test_registry

    try:
        ddf = con.execute(oracle).fetch_df()
    except Exception as e:  # noqa: BLE001
        return f"duckdb error: {e}", len(srows)

    duck_cols = sorted(ddf.columns)
    if spark_cols != duck_cols:
        return f"columns differ spark={spark_cols} duck={duck_cols}", len(srows)
    if len(srows) != len(ddf):
        return f"rowcount spark={len(srows)} duck={len(ddf)}", len(srows)
    smap = Counter(_row_key([r[c] for c in spark_cols]) for r in srows)
    dmap = Counter(
        _row_key([rec[c] for c in duck_cols]) for rec in ddf.to_dict("records")
    )
    if smap != dmap:
        sonly = list((smap - dmap).keys())[:2]
        donly = list((dmap - smap).keys())[:2]
        return f"values differ; spark-only={sonly} duck-only={donly}", len(srows)
    return None, len(srows)
