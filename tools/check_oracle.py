"""Single-query oracle check — the driver's comparison, on demand.

Usage: python tools/check_oracle.py <query_key> [sf_dir]

Runs the Spark query from the driver contract (__spark_entry__.queries)
and its DuckDB oracle (oracle_sql) side by side on the same parquet
fixture dir (default /root/testdata/sf0.01), compares row counts,
sorted column names, and sorted values, and exits nonzero on mismatch.
Rows-only queries (no oracle entry) report the row count and exit 0.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    key = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod
    from opendata_gov_lt_mysql_import_spark.session import get_spark

    queries = entrymod.queries()
    if key not in queries:
        print(f"unknown query {key!r}; {len(queries)} registered")
        return 2
    spark = get_spark(app_name=f"check-oracle-{key}")
    sdf = queries[key](spark, sf_dir).toPandas()
    oracle = entrymod.oracle_sql().get(key)
    if oracle is None:
        print(f"{key}: rows-only (no oracle); spark rows = {len(sdf)}")
        return 0

    con = duckdb.connect()
    for t in TABLES:
        # TABLE, not VIEW: DuckDB inlines CTE references, and the
        # recipe-sized oracles expand to ~10k concurrent parquet scan
        # instances, each holding a file handle (see
        # oracle_gate.duckdb_connect)
        con.execute(
            f"CREATE TABLE {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    odf = con.execute(oracle).df()

    if sorted(sdf.columns) != sorted(odf.columns):
        print(f"{key}: SCHEMA MISMATCH spark={sorted(sdf.columns)} "
              f"oracle={sorted(odf.columns)}")
        return 1
    cols = sorted(sdf.columns)
    sdf = sdf[cols].sort_values(cols).reset_index(drop=True)
    odf = odf[cols].sort_values(cols).reset_index(drop=True)
    if len(sdf) != len(odf):
        print(f"{key}: ROW COUNT MISMATCH spark={len(sdf)} oracle={len(odf)}")
        return 1
    try:
        pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)
    except AssertionError as exc:
        print(f"{key}: VALUE MISMATCH\n{exc}")
        return 1
    # the gate's canonicalizer as a second opinion:
    # assert_frame_equal(check_dtype=False) treats 7 and 7.0 as equal,
    # but a nullable BIGINT through the pandas bridge becomes float64
    # and the driver's value hash distinguishes '7' from '7.0' (the
    # round-13 incremental_semantic_dedup lesson) — run the same
    # _row_key compare the gate (and the driver) effectively uses
    from collections import Counter

    from opendata_gov_lt_mysql_import_spark.oracle_gate import _row_key

    smap = Counter(_row_key(list(r)) for r in sdf.itertuples(index=False))
    omap = Counter(_row_key(list(r)) for r in odf.itertuples(index=False))
    if smap != omap:
        sonly = list((smap - omap).keys())[:2]
        oonly = list((omap - smap).keys())[:2]
        print(
            f"{key}: CANONICAL-HASH MISMATCH (values equal loosely, "
            f"dtype bridge differs)\nspark-only={sonly}\noracle-only={oonly}"
        )
        return 1
    print(f"{key}: MATCH OK ({len(sdf)} rows, {len(cols)} cols, {sf_dir})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
