"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and an
order-insensitive value multiset (stringified, arrays included).

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

from opendata_gov_lt_mysql_import_spark.session import get_spark  # noqa: E402
from opendata_gov_lt_mysql_import_spark.sources.parquet import TABLES  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def normalize(v):
    import datetime
    import math

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
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return repr(v)


def row_key(row):
    return "|".join(normalize(v) for v in row)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark(app_name="verify-oracle")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sorted(sdf.columns)
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        # replicate the DRIVER's canonicalizer: it pandas-sorts every
        # result column, which factorizes values — list/array cells are
        # unhashable there and turn the row red even when values match
        # (round-1 lesson: j3/a1/f4). Catch that locally.
        try:
            import pandas as pd

            pdf = pd.DataFrame(
                [[r[c] for c in spark_cols] for r in srows], columns=spark_cols
            )
            if len(pdf):
                pdf.sort_values(by=spark_cols)
        except TypeError as e:
            failures.append(name)
            print(f"FAIL {name}: driver-canonicalizer hazard: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetch_df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        duck_cols = sorted(ddf.columns)
        if spark_cols != duck_cols:
            failures.append(name)
            print(f"FAIL {name}: columns differ spark={spark_cols} duck={duck_cols}")
            continue
        if len(srows) != len(ddf):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(ddf)}")
            continue
        smap = Counter(row_key([r[c] for c in spark_cols]) for r in srows)
        dmap = Counter(
            row_key([rec[c] for c in duck_cols]) for rec in ddf.to_dict("records")
        )
        if smap != dmap:
            failures.append(name)
            sonly = list((smap - dmap).keys())[:3]
            donly = list((dmap - smap).keys())[:3]
            print(f"FAIL {name}: values differ\n  spark-only: {sonly}\n  duck-only:  {donly}")
            continue
        print(f"ok   {name}: {len(srows)} rows match")

    print(f"\n{len(failures)} failures" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
