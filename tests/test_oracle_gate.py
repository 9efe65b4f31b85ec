"""Full-registry cross-engine gate: EVERY queries() entry vs its DuckDB
oracle at sf0.01 — the exact comparison the driver's correctness pass
runs, but over the whole registry instead of the driver's first-50 cap.

One test, one pass, all failures reported together (a parametrize would
pay Spark-session and DuckDB-view setup per query)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from opendata_gov_lt_mysql_import_spark.oracle_gate import (
    check_query,
    duckdb_connect,
)

SF_ORACLE = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_every_registry_query_matches_oracle(spark):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_connect(SF_ORACLE)
    failures = {}
    for name, fn in queries.items():
        err = check_query(spark, con, SF_ORACLE, name, fn, oracles.get(name))
        if err is not None:
            failures[name] = err
    assert not failures, "\n".join(f"{k}: {v}" for k, v in failures.items())
