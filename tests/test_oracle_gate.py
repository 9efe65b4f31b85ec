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


def test_gate_rejects_out_of_pandas_range_timestamps(spark):
    """Driver-hazard probe: a result column holding the 9999-12-31 SCD2
    sentinel must turn the gate red (the driver's canonicalizer coerces
    datetimes to datetime64[ns], whose max is 2262-04-11) — this is the
    in-CI replica of the round-3 scd2_user_event_type driver failure."""
    from pyspark.sql import functions as F

    def bad_query(spark, sf_dir):
        return spark.range(1).select(
            F.lit("9999-12-31 00:00:00").cast("timestamp").alias("valid_to")
        )

    err, nrows = check_query(spark, None, SF_ORACLE, bad_query, None)
    assert err is not None and "hazard" in err
    assert nrows == 1

    def good_query(spark, sf_dir):
        return spark.range(1).select(
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("valid_to")
        )

    err, nrows = check_query(spark, None, SF_ORACLE, good_query, None)
    assert err is None and nrows == 1


from conftest import SF_SMALL


@pytest.mark.slow
@pytest.mark.parametrize(
    "gate_sf",
    [
        # the sf0.01 driver-scale pass is the SAME comparison the
        # external driver re-runs itself (CORRECTNESS artifact) and is
        # the single most expensive test in the suite (~13 min on a
        # contended box), so it rides the `full` tier; the DEFAULT
        # (driver-window) tier keeps full-registry coverage through
        # the sf0.001 pass — every queries() entry still runs against
        # its oracle on every default invocation (round-15 verdict
        # item 2: a bounded-time driver tier).
        pytest.param(SF_ORACLE, marks=pytest.mark.full),
        SF_SMALL,
    ],
    ids=["sf0.01-driver-scale", "sf0.001-alt-scale"],
)
def test_every_registry_query_matches_oracle(spark, gate_sf):
    """Both scales on purpose: sf0.01 is what the external driver runs;
    sf0.001 varies group sizes and interpolation positions, which is how
    the percentile half-cent rounding tie and the pagerank
    summation-order flake were caught (a query can be green at one scale
    and red at another for pure float-boundary reasons, not logic)."""
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_connect(gate_sf)

    # The ~195 checks are independent (each query touches only its own
    # temp-view names / mkdtemp dirs; the two in-query conf.sets are
    # idempotent same-value writes), so run them on a small thread pool:
    # Spark's scheduler interleaves the jobs across the same executor
    # slots while DuckDB/pandas/py4j latency overlaps instead of
    # serializing — the suite's dominant wall-clock cost (round-7
    # verdict item 7). DuckDB connections are not thread-safe; each
    # worker thread takes its own cursor (shared catalog, own state).
    import threading
    from concurrent.futures import ThreadPoolExecutor

    tl = threading.local()

    def _run(item):
        name, fn = item
        cur = getattr(tl, "cur", None)
        if cur is None:
            cur = tl.cur = con.cursor()
        err, _nrows = check_query(spark, cur, gate_sf, fn, oracles.get(name))
        return name, err

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(_run, queries.items()))
    failures = {name: err for name, err in results if err is not None}
    assert not failures, "\n".join(f"{k}: {v}" for k, v in failures.items())
