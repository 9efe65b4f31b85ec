"""One-off config A/B harness (round-15 optimization): run named
HEADLINE entries under bench_subset's protocol with extra session conf,
so a config candidate can be priced on the same box before touching
session.py. Spark sessions cannot change these confs live, so each
invocation is one side of the A/B; interleave invocations externally.

Usage:
  python tools/conf_ab.py --conf k=v [--conf k=v ...] [--runs N] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    # argparse instead of the two hand-rolled --conf scans (round-15
    # advisory: `--conf=k` without a value and a two-token pair missing
    # '=' both crashed with bare unpacking tracebacks)
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument(
        "--conf", action="append", default=[], metavar="K=V",
        help="extra Spark conf for this session (repeatable)",
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("queries", nargs="+", metavar="QUERY")
    args = ap.parse_args()
    conf: dict[str, str] = {}
    for entry in args.conf:
        if "=" not in entry:
            ap.error(f"--conf expects K=V, got {entry!r}")
        k, v = entry.split("=", 1)
        if not k or not v:
            ap.error(f"--conf expects non-empty K=V, got {entry!r}")
        conf[k] = v
    runs_n = args.runs
    names = args.queries

    from bench import force_eval_chk
    from opendata_gov_lt_mysql_import_spark.session import get_spark
    from opendata_gov_lt_mysql_import_spark.queries import all_queries
    import opendata_gov_lt_mysql_import_spark.queries_ml  # noqa: F401
    import opendata_gov_lt_mysql_import_spark.queries_sql  # noqa: F401

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="conf-ab", extra_conf=conf)
    for k in conf:
        got = spark.conf.get(k, None)
        print(f"# conf {k} = {got}", flush=True)
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    queries["q1_pricing_summary"](spark, sf_dir).count()
    total = 0.0
    for name in names:
        fn = queries[name]
        runs: list[float] = []
        n = chk = 0
        for _ in range(runs_n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n, chk = force_eval_chk(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        runs.sort()
        total += runs[0]
        print(f"{name}: min={runs[0]:.3f}s med={runs[len(runs)//2]:.3f}s "
              f"max={runs[-1]:.3f}s rows={n} chk={chk}", flush=True)
    print(f"# total (min): {total:.3f}s over {len(names)} entries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
