"""One-off config A/B harness (round-15 optimization): run named
HEADLINE entries under bench_subset's protocol with extra session conf,
so a config candidate can be priced on the same box before touching
session.py. Spark sessions cannot change these confs live, so each
invocation is one side of the A/B; interleave invocations externally.

Usage:
  python tools/conf_ab.py --conf k=v [--conf k=v ...] [--runs=N] q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs_n = 3
    conf: dict[str, str] = {}
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs_n = int(a.split("=", 1)[1])
        elif a.startswith("--conf="):
            k, v = a.split("=", 2)[1:]
            conf[k] = v
        elif a.startswith("--conf"):
            pass
    # also accept --conf k=v as two tokens
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--conf" and i + 1 < len(argv):
            k, v = argv[i + 1].split("=", 1)
            conf[k] = v
            if argv[i + 1] in names:
                names.remove(argv[i + 1])
    from bench import force_eval_chk
    from opendata_gov_lt_mysql_import_spark.session import get_spark
    from opendata_gov_lt_mysql_import_spark.queries import all_queries
    import opendata_gov_lt_mysql_import_spark.queries_ml  # noqa: F401
    import opendata_gov_lt_mysql_import_spark.queries_sql  # noqa: F401

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="conf-ab", extra_conf=conf)
    for k, v in conf.items():
        got = spark.conf.get(k, None)
        print(f"# conf {k} = {got}", flush=True)
    queries = all_queries()
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
