"""Subset bench — bench.py's exact methodology over named entries.

Usage: python tools/bench_subset.py <query> [<query> ...] [--runs=N]

Runs the named HEADLINE entries with the same protocol as bench.py
(shared session, clearCache between runs, min-of-3 wall clock through
the force_eval_chk full-evaluation checksum) so that optimization
iterations can measure one query family in ~seconds instead of a full
150-entry sweep. Prints per-entry min/med/max and the result checksum —
the checksum is the result-identity guard: before/after runs of an
optimization must print the same chk.

Not a replacement for bench.py: the committed record only ever comes
from `python bench.py --commit`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import force_eval_chk  # noqa: E402
from opendata_gov_lt_mysql_import_spark.session import get_spark  # noqa: E402
from opendata_gov_lt_mysql_import_spark.queries import all_queries  # noqa: E402
import opendata_gov_lt_mysql_import_spark.queries_ml  # noqa: F401, E402
import opendata_gov_lt_mysql_import_spark.queries_sql  # noqa: F401, E402


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs_n = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs_n = int(a.split("=", 1)[1])
    if not names:
        print(__doc__)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-subset")
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    # same warmup as bench.py
    queries["q1_pricing_summary"](spark, sf_dir).count()
    total = 0.0
    for name in names:
        fn = queries[name]
        runs: list[float] = []
        n = chk = 0
        for _ in range(runs_n):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"subset:{name}")
            t0 = time.perf_counter()
            n, chk = force_eval_chk(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        runs.sort()
        total += runs[0]
        print(
            f"{name}: min={runs[0]:.3f}s med={runs[len(runs)//2]:.3f}s "
            f"max={runs[-1]:.3f}s rows={n} chk={chk}"
        )
    print(f"# subset total (min): {total:.3f}s over {len(names)} entries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
