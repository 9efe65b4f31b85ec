"""One-off sf-scaling sensitivity run: times the most expensive headline
entries at sf0.1 and at a KEY-CONSISTENT 2x derivation of it, and writes
the ratios to SCALING.json (bench.py embeds that file into every
BENCH_r{N} line as ``scaling_appendix``).

Why derive instead of just unioning a copy: naive duplication makes
every key twice as hot (joins produce 4x pairs, dedup finds a twin for
every document), which measures the *distortion*, not the scaling. The
2x set therefore:

- offsets every key space by its max+1 so the second copy's FK edges
  land on the second copy (orders'->customer', lineitem'->orders'/
  part'/supplier'), keeping join fan-out linear;
- leaves the true dimensions (nation/region) fixed, as a real 2x
  ingest would;
- appends a per-document unique token to the copied texts so exact/
  near-dup structure stays comparable instead of every doc gaining a
  twin, and jitters copied embeddings deterministically for the same
  reason.

A broadcast/partial-agg plan should land near 2x wall-clock on 2x rows
(modulo fixed per-query overhead, which pushes the ratio BELOW 2 for
sub-second entries); a quadratic candidate generator would land near
4x. Single-process, interleaved min-of-2 — on a shared box the ratios
still carry noise; read them alongside the spread fields.

Usage: python tools/bench_scaling.py [n_queries]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opendata_gov_lt_mysql_import_spark.session import get_spark  # noqa: E402
from opendata_gov_lt_mysql_import_spark.queries import all_queries  # noqa: E402
import opendata_gov_lt_mysql_import_spark.queries_ml  # noqa: F401, E402
import opendata_gov_lt_mysql_import_spark.queries_sql  # noqa: F401, E402
from bench import force_eval  # noqa: E402

BASE = "/root/testdata/sf0.1"
DERIVED = "/tmp/spark_graft_sf0.2"

# r4's most expensive headline entries, covering the document corpus
# (explode/LSH/pipeline), the TPC-H star (scan/join/agg), and the
# percentile/window surface
TOP = [
    "tfidf_top_keywords",
    "ngram_jaccard_verify_lsh",
    "profile_orders",
    "corpus_prep_pipeline",
    "decontaminate_hits",
    "j3_mn_collect",
    "percentile_price",
    "minhash_lsh_pairs",
    "q3_top_revenue",
    "q1_pricing_summary",
    # round-5 heavy entries
    "matview_incremental_refresh",
    "w1_tree_closure_recursive",
    "q18_large_orders",
    "q10_returned_items",
    "dq_constraint_report",
    "events_gap_fill_hourly",
    "semantic_dedup_arrow",
    # round-5 fourth-wave heavy entries
    "incremental_neardup_lsh",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
]


def _write(df, name):
    df.write.mode("overwrite").parquet(os.path.join(DERIVED, f"{name}.parquet"))


def build_2x(spark) -> None:
    """Derive the 2x dataset (idempotent: skipped when already built)."""
    if os.path.exists(os.path.join(DERIVED, "_BUILT")):
        return
    shutil.rmtree(DERIVED, ignore_errors=True)
    os.makedirs(DERIVED)
    t = {}
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        t[name] = spark.read.parquet(os.path.join(BASE, f"{name}.parquet"))

    # key-space offsets (max+1 per key space, computed once)
    off = {
        "cust": t["customer"].agg(F.max("c_custkey")).collect()[0][0] + 1,
        "supp": t["supplier"].agg(F.max("s_suppkey")).collect()[0][0] + 1,
        "part": t["part"].agg(F.max("p_partkey")).collect()[0][0] + 1,
        "ord": t["orders"].agg(F.max("o_orderkey")).collect()[0][0] + 1,
        "doc": t["documents"].agg(F.max("doc_id")).collect()[0][0] + 1,
        "vec": t["embeddings"].agg(F.max("vec_id")).collect()[0][0] + 1,
        "ev": t["events"].agg(F.max("event_id")).collect()[0][0] + 1,
        "user": t["events"].agg(F.max("user_id")).collect()[0][0] + 1,
    }

    _write(t["region"], "region")
    _write(t["nation"], "nation")
    _write(
        t["customer"].unionByName(
            t["customer"].withColumn("c_custkey", F.col("c_custkey") + off["cust"])
        ),
        "customer",
    )
    _write(
        t["supplier"].unionByName(
            t["supplier"].withColumn("s_suppkey", F.col("s_suppkey") + off["supp"])
        ),
        "supplier",
    )
    _write(
        t["part"].unionByName(
            t["part"].withColumn("p_partkey", F.col("p_partkey") + off["part"])
        ),
        "part",
    )
    _write(
        t["orders"].unionByName(
            t["orders"]
            .withColumn("o_orderkey", F.col("o_orderkey") + off["ord"])
            .withColumn("o_custkey", F.col("o_custkey") + off["cust"])
        ),
        "orders",
    )
    _write(
        t["lineitem"].unionByName(
            t["lineitem"]
            .withColumn("l_orderkey", F.col("l_orderkey") + off["ord"])
            .withColumn("l_partkey", F.col("l_partkey") + off["part"])
            .withColumn("l_suppkey", F.col("l_suppkey") + off["supp"])
        ),
        "lineitem",
    )
    _write(
        t["events"].unionByName(
            t["events"]
            .withColumn("event_id", F.col("event_id") + off["ev"])
            .withColumn("user_id", F.col("user_id") + off["user"])
        ),
        "events",
    )
    _write(
        t["documents"].unionByName(
            t["documents"]
            .withColumn("doc_id", F.col("doc_id") + off["doc"])
            # unique suffix token: the copy is near- but not exact-dup,
            # so dedup output structure stays comparable
            .withColumn(
                "text",
                F.concat(F.col("text"), F.lit(" zz"), F.col("doc_id")),
            )
            .withColumn("n_chars", F.length("text"))
        ),
        "documents",
    )
    _write(
        t["embeddings"].unionByName(
            t["embeddings"]
            .withColumn("vec_id", F.col("vec_id") + off["vec"])
            .withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x: x
                    + ((F.col("vec_id") % 97).cast("float") * F.lit(1e-3)),
                ),
            )
        ),
        "embeddings",
    )
    open(os.path.join(DERIVED, "_BUILT"), "w").close()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else len(TOP)
    spark = get_spark(app_name="bench-scaling")
    build_2x(spark)
    queries = all_queries()
    queries["q1_pricing_summary"](spark, BASE).count()  # warm

    results = {}
    for name in TOP[:n]:
        fn = queries[name]
        t_base = t_2x = None
        for _ in range(2):  # interleaved min-of-2
            for which, sf_dir in (("base", BASE), ("2x", DERIVED)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                force_eval(fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                if which == "base":
                    t_base = dt if t_base is None else min(t_base, dt)
                else:
                    t_2x = dt if t_2x is None else min(t_2x, dt)
        results[name] = {
            "t_sf0.1": round(t_base, 4),
            "t_2x": round(t_2x, 4),
            "ratio": round(t_2x / t_base, 2),
        }
        print(f"# {name}: {t_base:.3f}s -> {t_2x:.3f}s "
              f"(x{t_2x / t_base:.2f})", file=sys.stderr)

    out = {
        "note": (
            "2x-derived dataset (key-offset copies, fixed dims, "
            "perturbed texts/embeddings); ratio ~<=2 = linear plan, "
            "~4 = quadratic candidate generation. Single shared box, "
            "min-of-2 interleaved."
        ),
        "base": "sf0.1",
        "data_scale": 2.0,
        "queries": results,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
