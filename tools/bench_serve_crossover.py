"""Batched-vs-per-query serve crossover over the warm IVFADC index
(round-12 verdict item 3).

The single-query warm serve (`ann_ivfadc_warm_serve`) prunes the code
scan to ~nprobe/ncells of the files; the batched panel serve
(`ann_ivfadc_warm_panel_serve`) argues the flip QUALITATIVELY — a
diverse batch's probes cover all cells, so one full scan + broadcast
lookup tables beats Q pruned scans. This harness puts the crossover Q
on the record: for Q ∈ {1, 4, 16, 64} panel queries it times

- sequential: Q per-query serves, each a driver-side probe (collected
  16-row pivot table — serving-node scalar work) + manifest-pruned
  scan of the probed cells + broadcast ADC + TakeOrdered(10);
- batched: ONE scan of the code table with the Q×nprobe×32-row lookup
  tables broadcast and per-query member restriction through the
  (qid, pid) probe-pair join.

Expected shape: sequential cost ≈ Q × (fixed job overhead + pruned
scan), linear in Q; batched cost ≈ one full scan + per-query bounded
work, ~flat in Q. The crossover is where an operator should switch an
offline eval from per-query serving to the batched plan.

Both paths compute identical top-10s by construction (the panel serve's
oracle already proves the batched plan == per-query semantics); this
harness is timing-only and asserts result equality as a sanity check
at the smallest Q.

Usage: python tools/bench_serve_crossover.py
Merges a "serve_crossover" section into SCALING.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from opendata_gov_lt_mysql_import_spark.session import get_spark  # noqa: E402
from opendata_gov_lt_mysql_import_spark.sources.parquet import (  # noqa: E402
    load_table,
)
from opendata_gov_lt_mysql_import_spark.sources.snapshots import (  # noqa: E402
    read_snapshot,
    read_snapshot_pruned,
)

BASE = "/root/testdata/sf0.1"
QS = (1, 4, 16, 64)
RUNS = 2


def _serve_one(spark, dirs, qid, pivots, qe):
    """One per-query pruned serve: the `_ivfadc_serve` plan with the
    probe parameterized by (qid, qe) instead of the fixed vec-0 query."""
    from opendata_gov_lt_mysql_import_spark.queries_ml import (
        _pq_dist,
        _subspace_explode,
    )

    dists = sorted(
        (sum((qe[k] - pe[k]) * (qe[k] - pe[k]) for k in range(64)), pid)
        for pid, pe in pivots.items()
    )
    probed = [pid for _d, pid in dists[:2]]
    qres = spark.createDataFrame(
        [(pid, [qe[k] - pivots[pid][k] for k in range(64)]) for pid in probed],
        "pid long, qr array<double>",
    )
    rcb = read_snapshot(spark, dirs["codebook"], version=dirs["codebook_version"])
    qt = (
        _subspace_explode(qres, "qr", "sv")
        .join(F.broadcast(rcb), "m")
        .select("pid", "m", "cid", _pq_dist().alias("qd"))
    )
    codes = read_snapshot_pruned(
        spark,
        dirs["codes"],
        [("pid", "in", probed)],
        version=dirs["codes_base_version"],
    ).filter(F.col("vec_id") != qid)
    adc = (
        codes.join(F.broadcast(qt), ["pid", "m", "cid"])
        .groupBy("vec_id")
        .agg(
            F.max("pid").cast("long").alias("cell"),
            F.round(F.sum("qd"), 4).alias("adc_dist"),
        )
    )
    return [
        (qid, r["vec_id"], r["adc_dist"])
        for r in adc.orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(10)
        .collect()
    ]


def _serve_batched(spark, dirs, qids, cl):
    """The panel-serve plan restricted to ``qids``: one code-table scan,
    broadcast per-(query, cell) lookup tables, per-query member
    restriction through the (qid, pid) probe-pair join."""
    from opendata_gov_lt_mysql_import_spark.queries_ml import (
        _l2_col,
        _pq_dist,
        _subspace_explode,
    )

    piv0 = read_snapshot(spark, dirs["pivots"], version=dirs["pivots_version"])
    rcb = read_snapshot(spark, dirs["codebook"], version=dirs["codebook_version"])
    panel = spark.createDataFrame([(q,) for q in qids], "vec_id long")
    qs = cl.join(F.broadcast(panel), "vec_id").select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    w_probe = Window.partitionBy("qid").orderBy(F.asc("d"), F.asc("pid"))
    probe = (
        qs.crossJoin(F.broadcast(piv0))
        .select(
            "qid", "pid", "pe", "qe",
            _l2_col(F.col("qe"), F.col("pe")).alias("d"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= 2)
        .select("qid", "pid", "pe", "qe")
    )
    qres = probe.select(
        "qid", "pid",
        F.zip_with(F.col("qe"), F.col("pe"), lambda x, y: x - y).alias("qr"),
    )
    qtres = (
        _subspace_explode(qres, "qr", "sv")
        .join(F.broadcast(rcb), "m")
        .select("qid", "pid", "m", "cid", _pq_dist().alias("qd"))
    )
    codes = read_snapshot(
        spark, dirs["codes"], version=dirs["codes_base_version"]
    )
    w_adc = Window.partitionBy("qid").orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    return (
        codes.join(F.broadcast(probe.select("qid", "pid")), "pid")
        .filter(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(qtres), ["qid", "pid", "m", "cid"])
        .groupBy("qid", "vec_id")
        .agg(F.round(F.sum("qd"), 4).alias("adc_dist"))
        .withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id", "adc_dist")
    )


def main() -> None:
    from opendata_gov_lt_mysql_import_spark.queries_ml import (
        _audit_panel,
        _ivfadc_warm_dirs,
        _rescl_corpus,
    )

    spark = get_spark(app_name="bench-serve-crossover")
    dirs = _ivfadc_warm_dirs(spark, BASE)
    emb64 = load_table(spark, BASE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cl = _rescl_corpus(emb64, load_table(spark, BASE, "embeddings")
                       .filter(F.col("vec_id").between(1, 16))
                       .select(F.col("vec_id").alias("pid"),
                               F.col("embedding").cast("array<double>")
                               .alias("pe"))).localCheckpoint(eager=True)
    panel_ids = [r["vec_id"] for r in _audit_panel(emb64).collect()]
    pivots = {
        r["pid"]: list(r["pe"])
        for r in read_snapshot(spark, dirs["pivots"], version=dirs["pivots_version"]).collect()
    }
    qe_map = {
        r["vec_id"]: list(r["e"])
        for r in cl.join(
            F.broadcast(
                spark.createDataFrame(
                    [(q,) for q in panel_ids], "vec_id long"
                )
            ),
            "vec_id",
        ).collect()
    }

    # sanity: both paths agree at Q=1
    q0 = panel_ids[0]
    seq0 = _serve_one(spark, dirs, q0, pivots, qe_map[q0])
    bat0 = sorted(
        tuple(r) for r in _serve_batched(spark, dirs, [q0], cl).collect()
    )
    assert sorted(seq0) == bat0, (sorted(seq0)[:3], bat0[:3])

    results = {}
    for q_n in QS:
        qids = panel_ids[:q_n]
        t_seq_runs, t_bat_runs = [], []
        for _ in range(RUNS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            for qid in qids:
                _serve_one(spark, dirs, qid, pivots, qe_map[qid])
            t_seq_runs.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _serve_batched(spark, dirs, qids, cl).collect()
            t_bat_runs.append(time.perf_counter() - t0)
        t_seq, t_bat = min(t_seq_runs), min(t_bat_runs)
        results[f"Q{q_n}"] = {
            "t_sequential": round(t_seq, 3),
            "t_batched": round(t_bat, 3),
            "batched_speedup": round(t_seq / t_bat, 2),
        }
        print(
            f"# Q={q_n}: seq {t_seq:.2f}s batched {t_bat:.2f}s "
            f"(x{t_seq / t_bat:.2f})",
            file=sys.stderr,
        )

    xover = None
    for q_n in QS:
        if results[f"Q{q_n}"]["batched_speedup"] >= 1.0:
            xover = q_n
            break
    out = {
        "note": (
            "sequential = Q per-query pruned serves (driver-side probe "
            "+ manifest-pruned scan + broadcast ADC each); batched = "
            "one code-table scan with Q*nprobe*32-row lookup tables "
            "broadcast and per-query member restriction. crossover_q = "
            "smallest measured Q where batching wins; below it an "
            "operator should serve per-query, at or above it batch. "
            "sf0.1 warm index, min-of-2 interleaved."
        ),
        "queries": results,
        "crossover_q": xover,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json",
    )
    with open(path) as fh:
        merged = json.load(fh)
    merged["serve_crossover"] = out
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
