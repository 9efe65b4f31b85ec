"""Model-based randomized test for incremental materialized aggregates:
random interleavings of source appends, compactions, redundant
refreshes, and reads must keep the view equal to a driver-side dict
model of the full aggregate. Deterministic seeds — failures replay."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.plans.matview import (
    AggSpec,
    IncrementalAggregate,
)
from opendata_gov_lt_mysql_import_spark.sources.snapshots import (
    commit_snapshot,
    compact_snapshot,
    snapshot_history,
)

KEYS = ["a", "b", "c", "d"]


def _model_add(model: dict, rows: list[tuple[str, int]]) -> None:
    for k, cents in rows:
        n, tot, lo, hi = model.get(k, (0, 0, None, None))
        model[k] = (
            n + 1,
            tot + cents,
            cents if lo is None else min(lo, cents),
            cents if hi is None else max(hi, cents),
        )


@pytest.mark.parametrize("seed", [11, 47])
def test_random_pipeline_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    mv = IncrementalAggregate(
        source_dir=str(tmp_path / "src"),
        view_dir=str(tmp_path / "view"),
        group_cols=["k"],
        aggs=[
            AggSpec("n", "count"),
            AggSpec("total", "sum", "cents"),
            AggSpec("lo", "min", "cents"),
            AggSpec("hi", "max", "cents"),
        ],
    )
    model: dict = {}
    refreshes = 0
    for step in range(10):
        op = rng.choice(["append", "append", "refresh", "compact", "noop_refresh"])
        if op == "append":
            rows = [
                (rng.choice(KEYS), rng.randint(-500, 500))
                for _ in range(rng.randint(1, 6))
            ]
            commit_snapshot(
                spark.createDataFrame(rows, "k string, cents long"), mv.source_dir
            )
            _model_add(model, rows)
        elif op == "compact" and snapshot_history(mv.source_dir):
            compact_snapshot(spark, mv.source_dir, target_files=1)
        elif op in ("refresh", "noop_refresh"):
            before = mv.materialized_through()
            mv.refresh(spark)
            refreshes += 1
            if op == "noop_refresh":
                mv.refresh(spark)  # idempotent per source version
            if snapshot_history(mv.source_dir):
                assert mv.is_fresh()
                got = {
                    r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
                    for r in mv.read(spark).collect()
                }
                assert got == model, f"seed={seed} step={step} after={before}"
    # final reconciliation
    if snapshot_history(mv.source_dir):
        mv.refresh(spark)
        got = {
            r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
            for r in mv.read(spark).collect()
        }
        assert got == model
        # and the view agrees with a one-shot aggregate over the source
        from opendata_gov_lt_mysql_import_spark.sources.snapshots import read_snapshot

        oneshot = {
            r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
            for r in read_snapshot(spark, mv.source_dir)
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("cents").alias("total"),
                F.min("cents").alias("lo"),
                F.max("cents").alias("hi"),
            )
            .collect()
        }
        assert got == oneshot
