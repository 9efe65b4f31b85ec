"""Model-based randomized test for the snapshot table format: random
sequences of append / overwrite / merge / delete / compact are executed
against Spark AND against a plain python dict model; after every
operation the table must equal the model, and every historical version
must still time-travel to its recorded model state (copy-on-write
invariant). Deterministic seeds — failures replay exactly."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.sources.snapshots import (
    commit_snapshot,
    compact_snapshot,
    delete_snapshot_rows,
    merge_snapshot,
    read_snapshot,
    snapshot_history,
    vacuum,
)


def _df(spark, rows):
    if not rows:
        return spark.createDataFrame([], "id long, v long")
    return spark.createDataFrame(sorted(rows.items()), "id long, v long")


def _table_state(spark, t, version=None):
    return {
        r["id"]: r["v"]
        for r in read_snapshot(spark, t, version=version).collect()
    }


@pytest.mark.parametrize("seed", [7, 23, 91])
# `full` tier (round-16): see pytest.ini — excluded from the default driver-window run
@pytest.mark.full
def test_random_op_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = str(tmp_path / f"tbl{seed}")
    model: dict[int, int] = {}
    next_id = 0
    history: dict[int, dict[int, int]] = {}  # version -> model snapshot

    def fresh_ids(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        next_id += n
        return ids

    # seed version
    rows = {i: rng.randrange(1000) for i in fresh_ids(rng.randint(5, 30))}
    v = commit_snapshot(_df(spark, rows), t, cluster_by=["id"], target_files=3)
    model.update(rows)
    history[v] = dict(model)

    for step in range(10):
        op = rng.choice(
            ["append", "merge", "delete", "overwrite", "compact", "vacuum"]
        )
        if op == "vacuum":
            vacuum(t, keep_last=2, orphan_grace_seconds=0)
            # versions older than the last 2 are gone; stop checking them
            for gone in [hv for hv in history if hv <= v - 2]:
                del history[gone]
            assert _table_state(spark, t) == model, f"seed={seed} vacuum"
            continue
        if op == "append":
            rows = {
                i: rng.randrange(1000) for i in fresh_ids(rng.randint(1, 20))
            }
            v = commit_snapshot(_df(spark, rows), t)
            model.update(rows)
        elif op == "overwrite":
            rows = {
                i: rng.randrange(1000) for i in fresh_ids(rng.randint(1, 15))
            }
            v = commit_snapshot(_df(spark, rows), t, mode="overwrite")
            model = dict(rows)
        elif op == "merge":
            updates = {
                k: rng.randrange(1000)
                for k in rng.sample(
                    sorted(model), min(len(model), rng.randint(1, 5))
                )
            } if model else {}
            inserts = {
                i: rng.randrange(1000) for i in fresh_ids(rng.randint(0, 5))
            }
            src = {**updates, **inserts}
            if not src:
                continue
            v = merge_snapshot(spark, t, _df(spark, src), on="id")
            model.update(src)
        elif op == "delete":
            if not model:
                continue
            lo = rng.randrange(next_id)
            hi = lo + rng.randint(0, next_id // 2)
            new_v = delete_snapshot_rows(
                spark, t, [("id", ">=", lo), ("id", "<=", hi)]
            )
            model = {k: x for k, x in model.items() if not (lo <= k <= hi)}
            if new_v == v:
                continue  # provably-no-op delete publishes nothing
            v = new_v
        else:  # compact
            v = compact_snapshot(
                spark, t, target_files=rng.randint(1, 3), cluster_by=["id"]
            )
        history[v] = dict(model)
        assert _table_state(spark, t) == model, f"seed={seed} step={step} {op}"

    # every surviving version still time-travels to its recorded state
    for hv, snap in history.items():
        assert _table_state(spark, t, version=hv) == snap, (
            f"seed={seed} version={hv} time-travel drifted"
        )
    # history endpoints are consistent
    hist = snapshot_history(t)
    assert [h["version"] for h in hist] == sorted(h["version"] for h in hist)
    # row-level sanity via an aggregate (exercises the scan path too)
    total = read_snapshot(spark, t).agg(F.sum("v")).collect()[0][0]
    assert total == (sum(model.values()) if model else None)
