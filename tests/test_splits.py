"""Deterministic hash-split operator tests (operators/splits.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.operators.splits import (
    hash_split,
    split_thresholds,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


class TestHashSplit:
    def test_proportions_and_determinism(self, spark):
        df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
        out = hash_split(df, "doc_id", WEIGHTS)
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        # md5 is uniform; 20k draws keep each share within ±2% absolute.
        assert abs(counts["train"] / 20000 - 0.8) < 0.02
        assert abs(counts["val"] / 20000 - 0.1) < 0.02
        assert abs(counts["test"] / 20000 - 0.1) < 0.02
        # identical second run — no RNG anywhere
        again = {(r.doc_id, r.split) for r in hash_split(df, "doc_id", WEIGHTS).collect()}
        assert {(r.doc_id, r.split) for r in out.collect()} == again

    def test_stable_under_append(self, spark):
        # assignments of existing ids must not move when the corpus grows
        small = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
        big = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.split for r in hash_split(small, "doc_id", WEIGHTS).collect()}
        b = {r.doc_id: r.split for r in hash_split(big, "doc_id", WEIGHTS).collect()}
        assert all(b[k] == v for k, v in a.items())

    def test_seed_changes_assignment(self, spark):
        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.split for r in hash_split(df, "doc_id", WEIGHTS, seed=1).collect()}
        b = {r.doc_id: r.split for r in hash_split(df, "doc_id", WEIGHTS, seed=2).collect()}
        assert any(a[k] != b[k] for k in a)

    def test_weights_normalized_and_exhaustive(self, spark):
        # relative weights (not summing to 1) normalize; every row lands
        df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
        out = hash_split(df, "doc_id", {"a": 3, "b": 1})
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts["a"] + counts["b"] == 3000
        assert abs(counts["a"] / 3000 - 0.75) < 0.03

    def test_zero_shuffle_plan(self, spark):
        df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
        out = hash_split(df, "doc_id", WEIGHTS)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_thresholds_monotone_hex(self):
        pairs = split_thresholds(WEIGHTS)
        assert [p[0] for p in pairs] == ["train", "val", "test"]
        hexes = [p[1] for p in pairs]
        assert all(len(h) == 32 for h in hexes)
        assert hexes == sorted(hexes)


class TestWeightedSample:
    def test_inclusion_tracks_weight(self, spark):
        """A weight-4 item must be sampled ~4x as often as a weight-1
        item across seeds (A-ES guarantee), and draws are deterministic
        per seed."""
        from pyspark.sql import functions as F

        from opendata_gov_lt_mysql_import_spark.operators.splits import (
            weighted_sample,
        )

        rows = [(i, 4.0 if i < 10 else 1.0) for i in range(110)]
        df = spark.createDataFrame(rows, "id long, w double").cache()
        df.count()
        heavy_hits = light_hits = 0
        for seed in range(40):
            picked = {
                r["id"] for r in weighted_sample(df, "w", 20, seed=seed).collect()
            }
            assert len(picked) == 20
            heavy_hits += sum(1 for i in picked if i < 10)
            light_hits += sum(1 for i in picked if i >= 10)
        # expected inclusion ratio per item: heavy ~4x light
        per_heavy = heavy_hits / 10
        per_light = light_hits / 100
        assert 2.5 < per_heavy / per_light < 6.0
        # determinism: same seed -> same sample
        s1 = {r["id"] for r in weighted_sample(df, "w", 20, seed=7).collect()}
        s2 = {r["id"] for r in weighted_sample(df, "w", 20, seed=7).collect()}
        assert s1 == s2

    def test_zero_weight_never_sampled(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.splits import (
            weighted_sample,
        )

        df = spark.createDataFrame(
            [(1, 0.0), (2, 1.0), (3, 1.0)], "id long, w double"
        )
        for seed in range(5):
            assert 1 not in {
                r["id"] for r in weighted_sample(df, "w", 2, seed=seed).collect()
            }


def test_split_by_dup_cluster_never_splits_a_cluster(spark, sf_dir):
    """The leakage guard itself: every member of a near-dup cluster must
    carry the SAME split label (one leaked paraphrase invalidates the
    eval set), and all three splits must be non-empty on the planted-
    duplicate corpus."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    df = entrymod.queries()["split_by_dup_cluster"](spark, sf_dir)
    per_cluster = df.groupBy("cluster").agg(
        F.countDistinct("split").alias("n_splits"),
        F.count(F.lit(1)).alias("n"),
    )
    assert per_cluster.filter("n_splits > 1").count() == 0
    # the planted +1000000 clones form multi-member clusters — the
    # invariant must be exercised, not vacuous
    assert per_cluster.filter("n > 1").count() > 0
    labels = {r["split"] for r in df.select("split").distinct().collect()}
    assert labels == {"train", "val", "test"}
