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


def test_token_budget_mixture_greedy_prefix(spark, sf_dir):
    """DoReMi-lite selection contract: per source, kept docs are exactly
    the greedy md5-ranked prefix whose running token sum fits the
    source's tiered budget — recomputed independently in Python."""
    import hashlib

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    kept = entrymod.queries()["token_budget_mixture"](spark, sf_dir).collect()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )

    # independent recomputation
    from collections import defaultdict

    ntok = {r["doc_id"]: len(r["text"].split()) if r["text"].strip() else 0 for r in docs}
    by_src = defaultdict(list)
    for r in docs:
        by_src[r["source"]].append(r["doc_id"])
    src_tokens = {s: sum(ntok[i] for i in ids) for s, ids in by_src.items()}
    tier = {s: int(s[3:]) % 4 + 1 for s in by_src}
    total, sum_tiers = sum(src_tokens.values()), sum(tier.values())
    budget = {s: (total // 2) * tier[s] // sum_tiers for s in by_src}

    expected = set()
    for s, ids in by_src.items():
        ids.sort(key=lambda i: (hashlib.md5(f"{i}#mix".encode()).hexdigest(), i))
        cum = 0
        for i in ids:
            cum += ntok[i]
            if cum <= budget[s]:
                expected.add(i)
    assert {r["doc_id"] for r in kept} == expected
    # budget is respected per source, and selection is non-trivial
    got_by_src = defaultdict(int)
    for r in kept:
        got_by_src[r["source"]] += r["n_tokens"]
    assert all(got_by_src[s] <= budget[s] for s in got_by_src)
    assert 0 < len(kept) < len(docs)
