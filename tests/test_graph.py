"""PageRank invariants (operators/graph.py): mass conservation on
undirected graphs, convergence monotonicity, agreement with the
oracle-checked single-iteration twin, and known-value checks on a
hand-built graph."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.operators.graph import pagerank
from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table


def _ranks_dict(df):
    return {r["node"]: r["rank"] for r in df.collect()}


class TestPageRank:
    def test_symmetric_pair_is_fixed_point(self, spark):
        # two nodes pointing at each other: rank 1.0 each is the exact
        # fixed point, every iteration must reproduce it
        e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
        for k in (1, 3):
            got = _ranks_dict(pagerank(e, k=k))
            assert got == {1: pytest.approx(1.0), 2: pytest.approx(1.0)}

    def test_star_graph_known_values(self, spark):
        # directed star 1->2, 1->3: after one iteration
        # rank(2) = rank(3) = 0.15 + 0.85 * (1/2); rank(1) = 0.15
        e = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
        got = _ranks_dict(pagerank(e, k=1))
        assert got[1] == pytest.approx(0.15)
        assert got[2] == pytest.approx(0.15 + 0.85 * 0.5)
        assert got[3] == pytest.approx(0.15 + 0.85 * 0.5)

    def test_mass_conservation_undirected(self, spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        e = li.select(
            (F.col("l_partkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        ranks = pagerank(e, k=3, undirected=True)
        row = ranks.agg(
            F.count(F.lit(1)).alias("n"), F.sum("rank").alias("mass")
        ).collect()[0]
        # undirected => no dangling nodes => total mass fixed at N
        assert row["mass"] == pytest.approx(row["n"], rel=1e-9)

    def test_convergence_monotone(self, spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        e = li.select(
            (F.col("l_partkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )

        r1 = _ranks_dict(pagerank(e, k=1, undirected=True))
        r2 = _ranks_dict(pagerank(e, k=2, undirected=True))
        r3 = _ranks_dict(pagerank(e, k=3, undirected=True))
        d12 = sum(abs(r2[n] - r1[n]) for n in r1)
        d23 = sum(abs(r3[n] - r2[n]) for n in r2)
        assert d23 < d12  # damping contracts the iteration

    def test_k1_matches_one_iter_query(self, spark, sf_dir):
        """pagerank(k=1) on the directed part->supplier graph must equal
        the oracle-checked pagerank_one_iter on supplier nodes."""
        import __spark_entry__ as entrymod

        li = load_table(spark, sf_dir, "lineitem")
        e = li.select(
            (F.col("l_partkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        mine = {
            (r["node"] - 1) // 2: r["rank"]
            for r in pagerank(e, k=1).filter(F.col("node") % 2 == 1).collect()
        }
        ref = {
            r["suppkey"]: r["pagerank"]
            for r in entrymod.queries()["pagerank_one_iter"](
                spark, sf_dir
            ).collect()
        }
        assert set(mine) == set(ref)
        for kk in ref:
            assert mine[kk] == pytest.approx(ref[kk], rel=1e-9)

    def test_k_validation(self, spark):
        e = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError):
            pagerank(e, k=0)

    def test_fixed_point_overflow_guard(self, spark):
        """Past the documented headroom, Spark's non-ANSI BIGINT
        85*inflow would silently wrap while a HUGEINT-promoting oracle
        would not — the divergence must be a clear error up front
        (round-6 advisory), and the error must name a workable scale."""
        from opendata_gov_lt_mysql_import_spark.operators.graph import (
            pagerank_fixed_point,
        )

        e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        # 3 nodes at an absurd scale: 85 * 3 * 2^61 overflows BIGINT
        with pytest.raises(ValueError, match="fixed-point overflow"):
            pagerank_fixed_point(e, k=1, scale=2**61)
        # same graph at the documented scale still runs
        assert pagerank_fixed_point(e, k=1, scale=10**12).count() == 3
