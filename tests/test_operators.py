"""Operator-level tests: joins, hierarchy closure, dedup, similarity."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.operators.dedup import (
    blocked_jaccard_pairs,
    exact_dedup,
    minhash_candidate_pairs,
    simhash_candidate_pairs,
)
from opendata_gov_lt_mysql_import_spark.operators.hierarchy import (
    children_lists,
    tree_closure,
)
from opendata_gov_lt_mysql_import_spark.operators.joins import (
    broadcast_left_join_with_defaults,
    exists_split,
    stale_rows,
)
from opendata_gov_lt_mysql_import_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
)


def _reference_tree(spark):
    """The reference test's 7-node, 3-level category tree
    (tests/test_odgovlt.py:180-220): roots 1,2; 3→1, 4→2; 5→3, 6→4, 7→4."""
    rows = [
        (1, 0, "Testas1"),
        (2, 0, "Testas2"),
        (3, 1, "Testas3"),
        (4, 2, "Testas4"),
        (5, 3, "Testas5"),
        (6, 4, "Testas6"),
        (7, 4, "Testas7"),
    ]
    return spark.createDataFrame(rows, "id int, parent_id int, name string")


class TestTreeClosure:
    def test_reference_tree_shape(self, spark):
        closure = tree_closure(
            _reference_tree(spark), root_parent=0, name_col="name"
        ).collect()
        by_id = {r["id"]: r for r in closure}
        assert len(by_id) == 7
        assert by_id[1]["depth"] == 1 and by_id[1]["root_id"] == 1
        assert by_id[3]["depth"] == 2 and by_id[3]["root_id"] == 1
        assert by_id[5]["depth"] == 3 and by_id[5]["root_id"] == 1
        assert by_id[7]["depth"] == 3 and by_id[7]["root_id"] == 2
        assert by_id[5]["path"] == [1, 3, 5]
        assert by_id[7]["name_path"] == ["Testas2", "Testas4", "Testas7"]

    def test_children_lists(self, spark):
        out = {
            r["parent_id"]: r["children"]
            for r in children_lists(
                _reference_tree(spark), "id", "parent_id", F.col("name")
            ).collect()
        }
        assert out[0] == ["Testas1", "Testas2"]
        assert out[4] == ["Testas6", "Testas7"]

    def test_deep_chain(self, spark):
        # 10-level chain: node i has parent i-1
        rows = [(i, i - 1) for i in range(1, 11)]
        df = spark.createDataFrame(rows, "id int, parent_id int")
        closure = tree_closure(df, root_parent=0)
        assert closure.count() == 10
        assert closure.agg(F.max("depth")).first()[0] == 10

    def test_recursive_cte_matches_manual_loop(self, spark):
        """Spark 4.1 native WITH RECURSIVE produces the same closure as
        the iterative self-join operator (the two W1 forms must agree)."""
        tree = _reference_tree(spark)
        manual = {
            (r["id"], r["root_id"], r["depth"])
            for r in tree_closure(tree, root_parent=0).collect()
        }
        tree.createOrReplaceTempView("_rec_tree")
        sql = {
            (r["id"], r["root_id"], r["depth"])
            for r in spark.sql(
                """
                WITH RECURSIVE walk AS (
                    SELECT id, id AS root_id, 1 AS depth
                    FROM _rec_tree WHERE parent_id = 0
                    UNION ALL
                    SELECT t.id, w.root_id, w.depth + 1
                    FROM _rec_tree t JOIN walk w ON t.parent_id = w.id
                )
                SELECT * FROM walk
                """
            ).collect()
        }
        assert manual == sql



class TestJoins:
    def test_left_join_defaults(self, spark):
        fact = spark.createDataFrame([(1, 10), (2, 20), (3, 99)], "id int, dim_id int")
        dim = spark.createDataFrame([(10, "a"), (20, "b")], "dim_id int, name string")
        out = broadcast_left_join_with_defaults(
            fact, dim, on=fact["dim_id"] == dim["dim_id"], defaults={"name": "Unknown"}
        )
        got = {r["id"]: r["name"] for r in out.collect()}
        assert got == {1: "a", 2: "b", 3: "Unknown"}

    def test_exists_split(self, spark):
        incoming = spark.createDataFrame([(1,), (2,), (3,)], "k int")
        existing = spark.createDataFrame([(2,), (3,), (4,)], "k int")
        create, present = exists_split(incoming, existing, on="k")
        assert sorted(r["k"] for r in create.collect()) == [1]
        assert sorted(r["k"] for r in present.collect()) == [2, 3]

    def test_stale_rows_with_ownership(self, spark):
        existing = spark.createDataFrame(
            [(1, "IVPK IRS"), (2, "other"), (3, "IVPK IRS")], "k int, owner string"
        )
        incoming = spark.createDataFrame([(1,)], "k int")
        out = stale_rows(
            existing, incoming, on="k", ownership_filter=F.col("owner") == "IVPK IRS"
        )
        assert sorted(r["k"] for r in out.collect()) == [3]


class TestDedup:
    def _docs(self, spark):
        base = [
            (1, "the quick brown fox jumps over the lazy dog again and again", "g1"),
            (2, "the quick brown fox jumps over the lazy dog again and again", "g1"),
            (3, "the quick brown fox jumps over the lazy cat again and again", "g1"),
            (4, "completely different text about spark query engines at scale", "g1"),
        ]
        return spark.createDataFrame(base, "id long, text string, grp string")

    def test_exact_dedup_keeps_min_id(self, spark):
        out = exact_dedup(self._docs(spark), "text", "id")
        assert sorted(r["id"] for r in out.collect()) == [1, 3, 4]

    def test_minhash_finds_exact_dup(self, spark):
        pairs = minhash_candidate_pairs(
            self._docs(spark), "text", "id", min_jaccard_est=0.9,
            dropped_out=[],
        ).collect()
        assert any(r["id_a"] == 1 and r["id_b"] == 2 for r in pairs)
        est = {(r["id_a"], r["id_b"]): r["jaccard_est"] for r in pairs}
        assert est[(1, 2)] == 1.0

    def test_minhash_near_dup_detected_far_pair_excluded(self, spark):
        pairs = minhash_candidate_pairs(
            self._docs(spark), "text", "id", min_jaccard_est=0.3,
            dropped_out=[],
        ).collect()
        keys = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 3) in keys  # one-word-change near-dup
        assert (1, 4) not in keys and (3, 4) not in keys

    def test_incremental_dedup_drops_history_and_batch_dups(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            incremental_exact_dedup,
        )
        from pyspark.sql import functions as F

        hist = spark.createDataFrame(
            [("seen before",)], "text string"
        ).select(F.md5("text").alias("fp"))
        batch = spark.createDataFrame(
            [
                (10, "seen before"),     # dup of history -> dropped
                (11, "fresh text"),      # kept
                (12, "fresh text"),      # in-batch dup -> dropped
                (13, "other fresh"),     # kept
            ],
            "id long, text string",
        )
        out = incremental_exact_dedup(batch, hist, "text", "id")
        assert sorted(r.id for r in out.collect()) == [11, 13]

    def test_incremental_neardup_short_and_empty_docs_match_oracle_semantics(self, spark):
        """ADVICE r5 claimed short (<n-token) docs silently drop from the
        Spark signature path while the DuckDB oracle emits a partial
        gram. Empirically FALSE — word_ngrams falls back to the whole
        token stream via greatest(count - n + 1, 1) and concat_ws skips
        the null tail, so a 1-2-token doc yields the same partial gram
        as the oracle's list-slice, and even an EMPTY doc yields one ""
        gram on both engines. This pins that: identical short/empty docs
        across batch and history MUST collide with a full 16/16 match
        (i.e. they are near-dup-gated, not silently admitted)."""
        from pyspark.sql import functions as F

        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            incremental_minhash_neardup,
            minhash_history_index,
        )

        hist = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "hi"), (3, ""), (4, "one two")],
            "doc_id long, text string",
        )
        batch = hist.filter(F.col("doc_id").isin(2, 3, 4)).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
        idx = minhash_history_index(hist, "text", "doc_id", n_gram=3, k=16, bands=8)
        out = {
            (r["new_id"], r["hist_id"]): r["n_match"]
            for r in incremental_minhash_neardup(
                batch, idx, "text", "doc_id", n_gram=3, k=16, bands=8
            ).collect()
        }
        assert out[(1000002, 2)] == 16   # 1-token doc
        assert out[(1000003, 3)] == 16   # empty doc
        assert out[(1000004, 4)] == 16   # 2-token doc (< n_gram)

    def test_minhash_md5_exact_dup_full_match(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            minhash_md5_pairs,
        )

        pairs = {
            (r.id_a, r.id_b): r.n_match
            for r in minhash_md5_pairs(self._docs(spark), "text", "id").collect()
        }
        # identical docs share every signature component
        assert pairs[(1, 2)] == 16
        # one-word-change near-dup collides in some band with high overlap
        assert pairs.get((1, 3), 0) >= 8
        # the unrelated doc never pairs with anything
        assert all(4 not in k for k in pairs)

    def test_simhash_exact_dup_hamming_zero(self, spark):
        for impl in ("arrow", "expr"):
            pairs = simhash_candidate_pairs(
                self._docs(spark), "text", "id", max_hamming=3, impl=impl
            )
            got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
            assert got.get((1, 2)) == 0, impl

    def test_simhash_md5_exact_dup_hamming_zero(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            simhash_md5_pairs,
        )

        pairs = {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_md5_pairs(self._docs(spark), "text", "id").collect()
        }
        assert pairs[(1, 2)] == 0  # identical docs -> identical fingerprints

    def test_blocked_jaccard_exact_values(self, spark):
        out = blocked_jaccard_pairs(
            self._docs(spark), "text", "id", "grp", n=2, min_jaccard=0.1
        )
        vals = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
        assert vals[(1, 2)] == 1.0
        assert 0.5 < vals[(1, 3)] < 1.0

    def test_jaccard_verify_pairs_exact_values(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            jaccard_verify_pairs,
        )

        docs = self._docs(spark)
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
        )
        out = jaccard_verify_pairs(docs, pairs, "text", "id", n=2, min_jaccard=0.1)
        vals = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
        # same exact Jaccard as the blocked form for the supplied pairs
        assert vals[(1, 2)] == 1.0
        assert 0.5 < vals[(1, 3)] < 1.0
        assert (1, 4) not in vals  # below threshold → dropped

    def test_jaccard_verify_pairs_materialized_flag_identical(self, spark):
        """round-16: ``pairs_materialized=True`` (the caller attests a
        distinct, checkpointed pair set, so the verifier skips its own
        redundant dedup + checkpoint) must return the identical result
        — and its plan must carry no extra exchange of the pair set."""
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            jaccard_verify_pairs,
        )

        docs = self._docs(spark)
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
        ).localCheckpoint(eager=True)
        base = jaccard_verify_pairs(
            docs, pairs, "text", "id", n=2, min_jaccard=0.1
        )
        fast = jaccard_verify_pairs(
            docs, pairs, "text", "id", n=2, min_jaccard=0.1,
            pairs_materialized=True,
        )
        key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
        assert sorted(map(key, base.collect())) == sorted(
            map(key, fast.collect())
        )
        vals = {key(r): r["jaccard"] for r in fast.collect()}
        assert vals[(1, 2)] == 1.0

    def test_grams_verify_on_missing_modes(self, spark):
        """Index/scrub desync contract (round-13 advisory): a pair id
        absent from the gram index is silently dropped under the
        default ``on_missing='drop'`` (inner-join semantics, pinned
        here so a behavior change is loud) and raises under
        ``on_missing='error'``."""
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            gram_hash_index,
            jaccard_verify_pairs_grams,
        )

        docs = self._docs(spark)
        # desynced index: id=3 shingled but never folded in
        index = gram_hash_index(docs.filter("id != 3"), "text", "id", n=2)
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3)], "id_a long, id_b long"
        )
        dropped = jaccard_verify_pairs_grams(index, pairs, min_jaccard=0.1)
        vals = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dropped.collect()}
        assert vals == {(1, 2): 1.0}  # (1,3) silently gone — the pinned hazard
        import pytest as _pytest

        loud = jaccard_verify_pairs_grams(
            index, pairs, min_jaccard=0.1, on_missing="error"
        )
        with _pytest.raises(Exception) as exc:
            loud.collect()
        assert "gram index missing id" in str(exc.value), exc.value
        with _pytest.raises(ValueError):
            jaccard_verify_pairs_grams(index, pairs, on_missing="bogus")
        # full coverage → error mode is value-identical to drop mode
        full = gram_hash_index(docs, "text", "id", n=2)
        a = jaccard_verify_pairs_grams(full, pairs, min_jaccard=0.1)
        b = jaccard_verify_pairs_grams(
            full, pairs, min_jaccard=0.1, on_missing="error"
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_candidates_only_verify_equals_exact_blocked(self, spark, sf_dir):
        """The 100 TB pipeline shape (LSH generate → exact verify) returns
        the same high-similarity pairs as the quadratic blocked form on the
        planted-duplicate corpus."""
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            jaccard_verify_pairs,
            minhash_candidate_pairs,
        )
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            _documents_with_dups,
        )

        d = _documents_with_dups(spark, sf_dir)
        cands = minhash_candidate_pairs(
            d, "text", "doc_id", min_jaccard_est=0.3, max_bucket_size=200,
            dropped_out=[],
        )
        via_lsh = jaccard_verify_pairs(
            d, cands, text_col="text", id_col="doc_id", n=2, min_jaccard=0.5
        )
        # exact form: all-pairs within a single block (whole corpus — only
        # feasible at test scale, which is exactly the point)
        exact = blocked_jaccard_pairs(
            d.withColumn("_b", F.lit(1)),
            "text",
            "doc_id",
            "_b",
            n=2,
            min_jaccard=0.5,
        )
        lsh_pairs = {(r["id_a"], r["id_b"]) for r in via_lsh.collect()}
        exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
        assert lsh_pairs == exact_pairs
        assert len(exact_pairs) >= 100  # the planted clones are all found

    def test_connected_components_chain_and_triangle(self, spark):
        """A~B~C chains into one cluster labeled by the min id; isolated
        pair keeps its own; convergence needs diameter sweeps."""
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            connected_components,
            keep_one_per_cluster,
        )

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
            "id_a long, id_b long",
        )
        got = {r["id"]: r["cluster"] for r in connected_components(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in [1, 2, 3, 4, 10, 11, 20, 21, 22, 99]],
            "doc_id long, text string",
        )
        kept = sorted(
            r["doc_id"]
            for r in keep_one_per_cluster(
                docs, connected_components(pairs), "doc_id"
            ).collect()
        )
        assert kept == [1, 10, 20, 99]  # one per component + the singleton

    def test_pair_generation_equals_band_semantics_randomized(self, spark):
        """The round-6 single-agg pair enumeration must emit EXACTLY the
        pairs LSH banding semantics define: two docs pair iff some band
        of their signatures is equal. Checked against a brute-force
        O(n^2) comparison over the collected signatures themselves (not
        over Spark's bucket hash), across seeded random corpora — so a
        bucket-key collision bug, a slice off-by-one, or a dropped
        bucket would all surface as set inequality."""
        import random

        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            minhash_candidate_pairs,
            minhash_signatures_arrow,
        )

        words = ["spark", "table", "row", "scan", "merge", "key", "agg"]
        for seed in (7, 23, 99):
            rng = random.Random(seed)
            rows = []
            for i in range(40):
                base = [rng.choice(words) for _ in range(rng.randint(3, 12))]
                rows.append((i, " ".join(base)))
                if rng.random() < 0.3:  # planted near-dup
                    mut = list(base)
                    mut[rng.randrange(len(mut))] = rng.choice(words)
                    rows.append((100 + i, " ".join(mut)))
            df = spark.createDataFrame(rows, "id long, text string")

            n_hashes, n_bands, rpb = 64, 16, 4
            sigs = {
                r["id"]: tuple(r["sig"])
                for r in minhash_signatures_arrow(
                    df, "text", "id", n_hashes, 9
                ).collect()
            }
            ids = sorted(sigs)
            expected = set()
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    a, b = ids[x], ids[y]
                    if any(
                        sigs[a][k * rpb:(k + 1) * rpb]
                        == sigs[b][k * rpb:(k + 1) * rpb]
                        for k in range(n_bands)
                    ):
                        expected.add((a, b))
            got = {
                (r["id_a"], r["id_b"])
                for r in minhash_candidate_pairs(
                    df, "text", "id", min_jaccard_est=0.0, dropped_out=[]
                ).collect()
            }
            assert got == expected, f"seed {seed}: {got ^ expected}"

    def test_lsh_bucket_cap_bounds_degenerate_corpus(self, spark):
        """200 identical docs land in one bucket per band; with a cap the
        self-join is bounded and the dropped buckets are reported."""
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            minhash_candidate_pairs,
            simhash_candidate_pairs,
        )

        rows = [(i, "identical boilerplate text repeated everywhere") for i in range(200)]
        df = spark.createDataFrame(rows, "id long, text string")

        uncapped = minhash_candidate_pairs(
            df, "text", "id", min_jaccard_est=0.5, max_bucket_size=None
        )
        assert uncapped.count() == 200 * 199 // 2  # quadratic blow-up

        dropped: list = []
        capped = minhash_candidate_pairs(
            df, "text", "id", min_jaccard_est=0.5, max_bucket_size=50,
            dropped_out=dropped,
        )
        assert capped.count() == 0  # every bucket was hot → nothing joined
        hot = dropped[0].collect()
        assert len(hot) > 0 and all(r["bucket_size"] == 200 for r in hot)

    def test_cap_without_report_warns(self, spark):
        """Round-7 advisory: a bucket cap with no dropped_out report must
        announce itself at plan-build time (and stay silent when either
        the report is requested or capping is disabled)."""
        import warnings as _w

        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            minhash_candidate_pairs,
        )

        df = spark.createDataFrame([(1, "a b c")], "id long, text string")
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            minhash_candidate_pairs(df, "text", "id")  # default cap, no report
        assert any("dropped without a report" in str(r.message) for r in rec)

        for kw in ({"dropped_out": []}, {"max_bucket_size": None}):
            with _w.catch_warnings(record=True) as rec:
                _w.simplefilter("always")
                minhash_candidate_pairs(df, "text", "id", **kw)
            assert not [r for r in rec if issubclass(r.category, UserWarning)]

        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            simhash_candidate_pairs,
        )

        hot_df = spark.createDataFrame(
            [(i, "identical boilerplate text repeated everywhere") for i in range(200)],
            "id long, text string",
        )
        dropped_sh: list = []
        capped_sh = simhash_candidate_pairs(
            hot_df, "text", "id", max_hamming=3, max_bucket_size=50,
            dropped_out=dropped_sh,
        )
        assert capped_sh.count() == 0  # every bucket hot -> nothing joined
        hot = dropped_sh[0].collect()
        assert len(hot) > 0 and all(r["bucket_size"] == 200 for r in hot)


class TestTextCleaning:
    def test_gopher_empty_text_tokenization_parity(self, spark):
        """Degenerate-input twin agreement (round-6 advisory): Spark's
        tokens('') is an EMPTY array while DuckDB's str_split_regex('')
        is [''] — the gopher oracle guards with CASE WHEN trim='' THEN
        []; pin both engines at n_words=0 for empty/space-only input
        (both engines' trim() strips SPACES only, so space-trimmed
        emptiness is the exact boundary the guard covers)."""
        import duckdb

        from opendata_gov_lt_mysql_import_spark.operators.textanalysis import (
            tokens,
        )

        for raw in ("", "   "):
            n_duck = duckdb.sql(
                "SELECT len(CASE WHEN trim(?) = '' THEN []::VARCHAR[] "
                "ELSE str_split_regex(trim(?), '\\s+') END)",
                params=[raw, raw],
            ).fetchone()[0]
            n_spark = (
                spark.range(1)
                .select(F.size(tokens(F.lit(raw))).alias("n"))
                .first()["n"]
            )
            assert n_duck == n_spark == 0, raw

    def test_clean_and_verdict(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.textanalysis import (
            clean_text,
            quality_projection,
            quality_verdict,
        )

        df = spark.createDataFrame(
            [
                (1, "see https://example.com/x?y=1 and\x00\x07  more\t text"),
                (2, "ok"),  # 1 token → too_few_tokens
                (3, "1234 5678 9012 3456 7890 99"),  # digit-heavy
                (4, "plain sentence with enough ordinary words here"),
            ],
            "doc_id long, text string",
        )
        cleaned = {r["doc_id"]: r["c"] for r in df.select("doc_id", clean_text(F.col("text")).alias("c")).collect()}
        assert cleaned[1] == "see and more text"
        verdicts = {
            r["doc_id"]: r["v"]
            for r in df.select(
                "doc_id", *quality_projection(F.col("text"))
            ).select("doc_id", quality_verdict().alias("v")).collect()
        }
        assert verdicts[2] == "too_few_tokens"
        assert verdicts[3] == "too_many_digits"
        assert verdicts[4] == "keep"


class TestSimilarity:
    def test_cosine_topk_exact(self, spark, sf_dir):
        from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        top = cosine_topk(emb, q, k=5).collect()
        assert top[0]["vec_id"] == 0  # self-similarity = 1.0
        assert math.isclose(top[0]["sim"], 1.0, abs_tol=1e-9)
        sims = [r["sim"] for r in top]
        assert sims == sorted(sims, reverse=True)

    def test_ann_ivf_recall_and_determinism(self, spark, sf_dir):
        from opendata_gov_lt_mysql_import_spark.operators.similarity import (
            ann_ivf_topk,
            cosine_topk,
        )
        from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        search = emb.filter(F.col("vec_id") != 0)
        ivf = [r["vec_id"] for r in ann_ivf_topk(search, q, k=10, nprobe=4).collect()]
        again = [r["vec_id"] for r in ann_ivf_topk(search, q, k=10, nprobe=4).collect()]
        assert ivf == again  # deterministic pivots + stable tie-breaks
        exact = [r["vec_id"] for r in cosine_topk(search, q, k=10).collect()]
        # probing 4/16 cells must recover a meaningful share of the true
        # top-10 (loose bound: approximate by construction)
        assert len(set(ivf) & set(exact)) >= 3

    def test_ann_lsh_recall_vs_bruteforce(self, spark, sf_dir):
        from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        q = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
        exact = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
        approx = [
            r["vec_id"]
            for r in ann_lsh_topk(emb, q, k=5, n_planes=10, max_hamming=4).collect()
        ]
        # the query vector itself must be found, plus reasonable overlap
        assert 7 in approx
        assert len(set(exact) & set(approx)) >= 2


class TestAsofJoin:
    def _frames(self, spark):
        from pyspark.sql import Row
        import datetime as dt

        T = lambda s: dt.datetime.fromisoformat(s)
        left = spark.createDataFrame(
            [
                Row(k=1, ts=T("2024-01-01T05:00:00"), tag="a"),
                Row(k=1, ts=T("2024-01-01T09:00:00"), tag="b"),
                Row(k=1, ts=T("2024-01-01T10:00:00"), tag="c"),  # == state ts
                Row(k=2, ts=T("2024-01-01T01:00:00"), tag="d"),  # before any state
            ]
        )
        right = spark.createDataFrame(
            [
                Row(k=1, ts=T("2024-01-01T04:00:00"), v=10),
                Row(k=1, ts=T("2024-01-01T10:00:00"), v=20),
                Row(k=2, ts=T("2024-01-01T02:00:00"), v=30),
            ]
        )
        return left, right

    def test_backward_semantics(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.asof import asof_join

        left, right = self._frames(spark)
        got = {
            r["tag"]: r["asof_v"]
            for r in asof_join(
                left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["v"]
            ).collect()
        }
        # a: state@04 → 10; b: still 10; c: equal-ts state@10 → 20; d: none
        assert got == {"a": 10, "b": 10, "c": 20, "d": None}

    def test_inner_drops_stateless_rows(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.asof import asof_join

        left, right = self._frames(spark)
        tags = {
            r["tag"]
            for r in asof_join(
                left, right, on="k", left_ts="ts", right_ts="ts",
                right_cols=["v"], how="inner",
            ).collect()
        }
        assert tags == {"a", "b", "c"}

    def test_single_shuffle_plan(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.asof import asof_join

        left, right = self._frames(spark)
        df = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["v"])
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.split("+- == Initial Plan ==")[0].count("Exchange hashpartitioning")
        assert n_exchanges == 1, plan


class TestRangeJoin:
    def test_matches_naive_inequality_join(self, spark, sf_dir):
        from opendata_gov_lt_mysql_import_spark.operators.range_join import range_join
        from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table
        from pyspark.sql import functions as F

        ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
        other = ev.select("user_id", F.col("ts").alias("b_ts"))
        got = range_join(
            ev, other, on="user_id", left_ts="ts",
            right_ts="b_ts", lower_s=-4 * 3600, upper_s=0,
            right_cols=["b_ts"],
        )
        naive = ev.join(
            other,
            on="user_id",
        ).filter(
            (F.col("b_ts") >= F.col("ts") - F.expr("INTERVAL 4 HOURS"))
            & (F.col("b_ts") <= F.col("ts"))
        ).select("user_id", "ts", "b_ts")
        n = naive.count()
        assert n > 0  # window must be non-trivial for this test to mean anything
        as_tuples = lambda df: sorted(tuple(r) for r in df.collect())
        assert as_tuples(got.select("user_id", "ts", "r_b_ts")) == as_tuples(naive)

    def test_bucket_boundary_inclusive(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.range_join import range_join
        import datetime as dt
        from pyspark.sql import Row

        T = dt.datetime.fromisoformat
        left = spark.createDataFrame([Row(k=1, ts=T("2024-01-10T00:00:00"))])
        right = spark.createDataFrame(
            [
                Row(k=1, ts=T("2024-01-03T00:00:00"), v=1),  # exactly lower bound
                Row(k=1, ts=T("2024-01-10T00:00:00"), v=2),  # exactly upper bound
                Row(k=1, ts=T("2024-01-02T23:59:59"), v=3),  # 1s outside
                Row(k=1, ts=T("2024-01-10T00:00:01"), v=4),  # 1s outside
            ]
        )
        got = sorted(
            r["r_v"]
            for r in range_join(
                left, right, on="k", left_ts="ts", right_ts="ts",
                lower_s=-7 * 86400, upper_s=0, right_cols=["v"],
            ).collect()
        )
        assert got == [1, 2]

    def test_rejects_empty_interval(self, spark):
        import pytest as _pytest
        from opendata_gov_lt_mysql_import_spark.operators.range_join import range_join

        with _pytest.raises(ValueError):
            range_join(
                spark.range(1), spark.range(1), on="id", left_ts="id",
                right_ts="id", lower_s=0, upper_s=0, right_cols=[],
            )


class TestApproxDistinct:
    def test_estimate_within_2pct_of_exact(self, spark, sf_dir):
        from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table
        from pyspark.sql import functions as F

        ev = load_table(spark, sf_dir, "events")
        approx = {
            r["event_type"]: r["approx"]
            for r in ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx"))
            .collect()
        }
        exact = {
            r["event_type"]: r["exact"]
            for r in ev.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("exact"))
            .collect()
        }
        assert approx.keys() == exact.keys()
        for k in exact:
            assert abs(approx[k] - exact[k]) <= max(1, 0.02 * exact[k]), (
                k, approx[k], exact[k],
            )


class TestMinhashImpls:
    # `full` tier (round-16): see pytest.ini — excluded from the default driver-window run
    @pytest.mark.full
    def test_both_impls_find_exact_duplicates(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            minhash_candidate_pairs,
        )
        from pyspark.sql import functions as F
        from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        dups = d.filter(F.col("doc_id") < 50).withColumn(
            "doc_id", F.col("doc_id") + F.lit(1000000)
        )
        corpus = d.unionByName(dups)
        expected = {(i, i + 1000000) for i in range(50)}
        for impl in ("arrow", "expr"):
            pairs = {
                (r["id_a"], r["id_b"])
                for r in minhash_candidate_pairs(
                    corpus, "text", "doc_id", impl=impl, dropped_out=[]
                ).collect()
            }
            missed = expected - pairs
            assert not missed, (impl, sorted(missed)[:5])
            # exact duplicates must estimate at 1.0 in either impl
            ests = [
                r["jaccard_est"]
                for r in minhash_candidate_pairs(
                    corpus, "text", "doc_id", impl=impl, dropped_out=[]
                )
                .filter(F.col("id_b") - F.col("id_a") == 1000000)
                .collect()
            ]
            assert all(e == 1.0 for e in ests), impl

    def test_invalid_impl_rejected(self, spark):
        import pytest as _pytest
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            minhash_candidate_pairs,
        )

        with _pytest.raises(ValueError):
            minhash_candidate_pairs(spark.range(1), "id", "id", impl="nope")


class TestStratifiedSample:
    def test_deterministic_and_proportional(self, spark, sf_dir):
        from opendata_gov_lt_mysql_import_spark.operators.textanalysis import (
            stratified_sample,
        )
        from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table

        d = load_table(spark, sf_dir, "documents")
        fr = {r[0]: 0.3 for r in d.select("lang").distinct().collect()}
        a = stratified_sample(d, "lang", fr, seed=7)
        b = stratified_sample(d, "lang", fr, seed=7)
        assert sorted(r["doc_id"] for r in a.collect()) == sorted(
            r["doc_id"] for r in b.collect()
        )
        n, total = a.count(), d.count()
        assert 0.15 * total < n < 0.45 * total  # Bernoulli tolerance at sf0.001


def test_approx_percentile_within_one_percent_of_exact(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    exact = {
        r["l_returnflag"]: r for r in qs["percentile_price"](spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in qs["approx_percentile_price"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        for col in ("p25", "p50", "p75", "p99"):
            assert abs(a[col] - e[col]) <= 0.01 * abs(e[col]) + 1e-9, (
                flag, col, a[col], e[col],
            )


class TestKMVDistinct:
    """KMV bottom-k distinct sketch invariants (operators/sketches.py
    kmv_distinct): the salted two-phase bottom-k must equal the global
    bottom-k (subset argument: the global k smallest distinct hashes
    number <= k, so each salt's share survives its per-salt top-k); the
    small-cardinality branch is exact; the estimator tracks truth
    within the ~1/sqrt(k) band."""

    @staticmethod
    def _tagged(spark, n, tag="t"):
        from pyspark.sql import functions as F

        return (
            spark.range(n)
            .select(
                F.lit(tag).alias("col_name"),
                F.col("id").cast("string").alias("val"),
            )
            # duplicate every value: set semantics must absorb repeats
            .unionAll(
                spark.range(n).select(
                    F.lit(tag).alias("col_name"),
                    F.col("id").cast("string").alias("val"),
                )
            )
        )

    def test_two_phase_equals_single_window(self, spark):
        from pyspark.sql import functions as F

        from opendata_gov_lt_mysql_import_spark.operators.sketches import (
            kmv_distinct,
            kmv_hash,
        )

        tagged = self._tagged(spark, 5000)
        got = kmv_distinct(tagged, k=64, n_salts=8).collect()[0]
        # reference: global bottom-64 of the distinct hash set, one sort
        ref = (
            tagged.select(kmv_hash(F.col("val")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(64)
            .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
            .collect()[0]
        )
        assert got["n_sketch"] == ref["n"] == 64
        assert got["kth_hash"] == ref["kth"]

    def test_small_cardinality_branch_is_exact(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.sketches import (
            kmv_distinct,
        )

        tagged = self._tagged(spark, 50)
        row = kmv_distinct(tagged, k=256).collect()[0]
        assert row["n_sketch"] == 50
        assert row["kmv_estimate"] == 50  # sketch IS the exact count

    def test_estimator_tracks_truth(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.sketches import (
            kmv_distinct,
        )

        n = 20_000
        row = kmv_distinct(self._tagged(spark, n), k=256).collect()[0]
        assert row["n_sketch"] == 256
        # 1/sqrt(k-2) ~ 6.3%; allow 4 sigma for the fixed seed draw
        assert abs(row["kmv_estimate"] - n) / n < 0.25

    def test_k_validation(self, spark):
        import pytest as _pytest

        from opendata_gov_lt_mysql_import_spark.operators.sketches import (
            kmv_distinct,
        )

        with _pytest.raises(ValueError):
            kmv_distinct(self._tagged(spark, 10), k=1)


class TestHllSketchRollup:
    """Stored-sketch rollup invariants (hll_sketch_rollup_merge): daily
    HLL sketches must merge LOSSLESSLY (union of partials == one-shot
    sketch, exactly) and track exact distinct counts within 2%."""

    def test_merge_lossless_and_error_bound(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table

        ev = load_table(spark, sf_dir, "events")
        daily = ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
        merged = {
            r["event_type"]: r["est"]
            for r in daily.groupBy("event_type")
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg("sketch"))
                .cast("long")
                .alias("est")
            )
            .collect()
        }
        oneshot = {
            r["event_type"]: r["est"]
            for r in ev.groupBy("event_type")
            .agg(
                F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
                .cast("long")
                .alias("est")
            )
            .collect()
        }
        exact = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n"))
            .collect()
        }
        assert merged == oneshot  # lossless merge: union of partials
        for t, n in exact.items():
            assert abs(merged[t] - n) / n < 0.02


class TestSemanticDedup:
    def test_keep_exactly_one_per_component(self, spark, sf_dir):
        import __spark_entry__ as entrymod
        from pyspark.sql import functions as F

        out = entrymod.queries()["semantic_dedup"](spark, sf_dir)
        # exactly one kept member per component
        per_comp = out.groupBy("component").agg(
            F.sum(F.col("keep").cast("int")).alias("kept"),
            F.count(F.lit(1)).alias("n"),
        )
        assert per_comp.filter(F.col("kept") != 1).isEmpty()
        # the kept member has the component's LOWEST (rounded) centroid
        # similarity — the SemDeDup keep-least-prototypical rule
        mins = out.groupBy("component").agg(F.min("cos_centroid").alias("lo"))
        kept = out.filter("keep").join(mins, "component")
        assert kept.filter(F.col("cos_centroid") != F.col("lo")).isEmpty()
        # every input row appears exactly once
        assert out.count() == out.select("vec_id").distinct().count()


class TestEntityResolution:
    def test_planted_clones_resolve_to_source(self, spark, sf_dir):
        import __spark_entry__ as entrymod
        from pyspark.sql import functions as F

        out = entrymod.queries()["entity_resolution_customers"](spark, sf_dir)
        clones = out.filter(F.col("entity_id") >= 1000000)
        # recall = 1.0: every planted clone links back to its source id
        wrong = clones.filter(
            F.col("canonical_id") != F.col("entity_id") - 1000000
        )
        assert wrong.isEmpty()
        assert clones.filter(~F.col("is_duplicate")).isEmpty()
        # sources of clones are marked duplicates too (same component)
        srcs = out.filter(
            (F.col("entity_id") < 1000000) & (F.col("entity_id") % 7 == 0)
        )
        assert srcs.filter(~F.col("is_duplicate")).isEmpty()

    def test_no_cross_entity_merges(self, spark, sf_dir):
        """Precision guard: no component may contain two DIFFERENT
        original customers (ids both < 1000000 with different values) -
        the trigram+balance rule must not merge distinct entities."""
        import __spark_entry__ as entrymod
        from pyspark.sql import functions as F

        out = entrymod.queries()["entity_resolution_customers"](spark, sf_dir)
        originals = out.filter(F.col("entity_id") < 1000000)
        comp_sizes = originals.groupBy("canonical_id").agg(
            F.count(F.lit(1)).alias("n_originals")
        )
        assert comp_sizes.filter(F.col("n_originals") > 1).isEmpty()


class TestConnectedComponentsPaths:
    def test_distributed_path_equals_driver_path(self, spark):
        """driver_threshold=0 forces the pointer-jumping loop; both
        paths must produce identical component labels on a graph with
        chains, a cycle, and singletder components."""
        import random

        from pyspark.sql import functions as F

        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            connected_components,
        )

        rng = random.Random(13)
        edges = [(i, i + 1) for i in range(0, 40)]          # long chain
        edges += [(100, 101), (101, 102), (102, 100)]        # cycle
        edges += [(rng.randint(200, 260), rng.randint(200, 260)) for _ in range(40)]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        driver = {
            (r["id"], r["cluster"])
            for r in connected_components(pairs).collect()
        }
        dist = {
            (r["id"], r["cluster"])
            for r in connected_components(pairs, driver_threshold=0).collect()
        }
        assert driver == dist
        # the 41-node chain must fully collapse (pointer jumping would
        # not converge in 25 sweeps without path halving... but plain
        # propagation wouldn't: diameter 40 > max_iter)
        chain = {c for i, c in driver if i <= 40}
        assert chain == {0}

    def test_arrow_semantic_dedup_matches_exact(self, spark, sf_dir):
        import __spark_entry__ as entrymod

        q = entrymod.queries()
        exact = {tuple(r) for r in q["semantic_dedup"](spark, sf_dir).collect()}
        arrow = {tuple(r) for r in q["semantic_dedup_arrow"](spark, sf_dir).collect()}
        assert exact == arrow


class TestIncrementalNearDup:
    """incremental_minhash_neardup == the cross (batch x history) slice
    of the one-shot finder on the union — same signatures, same bands,
    so the two paths must agree pair-for-pair and count-for-count."""

    # `full` tier (round-16): see pytest.ini — excluded from the default driver-window run
    @pytest.mark.full
    def test_matches_one_shot_cross_slice(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            incremental_minhash_neardup,
            minhash_history_index,
            minhash_md5_pairs,
        )
        from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table

        d = load_table(spark, sf_dir, "documents")
        batch = d.filter(F.col("doc_id") < 100).withColumn(
            "doc_id", F.col("doc_id") + F.lit(1000000)
        )
        idx = minhash_history_index(d, "text", "doc_id")
        inc = {
            (r["new_id"], r["hist_id"], r["n_match"])
            for r in incremental_minhash_neardup(
                batch, idx, "text", "doc_id"
            ).collect()
        }
        oneshot = {
            (r["id_b"], r["id_a"], r["n_match"])
            for r in minhash_md5_pairs(
                d.unionByName(batch), "text", "doc_id"
            ).collect()
            if r["id_b"] >= 1000000 > r["id_a"]
        }
        assert inc == oneshot
        # every clone collides with its source at a full 16/16 match
        full = {(n, h) for n, h, m in inc if m == 16}
        assert {(i + 1000000, i) for i in range(100)} <= full


class TestWinnowing:
    """Winnowing fingerprints (Schleimer et al. 2003): the w+k-1
    guarantee, density, and planted-dup ranking."""

    def test_shared_substring_guarantee(self, spark):
        from pyspark.sql import functions as F

        from opendata_gov_lt_mysql_import_spark.operators.winnow import (
            winnow_fingerprints,
        )

        # two docs sharing a 23-char substring (= w + k - 1 at k=16,
        # w=8) embedded in unrelated noise MUST share a fingerprint
        shared = "abcdefghijklmnopqrstuvw"
        assert len(shared) == 23
        rows = [
            (1, "xxxxyyyyzzzz" + shared + "qqqqrrrrssss"),
            (2, "mmmmnnnnoooo" + shared + "ttttuuuuvvvv"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        fps = {
            r["doc_id"]: set(r["fps"])
            for r in df.select(
                "doc_id",
                winnow_fingerprints(F.col("text"), k=16, w=8).alias("fps"),
            ).collect()
        }
        assert fps[1] & fps[2], "guaranteed shared fingerprint missing"

    def test_short_doc_single_fingerprint(self, spark):
        from pyspark.sql import functions as F

        from opendata_gov_lt_mysql_import_spark.operators.winnow import (
            winnow_fingerprints,
        )

        df = spark.createDataFrame([(1, "short")], "doc_id long, text string")
        r = df.select(
            winnow_fingerprints(F.col("text"), k=16, w=8).alias("fps")
        ).collect()[0]
        assert len(r["fps"]) == 1  # whole-text hash, degenerate window

    def test_planted_dups_rank_at_10000(self, spark, sf_dir):
        import opendata_gov_lt_mysql_import_spark.queries_ml  # noqa: F401
        from opendata_gov_lt_mysql_import_spark.queries import all_queries

        rows = all_queries()["winnow_dup_pairs"](spark, sf_dir).collect()
        planted = [
            r for r in rows if r["doc_b"] - r["doc_a"] == 1000000
        ]
        assert len(planted) >= 95  # a couple may fall to the 64-cap
        for r in planted:
            assert r["jacc_bp"] == 10000, (r["doc_a"], r["jacc_bp"])
        # identical sets: shared == both sizes
        top = rows[0]
        assert top["jacc_bp"] == 10000
