"""Round-9 surface: URL canonicalization, hashed linear classifier,
CCNet buckets, hard negatives, datasheet — edge cases the sf-fixture
oracle runs can't isolate."""

from __future__ import annotations

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.functions.urls import canonical_url


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonical_url(F.col("url")).alias("c")).first()["c"]


class TestCanonicalUrl:
    def test_noise_dimensions_collapse(self, spark):
        # scheme case, host case, www., :443, trailing slash, utm_*
        # order, fragment — every variant lands on the same canonical
        variants = [
            "https://data.gov.lt/datasets/7?lang=lt&page=3",
            "HTTPS://WWW.Data.Gov.LT/datasets/7?page=3&lang=lt#sec1",
            "https://data.gov.lt:443/datasets/7/?lang=lt&page=3&utm_source=x",
            "https://www.data.gov.lt/datasets/7?utm_campaign=a&page=3&lang=lt",
            "https://Data.Gov.LT/datasets/7//?fbclid=abc&lang=lt&page=3",
        ]
        out = {_canon(spark, u) for u in variants}
        assert out == {"https://data.gov.lt/datasets/7?lang=lt&page=3"}

    def test_distinct_identities_stay_distinct(self, spark):
        a = _canon(spark, "https://data.gov.lt/datasets/7?page=3")
        b = _canon(spark, "https://data.gov.lt/datasets/7?page=4")
        c = _canon(spark, "https://data.gov.lt/datasets/8?page=3")
        d = _canon(spark, "http://data.gov.lt/datasets/7?page=3")
        assert len({a, b, c, d}) == 4  # scheme http vs https is identity

    def test_port_8080_kept_port_80_stripped(self, spark):
        assert _canon(spark, "https://h.lt:8080/x") == "https://h.lt:8080/x"
        assert _canon(spark, "http://h.lt:80/x") == "http://h.lt/x"
        assert _canon(spark, "https://h.lt:443/x") == "https://h.lt/x"
        # the OTHER scheme's default port is a real listener: keep it
        assert _canon(spark, "http://h.lt:443/x") == "http://h.lt:443/x"
        assert _canon(spark, "https://h.lt:80/x") == "https://h.lt:80/x"

    def test_empty_path_and_query(self, spark):
        assert _canon(spark, "https://h.lt") == "https://h.lt/"
        assert (
            _canon(spark, "https://h.lt/?utm_source=only") == "https://h.lt/"
        )

    def test_schemeless_degrades(self, spark):
        assert _canon(spark, "www.h.lt/a/") == "h.lt/a"


class TestHashedClassifier:
    def test_empty_doc_scores_zero_and_keeps(self, spark):
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            quality_classifier_hashed_q,
        )
        import opendata_gov_lt_mysql_import_spark.queries_ml as qml

        # drive through the query against a stubbed load_table
        orig = qml.load_table
        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "one token stream")],
            "doc_id long, text string",
        )
        try:
            qml.load_table = lambda s, sf, t: df
            out = {
                r["doc_id"]: r
                for r in quality_classifier_hashed_q(spark, "x").collect()
            }
        finally:
            qml.load_table = orig
        assert out[1]["score"] == 0 and out[1]["keep"] == 1
        assert out[2]["score"] == 0 and out[2]["n_tokens"] == 0
        assert out[3]["n_tokens"] == 3
        # score is the sum of per-token weights, each in [-512, 511]
        assert -512 * 3 <= out[3]["score"] <= 511 * 3

    def test_score_is_token_order_invariant(self, spark):
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            quality_classifier_hashed_q,
        )
        import opendata_gov_lt_mysql_import_spark.queries_ml as qml

        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "gamma alpha beta")],
            "doc_id long, text string",
        )
        orig = qml.load_table
        try:
            qml.load_table = lambda s, sf, t: df
            rows = {
                r["doc_id"]: r["score"]
                for r in quality_classifier_hashed_q(spark, "x").collect()
            }
        finally:
            qml.load_table = orig
        assert rows[1] == rows[2]


class TestHardNegatives:
    def test_negatives_never_share_anchor_label(self, spark):
        # invariant pin for the EXISTING hard_negatives entry (round 9
        # initially re-implemented it before spotting the duplicate —
        # the label-disjointness/dense-rank invariants keep value here)
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            hard_negatives,
        )

        sf = "/root/testdata/sf0.001"
        out = hard_negatives(spark, sf).collect()
        from opendata_gov_lt_mysql_import_spark.sources.parquet import (
            load_table,
        )

        labels = {
            r["vec_id"]: r["label"]
            for r in load_table(spark, sf, "embeddings")
            .select("vec_id", "label")
            .collect()
        }
        assert len(out) > 0
        for r in out:
            assert labels[r["query_id"]] != labels[r["neg_id"]]
        # every anchor contributes a full top-2 (corpus has both labels)
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r["neg_id"])
        for negs in by_q.values():
            assert len(negs) == 2 and len(set(negs)) == 2


class TestDatasheet:
    def test_top_lang_tie_breaks_ascending(self, spark):
        import opendata_gov_lt_mysql_import_spark.queries_ml as qml
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            corpus_datasheet_q,
        )

        df = spark.createDataFrame(
            [
                (1, "a b", "lt", "s1", 3),
                (2, "c", "en", "s1", 1),  # tie 1-1 -> 'en' wins (asc)
                (3, "", "lt", "s2", 0),
            ],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        orig = qml.load_table
        try:
            qml.load_table = lambda s, sf, t: df
            out = {
                r["source"]: r for r in corpus_datasheet_q(spark, "x").collect()
            }
        finally:
            qml.load_table = orig
        assert out["s1"]["top_lang"] == "en"
        assert out["s1"]["n_docs"] == 2 and out["s1"]["total_tokens"] == 3
        assert out["s1"]["avg_tokens"] == 1  # 3 div 2 truncates
        assert out["s2"]["n_empty"] == 1 and out["s2"]["total_tokens"] == 0


class TestJLProjection:
    def test_matches_hand_computed_signs(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.similarity import (
            jl_project,
            jl_sign_matrix,
        )

        vec = [1.0, 2.0, 3.0]
        signs = jl_sign_matrix(3, 2)
        s = 10**4
        expected = [
            sum(int(round(v * s)) * signs[i][j] for i, v in enumerate(vec))
            for j in range(2)
        ]
        df = spark.createDataFrame(
            [(0, vec)], "vec_id long, embedding array<float>"
        )
        row = jl_project(df, in_dim=3, out_dim=2).first()
        assert list(row["proj"]) == expected

    def test_linearity_on_integer_grid(self, spark):
        # quantization is exact on integer-valued floats, so the
        # projection must be exactly linear: proj(a+b) = proj(a)+proj(b)
        from opendata_gov_lt_mysql_import_spark.operators.similarity import (
            jl_project,
        )

        a = [3.0, -1.0, 4.0, 1.0]
        b = [-5.0, 9.0, 2.0, -6.0]
        ab = [x + y for x, y in zip(a, b)]
        df = spark.createDataFrame(
            [(0, a), (1, b), (2, ab)], "vec_id long, embedding array<float>"
        )
        rows = {
            r["vec_id"]: list(r["proj"])
            for r in jl_project(df, in_dim=4, out_dim=8).collect()
        }
        assert rows[2] == [x + y for x, y in zip(rows[0], rows[1])]


class TestNextEventPairs:
    def test_cap_label_and_order(self, spark):
        import opendata_gov_lt_mysql_import_spark.queries_ml as qml
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            next_event_training_pairs_q,
        )
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            # user 1: 25 events e00..e24 -> context = e04..e23, label e24
            *[
                (i, base + dt.timedelta(minutes=i), 1, f"e{i:02d}")
                for i in range(25)
            ],
            # user 2: exactly 3 events
            (100, base, 2, "a"),
            (101, base + dt.timedelta(minutes=1), 2, "b"),
            (102, base + dt.timedelta(minutes=2), 2, "c"),
            # user 3: only 2 events -> excluded
            (200, base, 3, "x"),
            (201, base + dt.timedelta(minutes=1), 3, "y"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long,"
            " event_type string"
        )
        orig = qml.load_table
        try:
            qml.load_table = lambda s, sf, t: df
            out = {
                r["user_id"]: r
                for r in next_event_training_pairs_q(spark, "x").collect()
            }
        finally:
            qml.load_table = orig
        assert set(out) == {1, 2}
        u1 = out[1]
        assert u1["label"] == "e24" and u1["n_events"] == 25
        assert u1["context"] == " ".join(f"e{i:02d}" for i in range(4, 24))
        u2 = out[2]
        assert u2["context"] == "a b" and u2["label"] == "c"
        assert u2["n_events"] == 3


class TestCanonicalIdempotence:
    def test_canon_of_canon_is_canon(self, spark):
        # canonicalization must be idempotent — re-canonicalizing an
        # already-canonical URL (the common re-crawl path) cannot move
        # it to a new dedup group. One Spark job over 300 seeded-random
        # messy URLs instead of a per-example hypothesis loop.
        import random

        rng = random.Random(99)
        urls = []
        for _ in range(300):
            scheme = rng.choice(["http://", "https://", "HTTPS://", ""])
            host = rng.choice(
                ["www.A.lt", "a.LT", "x.example.org", "WWW.X.EXAMPLE.ORG"]
            )
            port = rng.choice(["", ":80", ":443", ":8080"])
            path = rng.choice(["", "/", "/a", "/a/b/", "/a//", "/a/b/c"])
            params = rng.sample(
                ["q=1", "lang=lt", "utm_source=z", "fbclid=9", "b=2", ""],
                k=rng.randint(0, 4),
            )
            frag = rng.choice(["", "#top", "#s1"])
            q = ("?" + "&".join(params)) if params else ""
            urls.append(f"{scheme}{host}{port}{path}{q}{frag}")
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        out = df.select(
            canonical_url(F.col("url")).alias("c1"),
            canonical_url(canonical_url(F.col("url"))).alias("c2"),
        ).collect()
        bad = [(r["c1"], r["c2"]) for r in out if r["c1"] != r["c2"]]
        assert not bad, bad[:5]


class TestMinhashCalibration:
    def test_exact_clones_land_in_zero_error_decile(self, spark):
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            minhash_estimate_calibration_q,
        )

        rows = {
            r["err_decile"]: r
            for r in minhash_estimate_calibration_q(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        # the synthesized duplicate corpus guarantees 100 exact clones:
        # est 16/16 and exact 1.0 -> error 0, so decile 0 must exist and
        # hold pairs whose mean est and exact are both ~1000 milli
        assert 0 in rows
        z = rows[0]
        assert z["n_pairs"] >= 100
        assert z["mean_est_milli"] >= 900 and z["mean_exact_milli"] >= 900
        # calibration total == candidate pair count (nothing dropped)
        assert sum(r["n_pairs"] for r in rows.values()) >= z["n_pairs"]


def _py_canonical(url: str) -> str:
    """Independent pure-Python implementation of the canonical_url
    contract (no regex shared with the Column version) — the randomized
    cross-check reference."""
    nofrag = url.split("#", 1)[0]
    scheme, rest = "", nofrag
    for i, ch in enumerate(nofrag):
        if ch == ":":
            if nofrag[i : i + 3] == "://" and i > 0 and nofrag[0].isalpha():
                head = nofrag[:i]
                if all(c.isalnum() or c in "+.-" for c in head):
                    scheme, rest = head.lower(), nofrag[i + 3 :]
            break
        if not (ch.isalnum() or ch in "+.-"):
            break
    hostport = rest.split("/", 1)[0].split("?", 1)[0]
    after = rest[len(hostport):]
    path = after.split("?", 1)[0]
    qs = after.split("?", 1)[1] if "?" in after else ""
    host = hostport.lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    if host.startswith("www."):
        host = host[4:]
    path = path.rstrip("/") or "/"
    kept = sorted(
        p
        for p in qs.split("&")
        if p and not p.startswith(("utm_", "fbclid", "gclid"))
    )
    return (
        (scheme + "://" if scheme else "")
        + host
        + path
        + ("?" + "&".join(kept) if kept else "")
    )


class TestCanonicalReferenceParity:
    def test_random_urls_match_pure_python_reference(self, spark):
        import random

        rng = random.Random(7)
        urls = []
        for _ in range(400):
            scheme = rng.choice(
                ["http://", "https://", "HTTPS://", "HtTp://", ""]
            )
            host = rng.choice(
                ["www.A.lt", "a.LT", "x.example.org", "WWW.X.Y.Z"]
            )
            port = rng.choice(["", ":80", ":443", ":8080"])
            path = rng.choice(
                ["", "/", "/a", "/a/b/", "/a//", "/UP/case", "/a.b/c-d"]
            )
            params = rng.sample(
                [
                    "q=1", "lang=lt", "utm_source=z", "utm_x=1",
                    "fbclid=9", "gclid=2", "b=2", "a=x%20y", "",
                ],
                k=rng.randint(0, 5),
            )
            frag = rng.choice(["", "#top", "#a?b=1"])
            q = ("?" + "&".join(params)) if params else ""
            urls.append(f"{scheme}{host}{port}{path}{q}{frag}")
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = [
            r["c"]
            for r in df.select(
                canonical_url(F.col("url")).alias("c")
            ).collect()
        ]
        bad = [
            (u, g, _py_canonical(u))
            for u, g in zip(urls, got)
            if g != _py_canonical(u)
        ]
        assert not bad, bad[:5]


def test_jl_dimension_mismatch_fails_loudly(spark):
    import pytest as _pytest

    from opendata_gov_lt_mysql_import_spark.operators.similarity import (
        jl_project,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(Exception, match="jl_project: in_dim=8"):
        jl_project(df, in_dim=8, out_dim=4).collect()


class TestWinnowFastTwin:
    def test_guaranteed_detection_holds_with_xxhash(self, spark):
        # the winnowing guarantee (shared >= w+k-1 = 23-char substring
        # => shared fingerprint) is hash-agnostic — pin it for the
        # xxhash64 production twin on planted overlaps
        import opendata_gov_lt_mysql_import_spark.queries_ml as qml

        shared = "the quick brown fox jumps over the lazy dog " * 3
        rows = [
            (1, "prefix one " + shared + " tail alpha"),
            (2, "another start " + shared + " different end"),
            (3, "completely unrelated text with no overlap at all here"),
            (4, "yet more disjoint filler content nothing shared above"),
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        out = qml._winnow_pair_scores(d, hash_fn="xxhash64").collect()
        pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
        assert (1, 2) in pairs
        assert pairs[(1, 2)]["n_shared"] >= 1
        # the disjoint docs never pair with anything at high overlap
        for (a, b), r in pairs.items():
            if {a, b} & {3, 4} and {a, b} != {3, 4}:
                assert r["jacc_bp"] < 5000

    def test_fast_twin_query_runs_and_ranks(self, spark):
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            winnow_dup_pairs_fast_q,
        )

        out = winnow_dup_pairs_fast_q(spark, "/root/testdata/sf0.001").collect()
        assert 0 < len(out) <= 150
        # synthesized exact clones must rank at the top with jacc 100%
        assert out[0]["jacc_bp"] == 10000
        bps = [r["jacc_bp"] for r in out]
        assert bps == sorted(bps, reverse=True)


class TestEpochUpsample:
    def test_exact_copy_counts_per_source(self, spark):
        import opendata_gov_lt_mysql_import_spark.queries_ml as qml
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            epoch_upsample_mixture_q,
        )

        # src0: 1000 milli-epochs -> exactly 1 copy per doc;
        # src4: 2000 milli     -> exactly 2 copies per doc;
        # src2: 1500 milli     -> 1 copy + deterministic ~half get a 2nd
        df = spark.createDataFrame(
            [(i, "src0") for i in range(40)]
            + [(100 + i, "src4") for i in range(40)]
            + [(200 + i, "src2") for i in range(40)],
            "doc_id long, source string",
        )
        orig = qml.load_table
        try:
            qml.load_table = lambda s, sf, t: df
            out = epoch_upsample_mixture_q(spark, "x").collect()
        finally:
            qml.load_table = orig
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        assert len(by_src["src0"]) == 40
        assert all(r["copy_idx"] == 1 for r in by_src["src0"])
        assert len(by_src["src4"]) == 80
        n2 = len(by_src["src2"])
        assert 40 < n2 < 80  # 1 + Bernoulli(0.5) copies
        # determinism: same draw every run
        try:
            qml.load_table = lambda s, sf, t: df
            again = epoch_upsample_mixture_q(spark, "x").collect()
        finally:
            qml.load_table = orig
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))
