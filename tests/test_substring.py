"""Exact substring (duplicated-span) dedup — Lee et al. 2022 semantics.

Planted cross-document spans at DIFFERENT positions: the case exact
(whole-doc) dedup misses and window fingerprinting must catch. Pinned:
span recovery (exact fingerprint set), keeper selection (global first
occurrence), removal coverage (union of windows, keeper retained),
cross-document-only semantics (within-doc repeats survive), and the
short-doc / degenerate-input edges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.operators.substring import (
    duplicated_spans,
    remove_duplicated_spans,
    span_fingerprints,
)


def _toks(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


# 25-token shared span S planted at pos 11 in doc 1 and pos 6 in doc 2
_S = _toks("s", 25)
_DOC1 = _toks("a", 10) + " " + _S + " " + _toks("b", 8)  # S at pos 11
_DOC2 = _toks("c", 5) + " " + _S + " " + _toks("d", 12)  # S at pos 6
K = 20


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, _DOC1), (2, _DOC2), (3, _toks("e", 30))],
        "doc_id long, text string",
    )


class TestSpanDetection:
    def test_window_counts(self, spark, corpus):
        w = span_fingerprints(corpus, "text", "doc_id", k=K)
        per_doc = {
            r["id"]: r["n"]
            for r in w.groupBy("id").agg(F.count("*").alias("n")).collect()
        }
        # doc1: 10+25+8=43 tokens -> 24 windows; doc2: 5+25+12=42 -> 23
        assert per_doc == {1: 24, 2: 23, 3: 11}

    def test_planted_span_recovered_exactly(self, spark, corpus):
        spans = duplicated_spans(corpus, "text", "doc_id", k=K).collect()
        # windows fully inside the 25-token S: 25-20+1 = 6, each in both
        # docs exactly once; nothing else collides
        assert len(spans) == 6
        for r in spans:
            assert r["n_docs"] == 2 and r["n_occ"] == 2
            assert r["keeper_id"] == 1  # doc 1 precedes doc 2
        # keeper positions: S starts at pos 11 in doc1 -> windows 11..16
        assert sorted(r["keeper_pos"] for r in spans) == [11, 12, 13, 14, 15, 16]

    def test_removal_excises_span_once(self, spark, corpus):
        out = {
            r["id"]: r
            for r in remove_duplicated_spans(
                corpus, "text", "doc_id", k=K
            ).collect()
        }
        # doc1 holds every first occurrence -> untouched
        assert out[1]["n_removed"] == 0
        assert out[1]["text"] == _DOC1
        # doc2: coverage = union of windows at pos 6..11, each 20 long
        # -> positions 6..30 = the full 25-token S
        assert out[2]["n_removed"] == 25
        expected = _toks("c", 5) + " " + _toks("d", 12)
        assert out[2]["text"] == expected
        assert out[3]["n_removed"] == 0 and out[3]["text"] == _toks("e", 30)

    def test_within_doc_repeat_survives_cross_doc_rule(self, spark):
        # the same 22-token span twice inside ONE doc: min_docs=2 counts
        # DISTINCT docs, so nothing is duplicated "across" the corpus
        s = _toks("x", 22)
        df = spark.createDataFrame(
            [(1, s + " " + s), (2, _toks("y", 30))], "doc_id long, text string"
        )
        assert duplicated_spans(df, "text", "doc_id", k=K).count() == 0
        out = {
            r["id"]: r
            for r in remove_duplicated_spans(df, "text", "doc_id", k=K).collect()
        }
        assert out[1]["n_removed"] == 0

    def test_short_and_empty_docs(self, spark):
        df = spark.createDataFrame(
            [(1, _toks("x", 19)), (2, ""), (3, "   ")],
            "doc_id long, text string",
        )
        assert span_fingerprints(df, "text", "doc_id", k=K).count() == 0
        out = {
            r["id"]: r
            for r in remove_duplicated_spans(df, "text", "doc_id", k=K).collect()
        }
        assert out[1]["text"] == _toks("x", 19) and out[1]["n_removed"] == 0
        assert out[2]["text"] == "" and out[3]["text"] == ""

    def test_k_validation(self, spark, corpus):
        with pytest.raises(ValueError, match="k must be"):
            span_fingerprints(corpus, "text", "doc_id", k=1)

    def test_three_way_duplication_single_keeper(self, spark):
        # span in three docs -> one keeper, coverage removed from BOTH
        # later docs
        s = _toks("z", 20)
        df = spark.createDataFrame(
            [
                (10, s + " " + _toks("p", 5)),
                (20, _toks("q", 3) + " " + s),
                (30, s),
            ],
            "doc_id long, text string",
        )
        spans = duplicated_spans(df, "text", "doc_id", k=K).collect()
        assert len(spans) == 1
        assert spans[0]["n_docs"] == 3 and spans[0]["n_occ"] == 3
        assert spans[0]["keeper_id"] == 10 and spans[0]["keeper_pos"] == 1
        out = {
            r["id"]: r
            for r in remove_duplicated_spans(df, "text", "doc_id", k=K).collect()
        }
        assert out[10]["n_removed"] == 0
        assert out[20]["n_removed"] == 20 and out[20]["text"] == _toks("q", 3)
        assert out[30]["n_removed"] == 20 and out[30]["text"] == ""

    def test_id_col_named_id_not_ambiguous(self, spark):
        # round-7 advisory: the coverage frame also carries a column
        # named 'id'; before the _cov_id rename a caller whose id_col is
        # literally 'id' hit an ambiguous-reference AnalysisException
        span = _toks("s", K)
        df = spark.createDataFrame(
            [(1, span + " " + _toks("a", 3)), (2, span + " " + _toks("b", 3))],
            "id long, text string",
        )
        out = {r["id"]: r for r in
               remove_duplicated_spans(df, "text", "id", k=K).collect()}
        assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == K


class TestIntervals:
    def test_planted_span_merges_to_one_interval(self, spark, corpus):
        from opendata_gov_lt_mysql_import_spark.operators.substring import (
            duplicated_span_intervals,
        )

        rows = {
            (r["id"], r["start_pos"]): r
            for r in duplicated_span_intervals(
                corpus, "text", "doc_id", k=K
            ).collect()
        }
        # 6 overlapping windows per doc merge into ONE maximal interval
        # spanning exactly the planted 25-token S
        assert set(rows) == {(1, 11), (2, 6)}
        assert rows[(1, 11)]["end_pos"] == 35 and rows[(1, 11)]["n_windows"] == 6
        assert rows[(2, 6)]["end_pos"] == 30 and rows[(2, 6)]["n_windows"] == 6

    def test_disjoint_regions_stay_separate(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.substring import (
            duplicated_span_intervals,
        )

        s1, s2 = _toks("m", 20), _toks("n", 20)
        gap = _toks("g", 10)
        df = spark.createDataFrame(
            [
                (1, s1 + " " + gap + " " + s2),  # s1 at 1, s2 at 31
                (2, s1),
                (3, s2),
            ],
            "doc_id long, text string",
        )
        rows = sorted(
            (r["id"], r["start_pos"], r["end_pos"])
            for r in duplicated_span_intervals(
                df, "text", "doc_id", k=K
            ).collect()
        )
        assert rows == [(1, 1, 20), (1, 31, 50), (2, 1, 20), (3, 1, 20)]


class TestIncrementalSpanDedup:
    def test_batch_probe_counts_and_coverage(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.substring import (
            incremental_span_dedup,
            span_fingerprints,
        )

        # history holds S (25 tokens); the batch doc carries a 3-token
        # novel prefix + S; a second batch doc is entirely novel
        hist = spark.createDataFrame(
            [(1, _toks("a", 10) + " " + _S)], "doc_id long, text string"
        )
        batch = spark.createDataFrame(
            [
                (100, "px-1 px-2 px-3 " + _S),
                (200, _toks("novel", 30)),
                (300, _toks("tiny", 5)),  # < k tokens -> no windows
            ],
            "doc_id long, text string",
        )
        index = span_fingerprints(hist, "text", "doc_id", k=K)
        out = {
            r["id"]: r
            for r in incremental_span_dedup(
                batch, index, "text", "doc_id", k=K
            ).collect()
        }
        # batch doc 100: 28 tokens -> 9 windows; the 6 windows fully
        # inside S collide (S sits at pos 11..35 in history, 4..28 in
        # the batch doc — position-independent by construction);
        # coverage = union of 6 windows of 20 = the 25 tokens of S
        assert out[100]["n_windows"] == 9
        assert out[100]["n_dup_windows"] == 6
        assert out[100]["n_covered"] == 25
        assert out[200]["n_windows"] == 11
        assert out[200]["n_dup_windows"] == 0 and out[200]["n_covered"] == 0
        assert 300 not in out  # sub-k docs have no windows


class TestCountMinSketch:
    def test_one_sided_guarantee_and_exact_when_no_collision(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.sketches import (
            cms_cells,
            cms_estimates,
        )

        rows = [(f"tok{i}",) for i in range(50) for _ in range(i + 1)]
        df = spark.createDataFrame(rows, "tok string")
        cells = cms_cells(df, "tok", d=4)
        # total mass is conserved per hash row
        per_row = cells.groupBy("r").agg(F.sum("cn").alias("s")).collect()
        assert all(r["s"] == len(rows) for r in per_row)
        probes = spark.createDataFrame(
            [(f"tok{i}",) for i in range(50)], "tok string"
        )
        est = {
            r["tok"]: r["cms_n"]
            for r in cms_estimates(cells, probes, "tok", d=4).collect()
        }
        for i in range(50):
            assert est[f"tok{i}"] >= i + 1  # never underestimates

    def test_absent_probe_estimates_zero_not_missing(self, spark):
        # round-7 advisory: probes absent from the stream must come back
        # as rows (left join), and a probe whose d cells are all
        # untouched estimates exactly 0 — the one-sided bound for ALL
        # probes, not only stream members. A 3-token stream in a
        # 4x256-cell sketch leaves almost every cell empty, so at least
        # one of an absent probe's d cells is empty w.h.p.; assert the
        # row EXISTS and never underestimates (0), and exercise many
        # absent probes so a single unlucky full-collision can't mask a
        # reintroduced inner join (which would drop ALL of them).
        from opendata_gov_lt_mysql_import_spark.operators.sketches import (
            cms_cells,
            cms_estimates,
        )

        df = spark.createDataFrame([("a",), ("b",), ("c",)], "tok string")
        cells = cms_cells(df, "tok", d=4)
        probes = spark.createDataFrame(
            [(f"ghost{i}",) for i in range(20)] + [("a",)], "tok string"
        )
        est = {
            r["tok"]: r["cms_n"]
            for r in cms_estimates(cells, probes, "tok", d=4).collect()
        }
        assert len(est) == 21  # no probe vanished
        assert est["a"] >= 1
        assert all(est[f"ghost{i}"] >= 0 for i in range(20))
        # with 3 stream tokens in 1024 cells, 20 ghosts all fully
        # colliding has probability ~(12/256)^80 — assert most are 0
        assert sum(est[f"ghost{i}"] == 0 for i in range(20)) >= 15

    def test_preaggregated_input_identical_sketch(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.sketches import (
            cms_cells,
        )

        raw = spark.createDataFrame(
            [("a",)] * 3 + [("b",)] * 2 + [("c",)], "tok string"
        )
        agg = spark.createDataFrame(
            [("a", 3), ("b", 2), ("c", 1)], "tok string, n long"
        )
        c1 = sorted(
            (r["r"], r["bucket"], r["cn"])
            for r in cms_cells(raw, "tok", d=4).collect()
        )
        c2 = sorted(
            (r["r"], r["bucket"], r["cn"])
            for r in cms_cells(agg, "tok", d=4, count_col="n").collect()
        )
        assert c1 == c2

    def test_d_validation(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.sketches import (
            cms_cells,
        )

        with pytest.raises(ValueError, match="d must be"):
            cms_cells(spark.range(1).selectExpr("'x' tok"), "tok", d=0)


class TestRandomizedInvariants:
    """Fixed-seed randomized corpora (shared word pool so cross-doc
    window collisions actually occur at k=5). Invariants that must hold
    for ANY input, complementing the planted-span goldens."""

    def _random_corpus(self, spark, seed, n_docs=12):
        import random

        rng = random.Random(seed)
        pool = [f"w{i}" for i in range(8)]  # tiny vocab -> collisions
        rows = [
            (i, " ".join(rng.choice(pool) for _ in range(rng.randint(0, 18))))
            for i in range(n_docs)
        ]
        return rows, spark.createDataFrame(rows, "doc_id long, text string")

    def test_removal_conservation_and_subsequence(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.substring import (
            remove_duplicated_spans,
        )

        for seed in (11, 23, 47):
            rows, df = self._random_corpus(spark, seed)
            out = {
                r["id"]: r
                for r in remove_duplicated_spans(
                    df, "text", "doc_id", k=5
                ).collect()
            }
            assert set(out) == {i for i, _ in rows}
            for i, text in rows:
                orig = text.split()
                kept = out[i]["text"].split() if out[i]["text"] else []
                # conservation: n_removed counts exactly the dropped tokens
                assert len(orig) - len(kept) == out[i]["n_removed"], (seed, i)
                # kept tokens are a subsequence of the original
                it = iter(orig)
                assert all(tok in it for tok in kept), (seed, i)

    def test_spans_intervals_consistency(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.substring import (
            duplicated_span_intervals,
            duplicated_spans,
            span_fingerprints,
        )

        for seed in (11, 23):
            _, df = self._random_corpus(spark, seed)
            spans = duplicated_spans(df, "text", "doc_id", k=5).collect()
            ivals = duplicated_span_intervals(df, "text", "doc_id", k=5).collect()
            w = span_fingerprints(df, "text", "doc_id", k=5).collect()
            dup_fps = {r["fp"] for r in spans}
            occs = [(r["id"], r["pos"]) for r in w if r["fp"] in dup_fps]
            # every duplicated occurrence falls inside exactly one
            # interval of its doc, and window counts agree in total
            assert sum(r["n_windows"] for r in ivals) == len(occs)
            for did, pos in occs:
                hits = [
                    r
                    for r in ivals
                    if r["id"] == did
                    and r["start_pos"] <= pos <= r["end_pos"] - 4
                ]
                assert len(hits) == 1, (seed, did, pos)

    def test_determinism_across_runs(self, spark):
        from opendata_gov_lt_mysql_import_spark.operators.substring import (
            remove_duplicated_spans,
        )

        _, df = self._random_corpus(spark, 99)
        df = df.repartition(7)  # partitioning must not affect results
        a = sorted(
            map(tuple, remove_duplicated_spans(df, "text", "doc_id", k=5).collect())
        )
        b = sorted(
            map(tuple, remove_duplicated_spans(df, "text", "doc_id", k=5).collect())
        )
        assert a == b


class TestPlanShape:
    def test_no_cartesian_and_bounded_exchanges(self, spark, corpus):
        df = remove_duplicated_spans(corpus, "text", "doc_id", k=K)
        df.collect()  # finalize AQE before reading the executed plan
        plan = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # one fp partitioning (both window fns share it), one coverage
        # groupBy on id; the corpus re-join broadcasts at this size —
        # anything beyond 3 exchanges means a shared stage split
        n_exch = plan.count("Exchange hashpartitioning")
        assert n_exch <= 3, f"{n_exch} hash exchanges\n{plan}"

    def test_span_detection_two_exchanges(self, spark, corpus):
        df = duplicated_spans(corpus, "text", "doc_id", k=K)
        df.collect()
        plan = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        n_exch = plan.count("Exchange hashpartitioning")
        assert n_exch <= 2, f"{n_exch} hash exchanges\n{plan}"


def test_winnow_span_report_localizes_planted_copies(spark, sf_dir):
    """Winnow→span composition: every prefix-shifted planted copy pair
    (n, n+2000000) whose original has >= 20 tokens must be winnow-
    confirmed AND localized to the FULL original text — the shared
    windows are every window of the original, so the merged interval is
    exactly (1, n_tokens)."""
    import __spark_entry__ as entrymod

    report = entrymod.queries()["winnow_span_report"](spark, sf_dir).collect()
    by_pair = {}
    for r in report:
        by_pair.setdefault((r["doc_a"], r["doc_b"]), []).append(r)

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    checked = 0
    for d in docs:
        if d["doc_id"] >= 100:
            continue
        ntok = len(d["text"].split()) if d["text"].strip() else 0
        if ntok < 20:
            continue
        pair = (d["doc_id"], d["doc_id"] + 2000000)
        assert pair in by_pair, f"planted pair {pair} not confirmed"
        spans = by_pair[pair]
        assert any(
            r["a_start"] == 1 and r["a_end"] == ntok for r in spans
        ), f"pair {pair}: full-text span not localized ({spans})"
        checked += 1
    assert checked >= 5  # the invariant actually ran
