"""Benchmark-decontamination operator tests (operators/decontam.py)."""

from __future__ import annotations

from opendata_gov_lt_mysql_import_spark.operators.decontam import (
    contamination_hits,
    decontaminate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDecontam:
    def test_hit_counts_and_clean_set(self, spark):
        # eval doc shares the 5-gram "a b c d e" with train doc 1 only;
        # doc 2 shares 4 tokens but never a full 5-gram; doc 3 disjoint.
        train = _docs(
            spark,
            [
                (1, "x y a b c d e z"),
                (2, "a b c d q"),
                (3, "p q r s t u v"),
            ],
        )
        ev = _docs(spark, [(100, "a b c d e f g")])
        hits = {
            r.doc_id: r.eval_grams_hit
            for r in contamination_hits(train, ev, n=5).collect()
        }
        assert hits == {1: 1}
        clean = decontaminate(train, ev, n=5)
        assert sorted(r.doc_id for r in clean.collect()) == [2, 3]

    def test_multiple_distinct_grams_counted_once_each(self, spark):
        # train doc repeats the contaminated gram twice; word_ngrams is
        # distinct-per-doc so the hit count stays 2 (two distinct grams),
        # not inflated by repetition.
        ev = _docs(spark, [(100, "a b c d e f")])  # grams: "a b c d e", "b c d e f"
        train = _docs(spark, [(1, "a b c d e f a b c d e f")])
        out = contamination_hits(train, ev, n=5).collect()
        # train doc contains both eval grams (plus wrap-around grams that
        # don't match); each counted once.
        assert len(out) == 1
        assert out[0].eval_grams_hit == 2

    def test_short_docs_whole_stream_gram(self, spark):
        # Docs shorter than n collapse to a single whole-text gram on
        # both engines; identical short docs collide.
        train = _docs(spark, [(1, "tiny doc"), (2, "other text")])
        ev = _docs(spark, [(100, "tiny doc")])
        hits = {
            r.doc_id: r.eval_grams_hit
            for r in contamination_hits(train, ev, n=5).collect()
        }
        assert hits == {1: 1}

    def test_min_hits_threshold(self, spark):
        ev = _docs(spark, [(100, "a b c d e f")])
        train = _docs(
            spark,
            [(1, "a b c d e f"), (2, "z z a b c d e z z")],
        )
        # doc 1 hits 2 grams, doc 2 hits 1; min_hits=2 keeps doc 2.
        clean = decontaminate(train, ev, n=5, min_hits=2)
        assert sorted(r.doc_id for r in clean.collect()) == [2]
