"""Streaming twin of the incremental corpus recipe: crawl slices
arrive as a file stream, each micro-batch is labeled against the
PERSISTED recipe state (URL set, alive-fingerprint set, scrubbed-text
store, frozen boilerplate model — all snapshot tables), and the state
snapshots are extended with exactly that batch's contributions, so
batch N+1 dedups against batch N's admissions. The final per-doc
labels must equal the one-shot recipe labeling of the full union —
the streaming path IS the batch path (the reconcile discipline,
applied to the stream)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.operators.dedup import _spread
from opendata_gov_lt_mysql_import_spark.queries_ml import (
    _recipe_bp,
    _recipe_hist_batch,
    _recipe_inject,
    _recipe_label_batch,
    _recipe_labeled_over,
    _recipe_state,
)
from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table
from opendata_gov_lt_mysql_import_spark.sources.snapshots import (
    commit_snapshot,
    read_snapshot,
)

SF = "/root/testdata/sf0.001"
BATCH_SCHEMA = (
    "doc_id long, base_id long, source string, text string, url string"
)
LABEL_COLS = [
    "doc_id", "alive2", "alive3", "alive5", "alive6", "alive7",
    "n_tok_raw", "n_tok_clean",
]


def _second_batch(spark):
    """Planted families built from batch 1's fresh pages (the
    two-epoch construction from test_corpus): each dies only if the
    streamed state was actually extended by batch 1."""
    d = load_table(spark, SF, "documents").select("doc_id", "text", "source")
    binj = _recipe_inject(d.filter(F.col("doc_id") % 4 == 3))
    b = F.col("base_id").cast("string")
    s = (F.col("base_id") % 8).cast("string")
    q = (F.col("base_id") % 7).cast("string")
    recrawl = binj.filter(F.col("base_id") % 3 == 0).select(
        (F.col("base_id") + 10_000_000).alias("doc_id"),
        "base_id", "source", "text",
        F.concat(
            F.lit("HTTP://WWW.Site"), s, F.lit(".EXAMPLE.COM:80/new/"),
            b, F.lit("/?utm_source=feed&q="), q, F.lit("&ref=a#top"),
        ).alias("url"),
    )
    mirror = binj.filter(F.col("base_id") % 3 == 1).select(
        (F.col("base_id") + 9_000_000).alias("doc_id"),
        "base_id", "source", "text",
        F.concat(F.lit("http://mirror.example.net/m3/"), b).alias("url"),
    )
    edit = binj.filter(F.col("base_id") % 5 == 2).select(
        (F.col("base_id") + 11_000_000).alias("doc_id"),
        "base_id", "source",
        F.concat(
            F.col("text"), F.lit("\nsecond epoch note "), b
        ).alias("text"),
        F.concat(F.lit("http://copy.example.org/c3/"), b).alias("url"),
    )
    return recrawl.unionByName(mirror).unionByName(edit)


class TestStreamingRecipeIngest:
    # `full` tier (round-16): see pytest.ini — excluded from the default driver-window run
    @pytest.mark.full
    def test_streamed_batches_reconcile_with_oneshot(self, spark, tmp_path):
        from opendata_gov_lt_mysql_import_spark.functions.urls import (
            canonical_url,
        )

        dirs = {
            k: str(tmp_path / k)
            for k in ["bp", "url_index", "fp_index", "scrub", "labels"]
        }
        stage = tmp_path / "stage"
        stage.mkdir()

        # --- one-time history state build, persisted as snapshots
        hist, b1 = _recipe_hist_batch(spark, SF)
        hist = _spread(hist)
        bp = _recipe_bp(hist)
        hist_lab = _recipe_labeled_over(hist, hist, bp=bp).localCheckpoint(
            eager=True
        )
        state0 = _recipe_state(hist, hist_lab, bp)
        commit_snapshot(state0["bp"], dirs["bp"])
        commit_snapshot(state0["url_index"], dirs["url_index"])
        commit_snapshot(state0["fp_index"], dirs["fp_index"])
        commit_snapshot(state0["scrub"], dirs["scrub"])

        # --- two crawl slices staged as one file each
        b2 = _second_batch(spark)
        b1.coalesce(1).write.parquet(str(stage / "b1"))
        b2.coalesce(1).write.parquet(str(stage / "b2"))

        stream = (
            spark.readStream.schema(BATCH_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stage) + "/*")
        )

        def sink(batch_df, batch_id):
            batch_df = batch_df.localCheckpoint(eager=True)
            if batch_df.isEmpty():
                return
            scrub = read_snapshot(spark, dirs["scrub"])
            state = {
                "bp": read_snapshot(spark, dirs["bp"]),
                "url_index": read_snapshot(spark, dirs["url_index"]),
                "fp_index": read_snapshot(spark, dirs["fp_index"]),
                "scrub": scrub,
                "ev": scrub.filter(
                    (F.col("doc_id") % 20 == 0) & (F.col("doc_id") < 1000000)
                ),
            }
            blab = _recipe_label_batch(batch_df, state)
            commit_snapshot(blab.select(LABEL_COLS), dirs["labels"])
            # extend the state with THIS batch's contributions so the
            # next micro-batch probes it (bp + eval stay frozen).
            # Anti-join against the CURRENT snapshot first: append-mode
            # snapshots accumulate versions, and a duplicate hurl/hfp
            # key would fan out _recipe_label_batch's left join and
            # corrupt later batches' labels (round-12 advisory — the
            # batch-side .distinct() alone doesn't dedup ACROSS
            # versions the way _recipe_state_update's union.distinct
            # does).
            commit_snapshot(
                batch_df.select(
                    canonical_url(F.col("url")).alias("hurl")
                )
                .distinct()
                .join(state["url_index"], "hurl", "left_anti"),
                dirs["url_index"],
            )
            commit_snapshot(
                blab.filter(F.col("alive2"))
                .select(F.md5(F.col("text")).alias("hfp"))
                .distinct()
                .join(state["fp_index"], "hfp", "left_anti"),
                dirs["fp_index"],
            )
            commit_snapshot(
                blab.select("doc_id", F.col("clean_text").alias("text")),
                dirs["scrub"],
            )

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        streamed = read_snapshot(spark, dirs["labels"])
        # the probe indexes stay duplicate-free across snapshot
        # versions (the anti-join-before-commit contract above)
        for d, key in [(dirs["url_index"], "hurl"), (dirs["fp_index"], "hfp")]:
            idx = read_snapshot(spark, d)
            assert idx.count() == idx.select(key).distinct().count()
        # planted b2 families died on state extended BY THE STREAM
        rows = streamed.filter(F.col("doc_id") >= 9_000_000).select(
            "doc_id", "alive2", "alive3", "alive5"
        ).collect()
        fam = lambda lo: [r for r in rows if lo <= r["doc_id"] < lo + 10**6]
        mirror, recrawl, edit = fam(9e6), fam(10e6), fam(11e6)
        assert mirror and recrawl and edit
        assert all(not r["alive2"] for r in recrawl)
        assert all(r["alive2"] and not r["alive3"] for r in mirror)
        assert all(r["alive3"] and not r["alive5"] for r in edit)

        # the streaming path IS the batch path: per-doc reconcile with
        # the one-shot labeling of hist ∪ b1 ∪ b2
        comb = _recipe_labeled_over(
            _spread(hist.unionByName(b1).unionByName(b2)), hist
        ).select(LABEL_COLS)
        inc = hist_lab.select(LABEL_COLS).unionByName(streamed)
        ref = comb.select(
            "doc_id",
            *[F.col(c).alias(f"ref_{c}") for c in LABEL_COLS[1:]],
        )
        joined = inc.join(ref, "doc_id", "full")
        mismatch = joined.filter(
            " OR ".join(
                [
                    f"(coalesce({c} = ref_{c}, false) = false)"
                    for c in LABEL_COLS[1:]
                ]
            )
        )
        assert not mismatch.limit(5).collect()
        assert inc.count() == comb.count()

    # `full` tier (round-16): see pytest.ini — excluded from the default driver-window run
    @pytest.mark.full
    def test_streamed_batches_reconcile_with_warm_indexes(
        self, spark, tmp_path, monkeypatch
    ):
        """The WARM streaming twin (round 13): the sink's persisted
        state additionally carries the banded LSH signature index and
        the per-doc gram-hash index, each extended per micro-batch by
        exactly that batch's contribution (the `_recipe_state_update`
        fold, expressed as snapshot appends). Three teeth: (1) the
        labeler must never re-derive the LSH index from the grown
        scrub store and (2) never fall back to the text-based
        verifier — both monkeypatch-exploded for the WHOLE stream —
        and (3) the streamed labels still reconcile per-doc with the
        one-shot labeling of the full union, with the planted
        second-epoch families dying on stream-extended indexes."""
        import opendata_gov_lt_mysql_import_spark.operators.dedup as dedup
        from opendata_gov_lt_mysql_import_spark.functions.urls import (
            canonical_url,
        )
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            gram_hash_index,
        )

        mk_index = dedup.minhash_history_index  # real builder for the sink

        dirs = {
            k: str(tmp_path / k)
            for k in [
                "bp", "url_index", "fp_index", "scrub", "lsh_index",
                "gram_index", "labels",
            ]
        }
        stage = tmp_path / "stage"
        stage.mkdir()

        hist, b1 = _recipe_hist_batch(spark, SF)
        hist = _spread(hist)
        bp = _recipe_bp(hist)
        hist_lab = _recipe_labeled_over(hist, hist, bp=bp).localCheckpoint(
            eager=True
        )
        state0 = _recipe_state(hist, hist_lab, bp)
        commit_snapshot(state0["bp"], dirs["bp"])
        commit_snapshot(state0["url_index"], dirs["url_index"])
        commit_snapshot(state0["fp_index"], dirs["fp_index"])
        commit_snapshot(state0["scrub"], dirs["scrub"])
        commit_snapshot(
            mk_index(state0["scrub"], "text", "doc_id", n_gram=3, k=16,
                     bands=8),
            dirs["lsh_index"],
        )
        commit_snapshot(
            gram_hash_index(state0["scrub"], "text", "doc_id", n=2),
            dirs["gram_index"],
        )

        b2 = _second_batch(spark)
        b1.coalesce(1).write.parquet(str(stage / "b1"))
        b2.coalesce(1).write.parquet(str(stage / "b2"))

        # teeth 1+2: any index re-derivation or text-verify fallback in
        # the LABELER explodes the stream (the sink extends the indexes
        # with the saved real builders, batch-sized by construction)
        def boom_index(*a, **k):
            raise AssertionError("labeler re-derived the LSH index")

        def boom_verify(*a, **k):
            raise AssertionError("labeler fell back to text verify")

        monkeypatch.setattr(dedup, "minhash_history_index", boom_index)
        monkeypatch.setattr(dedup, "jaccard_verify_pairs", boom_verify)

        stream = (
            spark.readStream.schema(BATCH_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stage) + "/*")
        )

        def sink(batch_df, batch_id):
            batch_df = batch_df.localCheckpoint(eager=True)
            if batch_df.isEmpty():
                return
            scrub = read_snapshot(spark, dirs["scrub"])
            state = {
                "bp": read_snapshot(spark, dirs["bp"]),
                "url_index": read_snapshot(spark, dirs["url_index"]),
                "fp_index": read_snapshot(spark, dirs["fp_index"]),
                "scrub": scrub,
                "lsh_index": read_snapshot(spark, dirs["lsh_index"]),
                "gram_index": read_snapshot(spark, dirs["gram_index"]),
                "ev": scrub.filter(
                    (F.col("doc_id") % 20 == 0) & (F.col("doc_id") < 1000000)
                ),
            }
            blab = _recipe_label_batch(batch_df, state)
            commit_snapshot(blab.select(LABEL_COLS), dirs["labels"])
            batch_scrub = blab.select(
                "doc_id", F.col("clean_text").alias("text")
            ).localCheckpoint(eager=True)
            commit_snapshot(
                batch_df.select(canonical_url(F.col("url")).alias("hurl"))
                .distinct()
                .join(state["url_index"], "hurl", "left_anti"),
                dirs["url_index"],
            )
            commit_snapshot(
                blab.filter(F.col("alive2"))
                .select(F.md5(F.col("text")).alias("hfp"))
                .distinct()
                .join(state["fp_index"], "hfp", "left_anti"),
                dirs["fp_index"],
            )
            commit_snapshot(batch_scrub, dirs["scrub"])
            # the warm-index fold: batch ids are new by the watermark
            # contract, so appends stay unique-keyed without anti-joins
            commit_snapshot(
                mk_index(batch_scrub, "text", "doc_id", n_gram=3, k=16,
                         bands=8),
                dirs["lsh_index"],
            )
            commit_snapshot(
                gram_hash_index(batch_scrub, "text", "doc_id", n=2),
                dirs["gram_index"],
            )

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # the explosives guarded the STREAM; the one-shot reconcile
        # below legitimately runs the text path
        monkeypatch.undo()

        streamed = read_snapshot(spark, dirs["labels"])
        rows = streamed.filter(F.col("doc_id") >= 9_000_000).select(
            "doc_id", "alive2", "alive3", "alive5"
        ).collect()
        fam = lambda lo: [r for r in rows if lo <= r["doc_id"] < lo + 10**6]
        mirror, recrawl, edit = fam(9e6), fam(10e6), fam(11e6)
        assert mirror and recrawl and edit
        assert all(not r["alive2"] for r in recrawl)
        assert all(r["alive2"] and not r["alive3"] for r in mirror)
        assert all(r["alive3"] and not r["alive5"] for r in edit)

        comb = _recipe_labeled_over(
            _spread(hist.unionByName(b1).unionByName(b2)), hist
        ).select(LABEL_COLS)
        inc = hist_lab.select(LABEL_COLS).unionByName(streamed)
        ref = comb.select(
            "doc_id",
            *[F.col(c).alias(f"ref_{c}") for c in LABEL_COLS[1:]],
        )
        joined = inc.join(ref, "doc_id", "full")
        mismatch = joined.filter(
            " OR ".join(
                [
                    f"(coalesce({c} = ref_{c}, false) = false)"
                    for c in LABEL_COLS[1:]
                ]
            )
        )
        assert not mismatch.limit(5).collect()
        assert inc.count() == comb.count()
