"""One-off sf-scaling sensitivity run: times the most expensive headline
entries at sf0.1 and at KEY-CONSISTENT 2x and 4x derivations of it, and
writes the ratios to SCALING.json (bench.py embeds that file into
BENCH_LOCAL.json as ``scaling_appendix``).

Why derive instead of just unioning a copy: naive duplication makes
every key twice as hot (joins produce 4x pairs, dedup finds a twin for
every document), which measures the *distortion*, not the scaling. The
kx set therefore:

- offsets every key space by j*(max+1) for copy j, so each copy's FK
  edges land on its own copy (orders'->customer', lineitem'->orders'/
  part'/supplier'), keeping join fan-out linear;
- leaves the true dimensions (nation/region) fixed, as a real kx
  ingest would;
- appends a per-document unique token to the copied texts so exact/
  near-dup structure stays comparable instead of every doc gaining a
  twin, and jitters copied embeddings deterministically for the same
  reason.

A broadcast/partial-agg plan should land near kx wall-clock on kx rows
(modulo fixed per-query overhead, which pushes the ratio BELOW k for
sub-second entries); a quadratic candidate generator lands near k².
The 4x point exists because 2x alone can hide a superlinear term
inside noise: with three points (1x, 2x, 4x), curvature
ratio(4x)/ratio(2x) stays in [1, 2] for any T = a + b*S linear plan
and is driven toward 4 by a quadratic term. Single-process, interleaved
min-of-2 — on a shared box the ratios still carry noise; read them
alongside the spread fields.

Usage: python tools/bench_scaling.py [n_queries]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opendata_gov_lt_mysql_import_spark.session import get_spark  # noqa: E402
from opendata_gov_lt_mysql_import_spark.queries import all_queries  # noqa: E402
import opendata_gov_lt_mysql_import_spark.queries_ml  # noqa: F401, E402
import opendata_gov_lt_mysql_import_spark.queries_sql  # noqa: F401, E402
from bench import force_eval_chk  # noqa: E402

BASE = "/root/testdata/sf0.1"
DERIVED_2X = "/tmp/spark_graft_sf0.2"
DERIVED_4X = "/tmp/spark_graft_sf0.4"
DERIVED_8X = "/tmp/spark_graft_sf0.8"
DERIVED_10X = "/tmp/spark_graft_sf1.0"

# r4's most expensive headline entries, covering the document corpus
# (explode/LSH/pipeline), the TPC-H star (scan/join/agg), and the
# percentile/window surface
TOP = [
    "tfidf_top_keywords",
    "ngram_jaccard_verify_lsh",
    "profile_orders",
    "corpus_prep_pipeline",
    "decontaminate_hits",
    "j3_mn_collect",
    "percentile_price",
    "minhash_lsh_pairs",
    # round-14: oracle-backed expr impl (xxhash64 votes) — re-pointed
    # after the impl switch so the curvature on record matches the
    # shipping path
    "simhash_pairs",
    "q3_top_revenue",
    "q1_pricing_summary",
    # round-5 heavy entries
    "matview_incremental_refresh",
    "w1_tree_closure_recursive",
    "q18_large_orders",
    "q10_returned_items",
    "dq_constraint_report",
    "events_gap_fill_hourly",
    "semantic_dedup_arrow",
    # round-5 fourth-wave heavy entries
    "incremental_neardup_lsh",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    # round-7 span family (2x point so the 4x section gets curvature)
    "substring_dup_spans",
    "substring_dedup_clean",
    "incremental_substring_dedup",
    # round-7 ranking/graph wave: the triangle census is the entry with
    # real superlinear POTENTIAL (wedge count grows with degree^2 —
    # linear only while DOULION sampling holds degrees down), bm25/dsir
    # should track corpus size
    "triangle_count_copurchase",
    "bm25_topk_docs",
    "dsir_importance_weights",
    # KMV sketch: cost should track the distinct-key count, not the row
    # count (the kx derivation offsets keys, so distincts DO grow kx)
    "kmv_distinct_sketch",
    # winnowing: md5-dense map projection — must scale with total chars
    "winnow_dup_pairs",
    # round-9 wave: the winnow→span composition (the bench's new #1 —
    # both stages carry 4x/8x points separately, this checks their
    # SUM), the bigram-DAG tertile cut, the canonical-URL groupBy, the
    # zero-shuffle classifier/JL maps (expected ratio << 2: fixed
    # plan-build overhead dominates at sf0.1), k-center's K scans
    "winnow_span_report",
    "ccnet_perplexity_buckets",
    "url_canonical_dedup",
    "quality_classifier_hashed",
    "jl_projection_sketch",
    "kcenter_coreset",
    # round-9 second wave: estimator calibration (LSH + full-candidate
    # verify), the xxhash winnow production twin, the WindowGroupLimit
    # sequence builder, and the mapInPandas image-hash dedup
    "minhash_estimate_calibration",
    "winnow_dup_pairs_fast",
    "next_event_training_pairs",
    "image_dhash_dedup",
    # round-10 (verdict item 2): 2x points for the three map/agg-shaped
    # stragglers that landed without one
    "corpus_datasheet",
    "epoch_upsample_mixture",
    "token_budget_mixture",
    # round-10 surface: the nine-stage recipe composition (the new
    # bench #1), the audio envelope-hash dedup, and the skew join pair
    # (the salted twin should HOLD its ratio as the hot key doubles;
    # the plain twin is the one allowed to degrade)
    "corpus_recipe_pipeline",
    "audio_envelope_dedup",
    "skew_salted_join_zipf",
    "skew_plain_join_zipf",
    # round-11 (verdict item 6): the 95%-hot-key pair — where does
    # AQE-alone stop recovering the straggler vs explicit salting
    "skew_salted_join_hot95",
    "skew_plain_join_hot95",
    # source overlap matrix: fingerprint groupBy + HOF pair explode
    "source_overlap_matrix",
    # round-10 third wave: the recipe's removed-sample audit (shares
    # the labeling DAG with the datasheet), the PQ compress/search pair
    # and its recall audit
    "corpus_recipe_rejects",
    "pq_quantize_embeddings",
    "pq_adc_topk",
    "pq_recall_calibration",
    # round-10 second wave: the recall audit (round-11: panel is now a
    # fixed 64-query LIMIT, so the exact side is Q x N with Q constant
    # — the ratios should sit in the linear band) and the perceptron
    # trainer (epochs x token-linear gradient passes)
    "ann_recall_calibration",
    "classifier_train_perceptron",
    # round-11: the IVFADC composition and its recall audit — the
    # search's cost is the probe-restricted code scan (~nprobe/ncells
    # of the corpus), the audit's is Q x N with the fixed 64 panel
    "ann_ivfadc_topk",
    "ivfadc_recall_calibration",
    # round-11: the incremental recipe — dominated by the one-time
    # history state build at this harness's shape; the per-ingest
    # claim (batch-sized probes) is carried by the plan pins
    "corpus_recipe_increment",
    # round-11 second wave: the trained-codebook trio (training is
    # iters+1 corpus reads + bounded update shuffles; the recall audit
    # is the fixed-64-panel Q x N shape) and the IVF occupancy report
    # (two broadcast argmins, dimension-sized tail)
    "pq_train_codebook",
    "pq_adc_topk_trained",
    "pq_recall_calibration_trained",
    "ann_ivf_occupancy_drift",
    # round-12: the WARM increment (state persisted once per sf dir —
    # the interleaved min-of-2 prices the per-ingest path, run 1 pays
    # the build), the residual IVFADC pair (search + controlled
    # raw-vs-residual gain audit on the clustered corpus), the nprobe
    # tuning sweep, and the drift→retrain maintenance audit (all
    # fixed-64-panel Q x N shapes except the search itself)
    "corpus_recipe_increment_warm",
    "ann_ivfadc_residual_topk",
    "ivfadc_residual_gain_audit",
    "ivfadc_nprobe_sweep",
    "ann_ivf_recall_after_drift",
    # round-12: warm-index serve — the pruned scan reads ~nprobe/ncells
    # of the code files at any corpus size, so its ratio should sit
    # BELOW the linear band (per-query work grows only with cell size)
    "ann_ivfadc_warm_serve",
    "ann_ivfadc_warm_ingest_serve",
    "ann_ivfadc_warm_compact_serve",
    "ivfadc_residual_nprobe_sweep",
    "ann_ivfadc_warm_panel_serve",
    # round-13: the retrain decision (composes the two audits — its
    # ratio should mirror theirs), index-served near-dup verification
    # (candidate-stream-linear like the md5 twin), and the CDC
    # occupancy refresh (slim column scan + appended files only — the
    # ratio should sit well below the linear band)
    "ann_ivf_retrain_decision",
    "ngram_jaccard_verify_grams_index",
    "ann_ivf_occupancy_incremental",
    # round-13: batch×block pair scoring — kx grows BOTH sides of the
    # block join (batch and block), so the honest expectation is ~2 at
    # 2x (the incremental claim is no history×history term, not
    # constant cost; the fixed-batch falsifier is the harness above)
    "incremental_semantic_dedup",
    # round-14: the IVF-cell-blocked twin (same both-sides-grow
    # expectation; history membership is a pinned snapshot read),
    # verify served from the committed gram table (candidate-stream
    # linear; the min-of-2 prices the serve, run 1 pays build+fold),
    # and the crossover-routed serve (two pruned per-query serves —
    # the ratio should sit below the linear band like the warm serve)
    "incremental_semantic_dedup_ivf",
    "ngram_jaccard_verify_warm",
    "ann_ivfadc_warm_serve_dispatch",
]

# third scaling point for the heaviest candidate-generating entries —
# exactly the shapes where a 2x ratio like ngram's r5 1.52 could be
# either fixed-cost amortization or the foot of a quadratic
TOP_4X = [
    "ngram_jaccard_verify_lsh",
    "minhash_lsh_pairs",
    "incremental_neardup_lsh",
    "decontaminate_hits",
    "corpus_prep_pipeline",
    "tfidf_top_keywords",
    # round-7 surface: the explode-heavy window-fingerprint family
    "substring_dup_spans",
    "substring_dedup_clean",
    "incremental_substring_dedup",
    # round-9 (verdict item 4): the bench's #1 entry gets the full
    # curvature treatment — md5-dense map projection + one posting
    # shuffle should be linear, but it now dominates the record
    "winnow_dup_pairs",
    # round-9 late wave: the winnow→span composition took over the #1
    # bench slot (7.4s) — same discipline applies to it
    "winnow_span_report",
    # round-7: wedge work is sum outdeg^2 — the one entry where a
    # superlinear term is structurally plausible, so give it the
    # curvature point (kx copies are key-disjoint, so the graph is k
    # disjoint components and an honest plan should scale linearly)
    "triangle_count_copurchase",
    # round-10 (verdict item 2): the calibration entry's 2x ratio ran
    # 1.39 with no candidate-count column — it gets the 4x point AND
    # candidate counts (below) so the time ratio is interpretable
    # against candidate growth
    "minhash_estimate_calibration",
    # round-10: the recipe composition is the new bench #1 — same
    # curvature discipline as winnow_span_report
    "corpus_recipe_pipeline",
    # round-10 third wave: the two new bench heavies — the rejects
    # audit (shares the recipe's labeling DAG, should mirror its
    # curvature) and the recall audits (round-11: fixed 64-query panel,
    # exact side Q x N with Q constant — both should now show linear
    # curvature; the pq point is the round-11 verdict-item-1 addition)
    "corpus_recipe_rejects",
    "ann_recall_calibration",
    "pq_recall_calibration",
    # round-11 (verdict item 6): the skew pairs' 4x points — the
    # salted twin should HOLD its ratio as the hot key quadruples;
    # the plain twin's divergence (if any) is the AQE-vs-salting
    # crossover the README records
    "skew_salted_join_zipf",
    "skew_plain_join_zipf",
    "skew_salted_join_hot95",
    "skew_plain_join_hot95",
    # round-11 second wave: curvature points for the two new fixed-
    # panel audits — same linear-band expectation as ann/pq recall
    "ivfadc_recall_calibration",
    "pq_recall_calibration_trained",
    # round-12 (round-11 verdict item 7): the increment flagship gets
    # the full curvature treatment, with evidence counts separating
    # batch-internal from batch-vs-history candidate growth (below);
    # the warm twin rides along so build-amortized per-ingest cost has
    # its own curvature record
    "corpus_recipe_increment",
    "corpus_recipe_increment_warm",
    # round-13: the index-served verifier — its candidate stream grows
    # ~37x at 4x (the md5 generator's property), so the curvature point
    # separates candidate growth from per-pair array-intersect cost
    "ngram_jaccard_verify_grams_index",
    # round-14: the committed-table twin gets the same curvature
    # treatment (identical candidate stream; the verify side is a
    # snapshot read instead of an in-DAG build)
    "ngram_jaccard_verify_warm",
]

# fourth scaling point (round-6 verdict item 7) for the two entries
# whose 4x curvature ran highest (1.63 / 1.59): an 8x point separates
# "fixed overhead still amortizing" (curvature_8x stays < 2) from a
# genuine superlinear term (drives toward 4). Result-row counts are
# recorded ALONGSIDE times so candidate-set growth is separated from
# per-candidate cost: a time ratio that tracks the count ratio is
# linear work per candidate, not a quadratic plan.
TOP_8X = [
    "ngram_jaccard_verify_lsh",
    "decontaminate_hits",
    # round-9 (verdict item 4): the bench's two most expensive entries
    # get 8x points with evidence counts — winnow pair candidates and
    # oriented wedge counts — so evidence growth is separated from
    # per-item cost exactly like the LSH candidate discipline
    "winnow_dup_pairs",
    "triangle_count_copurchase",
    # round-9 late wave: the composition entry, evidence = its
    # winnow-CONFIRMED pair count (what stage 2's span work scales on)
    "winnow_span_report",
    # round-10: the recipe composition took the #1 bench slot — full
    # curvature treatment; evidence = confirmed near-dup drops (the
    # verify stage's output) and stage-7 survivors (what the mixture/
    # upsample/shard stages scale on)
    "corpus_recipe_pipeline",
]


def _candidate_counts(spark, sf_dir: str) -> dict[str, int]:
    """Candidate-stream sizes for the 8x entries at ``sf_dir`` —
    counted with the queries' own generators so count growth is
    measured at the same stage the time is spent on."""
    from opendata_gov_lt_mysql_import_spark.operators.dedup import (
        minhash_candidate_pairs,
    )
    from opendata_gov_lt_mysql_import_spark.operators.graph import (
        oriented_wedge_count,
    )
    from opendata_gov_lt_mysql_import_spark.queries_ml import (
        _copurchase_sampled_edges,
        _documents_with_dups,
        _documents_with_span_dups,
        _recipe_labeled,
        _winnow_pair_scores,
    )

    d = _documents_with_dups(spark, sf_dir)
    return {
        # the LSH candidate stream feeding the exact-Jaccard verify
        "ngram_jaccard_verify_lsh": minhash_candidate_pairs(
            d, "text", "doc_id", min_jaccard_est=0.3, max_bucket_size=200,
            dropped_out=[],
        ).count(),
        # winnow: candidate pairs from capped fingerprint postings
        # (pre-top-150 — the full pair stream the agg runs over)
        "winnow_dup_pairs": _winnow_pair_scores(d).count(),
        # triangle: the oriented wedge space the closing join probes
        "triangle_count_copurchase": oriented_wedge_count(
            _copurchase_sampled_edges(spark, sf_dir)
        ),
        # winnow->span: the confirmed-pair list that gates stage 2
        "winnow_span_report": _winnow_pair_scores(
            _documents_with_span_dups(spark, sf_dir)
        )
        .filter(F.col("jacc_bp") >= 5000)
        .count(),
        # recipe: confirmed near-dup drops — the verified output of the
        # composition's heaviest stage (the LSH verify chain)
        "corpus_recipe_pipeline": _recipe_labeled(spark, sf_dir)
        .filter(F.col("nd_hit").isNotNull())
        .count(),
    }


def _write(df, dest, name):
    df.write.mode("overwrite").parquet(os.path.join(dest, f"{name}.parquet"))


def build_kx(spark, scale: int, dest: str) -> None:
    """Derive a key-consistent ``scale``x dataset (idempotent)."""
    if os.path.exists(os.path.join(dest, "_BUILT")):
        return
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    t = {}
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        t[name] = spark.read.parquet(os.path.join(BASE, f"{name}.parquet"))

    # key-space offsets (max+1 per key space, computed once); copy j
    # shifts each key by j*offset so copies never collide
    off = {
        "cust": t["customer"].agg(F.max("c_custkey")).collect()[0][0] + 1,
        "supp": t["supplier"].agg(F.max("s_suppkey")).collect()[0][0] + 1,
        "part": t["part"].agg(F.max("p_partkey")).collect()[0][0] + 1,
        "ord": t["orders"].agg(F.max("o_orderkey")).collect()[0][0] + 1,
        "doc": t["documents"].agg(F.max("doc_id")).collect()[0][0] + 1,
        "vec": t["embeddings"].agg(F.max("vec_id")).collect()[0][0] + 1,
        "ev": t["events"].agg(F.max("event_id")).collect()[0][0] + 1,
        "user": t["events"].agg(F.max("user_id")).collect()[0][0] + 1,
    }

    def stacked(base_df, shift_fn):
        out = base_df
        for j in range(1, scale):
            out = out.unionByName(shift_fn(base_df, j))
        return out

    _write(t["region"], dest, "region")
    _write(t["nation"], dest, "nation")
    _write(
        stacked(
            t["customer"],
            lambda d, j: d.withColumn(
                "c_custkey", F.col("c_custkey") + j * off["cust"]
            ),
        ),
        dest, "customer",
    )
    _write(
        stacked(
            t["supplier"],
            lambda d, j: d.withColumn(
                "s_suppkey", F.col("s_suppkey") + j * off["supp"]
            ),
        ),
        dest, "supplier",
    )
    _write(
        stacked(
            t["part"],
            lambda d, j: d.withColumn(
                "p_partkey", F.col("p_partkey") + j * off["part"]
            ),
        ),
        dest, "part",
    )
    _write(
        stacked(
            t["orders"],
            lambda d, j: d.withColumn(
                "o_orderkey", F.col("o_orderkey") + j * off["ord"]
            ).withColumn("o_custkey", F.col("o_custkey") + j * off["cust"]),
        ),
        dest, "orders",
    )
    _write(
        stacked(
            t["lineitem"],
            lambda d, j: d.withColumn(
                "l_orderkey", F.col("l_orderkey") + j * off["ord"]
            )
            .withColumn("l_partkey", F.col("l_partkey") + j * off["part"])
            .withColumn("l_suppkey", F.col("l_suppkey") + j * off["supp"]),
        ),
        dest, "lineitem",
    )
    _write(
        stacked(
            t["events"],
            lambda d, j: d.withColumn(
                "event_id", F.col("event_id") + j * off["ev"]
            ).withColumn("user_id", F.col("user_id") + j * off["user"]),
        ),
        dest, "events",
    )
    _write(
        stacked(
            t["documents"],
            lambda d, j: d.withColumn("doc_id", F.col("doc_id") + j * off["doc"])
            # unique suffix token: the copy is near- but not exact-dup,
            # so dedup output structure stays comparable
            .withColumn(
                "text",
                F.concat(F.col("text"), F.lit(" zz"), F.col("doc_id")),
            )
            .withColumn("n_chars", F.length("text")),
        ),
        dest, "documents",
    )
    _write(
        stacked(
            t["embeddings"],
            lambda d, j: d.withColumn("vec_id", F.col("vec_id") + j * off["vec"])
            .withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x: x
                    + ((F.col("vec_id") % 97).cast("float") * F.lit(1e-3)),
                ),
            ),
        ),
        dest, "embeddings",
    )
    open(os.path.join(dest, "_BUILT"), "w").close()


def _sweep(spark, queries, names, other_dir):
    """Interleaved min-of-2 base-vs-derived timings for ``names``.
    Returns {name: (t_base, t_kx, rows_base, rows_kx, chk_base,
    chk_kx)} — force_eval_chk counts result rows AND xxhash64-checksums
    every cell, so the row ratio comes free and each scaling point is
    self-verifying across rounds (round-13 verdict item 6): a
    curvature claim whose result set silently changed shows up as a
    checksum change, not as an unexplained timing shift. If the two
    runs of one side disagree on the checksum the entry is
    nondeterministic — recorded as chk None so nobody anchors on it."""
    results = {}
    for name in names:
        fn = queries[name]
        t_base = t_kx = None
        n_base = n_kx = 0
        chk: dict[str, int | None] = {}
        for _ in range(2):
            for which, sf_dir in (("base", BASE), ("kx", other_dir)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n, c = force_eval_chk(fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                if which in chk and chk[which] != c:
                    chk[which] = None  # run-to-run nondeterminism
                elif which not in chk:
                    chk[which] = c
                if which == "base":
                    t_base = dt if t_base is None else min(t_base, dt)
                    n_base = n
                else:
                    t_kx = dt if t_kx is None else min(t_kx, dt)
                    n_kx = n
        results[name] = (
            t_base, t_kx, n_base, n_kx, chk["base"], chk["kx"]
        )
        print(f"# {name}: {t_base:.3f}s -> {t_kx:.3f}s "
              f"(x{t_kx / t_base:.2f})", file=sys.stderr)
    return results


def main() -> None:
    # --only a,b,c : sweep just the named entries (in whichever of
    # TOP/TOP_4X/TOP_8X they appear) and MERGE the results into the
    # existing SCALING.json instead of overwriting it — so a new
    # round's entries get their points without re-timing the whole
    # record on a possibly-loaded box.
    args = list(sys.argv[1:])
    if "--10x" in args:
        # order-of-magnitude point for the flagship warm paths
        # (round-15 verdict item 5): build a 10x fixture and sweep the
        # named registry entries base-vs-10x with checksums, merging a
        # data_scale_10x section into the committed record. Standalone
        # mode (like --gram-only in the history harness) so the
        # 2x/4x/8x points are never silently re-baselined.
        i = args.index("--10x")
        names = args[i + 1].split(",")
        spark = get_spark(app_name="bench-scaling-10x")
        build_kx(spark, 10, DERIVED_10X)
        queries = all_queries()
        queries["q1_pricing_summary"](spark, BASE).count()  # warm
        r10 = _sweep(spark, queries, names, DERIVED_10X)

        def _hex10(c: int | None) -> str | None:
            return None if c is None else f"{c & 0xFFFFFFFFFFFFFFFF:016x}"

        results_10x = {
            name: {
                "t_sf0.1": round(tb, 4),
                "t_10x": round(t10, 4),
                "ratio_10x": round(t10 / tb, 2),
                "rows_sf0.1": nb,
                "rows_10x": n10,
                "row_ratio_10x": round(n10 / max(nb, 1), 2),
                "chk_sf0.1": _hex10(cb),
                "chk_10x": _hex10(ck),
            }
            for name, (tb, t10, nb, n10, cb, ck) in r10.items()
        }
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALING.json",
        )
        with open(path) as fh:
            merged = json.load(fh)
        merged["data_scale_10x"] = 10.0
        merged.setdefault("queries_10x", {}).update(results_10x)
        merged["note_10x"] = (
            "order-of-magnitude (sf1-equivalent, 10x kx-derived) point "
            "for the flagship warm paths: whole-fixture scaling, so "
            "batch AND history grow 10x together - the warm per-ingest "
            "claim predicts the ratio tracks the BATCH scale (~10x the "
            "per-batch work) with the state-build untimed (run 1 of "
            "the interleaved min-of-2 pays it per fixture; the warm "
            "dirs cache makes runs 2+ the per-ingest price). "
            "Checksummed like every scaling point."
        )
        with open(path, "w") as fh:
            json.dump(merged, fh, indent=1)
        print(json.dumps(results_10x))
        return

    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    n = int(args[0]) if args else len(TOP)
    top = [x for x in TOP[:n] if only is None or x in only]
    top_4x = [x for x in TOP_4X if only is None or x in only]
    top_8x = [x for x in TOP_8X if only is None or x in only]
    spark = get_spark(app_name="bench-scaling")
    build_kx(spark, 2, DERIVED_2X)
    build_kx(spark, 4, DERIVED_4X)
    queries = all_queries()
    queries["q1_pricing_summary"](spark, BASE).count()  # warm

    def _hex(c: int | None) -> str | None:
        # signed 64-bit bit_xor rendered as fixed-width hex; None =
        # run-to-run nondeterministic result set
        return None if c is None else f"{c & 0xFFFFFFFFFFFFFFFF:016x}"

    r2 = _sweep(spark, queries, top, DERIVED_2X)
    results = {
        name: {
            "t_sf0.1": round(tb, 4),
            "t_2x": round(t2, 4),
            "ratio": round(t2 / tb, 2),
            "chk_sf0.1": _hex(cb),
            "chk_2x": _hex(ck),
        }
        for name, (tb, t2, _nb, _nk, cb, ck) in r2.items()
    }
    print("# --- 4x sweep ---", file=sys.stderr)
    r4 = _sweep(spark, queries, top_4x, DERIVED_4X)
    results_4x = {}
    for name, (tb, t4, nb4, nk4, cb4, ck4) in r4.items():
        entry = {
            "t_sf0.1": round(tb, 4),
            "t_4x": round(t4, 4),
            "ratio_4x": round(t4 / tb, 2),
            "rows_sf0.1": nb4,
            "rows_4x": nk4,
            "chk_sf0.1": _hex(cb4),
            "chk_4x": _hex(ck4),
        }
        if name in results:
            # curvature: ratio(4x)/ratio(2x) ~1 = linear, ~2 = quadratic
            entry["curvature"] = round(
                (t4 / tb) / max(results[name]["ratio"], 0.01), 2
            )
        results_4x[name] = entry
    # calibration evidence counts (round-10 verdict item 2): its cost is
    # linear in the md5-LSH candidate stream, so record that stream's
    # size at 1x and 4x next to the time ratio
    if "minhash_estimate_calibration" in results_4x:
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            minhash_md5_pairs,
        )
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            _documents_with_dups,
        )

        def _calib_cands(sf_dir: str) -> int:
            d = _documents_with_dups(spark, sf_dir)
            return minhash_md5_pairs(
                d, "text", "doc_id", n_gram=3, k=16, bands=8
            ).count()

        c1, c4 = _calib_cands(BASE), _calib_cands(DERIVED_4X)
        results_4x["minhash_estimate_calibration"].update(
            {
                "candidates_sf0.1": c1,
                "candidates_4x": c4,
                "candidate_ratio_4x": round(c4 / max(c1, 1), 2),
            }
        )
    # increment evidence counts (round-11 verdict item 7): the per-batch
    # LSH stage has TWO candidate streams with different scaling laws —
    # batch-internal pairs (batch x batch banding) and batch-vs-history
    # probes (batch signatures against the persisted index) — so record
    # both at 1x and 4x, counted with the query's own generators, next
    # to the time ratios
    inc_names = [
        nm
        for nm in ("corpus_recipe_increment", "corpus_recipe_increment_warm")
        if nm in results_4x
    ]
    if inc_names:
        from opendata_gov_lt_mysql_import_spark.operators.dedup import (
            _spread,
            incremental_minhash_neardup,
            minhash_history_index,
            minhash_md5_pairs,
        )
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            _recipe_bp,
            _recipe_clean_expr,
            _recipe_hist_batch,
        )

        def _increment_cands(sf_dir: str) -> tuple[int, int]:
            hist, batch = _recipe_hist_batch(spark, sf_dir)
            hist = _spread(hist)
            bp = _recipe_bp(hist)
            scrub_b = (
                _spread(batch)
                .crossJoin(F.broadcast(bp))
                .select("doc_id", _recipe_clean_expr().alias("text"))
            )
            scrub_h = hist.crossJoin(F.broadcast(bp)).select(
                "doc_id", _recipe_clean_expr().alias("text")
            )
            n_int = (
                minhash_md5_pairs(
                    scrub_b, "text", "doc_id", n_gram=3, k=16, bands=8
                )
                .filter(F.col("n_match") >= 5)
                .count()
            )
            idx = minhash_history_index(
                scrub_h, "text", "doc_id", n_gram=3, k=16, bands=8
            )
            n_x = (
                incremental_minhash_neardup(
                    scrub_b, idx, "text", "doc_id", n_gram=3, k=16, bands=8
                )
                .filter(F.col("n_match") >= 5)
                .count()
            )
            return n_int, n_x

        i1, x1 = _increment_cands(BASE)
        i4, x4 = _increment_cands(DERIVED_4X)
        for nm in inc_names:
            results_4x[nm].update(
                {
                    "batch_internal_cands_sf0.1": i1,
                    "batch_internal_cands_4x": i4,
                    "batch_internal_ratio_4x": round(i4 / max(i1, 1), 2),
                    "batch_vs_history_cands_sf0.1": x1,
                    "batch_vs_history_cands_4x": x4,
                    "batch_vs_history_ratio_4x": round(x4 / max(x1, 1), 2),
                }
            )

    print("# --- 8x sweep ---", file=sys.stderr)
    results_8x = {}
    cand_base: dict[str, int] = {}
    cand_8x: dict[str, int] = {}
    if top_8x:
        build_kx(spark, 8, DERIVED_8X)
        cand_base = _candidate_counts(spark, BASE)
        cand_8x = _candidate_counts(spark, DERIVED_8X)
    r8 = _sweep(spark, queries, top_8x, DERIVED_8X) if top_8x else {}
    for name, (tb, t8, nb, n8, cb8, ck8) in r8.items():
        entry = {
            "t_sf0.1": round(tb, 4),
            "t_8x": round(t8, 4),
            "ratio_8x": round(t8 / tb, 2),
            "rows_sf0.1": nb,
            "rows_8x": n8,
            "row_ratio_8x": round(n8 / max(nb, 1), 2),
            "chk_sf0.1": _hex(cb8),
            "chk_8x": _hex(ck8),
        }
        if name in results_4x:
            # curvature vs the 4x point: data doubled again; < 2 keeps
            # the entry inside the linear band of the stated model
            entry["curvature_8x"] = round(
                (t8 / tb) / max(results_4x[name]["ratio_4x"], 0.01), 2
            )
        if name in cand_base:
            entry["candidates_sf0.1"] = cand_base[name]
            entry["candidates_8x"] = cand_8x[name]
            entry["candidate_ratio_8x"] = round(
                cand_8x[name] / max(cand_base[name], 1), 2
            )
        results_8x[name] = entry

    out = {
        "note": (
            "kx-derived datasets (key-offset copies, fixed dims, "
            "perturbed texts/embeddings); 2x ratio ~<=2 = linear plan, "
            "~4 = quadratic candidate generation. The 4x section gives "
            "a third point for the heaviest candidate generators: "
            "curvature = ratio_4x/ratio_2x. For T = a + b*S (linear) "
            "curvature lies in [1, 2] (-> 2 when variable cost dominates "
            "fixed overhead); a quadratic term drives it toward 4. "
            "Single shared box, min-of-2 interleaved."
        ),
        "base": "sf0.1",
        "data_scale": 2.0,
        "queries": results,
        "data_scale_4x": 4.0,
        "queries_4x": results_4x,
        "data_scale_8x": 8.0,
        "queries_8x": results_8x,
        "note_8x": (
            "fourth point for the two highest-4x-curvature entries; "
            "row/candidate counts recorded so candidate-set growth is "
            "separated from per-candidate cost (time ratio tracking the "
            "count ratio = linear per-candidate work). curvature_8x = "
            "ratio_8x/ratio_4x, linear band < 2."
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json",
    )
    if only is not None and os.path.exists(path):
        # subset run: merge the new points into the committed record
        with open(path) as fh:
            merged = json.load(fh)
        for key in ("queries", "queries_4x", "queries_8x"):
            merged.setdefault(key, {}).update(out[key])
        out = merged
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
