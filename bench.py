"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is fully evaluated: a xxhash64 checksum over EVERY output
column is aggregated, so Catalyst cannot prune the projection expressions
(a bare ``count()`` would reduce map-only plans — text_quality, lang-ID,
fingerprints — to a parquet row-count scan and time nothing).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from opendata_gov_lt_mysql_import_spark.session import get_spark  # noqa: E402
from opendata_gov_lt_mysql_import_spark.queries import all_queries  # noqa: E402
import opendata_gov_lt_mysql_import_spark.queries_ml  # noqa: F401, E402
import opendata_gov_lt_mysql_import_spark.queries_sql  # noqa: F401, E402

# Headline set: the scale-sensitive queries (scans, joins, aggs, window,
# closure, dedup families, similarity, text analysis). Cheap point lookups
# are left out — they don't measure anything at sf0.1.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_supplier_volume",
    "j1_left_join_default",
    "j3_mn_collect",
    "window_top_order_per_customer",
    "events_hourly_rollup",
    "w1_tree_closure",
    "f4_package_tags",
    "f5_changed_rows",
    "dedup_exact_groups",
    "text_quality",
    "text_quality_filter",
    "text_clean",
    "text_lang_id",
    "doc_fingerprint",
    "ann_topk_cosine",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "minhash_lsh_pairs",
    "ngram_jaccard_verify_lsh",
    "events_sessionize",
    "events_asof_last_order",
    "events_range_join_recent",
    "text_bpe_token_count",
    "rollup_status_priority",
    "scalar_subquery",
    "exists_subquery",
    "percentile_price",
    "cube_status_priority",
    "window_funcs_suite",
    "rolling_7d_revenue",
    "chunk_documents",
    "pii_scrub",
    "token_topk",
    "tfidf_top_keywords",
    "pack_sequences",
    "nearest_centroid_assign",
    "text_repetition",
    "corpus_stats",
    "embedding_quantize",
    "kmeans_one_iter",
    "repeated_ngrams",
    "quality_model_score",
    "scd2_user_event_type",
    "profile_orders",
    "bloom_semi_join_orders",
    "corpus_prep_pipeline",
    "funnel_view_click_purchase",
    "cohort_retention",
    "decontaminate_hits",
    "posting_lists",
    "events_zscore_outliers",
    # round-5 surface: new plan shapes measured from the round they land
    "q7_volume_shipping",
    "q10_returned_items",
    "q13_customer_distribution",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q22_dormant_customers",
    "w1_tree_closure_recursive",
    "dq_constraint_report",
    "events_gap_fill_hourly",
    "events_view_click_pairs",
    "events_value_trend",
    "matview_incremental_refresh",
    "semantic_dedup_arrow",
    "q8_market_share",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q4_priority_late_orders",
    "q9_nation_year_profit",
    "q11_important_parts",
    "q12_priority_by_linestatus",
    "q16_supplier_part_counts",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "q20_promotable_suppliers",
    "bpe_pair_counts",
    "incremental_neardup_lsh",
    # round-6 surface
    "zorder_pruned_scan",
    # round-7 surface: exact substring dedup (window fingerprints —
    # a new explode-heavy plan shape worth tracking at scale), the
    # incremental batch-vs-history span probe, fixed-point iterative
    # clustering, the bigram-LM join, and the CMS sketch build+probe
    "substring_dup_spans",
    "substring_dedup_clean",
    "incremental_substring_dedup",
    "kmeans_k_fixed",
    "bigram_logprob_score",
    "cms_token_topk",
    # round-7 ranking/selection/graph-structure wave: fixed-point BM25
    # top-k, DSIR importance weights (256-bucket integer reduction), and
    # degree-oriented triangle counting (the wedge join is the entry
    # whose cost is most sensitive to orientation — track it)
    "bm25_topk_docs",
    "dsir_importance_weights",
    "triangle_count_copurchase",
    "pmi_collocations",
    # KMV distinct sketch: the dedup + salted two-phase bottom-k plan
    # shape (set-semantics shuffle followed by two bounded windows)
    "kmv_distinct_sketch",
    # boilerplate scrub: line-DF count + key join + positional re-agg
    "boilerplate_line_scrub",
    # RRF hybrid retrieval: two TakeOrdered top-k's fused on <=2k rows
    "rrf_hybrid_topk",
    # incremental boilerplate scrub: index build + batch-sized probe
    "incremental_boilerplate_scrub",
    # winnowing: md5-dense map projection + one posting shuffle
    "winnow_dup_pairs",
    # round-9 surface: the winnow→span composition (screen + localize,
    # the most plan-diverse entry: winnow DAG → checkpoint → restricted
    # span join → islands) and the per-source token-budget greedy fill
    "winnow_span_report",
    "token_budget_mixture",
    # round-9 wave: URL-canonical dedup (map-only canonicalize + one
    # groupBy), CCNet tertiles (bigram DAG + per-lang window), hashed
    # classifier (zero-shuffle fused map), datasheet (two dim-keyed aggs)
    "url_canonical_dedup",
    "ccnet_perplexity_buckets",
    "quality_classifier_hashed",
    "corpus_datasheet",
    # k-center coreset: k-1 TakeOrdered(1) scans + one broadcast-argmin
    "kcenter_coreset",
    # JL sketch: 16 fused zip_with aggregates, zero-shuffle map pass
    "jl_projection_sketch",
    # next-event pairs: WindowGroupLimit cap + map-side count + collect
    "next_event_training_pairs",
    # image dHash dedup: BMP encode/decode/hash through mapInPandas
    "image_dhash_dedup",
    # estimator calibration: md5 LSH + linear verify + 10-cell report
    "minhash_estimate_calibration",
    # winnow production twin: xxhash64 fingerprints, same plan as md5
    "winnow_dup_pairs_fast",
    # epoch upsampling: zero-shuffle explode whose fan-out IS the recipe
    "epoch_upsample_mixture",
    # round-10 flagship: the nine-stage corpus recipe as one DAG —
    # url dedup → exact dedup → scrub → LSH near-dup → gopher gate →
    # decontaminate → mixture → upsample → shard, datasheet output
    "corpus_recipe_pipeline",
    # skew pair: zipfian key (60% of rows on one key) through the
    # salted join vs the plain shuffle join — the wall-clock delta IS
    # the measurement (how much of the straggler AQE recovers alone)
    "skew_salted_join_zipf",
    "skew_plain_join_zipf",
    # round-11: the 95%-hot-key skew pair (the AQE-vs-salting
    # crossover probe)
    "skew_salted_join_hot95",
    "skew_plain_join_hot95",
    # audio perceptual dedup: WAV encode/decode/envelope-hash through
    # mapInPandas (the audio twin of image_dhash_dedup)
    "audio_envelope_dedup",
    # ANN recall calibration: exact panel scoring + IVF probe overlap
    "ann_recall_calibration",
    # in-engine perceptron training: 3 unrolled epochs of broadcast
    # weight joins + gradient aggregates over the hashed feature frame
    "classifier_train_perceptron",
    # recipe removed-sample audit: shares the labeled frame with the
    # datasheet; cost is the labeling DAG + six bounded rank partitions
    "corpus_recipe_rejects",
    # product quantization: subspace explode + 32-row codebook argmin;
    # ADC search: 32-entry lookup-table join + TakeOrdered
    "pq_quantize_embeddings",
    "pq_adc_topk",
    # PQ recall: the calibration trilogy's third leg (ADC vs exact L2)
    "pq_recall_calibration",
    # source overlap matrix: fingerprint groupBy + HOF pair explode —
    # the no-self-join provenance diagnostic
    "source_overlap_matrix",
    # round-11: IVFADC — coarse-cell probe restricting the ADC code
    # scan (the FAISS serving layout), and its recall audit on the
    # fixed 64-query panel (cells + codes composed loss)
    "ann_ivfadc_topk",
    "ivfadc_recall_calibration",
    # round-11: learned PQ codebooks — two unrolled fixed-point Lloyd
    # iterations per subspace (broadcast codebook argmin + 32x16-cell
    # update shuffle per round)
    "pq_train_codebook",
    # round-11: ADC search on the trained codebook (the closed Jégou
    # loop: train -> compress -> serve, all fixed-point BIGINT)
    "pq_adc_topk_trained",
    # round-11: recall on the trained codes vs the data-as-codebook
    # baseline (mean recall@10 703 -> 1172 bp at sf0.001)
    "pq_recall_calibration_trained",
    # round-11: IVF index maintenance — incremental batch assignment
    # to frozen cells + the per-cell occupancy-drift report (the
    # rebalance trigger an index operator watches)
    "ann_ivf_occupancy_drift",
    # round-11: the incremental recipe — history labeled once (the
    # amortized state build), batch labeled via index probes, merged
    # slim mixture; output = the combined one-shot datasheet
    "corpus_recipe_increment",
    # round-12: the WARM increment — state persisted once as snapshot
    # tables (run 1 of the min-of-3 pays the build), so the recorded
    # number is the honest per-ingest cost: read state, label one
    # batch via probes, emit the combined datasheet
    "corpus_recipe_increment_warm",
    # round-12: residual IVFADC (Jégou §IV-A — PQ over x − q1(x) with
    # per-probed-cell query lookup tables) and the controlled
    # raw-vs-residual gain audit on the clustered corpus
    "ann_ivfadc_residual_topk",
    "ivfadc_residual_gain_audit",
    # round-12: the nprobe tuning curve (recall-vs-scanned at {1,2,4})
    # and the drift→retrain maintenance audit (frozen vs one-round
    # retrained pivots on the drifted corpus)
    "ivfadc_nprobe_sweep",
    "ann_ivf_recall_after_drift",
    # round-12: warm-index serving — codes persisted once as a
    # cell-clustered snapshot, each query reads only the probed cells'
    # files (2/16, pytest-asserted) + one broadcast join; min-of-3
    # prices the serve (run 1 pays the index build)
    "ann_ivfadc_warm_serve",
    # round-12: the maintenance loop — ingest one jittered batch into
    # the warm index (frozen cells + frozen codebook, exactly-once
    # append) and serve over the grown index; min-of-3 prices the
    # post-ingest serve (run 1 pays build + ingest)
    "ann_ivfadc_warm_ingest_serve",
    # round-12: compaction — rewrite the two-generation code table as
    # one clustered file set and serve over it (rows provably
    # unchanged: same oracle as the ingest serve)
    "ann_ivfadc_warm_compact_serve",
    # round-12: the nprobe curve re-measured with STRONG (residual)
    # codes — flat recall where raw codes fell (over-probing wasteful
    # vs harmful), completing the tuning-rule pair
    "ivfadc_residual_nprobe_sweep",
    # round-12: batched panel serving — 64 queries answered in ONE
    # scan of the persisted code table (diverse batches defeat file
    # pruning, so batching amortizes the scan instead)
    "ann_ivfadc_warm_panel_serve",
    "ann_ivfadc_warm_serve_dispatch",
    # round-13: the retrain decision row — composes the occupancy-drift
    # and recall-after-drift audits (their cost IS this entry's cost)
    # into the skew-triggered decision an operator acts on
    "ann_ivf_retrain_decision",
    # round-13: near-dup verification served from the persisted gram
    # index — two keyed joins + per-row array_intersect, same oracle
    # as the text-path md5 entry (index verify ≡ text verify, proven)
    "ngram_jaccard_verify_grams_index",
    "ngram_jaccard_verify_warm",
    # round-13: occupancy refreshed from table CDC — history counts
    # from the pinned base version, batch counts from the appended
    # files only (read_snapshot_changes); min-of-3 prices the refresh
    "ann_ivf_occupancy_incremental",
    # round-13: SemDeDup's incremental half — a new embedding batch
    # screened against history inside its centroid block (batch×block
    # pairs only; history-history pairs never form)
    "incremental_semantic_dedup",
    "incremental_semantic_dedup_ivf",
    # round-14: simhash_pairs switched to the JVM expr implementation
    # (its xxhash64 votes replay in SQL -> oracle-exact); price the
    # impl switch on the record
    "simhash_pairs",
    # round-15: the retrain ACTION — occupancy-scaled re-cluster into a
    # new snapshot generation (run 1 pays ingest+retrain; min-of-N
    # prices gen-2 serving), the post-retrain SemDeDup screen (the
    # falsifier's managed-constant side), and the gram table's
    # compaction fold (run 1 pays the rewrite; min-of-N prices verify
    # over the compacted layout)
    "ann_ivf_retrain_apply_serve",
    "incremental_semantic_dedup_ivf_retrained",
    "ngram_jaccard_verify_warm_compact",
]


def force_eval_chk(df) -> tuple[int, int]:
    """Evaluate every column of every row; return (row count, checksum).

    bit_xor over xxhash64(all columns) makes each projection expression
    load-bearing (nothing prunable), is order-insensitive, and cannot
    overflow under ANSI arithmetic. Map-typed columns are serialized via
    to_json first (xxhash64 rejects MapType). The checksum is what makes
    scaling/curvature points self-verifying across rounds (round-13
    verdict item 6): a timing claim about a result set that silently
    changed is worthless, so SCALING.json records the checksum next to
    every timing.
    """
    cols = []
    for fld in df.schema.fields:
        c = F.col(fld.name)
        if "map<" in fld.dataType.simpleString():
            c = F.to_json(c)
        cols.append(c)
    hashed = df.select(F.xxhash64(*cols).alias("h"))
    row = hashed.agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("chk")
    ).collect()[0]
    return row["n"], row["chk"] if row["chk"] is not None else 0


def force_eval(df) -> int:
    """Row count via :func:`force_eval_chk` (checksum discarded)."""
    return force_eval_chk(df)[0]


def adjudication_gate(
    deltas: dict, argv: list[str]
) -> tuple[bool, str | None]:
    """(refuse_commit, adjudication_note) for a --commit run carrying
    cross-round >1.3x deltas. Round-13 postmortem: the end-of-round
    --commit run carried 51 un-triaged flags and silently became the
    on-record number; now a flagged run refuses to replace
    BENCH_COMMITTED.json unless --adjudicated=<note> attests the
    interleaved triage (the note lands in the record itself). A bare
    --adjudicated= (empty note) does NOT count as an attestation."""
    note = next(
        (
            a.split("=", 1)[1]
            for a in argv
            if a.startswith("--adjudicated=")
        ),
        None,
    )
    if not note:
        note = None
    return (bool(deltas) and note is None, note)


def _prev_round_committed(here: str) -> tuple[str | None, dict]:
    """(commit sha, committed per-query timings) of BENCH_COMMITTED.json
    as of the PREVIOUS round boundary — the most recent driver
    round-artifact commit (message "round N: ..."). Round 11's
    cross-round adjudication drifted because BENCH_COMPARE.json was run
    against an intra-round ref; anchoring the delta list to the round
    boundary commit makes the adjudication target non-negotiable
    (round-11 verdict item 3)."""
    import re
    import subprocess

    try:
        log = subprocess.run(
            ["git", "log", "--format=%H %s", "-n", "500"],
            capture_output=True, text=True, cwd=here, check=True,
        ).stdout
        sha = None
        # Anchor ONLY on driver round-boundary commits. The driver's
        # convention is exact and lowercase: "round N: verdict/..." or
        # "round N: end-of-round snapshot (...)". Builder commits in the
        # history start with "Round 11:"/"Round-12 bench record:" and a
        # loose `^round[ -]?\d+` (or even a colon-only tightening) would
        # re-anchor the cross-round audit to an intra-round commit
        # (round-13 advisory, bench.py:327).
        round_re = re.compile(r"^round \d+: (verdict|end-of-round)")
        for line in log.splitlines():
            parts = line.split(" ", 1)
            if len(parts) == 2 and round_re.match(parts[1]):
                sha = parts[0]
                break
        if sha is None:
            print(
                "bench: no round-boundary commit found in the last 500 "
                "— cross-round delta audit disabled",
                file=sys.stderr,
            )
            return None, {}
        rec = subprocess.run(
            ["git", "show", f"{sha}:BENCH_COMMITTED.json"],
            capture_output=True, text=True, cwd=here, check=True,
        ).stdout
        return sha, json.loads(rec).get("queries", {})
    except (subprocess.CalledProcessError, OSError, json.JSONDecodeError,
            ValueError):
        return None, {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    queries = all_queries()

    # warm the JVM + parquet footers with one tiny action
    queries["q1_pricing_summary"](spark, sf_dir).count()

    # best of three runs per query: single-shot wall clock on a shared
    # box swings +/-50% with background load, and even min-of-2 left
    # sub-second entries jittering past a 20% band run-to-run; min-of-3
    # reports the query's actual cost for ~17s extra wall. Cache cleared
    # between runs so persisted intermediates (LSH signatures) don't
    # accumulate or flatter later runs. Full-evaluation checksum
    # protocol (BASELINE.md) unchanged.
    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        fn = queries[name]
        runs: list[float] = []
        n = 0
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = force_eval(df)
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[0], 4)
        # min/median/max across the 3 runs: a wide max/min ratio marks a
        # noisy entry (shared-box background load), so a regressed *min*
        # with tight spread is a real regression and a regressed min with
        # huge spread is measurement noise — distinguishable at a glance
        spread[name] = {
            "min": round(runs[0], 4),
            "med": round(runs[1], 4),
            "max": round(runs[2], 4),
        }
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full record (timings + spread + scaling appendix) outgrew the
    # driver's stdout tail window in rounds 5 AND 6 (BENCH_r0{5,6}.json
    # parsed:null — the round-5 "compact" line still carried the 81-entry
    # per-query map: 2,915 chars vs the driver's 2,000-char tail). Split
    # the record for real this time: the FULL JSON (with the per-query
    # map) is written to BENCH_LOCAL.json (committed, judge-readable);
    # stdout carries ONE compact line — metric/value/unit/n/sf +
    # slowest-10 only, ~700 chars — small enough to survive the window.
    full = {
        "metric": "headline_query_wall_clock_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "sf": sf_val,
    }
    # sf-scaling appendix: tools/bench_scaling.py runs the most expensive
    # entries at sf0.1 vs a key-consistent 2x dataset and commits the
    # ratios; embed the committed result so the full record carries it.
    here = os.path.dirname(os.path.abspath(__file__))
    appendix = os.path.join(here, "SCALING.json")
    if os.path.exists(appendix):
        try:
            with open(appendix) as fh:
                full["scaling_appendix"] = json.load(fh)
        except (OSError, json.JSONDecodeError):
            pass
    # Record split (round-10, ends the four-round stale-record loop):
    # BENCH_LOCAL.json is the MACHINE-RUN artifact — rewritten by every
    # invocation, including the driver's own post-final-commit run, so it
    # can never be committed "fresh" and is .gitignored like
    # PROGRESS.jsonl/LEAKCHECK.json. The COMMITTED record lives under a
    # distinct name, BENCH_COMMITTED.json, refreshed only on an explicit
    # `--commit` flag so the builder controls exactly what goes into
    # version control and `git status` is clean at round end by
    # construction.
    local_path = os.path.join(here, "BENCH_LOCAL.json")
    # A swallowed write failure must not masquerade as a fresh record:
    # full_record is the filename only when the write SUCCEEDED, else null
    # so consumers can detect the miss (round-6 advisory).
    full_record: str | None = "BENCH_LOCAL.json"
    try:
        with open(local_path, "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    except OSError:
        full_record = None
    committed_path = os.path.join(here, "BENCH_COMMITTED.json")
    if "--commit" in sys.argv:
        # Cross-round delta list, auto-emitted INTO the committed record
        # so the >1.3x entries vs the PREVIOUS ROUND's committed numbers
        # are on the record at commit time with a pinned ref — each one
        # is a tools/bench_compare.py adjudication TODO (interleaved
        # A/B on the same box; raw cross-day numbers are not verdicts).
        prev_sha, prev_q = _prev_round_committed(here)
        if not prev_q:
            # A missing anchor silently disables the ENTIRE cross-round
            # audit (delta list + adjudication gate) — the exact class
            # of failure the gate exists for, re-entered through the
            # back door (e.g. a restyled boundary subject breaking the
            # matcher). Refuse unless explicitly attested, and put the
            # attestation on the record.
            refused, adj_note = adjudication_gate(
                {"<no-anchor>": True}, sys.argv
            )
            if refused:
                print(
                    "# REFUSED: no previous-round committed baseline "
                    "found (boundary-subject matcher came up empty) — "
                    "the cross-round delta audit cannot run. Fix the "
                    "anchor, or re-run with --adjudicated='<why no "
                    "baseline exists>'.",
                    file=sys.stderr,
                )
                sys.exit(2)
            full["deltas_vs_prev_round"] = {
                "ref_commit": None,
                "band": 1.3,
                "entries": {},
                "adjudication": adj_note,
            }
        if prev_q:
            deltas = {}
            for name, now in timings.items():
                was = prev_q.get(name)
                if was and was > 0 and now / was > 1.3:
                    deltas[name] = {
                        "prev": was, "now": now,
                        "ratio": round(now / was, 2),
                    }
            full["deltas_vs_prev_round"] = {
                "ref_commit": prev_sha,
                "band": 1.3,
                "entries": deltas,
            }
            if deltas:
                print(
                    f"# NOTE: {len(deltas)} entries >1.3x vs previous "
                    f"round ({prev_sha[:8]}): {sorted(deltas)} — "
                    "adjudicate with tools/bench_compare.py "
                    f"{prev_sha[:8]} --entries "
                    + ",".join(sorted(deltas)),
                    file=sys.stderr,
                )
            # Round-13 postmortem (VERDICT r13 "what's wrong" item 2):
            # the end-of-round --commit run carried 51 un-triaged >1.3x
            # flags — a busy-box record that contradicted the README by
            # ~20% — and nothing stopped it from becoming the on-record
            # number. Structural fix: a flagged run REFUSES to replace
            # the committed record unless the caller attests the
            # adjudication with --adjudicated=<note>; the note is
            # embedded in the record so the attestation is itself on
            # the record. Un-flagged runs commit as before.
            refused, adj_note = adjudication_gate(deltas, sys.argv)
            if refused:
                print(
                    f"# REFUSED: {len(deltas)} un-adjudicated >1.3x "
                    "deltas — BENCH_COMMITTED.json left untouched. "
                    "Triaging via the interleaved protocol, then re-run "
                    "with --adjudicated='<summary of the triage>'.",
                    file=sys.stderr,
                )
                sys.exit(2)
            if deltas:
                full["deltas_vs_prev_round"]["adjudication"] = adj_note
        with open(committed_path, "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    else:
        # Structural staleness only: warn when the committed record's
        # ENTRY SET differs from this run's (new/removed headline
        # queries that never made it into the committed record). Timing
        # drift between runs is inherent to a shared box and must NOT
        # warn — that was the unwinnable loop.
        try:
            with open(committed_path) as fh:
                committed_names = set(json.load(fh).get("queries", {}))
            if committed_names != set(timings):
                delta = sorted(set(timings) ^ committed_names)
                print(
                    "# WARNING: BENCH_COMMITTED.json entry set differs "
                    f"from this run ({delta[:8]}...) — rerun "
                    "`python bench.py --commit` and commit the result",
                    file=sys.stderr,
                )
        except (OSError, json.JSONDecodeError):
            print(
                "# WARNING: no readable BENCH_COMMITTED.json — run "
                "`python bench.py --commit` once and commit it",
                file=sys.stderr,
            )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    out = {
        "metric": "headline_query_wall_clock_total",
        "value": total,
        "unit": "sec",
        "n": len(timings),
        "slowest_10": slowest,
        "sf": sf_val,
        "full_record": full_record,
    }
    line = json.dumps(out)
    # Driver tail window is 2,000 chars; the line must fit WHOLE.
    assert len(line) < 1900, f"stdout record too long: {len(line)}"
    print(line)


if __name__ == "__main__":
    main()
