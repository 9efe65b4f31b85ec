"""Fixed-batch, growing-history scaling for the two flagship warm
paths (round-12 verdict item 1).

Every SCALING.json point derives its kx dataset by scaling the WHOLE
fixture, so batch and history grow TOGETHER — a per-ingest time that
doubles at 2x is compatible with both "per-ingest work is batch-sized"
(batch doubled too) and "per-ingest work is O(history)" (the claim's
negation). This harness is the clean falsifier: hold the ingest batch
constant at its sf0.1 size while history alone grows 2x/4x (history
derived from the kx fixture, batch sliced from the BASE fixture — the
same key-disjoint derivation bench_scaling.py uses, and batch ids stay
above every kx history id by construction: history ids < 3e6 + 40k,
batch ids >= 4e6; embedding batch ids are offset by 1e6 >> the 8x-kx
vec_id range).

Under the batch-sized claim the per-ingest ratios should sit ~flat
(≈1, inside box noise), with two honest caveats the operator
docstrings already state: the recipe's index probes and the
contamination gram join STREAM the (columnar, slim) history indexes
map-side — an O(history)-scan term with a small constant — and the IVF
serve reads the probed cells, whose size grows with history. The
falsified alternative (per-ingest work re-labels/re-encodes history)
predicts ratios tracking the history scale (~2 at 2x, ~4 at 4x).

- recipe warm increment: state built ONCE per history scale (untimed,
  the deployment's amortized state build); timed = read state, label
  the FIXED base batch against the grown indexes, emit the combined
  datasheet (exactly `corpus_recipe_increment_warm`'s per-ingest path).
- IVF warm ingest+serve: index built ONCE per history scale (untimed);
  timed = encode the FIXED base batch against the frozen pivots/
  codebook + exactly-once append commit (t_ingest), then the pruned
  serve over the grown index (t_serve). Each timing run appends into a
  FRESH COPY of the committed index tree so replays never stack.

Usage: python tools/bench_history_scaling.py
Merges a "history_scaling" section into SCALING.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opendata_gov_lt_mysql_import_spark.session import get_spark  # noqa: E402
from opendata_gov_lt_mysql_import_spark.sources.parquet import (  # noqa: E402
    load_table,
)
from opendata_gov_lt_mysql_import_spark.sources.snapshots import (  # noqa: E402
    commit_snapshot_idempotent,
    read_snapshot,
)
from bench import force_eval  # noqa: E402
from tools.bench_scaling import (  # noqa: E402
    BASE,
    DERIVED_2X,
    DERIVED_4X,
    DERIVED_8X,
    build_kx,
)

RUNS = 2  # min-of-2, interleaved across history scales

# the one falsifier series where flat is NOT the expectation — see
# semdedup_point's docstring
_SEMDEDUP_NOTE = (
    "fixed base-fixture batch (jittered construction over base "
    "embeddings, frozen kx pivots) screened against kx history inside "
    "its own pinned-snapshot cell blocks. UNLIKE the recipe/IVF/gram "
    "points, flat is NOT the expectation: with the 16-cell geometry "
    "frozen, per-cell occupancy grows linearly with history, so the "
    "batch x occupancy pair term tracks the scale - the quantified WHY "
    "of the retrain trigger (ann_ivf_retrain_decision keys on exactly "
    "this occupancy growth; retraining with cell count ~ corpus keeps "
    "per-ingest screen cost batch-sized)"
)


def _min_of(runs: list[float]) -> float:
    return round(min(runs), 4)


def recipe_point(spark, hist_dir: str, base_batch) -> float:
    """One timed per-ingest run of the warm recipe increment: state is
    the build-once cache (`_recipe_warm_dirs(hist_dir)` — history from
    the kx fixture), the batch is the FIXED base-slice frame."""
    from opendata_gov_lt_mysql_import_spark.queries_ml import (
        _recipe_combined_datasheet,
        _recipe_label_batch,
        _recipe_surv_slim,
        _recipe_warm_dirs,
        _recipe_warm_state,
    )

    dirs = _recipe_warm_dirs(spark, hist_dir)  # cached after run 1
    t0 = time.perf_counter()
    state = _recipe_warm_state(spark, dirs)
    blab = _recipe_label_batch(base_batch, state)
    surv = read_snapshot(spark, dirs["surv"]).unionByName(
        _recipe_surv_slim(blab)
    )
    force_eval(
        _recipe_combined_datasheet(
            read_snapshot(spark, dirs["hist_agg"]), blab, surv
        )
    )
    return time.perf_counter() - t0


def ivf_point(spark, hist_dir: str) -> tuple[float, float]:
    """(t_ingest, t_serve) for one warm-index maintenance round: the
    FIXED base batch (jittered clustered construction over the BASE
    embeddings, encoded against the kx index's FROZEN pivots/codebook)
    appended into a fresh copy of the kx index, then the pruned serve
    over the grown copy."""
    from opendata_gov_lt_mysql_import_spark.queries_ml import (
        _ivfadc_batch_codes,
        _ivfadc_jittered_batch,
        _ivfadc_serve,
        _ivfadc_warm_dirs,
        _rescl_corpus,
    )

    dirs = _ivfadc_warm_dirs(spark, hist_dir)  # cached after run 1
    piv0 = read_snapshot(spark, dirs["pivots"], version=dirs["pivots_version"])
    rcb = read_snapshot(spark, dirs["codebook"], version=dirs["codebook_version"])
    emb64_base = load_table(spark, BASE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    scratch = tempfile.mkdtemp(prefix="hist_scale_ivf_")
    try:
        codes_copy = os.path.join(scratch, "codes")
        shutil.copytree(dirs["codes"], codes_copy)
        dirs_run = dict(dirs)
        dirs_run["codes"] = codes_copy

        t0 = time.perf_counter()
        bcodes = _ivfadc_batch_codes(
            _ivfadc_jittered_batch(_rescl_corpus(emb64_base, piv0)),
            piv0,
            rcb,
        )
        commit_snapshot_idempotent(
            bcodes,
            codes_copy,
            txn_id="hist-scale-ingest",
            mode="append",
            cluster_by=["pid"],
            target_files=16,
        )
        t_ingest = time.perf_counter() - t0

        t0 = time.perf_counter()
        force_eval(_ivfadc_serve(spark, hist_dir, dirs_run))
        t_serve = time.perf_counter() - t0
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return t_ingest, t_serve


def _gram_series(d: dict[str, list[float]]) -> dict:
    t1, t2, t4 = _min_of(d["1x"]), _min_of(d["2x"]), _min_of(d["4x"])
    out = {
        "t_hist_1x": t1,
        "t_hist_2x": t2,
        "t_hist_4x": t4,
        "ratio_hist_2x": round(t2 / t1, 2),
        "ratio_hist_4x": round(t4 / t1, 2),
        "note": (
            "fixed base-fixture pair set (candidate generation "
            "precomputed, untimed) verified against the committed "
            "gram table built over kx history; on_missing='error' "
            "proves id coverage at every scale"
        ),
    }
    if d.get("8x"):
        t8 = _min_of(d["8x"])
        out["t_hist_8x"] = t8
        out["ratio_hist_8x"] = round(t8 / t1, 2)
    return out


def gram_point(spark, hist_dir: str, base_pairs) -> float:
    """One timed verify pass of the warm gram-index table (round-13
    verdict item 3's history point): the candidate pair set is FIXED
    (precomputed from the base fixture and localCheckpointed, so
    candidate generation is outside the timing) while the committed
    gram table grows with history. The batch-sized claim: verify is
    two keyed joins + per-row array_intersect over pair-referenced
    rows only — the grown index streams map-side, so the honest
    expectation is mild sub-linear growth (the scan term), not ~2/~4.
    on_missing='error' doubles as the coverage proof: every base pair
    id must exist in every history scale's committed table (base ids
    and the +1e6 clones are preserved by the kx derivation), so a
    derivation change that broke id-stability would raise, not
    silently shrink the verify."""
    from opendata_gov_lt_mysql_import_spark.operators.dedup import (
        jaccard_verify_pairs_grams,
    )
    from opendata_gov_lt_mysql_import_spark.queries_ml import (
        _gram_warm_ingest,
    )

    dirs = _gram_warm_ingest(spark, hist_dir)  # cached after run 1
    t0 = time.perf_counter()
    force_eval(
        jaccard_verify_pairs_grams(
            read_snapshot(spark, dirs["grams"]),
            base_pairs,
            min_jaccard=0.5,
            on_missing="error",
        )
    )
    return time.perf_counter() - t0


def semdedup_point(spark, hist_dir: str) -> float:
    """One timed per-ingest screen of the IVF-blocked incremental
    SemDeDup (`incremental_semantic_dedup_ivf`, round-14): history is
    the kx warm index (pinned pre-ingest codes joined to the kx
    corpus) while the batch is the FIXED base-fixture jittered batch,
    assigned by the kx index's FROZEN pivots — the same per-scale
    batch convention as ivf_point, and the same id-disjointness (batch
    ids = base vec_id + 1e6, above every kx history vec_id). Only
    batch × occupied-cell pairs form (history-history never does) —
    but with the 16-cell geometry FROZEN, per-cell occupancy grows
    linearly with history, so this point is EXPECTED to track the
    scale (measured t ≈ 1.1s + 2.3s × scale): the falsifier here
    quantifies the retrain trigger's economics rather than claiming
    flatness — retraining with cell count ∝ corpus keeps occupancy,
    and hence per-ingest screen cost, batch-sized."""
    from opendata_gov_lt_mysql_import_spark.queries_ml import (
        _ivfadc_warm_dirs,
        _rescl_corpus,
        _semdedup_ivf_batch,
        _semdedup_ivf_screen,
    )

    dirs = _ivfadc_warm_dirs(spark, hist_dir)  # cached after run 1
    piv0 = read_snapshot(spark, dirs["pivots"], version=dirs["pivots_version"])

    def emb64(d):
        return load_table(spark, d, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )

    cl_hist = _rescl_corpus(emb64(hist_dir), piv0)
    batch = _semdedup_ivf_batch(_rescl_corpus(emb64(BASE), piv0))
    t0 = time.perf_counter()
    force_eval(_semdedup_ivf_screen(spark, dirs, cl_hist, batch, piv0))
    return time.perf_counter() - t0


_RETRAINED_NOTE = (
    "the RETRAINED twin of incremental_semantic_dedup_ivf_fixed_batch "
    "(round-15 verdict item 1): same fixed base-fixture batch "
    "(+2e6 ids, every third negated), but screened against kx history "
    "blocked on the RETRAINED generation - cell count scaled to the "
    "corpus by the absolute occupancy rule (32/64/128/256 cells at "
    "1x/2x/4x/8x vs the frozen series' 16 everywhere). The honest "
    "claim is PER-CANDIDATE, not per-wall: the kx fixture derives "
    "history as jittered COPIES of the base vectors, so every batch "
    "vector's TRUE near-duplicate set - and with it the in-cell "
    "candidate floor pairs_retrained_kx - grows with history BY "
    "CONSTRUCTION (no correct screen can be flat on this data). "
    "us_per_pair_kx is the cost per screened candidate: ~flat is the "
    "expectation and the measurement. What the retrain removes is the "
    "occupancy-driven JUNK candidates: pairs_frozen_kx (the 16-cell "
    "geometry's candidate count over the same data) grows ~linearly "
    "PAST the true-duplicate floor, and the frozen series' wall "
    "tracks it. t_retrain is the one-time re-cluster+re-encode cost "
    "per scale (corpus-sized, amortized across ingests)"
)


def retrained_point(spark, hist_dir: str) -> float:
    """One timed per-ingest screen over the RETRAINED geometry: the
    kx index is ingested + retrained once (untimed, cached via the
    warm-dirs latch), then the FIXED base-fixture batch screens
    against kx history inside the gen-2 cell blocks."""
    from opendata_gov_lt_mysql_import_spark.queries_ml import (
        _ivf_retrain,
        _ivfadc_jittered_batch,
        _rescl_corpus,
        _semdedup_ivf_batch,
        _semdedup_ivf_screen,
    )

    dirs = _ivf_retrain(spark, hist_dir)  # cached after run 1
    piv0 = read_snapshot(
        spark, dirs["pivots"], version=dirs["pivots_version"]
    )
    pivd = read_snapshot(
        spark, dirs["pivots"], version=dirs["pivots_retrain_version"]
    )

    def emb64(d):
        return load_table(spark, d, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )

    cl_kx = _rescl_corpus(emb64(hist_dir), piv0)
    hist = cl_kx.unionByName(_ivfadc_jittered_batch(cl_kx))
    batch = _semdedup_ivf_batch(
        _rescl_corpus(emb64(BASE), piv0), offset=2000000
    )
    t0 = time.perf_counter()
    force_eval(
        _semdedup_ivf_screen(
            spark,
            dirs,
            hist,
            batch,
            pivd,
            codes_version=dirs["codes_retrain_version"],
        )
    )
    return time.perf_counter() - t0


def _candidate_counts(spark, hist_dir: str) -> tuple[int, int]:
    """(pairs_frozen, pairs_retrained): the fixed base batch's in-cell
    candidate count under the frozen 16-cell geometry vs the
    retrained occupancy-scaled geometry — the quantitative before/
    after of what the retrain removes (junk candidates beyond the
    true-duplicate floor)."""
    from opendata_gov_lt_mysql_import_spark.queries_ml import (
        _ivf_retrain,
        _l2_col,
        _rescl_corpus,
        _semdedup_ivf_batch,
    )

    dirs = _ivf_retrain(spark, hist_dir)
    piv0 = read_snapshot(
        spark, dirs["pivots"], version=dirs["pivots_version"]
    )
    pivd = read_snapshot(
        spark, dirs["pivots"], version=dirs["pivots_retrain_version"]
    )
    emb64_base = load_table(spark, BASE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    batch = _semdedup_ivf_batch(
        _rescl_corpus(emb64_base, piv0), offset=2000000
    )

    def _basg(piv):
        return (
            batch.crossJoin(F.broadcast(piv))
            .select(
                "vec_id",
                "pid",
                _l2_col(F.col("e"), F.col("pe")).alias("d"),
            )
            .groupBy("vec_id")
            .agg(F.min(F.struct("d", "pid")).alias("_m"))
            .select("vec_id", F.col("_m.pid").alias("pid"))
        )

    def _hasg(version):
        return (
            read_snapshot(spark, dirs["codes"], version=version)
            .filter(F.col("m") == 0)
            .select(F.col("vec_id").alias("hist_id"), "pid")
        )

    frozen = _basg(piv0).join(
        _hasg(dirs["codes_base_version"]), "pid"
    ).count()
    retrained = _basg(pivd).join(
        _hasg(dirs["codes_retrain_version"]), "pid"
    ).count()
    return frozen, retrained


def _retrain_cost(spark, hist_dir: str) -> float:
    """Time the retrain itself (ingest already latched): the one-time
    generation cost the flat screen amortizes."""
    from opendata_gov_lt_mysql_import_spark.queries_ml import (
        _ivf_retrain,
        _ivfadc_warm_ingest,
    )

    _ivfadc_warm_ingest(spark, hist_dir)
    t0 = time.perf_counter()
    _ivf_retrain(spark, hist_dir)
    return time.perf_counter() - t0


def _base_pairs(spark):
    from opendata_gov_lt_mysql_import_spark.operators.dedup import (
        _spread,
        minhash_md5_pairs,
    )
    from opendata_gov_lt_mysql_import_spark.queries_ml import (
        _documents_with_dups,
    )

    d = _spread(_documents_with_dups(spark, BASE))
    return (
        minhash_md5_pairs(d, "text", "doc_id", n_gram=3, k=16, bands=8)
        .filter(F.col("n_match") >= 5)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )


def main() -> None:
    from opendata_gov_lt_mysql_import_spark.queries_ml import (
        _recipe_hist_batch,
    )

    spark = get_spark(app_name="bench-history-scaling")
    build_kx(spark, 2, DERIVED_2X)
    build_kx(spark, 4, DERIVED_4X)
    scales = [("1x", BASE), ("2x", DERIVED_2X), ("4x", DERIVED_4X)]
    if "--with-8x" in sys.argv:
        build_kx(spark, 8, DERIVED_8X)
        scales.append(("8x", DERIVED_8X))

    if "--gram-only" in sys.argv:
        # merge ONLY the gram-verify series into the existing
        # history_scaling record (the recipe/IVF points, including
        # their 8x runs, stay as committed — re-timing them on a
        # possibly different box would silently re-baseline the
        # falsifier)
        pairs = _base_pairs(spark)
        grm: dict[str, list[float]] = {k: [] for k, _ in scales}
        for key, d in scales:
            gram_point(spark, d, pairs)  # build+fold, discard timing
        for _ in range(RUNS):
            for key, d in scales:
                spark.catalog.clearCache()
                grm[key].append(gram_point(spark, d, pairs))
                print(
                    f"# {key}: gram_verify {grm[key][-1]:.2f}s",
                    file=sys.stderr,
                )
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALING.json",
        )
        with open(path) as fh:
            merged = json.load(fh)
        hs = merged.setdefault("history_scaling", {})
        hs["ngram_jaccard_verify_warm_fixed_pairs"] = _gram_series(grm)
        with open(path, "w") as fh:
            json.dump(merged, fh, indent=1)
        print(json.dumps(hs["ngram_jaccard_verify_warm_fixed_pairs"]))
        return

    if "--semdedup-only" in sys.argv:
        # merge ONLY the IVF-blocked SemDeDup series (same selective-
        # merge reasoning as --gram-only: re-timing the committed
        # recipe/IVF/gram points on a possibly different box would
        # silently re-baseline the falsifier)
        sdd: dict[str, list[float]] = {k: [] for k, _ in scales}
        for key, d in scales:
            semdedup_point(spark, d)  # index build + discard timing
        for _ in range(RUNS):
            for key, d in scales:
                spark.catalog.clearCache()
                sdd[key].append(semdedup_point(spark, d))
                print(
                    f"# {key}: semdedup_ivf {sdd[key][-1]:.2f}s",
                    file=sys.stderr,
                )
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALING.json",
        )
        with open(path) as fh:
            merged = json.load(fh)
        hs = merged.setdefault("history_scaling", {})
        hs["incremental_semantic_dedup_ivf_fixed_batch"] = _gram_series(sdd)
        hs["incremental_semantic_dedup_ivf_fixed_batch"]["note"] = (
            _SEMDEDUP_NOTE
        )
        with open(path, "w") as fh:
            json.dump(merged, fh, indent=1)
        print(json.dumps(hs["incremental_semantic_dedup_ivf_fixed_batch"]))
        return

    if "--retrained-only" in sys.argv:
        # merge ONLY the retrained-geometry series (same selective-merge
        # reasoning as --gram-only/--semdedup-only); t_retrain records
        # the per-scale one-time generation cost alongside
        ret: dict[str, list[float]] = {k: [] for k, _ in scales}
        costs: dict[str, float] = {}
        cands: dict[str, tuple[int, int]] = {}
        for key, d in scales:
            costs[key] = round(_retrain_cost(spark, d), 4)  # build+retrain
            cands[key] = _candidate_counts(spark, d)
            retrained_point(spark, d)  # warm, discard timing
        for _ in range(RUNS):
            for key, d in scales:
                spark.catalog.clearCache()
                ret[key].append(retrained_point(spark, d))
                print(
                    f"# {key}: semdedup_retrained {ret[key][-1]:.2f}s",
                    file=sys.stderr,
                )
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALING.json",
        )
        with open(path) as fh:
            merged = json.load(fh)
        hs = merged.setdefault("history_scaling", {})
        series = _gram_series(ret)
        series["note"] = _RETRAINED_NOTE
        for key, _d in scales:
            series[f"t_retrain_{key}"] = costs[key]
            fz, rt = cands[key]
            series[f"pairs_frozen_{key}"] = fz
            series[f"pairs_retrained_{key}"] = rt
            t = _min_of(ret[key])
            series[f"us_per_pair_{key}"] = round(t * 1e6 / max(rt, 1), 2)
        hs["incremental_semantic_dedup_ivf_retrained_fixed_batch"] = series
        with open(path, "w") as fh:
            json.dump(merged, fh, indent=1)
        print(json.dumps(series))
        return

    # the FIXED batch: always the base fixture's slice
    _, base_batch = _recipe_hist_batch(spark, BASE)

    # warm the builds (untimed run 1 per scale — the amortized state/
    # index build a deployment pays once, priced separately in
    # SCALING.json's corpus_recipe_increment entry)
    rec: dict[str, list[float]] = {k: [] for k, _ in scales}
    ivf_i: dict[str, list[float]] = {k: [] for k, _ in scales}
    ivf_s: dict[str, list[float]] = {k: [] for k, _ in scales}
    grm: dict[str, list[float]] = {k: [] for k, _ in scales}
    sdd: dict[str, list[float]] = {k: [] for k, _ in scales}
    pairs = _base_pairs(spark)
    for key, d in scales:
        recipe_point(spark, d, base_batch)  # build + discard timing
        ivf_point(spark, d)
        gram_point(spark, d, pairs)
        semdedup_point(spark, d)
    for _ in range(RUNS):
        for key, d in scales:  # interleaved min-of-N
            spark.catalog.clearCache()
            rec[key].append(recipe_point(spark, d, base_batch))
            ti, ts = ivf_point(spark, d)
            ivf_i[key].append(ti)
            ivf_s[key].append(ts)
            grm[key].append(gram_point(spark, d, pairs))
            sdd[key].append(semdedup_point(spark, d))
            print(
                f"# {key}: recipe {rec[key][-1]:.2f}s "
                f"ivf_ingest {ti:.2f}s ivf_serve {ts:.2f}s "
                f"gram_verify {grm[key][-1]:.2f}s "
                f"semdedup_ivf {sdd[key][-1]:.2f}s",
                file=sys.stderr,
            )

    def series(d):
        t1, t2, t4 = _min_of(d["1x"]), _min_of(d["2x"]), _min_of(d["4x"])
        out = {
            "t_hist_1x": t1,
            "t_hist_2x": t2,
            "t_hist_4x": t4,
            "ratio_hist_2x": round(t2 / t1, 2),
            "ratio_hist_4x": round(t4 / t1, 2),
        }
        if d.get("8x"):
            t8 = _min_of(d["8x"])
            out["t_hist_8x"] = t8
            out["ratio_hist_8x"] = round(t8 / t1, 2)
        return out

    out = {
        "note": (
            "fixed-batch, growing-history falsifier (round-12 verdict "
            "item 1): the ingest batch is held constant at its sf0.1 "
            "size while history alone grows 2x/4x (8x with --with-8x; "
            "kx-derived history, "
            "base-fixture batch). Batch-sized per-ingest work predicts "
            "~flat ratios; O(history) per-ingest work predicts ratios "
            "tracking the history scale (~2/~4). The recipe's "
            "index-probe joins and the IVF serve's probed-cell scan "
            "stream slim history-sized artifacts map-side, so mild "
            "sub-linear growth is the honest expectation, not exactly "
            "1.0. State/index builds per scale are untimed (the "
            "amortized one-time cost). Interleaved min-of-2."
        ),
        "batch": "sf0.1 slice (fixed)",
        "corpus_recipe_increment_warm": series(rec),
        "ann_ivfadc_warm_ingest": series(ivf_i),
        "ann_ivfadc_warm_serve_after_ingest": series(ivf_s),
        "ngram_jaccard_verify_warm_fixed_pairs": _gram_series(grm),
        "incremental_semantic_dedup_ivf_fixed_batch": {
            **_gram_series(sdd),
            "note": _SEMDEDUP_NOTE,
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json",
    )
    with open(path) as fh:
        merged = json.load(fh)
    merged["history_scaling"] = out
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
