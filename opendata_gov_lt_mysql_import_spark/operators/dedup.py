"""Deduplication operators for training-data pipelines.

Four families, each chosen for a different scale/recall trade-off:

- **exact**: hash-groupBy on a content fingerprint — one shuffle on the
  hash key, arbitrarily parallel; the 100 TB workhorse.
- **MinHash + LSH**: char k-shingles → n-permutation min-hash signature →
  banded bucket join. Candidate generation is a self-join on (band,
  band-hash) buckets, so cost is bounded by bucket occupancy, not n².
- **SimHash**: 64-bit majority-vote fingerprint; near-dups differ in ≤ h
  bits, found by banding the fingerprint into chunks (pigeonhole).
- **n-gram Jaccard**: exact set similarity via a shared-gram join +
  count — the verifier stage after any LSH candidate generator.

Implementation note (hot-path shape): signatures are computed with
``explode`` + map-side partial aggregation (``groupBy(id).agg(min/sum)``)
rather than nested higher-order functions. Nested HOF lambdas re-evaluate
captured expression subtrees per element (the tokenizer would run
O(seeds × shingles) times per row), while the explode+agg form evaluates
the tokenizer once per row, keeps everything in whole-stage codegen, and
partial-aggregates before the shuffle — the same plan shape that survives
a 100 TB corpus.

Hash choice: md5 (standardized, engine-portable) where an oracle checks
values; xxhash64 (fast, JVM built-in) for signature permutations where
only self-consistency matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textanalysis import tokens


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input arrives
    in fewer partitions.

    The dedup operators are CPU-heavy relative to the bytes scanned
    (shingle/gram explosion), so a compact parquet input that fits one
    scan task would serialize the whole stage on one core; the shuffle
    this costs is tiny (raw rows) next to the exploded stream it
    parallelizes. No-op when the source is already well-partitioned, as a
    real 100 TB table would be."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Group identical content by md5 fingerprint: (fingerprint, n_copies,
    keeper-id = min id). One shuffle on the fingerprint."""
    return (
        df.select(F.md5(F.col(content_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keeper"),
        )
    )


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep exactly one row (min id) per distinct content value.

    Shape: row_number over a fingerprint-partitioned window — ONE pass
    over the input and one shuffle. The groupBy-keepers + semi-join
    alternative consumes the input twice (keeper agg + probe), which
    doubles the upstream scan/compute when the input is an unmaterialized
    pipeline stage."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(F.md5(F.col(content_col)))
        .orderBy(F.col(id_col))
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def char_shingles(text: Column, k: int) -> Column:
    """Distinct byte k-shingles over the UTF-8 encoding (whole value when
    shorter than k).

    Shingling on BINARY, not STRING: ``substr`` on a UTF-8 string must
    seek from the start (variable-width chars) making per-row shingling
    O(len²); byte offsets are O(1). The shingles are only ever hashed, so
    byte-grams are as good as char-grams for LSH purposes. The cast is
    bound once per row via the 1-element transform wrapper (see
    word_ngrams) — captured, it would re-copy the bytes per shingle,
    reintroducing the O(len²) this function exists to avoid."""

    def build(b: Column) -> Column:
        n = F.greatest(F.length(b) - (k - 1), F.lit(1))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n), lambda i: b.substr(i, F.lit(k))
            )
        )

    return F.element_at(F.transform(F.array(text.cast("binary")), build), 1)


def _signed64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def _permute(h: Column, i: int) -> Column:
    """Deterministic bijection #i on 64-bit ints using only overflow-safe
    bitwise ops (ANSI mode forbids wrapping multiply/add): XOR with a
    splitmix-derived constant, then rotate. Base hashes are uniform
    xxhash64 outputs, so any bijection family preserves the MinHash
    equality statistics P(min_a = min_b) = J(A,B)."""
    c = _signed64((2 * i + 1) * 0x9E3779B97F4A7C15)
    r = (i * 23 + 17) % 63 + 1
    mixed = h.bitwiseXOR(F.lit(c).cast("long"))
    return F.shiftleft(mixed, r).bitwiseOR(F.shiftrightunsigned(mixed, 64 - r))


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    shingle_k: int = 9,
) -> DataFrame:
    """(id, sig: array<bigint>) — n-permutation MinHash over char
    k-shingles.

    One xxhash64 per shingle, then n cheap bitwise permutations of that
    base hash (instead of n full re-hashes of the shingle bytes — the
    classical permutation-family construction). Explode + n
    partial-aggregated mins: one shuffle on id, map-side combine.

    Shape note: shingles come from ``explode(sequence(...))`` + ``substr``
    rather than array higher-order functions — HOFs always run interpreted,
    while generate + substring compile to flat expression code. (The 64-min
    HashAggregate itself exceeds whole-stage-codegen method limits and runs
    interpreted either way; the win is avoiding per-row array building.)
    Shingles are NOT deduplicated: min over a multiset equals min over its
    set, so array_distinct would be pure overhead."""
    df = _spread(df)
    bin_ = F.col(text_col).cast("binary")
    n_pos = F.greatest(F.length(bin_) - (shingle_k - 1), F.lit(1))
    exploded = (
        df.select(
            F.col(id_col).alias("id"),
            bin_.alias("_bin"),
            F.explode(F.sequence(F.lit(1), n_pos)).alias("_i"),
        )
        .select("id", F.xxhash64(F.col("_bin").substr(F.col("_i"), F.lit(shingle_k))).alias("h"))
    )
    mins = exploded.groupBy("id").agg(
        *[F.min(_permute(F.col("h"), i)).alias(f"_h{i}") for i in range(n_hashes)]
    )
    return mins.select(
        "id", F.array(*[F.col(f"_h{i}") for i in range(n_hashes)]).alias("sig")
    )


def lsh_drop_hot_buckets(
    banded: DataFrame, keys: list[str], max_bucket_size: int
) -> tuple[DataFrame, DataFrame]:
    """Split a banded (id, *keys) stream into (cold, hot-bucket report).

    Buckets with more than ``max_bucket_size`` members are removed before
    the self-join — a bucket of B members yields B²/2 pairs, so one
    degenerate bucket (boilerplate page, empty doc, template) can dominate
    the whole job at corpus scale. The second DataFrame reports every
    dropped bucket with its occupancy so truncation is never silent:
    callers log it, route it to the exact-dedup path (giant buckets are
    usually *exact* duplicates), or raise the cap.

    The occupancy count shuffles on the same keys as the self-join it
    protects, so it adds no new shuffle layout."""
    occ = banded.groupBy(*keys).agg(F.count(F.lit(1)).alias("bucket_size"))
    hot = occ.filter(F.col("bucket_size") > max_bucket_size)
    cold = banded.join(hot.select(*keys), keys, "left_anti")
    return cold, hot


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_k: int = 9,
    min_jaccard_est: float = 0.5,
    impl: str = "arrow",
    max_bucket_size: int | None = 4096,
    dropped_out: list | None = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate candidate pairs with signature-overlap
    Jaccard estimate. Returns (id_a, id_b, jaccard_est), id_a < id_b.

    Scale shape: explode signatures to (band, bucket, id) — ONE shuffle
    on the LSH bucket into a collect_list aggregation — then in-bucket
    pair enumeration by chained generates over the sorted member array
    (posexplode anchor + explode of the tail slice, so no O(B²) array is
    ever materialized; peak row width is O(B), bounded by the cap).
    This replaces the former occupancy-count + left-anti + bucket
    self-join chain (three extra shuffles) with plain per-group
    expression work. ``max_bucket_size`` caps bucket occupancy — a
    bucket of B members yields B²/2 pairs IN ONE UNSPLITTABLE TASK
    (collect_list concentrates the bucket on a single row), so one
    degenerate bucket (boilerplate page, empty doc) can dominate the
    job at corpus scale. The DEFAULT cap of 4096 bounds any single
    task at ~8.4M generated pairs (round-6 advisory: the uncapped path
    is single-task per bucket and must be opt-in); pass ``None``
    explicitly to disable for exhaustive small-corpus runs. When
    capping, pass ``dropped_out=[]`` to receive the hot-bucket report
    DataFrame (band, bucket, bucket_size) appended to that list so the
    truncation is never silent. A cap WITHOUT ``dropped_out`` emits a
    UserWarning at plan-build time (round-7 advisory: the 4096 default
    made capping the default path, so the un-observed variant must
    announce itself — a data-dependent warning would force an eager
    count job inside this otherwise-lazy builder, so the warning is
    unconditional and the report list is the precise instrument).

    ``impl``: 'arrow' (default) computes signatures in a vectorized
    mapInPandas pass — ~2x faster and shuffle-free; 'expr' keeps the
    pure-JVM expression pipeline (no Python workers needed). Candidate
    sets are statistically equivalent but not bit-identical (different
    base hash)."""
    if impl not in ("arrow", "expr"):
        raise ValueError(f"impl must be 'arrow' or 'expr', got {impl!r}")
    if max_bucket_size is not None and dropped_out is None:
        import warnings

        warnings.warn(
            f"minhash_candidate_pairs: buckets over {max_bucket_size} members"
            " will be dropped without a report; pass dropped_out=[] to"
            " receive the hot-bucket DataFrame or max_bucket_size=None to"
            " disable capping",
            UserWarning,
            stacklevel=2,
        )
    sig_fn = minhash_signatures_arrow if impl == "arrow" else minhash_signatures
    rows_per_band = n_hashes // n_bands
    # sigs feeds three subplans (band explode + two signature re-attach
    # joins). Eager localCheckpoint, not lazy persist: concurrent stage
    # submission within one job would otherwise race all three consumers
    # through the signature computation before the cache is populated.
    sigs = sig_fn(df, text_col, id_col, n_hashes, shingle_k).localCheckpoint(eager=True)
    # band rows carry only (id, band, bucket) — the 64-long signature stays
    # out of the self-join shuffle and is re-attached to the (small)
    # candidate-pair set afterwards
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda h: h.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("b"),
    ).select("id", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket"))

    # one aggregation gathers each bucket's member ids; the occupancy cap
    # and the hot-bucket report are free size() predicates on the same
    # grouped rows (no second shuffle, no anti-join)
    occ = banded.groupBy("band", "bucket").agg(F.collect_list("id").alias("ids"))
    if max_bucket_size is not None:
        if dropped_out is not None:
            dropped_out.append(
                occ.filter(F.size("ids") > max_bucket_size).select(
                    "band", "bucket", F.size("ids").alias("bucket_size")
                )
            )
        occ = occ.filter(F.size("ids") <= max_bucket_size)
    # in-bucket combinations via chained generates: anchor each member
    # with its position, then explode the strictly-later tail of the
    # sorted array — ids are distinct within a bucket, so sort order
    # gives id_a < id_b without a comparison filter
    anchored = occ.filter(F.size("ids") >= 2).select(
        F.array_sort("ids").alias("_ids"),
        F.posexplode(F.array_sort("ids")).alias("_i", "id_a"),
    )
    pairs = (
        anchored.select(
            "id_a",
            F.explode(
                F.slice(F.col("_ids"), F.col("_i") + F.lit(2), F.size("_ids"))
            ).alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs_sig = pairs.join(
        sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
    ).join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e))
        / F.lit(float(n_hashes))
    )
    return (
        pairs_sig.withColumn("jaccard_est", est)
        .filter(F.col("jaccard_est") >= min_jaccard_est)
        .select("id_a", "id_b", "jaccard_est")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verifier)
# ---------------------------------------------------------------------------

def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-gram array (whole token stream when shorter than
    n).

    The token split is BOUND once per row through a 1-element
    ``transform`` wrapper: a lambda ARGUMENT is a variable reference
    inside nested lambdas, while a CAPTURED expression subtree is
    re-evaluated per element — with ``n`` ``get()``s per gram the
    captured form re-ran the split n·grams times per row (measured
    12.2s -> 0.6s on the sf0.1 5-gram stream, single partition; the
    cost was previously masked by ``_spread``'s 32-way parallelism)."""

    def build(toks: Column) -> Column:
        n_sh = F.greatest(F.size(toks) - (n - 1), F.lit(1))
        # get() per position, not slice(toks, i, n): slice copies an
        # n-element array per gram (O(len·n) allocations) while n fixed
        # get() lookups are O(1) each. get (not element_at) so an
        # out-of-range tail position yields NULL — skipped by concat_ws,
        # same as slice's short tail — instead of an ANSI-mode error.
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n_sh - 1),
                lambda i: F.concat_ws(
                    " ", *[F.get(toks, i + j) for j in range(n)]
                ),
            )
        )

    return F.element_at(F.transform(F.array(tokens(text)), build), 1)


def blocked_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    n: int = 3,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """Exact word-n-gram Jaccard over pairs sharing a blocking key.

    Shuffle-based set intersection: explode distinct grams, self-join on
    (block, gram), count shared grams per pair, then
    ``|A∩B| / (|A| + |B| - |A∩B|)``. No per-pair array materialization —
    the plan is two shuffles (gram join + pair count) regardless of
    document size, which is what survives at corpus scale. At 100 TB the
    blocking key is an LSH bucket; here any low-cardinality column works.

    Returns (id_a, id_b, jaccard), id_a < id_b.
    """
    # Join on a 64-bit hash of the gram, not the gram string: the two join
    # shuffles then carry (block, long, id) rows instead of full n-gram
    # text, and the equi-compare is a long compare. xxhash64 collisions
    # (~|grams per block|² / 2⁶⁴) are below any measurable effect on the
    # Jaccard estimate.
    #
    df = _spread(df)
    grams = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("_g"),
    ).select("id", "block", F.xxhash64(F.col("_g")).alias("gram"))
    # The gram stream feeds three subplans (both self-join sides + sizes);
    # AQE's broadcast conversion defeats exchange reuse and concurrent
    # stage submission races a lazy persist, so the interpreted gram HOF
    # would run three times. Eager localCheckpoint materializes it once.
    grams = grams.localCheckpoint(eager=True)
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))

    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


def jaccard_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_jaccard: float = 0.2,
    pairs_materialized: bool = False,
) -> DataFrame:
    """Exact word-n-gram Jaccard evaluated ONLY on a supplied candidate
    pair set (columns ``id_a``, ``id_b``) — the verifier stage downstream
    of any LSH candidate generator.

    This is the shape that survives 100 TB: cost is
    O(|candidate pairs| · grams-per-doc) — linear in what the LSH stage
    emits — where ``blocked_jaccard_pairs`` is O(block² · grams), i.e.
    10,000× the work at 100× the data for fixed block cardinality. Only
    documents referenced by a pair are tokenized (semi-join prune), and
    the gram streams shuffle on (pair, gram-hash) longs, never materialize
    per-pair arrays.

    Pairs sharing zero grams have Jaccard 0 and drop out of the
    intersection join — correct for any ``min_jaccard > 0``.

    ``pairs_materialized=True`` attests the caller already holds a
    DISTINCT, MATERIALIZED (checkpointed / persisted-table) (id_a,
    id_b) frame — the internal dedup + eager checkpoint is then a
    redundant shuffle + materialization job of the same rows
    back-to-back with the caller's (round-16: the estimator
    calibration checkpointed its candidate set for its own second
    consumer and then paid this one again). Only set it when both
    halves hold: the three consumers below re-read the frame, so a
    LAZY or duplicate-carrying input would recompute its whole
    lineage three times or inflate intersection counts.

    Returns (id_a, id_b, jaccard) for pairs with jaccard >= min_jaccard.
    """
    # the pair set feeds three consumers (both union arms of cand_ids and
    # the intersection join). A lazy persist is NOT enough: within one job
    # Spark submits independent stages concurrently, and all three would
    # race to compute the (expensive) upstream LSH generator before any
    # populates the cache. Eager localCheckpoint materializes the pair set
    # once, distributed, and truncates the lineage the consumers see.
    if not pairs_materialized:
        pairs = (
            pairs.select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
            .localCheckpoint(eager=True)
        )
    else:
        pairs = pairs.select("id_a", "id_b")
    # no .distinct(): the left-semi probe below dedups by construction,
    # so a distinct here would only add an aggregate stage
    cand_ids = pairs.select(F.col("id_a").alias("id")).unionByName(
        pairs.select(F.col("id_b").alias("id"))
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    # cand_ids is bounded by 2x the LSH pair output and derives from a
    # checkpointed frame whose stats Catalyst can't see — without the
    # explicit hint the semi-join planned as a sort-merge join that
    # shuffled and sorted the TEXT payload both sides (round-15
    # profiling: a 3.4s single-task stage at sf0.1, the doc stream
    # AQE-coalesced to one partition). Broadcasting the slim id set
    # keeps the text stream map-side (guide §2.3/§3.1: never shuffle a
    # heavy payload to answer a membership question).
    # Unconditional repartition (not _spread: its getNumPartitions probe
    # would materialize the upstream AQE plan): candidate docs are a small
    # selected subset, so the shuffle is cheap and the CPU-heavy gram
    # explode below gets full parallelism.
    docs = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_text"))
        .join(F.broadcast(cand_ids), "id", "left_semi")
        .repartition(par)
    )
    grams = docs.select(
        "id", F.explode(word_ngrams(F.col("_text"), n)).alias("_g")
    ).select("id", F.xxhash64(F.col("_g")).alias("gram"))
    return _jaccard_from_grams(pairs, grams, min_jaccard)


def _jaccard_from_grams(
    pairs: DataFrame, grams: DataFrame, min_jaccard: float
) -> DataFrame:
    """Shared verify core: exact set Jaccard from a gram-hash stream
    (columns ``id``, ``gram`` — one row per DISTINCT gram per doc,
    which is what :func:`word_ngrams`'s ``array_distinct`` guarantees)
    over a deduped, checkpointed candidate pair set. The stream must
    cover every id a pair references; extra ids are harmless (their
    sizes never join)."""
    # three consumers (sizes + both pair-join probes) — eager checkpoint
    # for the same concurrent-stage reason as the pair set above
    grams = grams.localCheckpoint(eager=True)
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))

    ga = grams.select(F.col("id").alias("id_a"), "gram")
    gb = grams.select(F.col("id").alias("id_b"), "gram")
    inter = (
        pairs.join(ga, "id_a")
        .join(gb, ["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


def gram_hash_index(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Per-doc DISTINCT word-n-gram hash sets — (id, grams
    array<bigint>) — the verify-stage state a warm pipeline persists
    alongside :func:`minhash_history_index`. The LSH index answers
    "which history docs COULD match a batch doc"; this index answers
    the exact-Jaccard verify without re-reading or re-tokenizing the
    history text: each doc in the 100 TB history is shingled exactly
    once in its life, and every later verify is an array explode + hash
    join over ~8-byte gram hashes (round-12 warm-increment finding:
    fetching and re-shingling candidate TEXTS per batch was ~5.7s of
    the 9.7s warm run).

    Hashes are xxhash64 of the same :func:`word_ngrams` stream
    :func:`jaccard_verify_pairs` tokenizes internally, so verifies from
    this index are bit-identical to verifies from text."""
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            word_ngrams(F.col(text_col), n), lambda g: F.xxhash64(g)
        ).alias("grams"),
    )


def jaccard_verify_pairs_grams(
    index: DataFrame,
    pairs: DataFrame,
    min_jaccard: float = 0.2,
    on_missing: str = "drop",
) -> DataFrame:
    """:func:`jaccard_verify_pairs` over a PRECOMPUTED gram-hash index
    (:func:`gram_hash_index` shape: ``id``, ``grams array<bigint>``)
    instead of texts — verify becomes two keyed joins + a per-row
    ``array_intersect``, never a re-parse. The gram arrays are DISTINCT
    sets by construction (:func:`word_ngrams` applies array_distinct
    before hashing), so set-Jaccard on the arrays equals the text
    path's explode-join count exactly.

    Why not reuse the exploded-gram core: measured at sf0.1, the
    explode path paid three shuffle stages (gram checkpoint,
    (id_b, gram) hash join, (id_a, id_b) aggregate) over ~1M gram rows
    for ~3.6k pairs — per-pair array intersection does the same work
    as one narrow map over the joined pairs (3.32s → the join cost
    alone). Scale shape: the pair set is the LSH stage's bounded
    output; each keyed join prunes the index scan to pair-referenced
    docs (pairs broadcast), and the intersection is
    O(|pairs| · grams-per-doc) with NO wide shuffle — the history's
    text column is never touched.

    No pair-set checkpoint here, deliberately: the text path's core
    consumes the pair set THREE times (both cand_ids arms + the
    intersection join), so it must materialize the LSH generator once;
    this shape consumes it exactly once in one linear plan, so a
    checkpoint would only add a serialization point.

    ``on_missing`` governs pairs referencing an id ABSENT from the
    index (an index/scrub desync — a missed fold or partial snapshot
    commit). ``"drop"`` (default) keeps the inner-join semantics:
    such pairs vanish, matching the text path's behavior when a
    candidate text is gone. ``"error"`` fail-louds: the joins go
    left-outer and a declarative ``raise_error`` fires at execution
    on the first null gram set, so a desync surfaces as an error
    instead of silently missing near-dup kills (round-13 advisory,
    operators/dedup.py:578). No extra job either way — the guard is
    a projection expression inside the same plan."""
    if on_missing not in ("drop", "error"):
        raise ValueError(f"on_missing must be 'drop' or 'error', got {on_missing!r}")
    pairs = pairs.select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])
    ia = index.select(F.col("id").alias("id_a"), F.col("grams").alias("_ga"))
    ib = index.select(F.col("id").alias("id_b"), F.col("grams").alias("_gb"))
    how = "inner" if on_missing == "drop" else "left"
    joined = pairs.join(ia, "id_a", how).join(ib, "id_b", how)
    if on_missing == "error":
        guard = lambda c, idc: F.when(  # noqa: E731
            F.col(c).isNull(),
            F.raise_error(
                F.concat(
                    F.lit("gram index missing id (index/scrub desync): "),
                    F.col(idc).cast("string"),
                )
            ),
        ).otherwise(F.col(c))
        joined = joined.withColumn("_ga", guard("_ga", "id_a")).withColumn(
            "_gb", guard("_gb", "id_b")
        )
    out = (
        joined
        .withColumn(
            "_inter", F.size(F.array_intersect(F.col("_ga"), F.col("_gb")))
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("_inter")
                / (F.size("_ga") + F.size("_gb") - F.col("_inter"))
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Duplicate-cluster labeling: connected components over a pair graph
    by iterative min-label propagation. Returns (id, cluster) where
    ``cluster`` is the smallest id reachable from ``id``.

    The step after any pair generator in a dedup pipeline — near-dup
    pairs chain (A~B, B~C but not A~C), so keep-one-per-pair under-dedups;
    keep-one-per-component is the correct contract.

    Shape: each sweep is one join + one partial-aggregated min per node —
    no collect, no driver recursion; iteration count is bounded by the
    component diameter (dup clusters are shallow — near-dups of a common
    ancestor), with ``max_iter`` as the safety bound, checked like
    ``tree_closure`` via a per-sweep convergence probe on checkpointed
    labels (lineage stays constant-depth)."""
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    # size-adaptive parallelism: every sweep pays (join + agg + checkpoint
    # + probe) per PARTITION in scheduler overhead, so a 1k-edge graph on
    # 32 shuffle partitions spends its whole wall-clock on empty tasks
    # (measured 18s -> 3s on a 1.5k-node graph). One count on the already-
    # checkpointed edge list sizes the loop; ~100k edges per partition,
    # capped by the session's parallelism for genuinely large graphs.
    n_edges = edges.count()
    spark = pairs.sparkSession
    if n_edges <= driver_threshold:
        # SIZE-ADAPTIVE ESCAPE HATCH: each distributed sweep costs a
        # fixed ~2 jobs of scheduler overhead regardless of data size,
        # so a sub-100k-edge graph (the common case after LSH/blocking
        # filters) pays seconds of pure overhead per sweep while a
        # driver union-find finishes in milliseconds. The collect is
        # BOUNDED by the threshold we just counted against — this is
        # not an unbounded fact-table collect. Billion-edge graphs take
        # the distributed pointer-jumping loop below.
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for row in edges.collect():
            ra, rb = find(row["a"]), find(row["b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = set(parent)
        nodes.update(r["a"] for r in edges.select("a").distinct().collect())
        out = [(n, find(n)) for n in sorted(nodes)]
        return spark.createDataFrame(out, "id long, cluster long")
    parts = max(1, min(
        spark.sparkContext.defaultParallelism, n_edges // 100_000 + 1
    ))
    edges = edges.repartition(parts, "b").localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("cluster", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("cluster").alias("_nmin"))
        )
        stepped = labels.join(
            neighbor_min, labels["id"] == neighbor_min["a"], "left"
        ).select(
            "id",
            F.least(
                F.col("cluster"), F.coalesce(F.col("_nmin"), F.col("cluster"))
            ).alias("cluster"),
        )
        # pointer jumping (path halving): also adopt the label OF the
        # current label — chains collapse in O(log diameter) sweeps
        # instead of O(diameter). A 20-diameter graph needed 21 sweeps
        # (~18s of per-sweep fixed cost) before; ~6 after. Labels only
        # ever decrease, so the fixpoint (everyone holds the component
        # minimum) is unchanged.
        jump_src = stepped.select(
            F.col("id").alias("_jid"), F.col("cluster").alias("_jcluster")
        )
        new_labels = (
            stepped.join(jump_src, stepped["cluster"] == F.col("_jid"), "left")
            .select(
                "id",
                F.least(
                    F.col("cluster"),
                    F.coalesce(F.col("_jcluster"), F.col("cluster")),
                ).alias("cluster"),
            )
            .localCheckpoint(eager=True)
        )
        converged = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .isEmpty()
        )
        labels = new_labels
        if converged:
            break
    return labels


def keep_one_per_cluster(
    df: DataFrame, clusters: DataFrame, id_col: str
) -> DataFrame:
    """Survivors of cluster dedup: the min-id member of every component
    plus every row that appears in no pair (singletons are implicitly
    their own cluster)."""
    keepers = clusters.groupBy("cluster").agg(F.min("id").alias(id_col))
    paired = clusters.select(F.col("id").alias(id_col))
    singletons = df.join(paired, id_col, "left_anti")
    return df.join(keepers.select(id_col), id_col, "left_semi").unionByName(singletons)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, fp: bigint) — 64-bit SimHash: token hashes via xxhash64, bit b
    of the fingerprint = majority vote of bit b across token hashes.

    Explode + 64 partial-aggregated votes (sum of ±1 per bit), then one
    projection folds the votes into the fingerprint. Empty documents get
    fp = 0 via the left join back."""
    df = _spread(df)
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select("id", F.xxhash64("tok").alias("h"))

    # Majority vote per bit as sum((h >> b) & 1) against count/2: a plain
    # shift-and-mask sum (branch-free) instead of 64 conditional ±1 sums —
    # sum(±1) >= 0  ⇔  2·popcount_b >= n, including the tie case.
    votes = hashed.groupBy("id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1).cast("long")))
            .alias(f"_v{b}")
            for b in range(64)
        ],
    )
    fp = F.lit(0).cast("long")
    for b in range(64):
        fp = fp + F.when(
            F.col(f"_v{b}") * 2 >= F.col("_n"), F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    fps = votes.select("id", fp.alias("fp"))

    ids = df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(fps, "id", "left").select(
        "id", F.coalesce("fp", F.lit(0).cast("long")).alias("fp")
    )


def simhash_chunks(fp: Column, n_chunks: int = 4) -> Column:
    """Split a 64-bit simhash into n width-16 chunks for pigeonhole
    banding: two fingerprints within hamming distance n_chunks-1 share at
    least one chunk."""
    width = 64 // n_chunks

    def signed64(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                fp.bitwiseAND(F.lit(signed64(mask << (i * width))).cast("long")).alias(
                    "value"
                ),
            )
            for i in range(n_chunks)
        ]
    )


def simhash_fingerprints_arrow(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, fp: bigint) — SimHash fingerprints in one Arrow-vectorized
    ``mapInPandas`` pass.

    The expression form bottoms out at a 64-sum HashAggregate that runs
    interpreted (past codegen method limits) plus one shuffle. Here each
    batch tokenizes with pandas str ops, hashes every token with
    ``hash_pandas_object`` (stable, vectorized), and takes the per-bit
    majority vote with 64 ``bincount`` folds over the flat token stream —
    no shuffle at all. Same statistics, different token hash than the
    expr form: callers must not mix fingerprints across implementations.
    Empty documents get fp = 0, matching the expr form's left-join
    fallback."""
    import numpy as np
    import pandas as pd

    def compute(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            token_lists = pdf[text_col].fillna("").str.strip().str.split()
            counts = token_lists.map(len).to_numpy(dtype=np.int64)
            flat = [t for lst in token_lists for t in lst]
            fps = np.zeros(len(ids), dtype=np.uint64)
            if flat:
                h = pd.util.hash_pandas_object(
                    pd.Series(flat), index=False
                ).to_numpy(dtype=np.uint64)
                doc_idx = np.repeat(np.arange(len(ids)), counts)
                for b in range(64):
                    votes = np.bincount(
                        doc_idx,
                        weights=((h >> np.uint64(b)) & np.uint64(1)).astype(np.float64),
                        minlength=len(ids),
                    )
                    # majority incl. ties, only where the doc has tokens
                    fps |= np.where(
                        (counts > 0) & (votes * 2 >= counts), np.uint64(1) << np.uint64(b), np.uint64(0)
                    )
            yield pd.DataFrame({"id": ids, "fp": fps.view(np.int64)})

    return _spread(df.select(F.col(id_col), F.col(text_col))).mapInPandas(
        compute, schema="id long, fp long"
    )


def simhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    dropped_out: list | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """Near-dup pairs by SimHash banding + exact hamming verification.

    ``max_bucket_size`` caps per-(chunk, value) occupancy before the
    self-join (see ``lsh_drop_hot_buckets``). ``impl``: 'arrow' (default)
    computes fingerprints in a vectorized shuffle-free mapInPandas pass;
    'expr' keeps the pure-JVM 64-vote aggregation (no Python workers)."""
    if impl not in ("arrow", "expr"):
        raise ValueError(f"impl must be 'arrow' or 'expr', got {impl!r}")
    fp_fn = simhash_fingerprints_arrow if impl == "arrow" else simhash_fingerprints
    # Both self-join sides read the fingerprint table; eager checkpoint so
    # the fingerprint computation runs once (broadcast conversion defeats
    # exchange reuse, and concurrent stages race a lazy persist).
    fps = fp_fn(df, text_col, id_col).localCheckpoint(eager=True)
    banded = fps.select(
        "id", "fp", F.explode(simhash_chunks(F.col("fp"))).alias("c")
    ).select("id", "fp", F.col("c.chunk").alias("chunk"), F.col("c.value").alias("value"))
    if max_bucket_size is not None:
        banded, hot = lsh_drop_hot_buckets(banded, ["chunk", "value"], max_bucket_size)
        if dropped_out is not None:
            dropped_out.append(hot)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.value") == F.col("b.value"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        pairs.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def minhash_signatures_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    shingle_k: int = 9,
) -> DataFrame:
    """(id, sig: array<bigint>) — MinHash signatures computed in one
    Arrow-vectorized ``mapInPandas`` pass.

    The expression-tree formulation (minhash_signatures) bottoms out at a
    64-min HashAggregate that exceeds whole-stage-codegen limits and runs
    interpreted (~20µs/shingle-row). Here each Arrow batch is hashed in
    numpy: byte k-gram rolling hashes via k vectorized shifted
    multiply-adds over the whole batch, then 64 affine permutations
    reduced with ``minimum.reduceat`` per document — ~50ns/shingle, and
    no shuffle at all (signatures are per-row; the explode+agg shuffle
    disappears). Same LSH statistics (uniform 64-bit hash + affine
    permutation family), different hash function — callers that pin
    signature values must pick one implementation and stay on it.
    """
    import numpy as np
    import pandas as pd

    P = np.uint64(1099511628211)        # FNV-ish odd multiplier
    OFF = np.uint64(1469598103934665603)
    A = (np.arange(n_hashes, dtype=np.uint64) * np.uint64(2) + np.uint64(1)) * np.uint64(
        0x9E3779B97F4A7C15
    )
    B = np.arange(n_hashes, dtype=np.uint64) * np.uint64(0xD1B54A32D192ED03)

    out_schema = f"id long, sig array<long>"

    def compute(batches):
        np_err = np.seterr(over="ignore")
        try:
            for pdf in batches:
                ids = pdf[id_col].to_numpy()
                texts = pdf[text_col].fillna("").astype(str)
                encoded = [t.encode("utf-8") for t in texts]
                # short docs contribute one whole-value gram, like char_shingles
                grams_per_doc = np.array(
                    [max(len(b) - shingle_k + 1, 1) for b in encoded], dtype=np.int64
                )
                buf = np.frombuffer(
                    b"".join(b.ljust(shingle_k, b"\0") for b in encoded), dtype=np.uint8
                ) if encoded else np.empty(0, dtype=np.uint8)
                # per-doc offsets into the concatenated (padded) byte buffer
                lens = np.array(
                    [max(len(b), shingle_k) for b in encoded], dtype=np.int64
                )
                doc_starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
                # gram start positions, flattened across the batch
                starts = np.concatenate(
                    [ds + np.arange(n) for ds, n in zip(doc_starts, grams_per_doc)]
                ) if len(encoded) else np.empty(0, dtype=np.int64)
                h = np.full(len(starts), OFF, dtype=np.uint64)
                for j in range(shingle_k):
                    h = h * P + buf[starts + j].astype(np.uint64)
                gram_starts = np.concatenate([[0], np.cumsum(grams_per_doc)])[:-1]
                sigs = np.empty((len(ids), n_hashes), dtype=np.uint64)
                for i in range(n_hashes):
                    sigs[:, i] = np.minimum.reduceat(h * A[i] + B[i], gram_starts)
                yield pd.DataFrame(
                    {"id": ids, "sig": list(sigs.view(np.int64))}
                )
        finally:
            np.seterr(**np_err)

    return _spread(df.select(F.col(id_col).alias(id_col), F.col(text_col))).mapInPandas(
        compute, schema=out_schema
    )


def _md5_signatures(
    df: DataFrame, text_col: str, id_col: str, n_gram: int, k: int
) -> DataFrame:
    """(id, sig: array<string> of k md5 permutation minima) — the
    engine-neutral signature builder shared by the one-shot pair finder
    and the incremental batch-vs-history probe.

    Explode + k partial-aggregated string-mins (the same shape as the
    xxhash64 production path above), NOT k ``array_min(transform(...))``
    HOFs: each HOF lambda re-evaluates the captured shingle subtree per
    permutation AND runs interpreted — the HOF form cost 17s at sf0.1
    where this form costs ~1s. Lexicographic min over fixed-width
    lowercase hex equals numeric min, and ``min`` over the multiset of
    grams equals min over the distinct set, so the oracle's
    list_distinct/list_min recomputation matches exactly."""
    exploded = df.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n_gram)).alias("_g"),
    )
    mins = exploded.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.col("_g"), F.lit(f"#{p}")))).alias(f"_m{p}")
            for p in range(k)
        ]
    )
    return mins.select(
        F.col(id_col),
        F.array(*[F.col(f"_m{p}") for p in range(k)]).alias("sig"),
    )


def _md5_banded(sigs: DataFrame, id_col: str, k: int, bands: int) -> DataFrame:
    """Explode signatures to the banded LSH index (id, b, bkey) — the
    compact probe-able state of the corpus (bands rows per doc, three
    slim columns; the text never travels with it)."""
    assert k % bands == 0
    rows = k // bands
    band_key = F.md5(
        F.concat(
            *[
                F.element_at(F.col("sig"), F.col("b") * rows + r + 1)
                for r in range(rows)
            ],
            F.concat(F.lit("@"), F.col("b").cast("string")),
        )
    )
    return sigs.select(
        id_col, F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("b"), "sig"
    ).select(id_col, "b", band_key.alias("bkey"))


def minhash_md5_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_gram: int = 3,
    k: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Engine-neutral MinHash-LSH twin: word n-gram shingles, md5
    permutations, banded candidate join — every step standardized, so a
    SQL oracle can recompute the identical signatures (lexicographic min
    over fixed-width lowercase hex equals numeric min, and md5 is md5
    everywhere; xxhash64, the production path in
    :func:`minhash_candidate_pairs`, is JVM-specific and can only be
    rows-only-checked). Same plan shape as production: per-doc signature
    (HOF-only, codegen'd, no Python), explode to (band, bucket), slim
    self-join on the bucket key, signatures re-attached once per pair.

    Returns (id_a, id_b, n_match) with id_a < id_b — n_match of k
    signature components equal, an exact integer on both engines (the
    Jaccard estimate is n_match/k; kept unscaled to avoid float hashing).
    """
    # repartition BEFORE the checkpoint (round-15): the signature agg's
    # output is a few MB, so AQE's byte-targeted coalescing collapses it
    # to one (or a handful of) partitions, and every downstream consumer
    # of the checkpoint — the banded explode, the bucket probe, the
    # zip_with signature compare — then runs single-task no matter how
    # CPU-dense it is (measured: a 3.1s one-task probe stage at sf0.1).
    # An explicit round-robin spread is a tiny shuffle of slim sig rows
    # and is invisible to downstream plans (they scan the checkpoint).
    par = df.sparkSession.sparkContext.defaultParallelism
    sigs = (
        _md5_signatures(df, text_col, id_col, n_gram, k)
        .repartition(par)
        .localCheckpoint(eager=True)
    )
    return minhash_md5_pairs_from_sigs(sigs, id_col, k=k, bands=bands)


def minhash_md5_pairs_from_sigs(
    sigs: DataFrame, id_col: str, k: int = 16, bands: int = 8
) -> DataFrame:
    """:func:`minhash_md5_pairs` from a PRECOMPUTED signature frame
    (``_md5_signatures`` shape: ``id_col``, ``sig array<string>``).
    The signature frame feeds THREE subplans (band self-join both
    sides + two signature re-attach joins), so the caller MUST have
    materialized it (localCheckpoint / persisted table) — exactly what
    :func:`minhash_md5_pairs` does internally. Split out so a pipeline
    that also probes a history index (the warm increment) signs its
    batch ONCE and feeds both the internal pair finder and
    :func:`incremental_minhash_neardup_from_sigs` — the duplicate
    signing was one full shingle + k-min aggregation pass plus a
    second checkpoint job per ingest (round-13 verdict item 2)."""
    banded = _md5_banded(sigs, id_col, k, bands)

    a, c = banded.alias("a"), banded.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.b") == F.col("c.b"))
            & (F.col("a.bkey") == F.col("c.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"c.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"c.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    n_match = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    ).cast("long")
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", n_match.alias("n_match"))
    )


def minhash_history_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_gram: int = 3,
    k: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Build the carry-forward near-dup state for a corpus: one row per
    (doc, band) with the band bucket key AND the full signature —
    (id, b, bkey, sig). This is what a daily pipeline persists (e.g. as
    a snapshot table bucketed by ``bkey``): slim columns, bands× the doc
    count, no text. The 100 TB history is shingled exactly once in its
    life; every later increment probes this index instead.

    The (id, b, bkey, sig) rows come out of ONE banded projection over
    the signature frame — ``sig`` is simply kept through the band
    explode. The former ``_md5_banded(sigs).join(sigs, id)`` shape
    computed the same thing via a self-join that planned as a
    sort-merge join over stat-less aggregates (round-15 profiling: the
    join's sort/exchange chain rode an AQE byte-coalesced 1-partition
    signature frame, serializing the whole history-side band explode
    on one core per cold probe). Same rows, zero joins, two fewer
    exchanges."""
    assert k % bands == 0
    rows = k // bands
    # explicit round-robin spread between the signature aggregate and
    # the band explode: AQE byte-coalesces the slim agg exchange to one
    # partition, which serialized the band explode + every downstream
    # probe join on a single core (round-15: a 2.8s one-task stage per
    # cold probe at sf0.1). An explicit-count repartition is exempt
    # from AQE coalescing; the shuffle moves only (id, 16 hashes) rows.
    par = df.sparkSession.sparkContext.defaultParallelism
    sigs = _md5_signatures(df, text_col, id_col, n_gram, k).repartition(par)
    band_key = F.md5(
        F.concat(
            *[
                F.element_at(F.col("sig"), F.col("b") * rows + r + 1)
                for r in range(rows)
            ],
            F.concat(F.lit("@"), F.col("b").cast("string")),
        )
    )
    return sigs.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("b"),
        "sig",
    ).select(id_col, "b", band_key.alias("bkey"), "sig")


def incremental_minhash_neardup(
    new_df: DataFrame,
    history_index: DataFrame,
    text_col: str,
    id_col: str,
    n_gram: int = 3,
    k: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Near-dup screen of a new ingest batch against the historical
    LSH index — the daily-increment twin of :func:`minhash_md5_pairs`
    (same signatures, same banding, so a batch⋈history collision means
    exactly what an in-corpus collision means).

    Returns (new_id, hist_id, n_match): each new doc paired with every
    history doc sharing ≥1 band bucket, with the exact count of equal
    signature components (Jaccard estimate = n_match/k; threshold is the
    caller's policy knob).

    Scale shape: the batch is signed (one pass over the *batch* only),
    its banded keys probe the index with a hash join on (b, bkey) — the
    batch side is the small side, so AQE broadcasts it and the 100 TB
    history's index streams map-side with NO shuffle; with the index
    pre-bucketed by bkey even that scan prunes to matching buckets.
    History signatures ride along in the index, so verification needs no
    second join against history state and the history text is never
    read. Batch-internal duplicates are the one-shot finder's job
    (:func:`minhash_md5_pairs` on the batch) — this op is the cross
    half, mirroring :func:`incremental_exact_dedup`."""
    # repartition before the checkpoint for the same reason as
    # minhash_md5_pairs: a byte-coalesced 1-partition signature frame
    # serializes the banded probe on one core.
    par = new_df.sparkSession.sparkContext.defaultParallelism
    batch_sigs = (
        _md5_signatures(new_df, text_col, id_col, n_gram, k)
        .repartition(par)
        .localCheckpoint(eager=True)
    )
    return incremental_minhash_neardup_from_sigs(
        batch_sigs, history_index, id_col, k=k, bands=bands
    )


def incremental_minhash_neardup_from_sigs(
    batch_sigs: DataFrame,
    history_index: DataFrame,
    id_col: str,
    k: int = 16,
    bands: int = 8,
) -> DataFrame:
    """:func:`incremental_minhash_neardup` from a PRECOMPUTED batch
    signature frame — the caller materializes the signatures once
    (they feed the banded probe AND the re-attach join here, plus
    usually :func:`minhash_md5_pairs_from_sigs` for the batch-internal
    half) so one ingest shingles its batch exactly once."""
    batch_banded = _md5_banded(batch_sigs, id_col, k, bands).select(
        F.col(id_col).alias("new_id"), "b", "bkey"
    )
    hist = history_index.select(
        F.col(id_col).alias("hist_id"),
        "b",
        "bkey",
        F.col("sig").alias("sig_h"),
    )
    cand = (
        batch_banded.join(hist, ["b", "bkey"])
        .select("new_id", "hist_id", "sig_h")
        .dropDuplicates(["new_id", "hist_id"])
    )
    sb = batch_sigs.select(F.col(id_col).alias("new_id"), F.col("sig").alias("sig_b"))
    n_match = F.size(
        F.filter(F.zip_with("sig_b", "sig_h", lambda x, y: x == y), lambda v: v)
    ).cast("long")
    return cand.join(sb, "new_id").select(
        "new_id", "hist_id", n_match.alias("n_match")
    )


def _md5_bit(h: Column, j: int) -> Column:
    """Bit ``j`` (MSB-first) of the 64-bit prefix of an md5 hex string,
    via nibble lookup — expressible identically in ANSI SQL, which is the
    whole point of this twin (xxhash64 is JVM-only)."""
    nib = F.conv(h.substr(j // 4 + 1, 1), 16, 10).cast("int")
    return F.shiftright(nib, 3 - j % 4).bitwiseAND(F.lit(1))


def simhash_md5_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Engine-neutral SimHash twin: 64-bit fingerprint from md5 token
    hashes (distinct tokens vote ±1 per bit; ties → 0), 4 × 16-bit
    pigeonhole bands (hamming ≤ 3 ⇒ at least one band equal), banded
    self-join, exact hamming refine. The md5-hex bit extraction lets a
    SQL oracle recompute byte-identical fingerprints; the production
    path (:func:`simhash_candidate_pairs`) keeps the single-pass
    xxhash64 vote aggregation. The 64 per-bit array aggregates make a
    wide expression tree (may exceed the codegen method budget and run
    interpreted) — acceptable for a verification twin that runs at
    oracle scale, not in the headline bench.

    Returns (id_a, id_b, hamming), id_a < id_b, hamming ≤ max_hamming.
    """
    hashes = F.transform(
        F.array_distinct(tokens(F.col(text_col))), lambda t: F.md5(t)
    )

    def fp_bit(j: int) -> Column:
        vote = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + _md5_bit(h, j) * 2 - 1,
        )
        return (vote > 0).cast("int")

    fp = F.array(*[fp_bit(j) for j in range(64)])
    fps = df.select(F.col(id_col), fp.alias("fp")).localCheckpoint(eager=True)

    chunk = F.aggregate(
        F.sequence(F.lit(0), F.lit(15)),
        F.lit(0),
        lambda acc, m: acc
        + F.element_at(F.col("fp"), F.col("k") * 16 + m + 1)
        * F.shiftleft(F.lit(1), 0).cast("int") * F.pow(F.lit(2), m).cast("int"),
    )
    banded = fps.select(
        id_col, F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"), "fp"
    ).select(id_col, "k", chunk.alias("ck"))

    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.ck") == F.col("b.ck"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    fa = fps.select(F.col(id_col).alias("id_a"), F.col("fp").alias("fp_a"))
    fb = fps.select(F.col(id_col).alias("id_b"), F.col("fp").alias("fp_b"))
    hamming = F.size(
        F.filter(F.zip_with("fp_a", "fp_b", lambda x, y: x != y), lambda v: v)
    ).cast("long")
    return (
        pairs.join(fa, "id_a")
        .join(fb, "id_b")
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def incremental_exact_dedup(
    new_df: DataFrame,
    seen_fps: DataFrame,
    content_col: str,
    id_col: str,
) -> DataFrame:
    """Dedup a new ingest batch against itself AND a historical
    fingerprint table — the daily-increment shape: the 100 TB corpus is
    never rescanned, only its fingerprint column (one md5 per historical
    doc, the compact state a pipeline carries between runs).

    Two stages, each one shuffle: in-batch keep-min-id (window over the
    batch's own fingerprints), then a left-anti hash join against
    ``seen_fps`` (column ``fp``). At scale the anti join shuffles on the
    same fingerprint key as the dedup window, so AQE coalesces the
    layouts; the batch side is the small side and the fingerprint table
    is pre-bucketed by fp in a real deployment."""
    batch = exact_dedup(new_df, content_col, id_col)
    return batch.join(
        seen_fps.select("fp"),
        F.md5(batch[content_col]) == F.col("fp"),
        "left_anti",
    )
