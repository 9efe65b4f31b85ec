"""Deduplication operators for training-data pipelines.

Four families, each chosen for a different scale/recall trade-off:

- **exact**: hash-groupBy on a content fingerprint — one shuffle on the
  hash key, arbitrarily parallel; the 100 TB workhorse.
- **MinHash + LSH**: k-shingle → n-permutation min-hash signature →
  banded bucket join. Candidate generation is a self-join on (band,
  band-hash) buckets, so cost is bounded by bucket occupancy, not n².
- **SimHash**: 64-bit weighted-projection fingerprint; near-dups differ
  in ≤ h bits, found by banding the fingerprint into chunks (pigeonhole).
- **n-gram Jaccard**: exact set similarity on candidate pairs — the
  verifier stage after any LSH candidate generator (or blocked by a
  grouping column at small scale).

Hash choice: md5 (standardized, engine-portable) for anything an oracle
checks; xxhash64 (fast, JVM built-in) for signature permutations where
only self-consistency matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textanalysis import tokens


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
    """Keep exactly one row (min id) per distinct content value."""
    keepers = exact_dedup_groups(df, content_col, id_col).select(
        F.col("keeper").alias(id_col)
    )
    return df.join(keepers, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(text: Column, n_hashes: int = 64, shingle_k: int = 3) -> Column:
    """n-permutation MinHash over word k-shingles, entirely JVM-side:
    shingles via sliding window over the token array, permutation i =
    xxhash64(shingle, i). Returns ``array<bigint>`` of length n_hashes."""
    toks = tokens(text)
    n_sh = F.greatest(F.size(toks) - (shingle_k - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(0), n_sh - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle_k)),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(s, seed))
        ),
    )


def minhash_bands(sig: Column, n_bands: int, rows_per_band: int) -> Column:
    """Band the signature: array of (band_id, band_hash) structs."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.concat_ws(",", F.transform(F.slice(sig, b * rows_per_band + 1, rows_per_band), lambda h: h.cast("string")))
            ).alias("bucket"),
        ),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    n_bands: int = 16,
    min_jaccard_est: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-duplicate candidate pairs with signature-overlap
    Jaccard estimate. Returns (id_a, id_b, jaccard_est), id_a < id_b.

    Scale shape: explode to (bucket, id, sig) — one shuffle on the LSH
    bucket — then a bucket-local self-join. Skewed buckets are bounded by
    AQE skew-join splitting; at extreme scale add a bucket-size cap
    filter before the join.
    """
    rows_per_band = n_hashes // n_bands
    sigs = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), n_hashes).alias("sig"),
    )
    banded = sigs.select(
        "id", "sig", F.explode(minhash_bands(F.col("sig"), n_bands, rows_per_band)).alias("b")
    ).select("id", "sig", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket"))

    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda e: e))
        / F.lit(float(n_hashes))
    )
    pairs = pairs.withColumn("jaccard_est", est)
    return pairs.filter(F.col("jaccard_est") >= min_jaccard_est).select(
        "id_a", "id_b", "jaccard_est"
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verifier)
# ---------------------------------------------------------------------------

def ngram_set(text: Column, n: int = 3) -> Column:
    """Sorted distinct word n-gram array."""
    toks = tokens(text)
    n_sh = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), n_sh - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_sort(F.array_distinct(grams))


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def blocked_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    n: int = 3,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing a blocking key (at scale
    the blocking key is an LSH bucket; here any low-cardinality column
    works). Returns (id_a, id_b, jaccard) with id_a < id_b."""
    prepped = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        ngram_set(F.col(text_col), n).alias("grams"),
    )
    a = prepped.alias("a")
    b = prepped.alias("b")
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jaccard(F.col("a.grams"), F.col("b.grams")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(text: Column, bits: int = 64) -> Column:
    """SimHash fingerprint, JVM-side: token hashes via xxhash64, bit b of
    the fingerprint = majority vote of bit b across token hashes.

    Expressed as: for each bit, count tokens whose hash has the bit set;
    set the output bit when count*2 >= n_tokens. ``aggregate`` over a
    64-element bit array stays in codegen — no Python."""
    toks = tokens(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(hashes)

    def bit_votes(b):
        return F.size(
            F.filter(
                hashes,
                lambda h: h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b)) != 0,
            )
        )

    out = F.lit(0).cast("long")
    for b in range(bits):
        vote = bit_votes(b)
        out = out + F.when(
            vote * 2 >= n, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return out


def simhash_chunks(fp: Column, n_chunks: int = 4) -> Column:
    """Split a 64-bit simhash into n 16-bit chunks for pigeonhole
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


def simhash_candidate_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash banding + exact hamming verification."""
    fps = df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("fp"))
    banded = fps.select(
        "id", "fp", F.explode(simhash_chunks(F.col("fp"))).alias("c")
    ).select("id", "fp", F.col("c.chunk").alias("chunk"), F.col("c.value").alias("value"))
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
