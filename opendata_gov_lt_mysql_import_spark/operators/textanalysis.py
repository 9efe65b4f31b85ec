"""Text analysis operators for training-data pipelines (beyond-reference
surface; generalizes the reference's tag tokenization F3/F4).

All hot-path expressions are JVM-side built-ins — no Python in any
per-row path — so they codegen and scale linearly with partitions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic tiny stopword sets for the language-ID heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "it", "a"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "los", "y", "es", "en", "un", "que"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "que"),
}


def tokens(c: Column) -> Column:
    """Whitespace tokenization; empty/null text → empty array."""
    trimmed = F.trim(c)
    return F.when(
        trimmed.isNull() | (trimmed == ""), F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, r"\s+"))


def token_count(c: Column) -> Column:
    return F.size(tokens(c)).cast("long")


def char_class_ratio(c: Column, char_class_regex: str) -> Column:
    """Fraction of characters matching a regex class (e.g. punctuation).
    Computed as (len - len(class-stripped)) / len — no Python, no explode."""
    n = F.length(c)
    remaining = F.length(F.regexp_replace(c, char_class_regex, ""))
    return F.when(n > 0, (n - remaining) / n).otherwise(F.lit(0.0))


def stopword_ratio(toks: Column, stopwords: tuple[str, ...]) -> Column:
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*stopwords)))
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def avg_token_len(toks: Column) -> Column:
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total / n).otherwise(F.lit(0.0))


def stopword_hits(toks: Column, stopwords: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*stopwords))).cast("long")


def lang_id(toks: Column) -> Column:
    """Argmax over per-language stopword hit counts with a deterministic
    priority tie-break (declaration order wins); 'und' when nothing
    matches."""
    scores = {lang: stopword_hits(toks, sw) for lang, sw in LANG_STOPWORDS.items()}
    langs = list(scores)
    overall_max = F.greatest(*scores.values())
    out = F.when(overall_max == 0, F.lit("und"))
    for i, lang in enumerate(langs):
        remaining_max = F.greatest(*[scores[l] for l in langs[i:]]) if i < len(langs) - 1 else scores[lang]
        out = out.when(scores[lang] == remaining_max, F.lit(lang))
    return out.otherwise(F.lit(langs[-1]))


def token_bigrams(toks: Column) -> Column:
    """Adjacent-token bigrams joined with a single space; <2 tokens →
    empty array. Pure HOF (zip_with over two slices) — no explode, no
    shuffle."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def max_multiplicity(arr: Column) -> Column:
    """Count of the most frequent element: sort the array, then one
    linear aggregate pass tracking (prev, run, best). Per-row mode
    computation with NO explode and NO shuffle — at 100 TB the
    repetition features stay a map-only projection."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = (
            F.when(acc["prev"].isNotNull() & (acc["prev"] == x), acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(F.array_sort(arr), acc0, step, lambda acc: acc["best"])


def repetition_projection(text: Column) -> list[Column]:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    table A1 — public paper): fraction of adjacent-token bigrams taken
    by the single most frequent bigram, and fraction of tokens that are
    repeats of an earlier token. Integer basis points via integer
    division so both engines agree bit-for-bit."""
    toks = tokens(text)
    bigr = token_bigrams(toks)
    n_big = F.size(bigr).cast("long")
    top_big = max_multiplicity(bigr)
    n_tok = F.size(toks).cast("long")
    n_dist = F.size(F.array_distinct(toks)).cast("long")
    # floor(double-div of exact ints) == integer division below 2^53
    top_bigram_bp = F.when(
        n_big > 0, F.floor((top_big * 10000) / n_big)
    ).otherwise(F.lit(0)).cast("long")
    dup_token_bp = F.when(
        n_tok > 0, F.floor(((n_tok - n_dist) * 10000) / n_tok)
    ).otherwise(F.lit(0)).cast("long")
    return [
        top_bigram_bp.alias("top_bigram_bp"),
        dup_token_bp.alias("dup_token_bp"),
    ]


def word_ngrams(toks: Column, n: int) -> Column:
    """All order-preserving word n-grams joined with single spaces;
    <n tokens → empty array. HOF-only (sequence + slice), no explode
    until the caller decides to. ``toks`` is bound once per row via a
    1-element transform wrapper — callers pass tokens(text) EXPRESSIONS,
    and a captured expression subtree re-evaluates (re-splits) per gram
    (the HOF-recapture trap; see operators.dedup.word_ngrams)."""

    def build(tk: Column) -> Column:
        sz = F.size(tk)
        return F.when(
            sz >= n,
            F.transform(
                F.sequence(F.lit(1), sz - (n - 1)),
                lambda i: F.array_join(F.slice(tk, i, F.lit(n)), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks), build), 1)


# Integer weights for the linear quality model (public fastText-style
# document-quality scoring reduced to an exact integer dot product so
# both engines agree bit-for-bit; the magnitudes follow the Gopher
# feature directions: length helps, punctuation/digit excess hurts,
# stopword presence helps).
QUALITY_MODEL_WEIGHTS: tuple[tuple[str, int], ...] = (
    ("n_tokens", 2),
    ("punct_ratio_bp", -3),
    ("digit_ratio_bp", -2),
    ("en_stopword_ratio_bp", 1),
    ("avg_token_len_c", -1),
)
QUALITY_MODEL_BIAS = 5000


def quality_model_score() -> Column:
    """Linear score over the quality_projection columns (integer dot
    product + bias). Evaluate AFTER selecting quality_projection."""
    z = F.lit(QUALITY_MODEL_BIAS).cast("long")
    for col, w in QUALITY_MODEL_WEIGHTS:
        z = z + F.col(col) * F.lit(w)
    return z.cast("long")


def shingle_fingerprint(c: Column, k: int = 5) -> Column:
    """Document fingerprint: minimum md5 over all k-char shingles — a
    1-hash MinHash, stable across engines (md5 is standardized, unlike
    murmur/xxhash availability). Short texts fall back to hashing the
    whole value."""
    n_shingles = F.greatest(F.length(c) - (k - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_shingles), lambda i: F.md5(c.substr(i, F.lit(k)))
    )
    return F.array_min(hashes)


def quality_projection(text: Column) -> list[Column]:
    """Standard quality-score feature block for a documents table."""
    toks = tokens(text)
    return [
        token_count(text).alias("n_tokens"),
        F.length(text).cast("long").alias("n_chars_actual"),
        F.floor(char_class_ratio(text, r"\p{Punct}") * 10000).cast("long").alias(
            "punct_ratio_bp"
        ),
        F.floor(char_class_ratio(text, r"[0-9]") * 10000).cast("long").alias(
            "digit_ratio_bp"
        ),
        F.floor(avg_token_len(toks) * 100).cast("long").alias("avg_token_len_c"),
        F.floor(stopword_ratio(toks, LANG_STOPWORDS["en"]) * 10000)
        .cast("long")
        .alias("en_stopword_ratio_bp"),
    ]


URL_PATTERN = r"https?://[^\s]+"
CONTROL_PATTERN = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def clean_text(text: Column) -> Column:
    """Pre-training text normalization: strip URLs, drop C0/C1 control
    characters (keeping \\t \\n \\r as whitespace), collapse whitespace
    runs to single spaces, trim. Pure JVM regexp chain — codegen'd, no
    shuffle; the first stage of every corpus-cleaning pipeline."""
    no_urls = F.regexp_replace(text, URL_PATTERN, " ")
    no_ctl = F.regexp_replace(no_urls, CONTROL_PATTERN, " ")
    return F.trim(F.regexp_replace(no_ctl, r"\s+", " "))


# Gopher-style repetition/quality gates (Rae et al. 2021, table A1 —
# public paper), expressed on the integer-scaled feature block so the
# thresholds compare exactly across engines.
QUALITY_RULES = (
    ("too_few_tokens", "n_tokens < 5"),
    ("too_many_tokens", "n_tokens > 100000"),
    ("avg_token_len_out_of_range", "avg_token_len_c < 200 OR avg_token_len_c > 1200"),
    ("too_much_punct", "punct_ratio_bp >= 2000"),
    ("too_many_digits", "digit_ratio_bp >= 3000"),
)


def quality_verdict() -> Column:
    """First-failing-rule verdict over the quality_projection columns:
    'keep' when every gate passes, else the rule name — deterministic
    rule order so both engines agree on multi-failure rows."""
    out = F.lit("keep")
    for name, cond in reversed(QUALITY_RULES):
        out = F.when(F.expr(cond), F.lit(name)).otherwise(out)
    return out


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``) — the corpus
    rebalancing step of a training-data pipeline (downsample the dominant
    language/source, keep the tail). One pass, no shuffle: each row is
    kept with its stratum's probability; deterministic for a fixed seed
    and partitioning. Strata ABSENT from ``fractions`` are dropped
    entirely (sampleBy contract) — list tail strata at 1.0 to keep them.
    For exact-count quotas use a per-stratum window rank instead — that
    costs a shuffle."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def exact_k_sample(
    df,
    strata_col: str,
    id_col: str,
    k: int,
    seed: int = 42,
):
    """Exact-count quota sampling: keep exactly min(k, |stratum|) rows
    per stratum, chosen by ranking on a salted md5 of the row id — a
    deterministic hash-as-PRNG, so the 'random' draw is reproducible on
    any engine (md5 is standardized; xxhash64 is not). One shuffle on
    the stratum key; the complement of the Bernoulli ``stratified_
    sample`` when the contract is 'exactly k docs per language'."""
    from pyspark.sql import Window

    rank_key = F.md5(
        F.concat_ws("#", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    w = Window.partitionBy(strata_col).orderBy(rank_key, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def gopher_flags(toks: Column, stopwords) -> dict[str, Column]:
    """The Gopher rule family (Rae et al. 2021 §A1.1 adapted to the
    fixture vocabulary) as named Column expressions — the single engine
    source of truth shared by ``gopher_quality_flags`` (per-flag report)
    and the corpus recipe's quality-gate stage, so the rule set cannot
    drift between the standalone report and the pipeline. All
    comparisons are INTEGER (total_len vs 3n/10n, mx*8 vs n). Keys:
    n, total_len, stop_hits, flag_wc, flag_ml, flag_sw, flag_tt, keep
    (keep is NULL-coalesced to False for empty/null token arrays)."""
    n = F.size(toks).cast("long")
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*stopwords))
    ).cast("long")
    flag_wc = n.between(20, 1000)
    flag_ml = (total_len >= 3 * n) & (total_len <= 10 * n)
    flag_sw = stop_hits >= 2
    flag_tt = max_multiplicity(toks) * 8 <= n
    return {
        "n": n,
        "total_len": total_len,
        "stop_hits": stop_hits,
        "flag_wc": flag_wc,
        "flag_ml": flag_ml,
        "flag_sw": flag_sw,
        "flag_tt": flag_tt,
        "keep": F.coalesce(
            flag_wc & flag_ml & flag_sw & flag_tt, F.lit(False)
        ),
    }
