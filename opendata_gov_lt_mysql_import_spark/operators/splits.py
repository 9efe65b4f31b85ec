"""Deterministic dataset splits (beyond-reference surface).

Train/val/test assignment for a training corpus must be (a) reproducible
across runs and engines, (b) stable under corpus growth — adding a
document must not reshuffle existing assignments — and (c) shuffle-free,
because it runs over the full 100 TB fact side. Random-number splits
fail (a) and (b); the standard fix (used by every large pipeline) is
hash bucketing: a salted cryptographic hash of the row id is uniform on
[0, 1), so comparing it against cumulative weight thresholds yields an
exact-in-expectation split that is a pure map — a narrow transformation
with no shuffle, no state, and no cross-engine drift (md5 is
standardized; Spark's xxhash64 is not).

The comparison happens on the hex string itself: md5 output is
lowercase-hex on every engine, and lexicographic order on fixed-width
hex equals numeric order, so thresholds are precomputed 32-char hex
literals and the whole operator compiles to codegen'd string compares —
no bigint conversion needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _threshold_hex(cum: float) -> str:
    """32-hex-char threshold t with P(md5 < t) == cum (md5 uniform)."""
    return format(min(int(cum * 16**32), 16**32 - 1), "032x")


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """(label, upper-threshold-hex) pairs in declaration order; the last
    label is the catch-all so weights summing to 1±ε never drop rows."""
    total = sum(weights.values())
    out, cum = [], 0.0
    for label, w in weights.items():
        cum += w / total
        out.append((label, _threshold_hex(min(cum, 1.0))))
    return out


def split_key(id_col: Column, seed: int = 42) -> Column:
    """The salted uniform hash the split buckets on."""
    return F.md5(F.concat_ws("#", id_col.cast("string"), F.lit(str(seed))))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Add ``split_col`` assigning each row to a named split.

    ``weights`` maps label → relative weight (normalized internally),
    e.g. ``{"train": 0.8, "val": 0.1, "test": 0.1}``. Assignment depends
    only on (id, seed) — stable under appends, repartitions, and engine
    changes. Zero shuffles; the plan is a single projected map stage.
    """
    key = split_key(F.col(id_col), seed)
    pairs = split_thresholds(weights)
    expr = F.lit(pairs[-1][0])  # catch-all: last label
    for label, thresh in reversed(pairs[:-1]):
        expr = F.when(key < F.lit(thresh), F.lit(label)).otherwise(expr)
    return df.withColumn(split_col, expr)


def split_sql_case(id_expr: str, weights: dict[str, float], seed: int = 42) -> str:
    """The equivalent ANSI/DuckDB CASE expression, for oracle parity."""
    pairs = split_thresholds(weights)
    key = f"md5(CAST({id_expr} AS VARCHAR) || '#{seed}')"
    whens = "".join(
        f" WHEN {key} < '{t}' THEN '{label}'" for label, t in pairs[:-1]
    )
    return f"CASE{whens} ELSE '{pairs[-1][0]}' END"


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "id",
    seed: int = 42,
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of ``k`` rows, fully
    distributed (Efraimidis–Spirakis A-ES): each row gets the key
    ``-ln(u)/w`` with ``u`` a deterministic md5-derived uniform in
    (0,1), and the sample is the k SMALLEST keys — a TakeOrdered top-k,
    no global sort, no sequential reservoir, no driver state. Inclusion
    probability is proportional to weight; changing ``seed`` redraws.

    Determinism: u comes from the same md5 keying as hash_split (the
    first 15 hex chars as a 60-bit integer over 2^60), so a given
    (id, seed) always draws the same u — reproducible samples across
    runs and engines, append-stable like the split machinery.

    The statistical contract (inclusion frequency tracks weight across
    seeds) is pinned in tests/test_splits.py; rows-only at the driver
    gate because ln/pow are libm-dependent in the last ulp.
    """
    key_hex = F.md5(
        F.concat_ws("#", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    u = (F.conv(F.substring(key_hex, 1, 15), 16, 10).cast("double") + 0.5) / F.lit(
        float(1 << 60)
    )
    w = F.col(weight_col).cast("double")
    es_key = -F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("_es_key", es_key)
        .orderBy("_es_key", F.col(id_col))
        .limit(k)
        .drop("_es_key")
    )
