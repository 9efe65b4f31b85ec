"""Declarative data-quality constraints compiled to ONE aggregation pass
(Deequ-style), beyond-reference surface for pipeline gating.

The reference validates rows implicitly — bad CKAN rows are skipped one
at a time inside the harvest loop (/root/reference/odgovlt.py:355-367
catches per-object errors and continues). At 100 TB you can't afford a
validation pass per rule: every scalar constraint here compiles to a
conditional-count expression and ALL of them run in a single
``df.agg(...)`` — one scan, map-side partial aggregation, one 1-row
shuffle — then unpivot to a tall report. Referential-integrity checks
are the one rule class that genuinely needs a second relation; they run
as (broadcast when small) left-anti join counts and union into the same
report.

Every metric is a **violation count** (``passed == (violations == 0)``),
so the report schema is uniform and a pipeline gate is a single
``filter(~passed).isEmpty()`` — no per-rule result shapes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: a name, the column it guards, and a violation-count
    aggregate expression (0 violations == pass)."""

    name: str
    column: str
    violations: Column = field(hash=False, compare=False)


def not_null(col: str, name: str | None = None) -> Check:
    return Check(
        name or f"{col}_not_null",
        col,
        F.count(F.when(F.col(col).isNull(), F.lit(1))),
    )


def unique(col: str, name: str | None = None) -> Check:
    """Excess duplicates among non-null values: count(col) - count_distinct(col).
    Exact count_distinct pays an Expand at scale — for a 100 TB
    monitoring (not gating) run swap in approx_count_distinct and accept
    a tolerance instead of 0."""
    return Check(
        name or f"{col}_unique",
        col,
        F.count(F.col(col)) - F.count_distinct(F.col(col)),
    )


def in_range(col: str, lo: float, hi: float, name: str | None = None) -> Check:
    """Non-null values outside [lo, hi]."""
    c = F.col(col)
    return Check(
        name or f"{col}_in_range",
        col,
        F.count(F.when(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))), F.lit(1))),
    )


def in_set(col: str, values: Sequence[object], name: str | None = None) -> Check:
    """Non-null values outside the accepted set."""
    c = F.col(col)
    return Check(
        name or f"{col}_in_set",
        col,
        F.count(F.when(c.isNotNull() & ~c.isin(list(values)), F.lit(1))),
    )


def matches(col: str, regex: str, name: str | None = None) -> Check:
    """Non-null values not matching ``regex`` (search semantics — anchor
    with ^...$ for full-match)."""
    c = F.col(col)
    return Check(
        name or f"{col}_matches",
        col,
        F.count(F.when(c.isNotNull() & ~c.rlike(regex), F.lit(1))),
    )


def min_rows(n: int, name: str = "min_rows") -> Check:
    """Shortfall below the expected minimum row count."""
    return Check(
        name,
        "*",
        F.greatest(F.lit(n) - F.count(F.lit(1)), F.lit(0)).cast("long"),
    )


def non_negative(col: str, name: str | None = None) -> Check:
    c = F.col(col)
    return Check(
        name or f"{col}_non_negative",
        col,
        F.count(F.when(c.isNotNull() & (c < 0), F.lit(1))),
    )


def check_constraints(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Run every scalar check in ONE aggregation over ``df``.

    Returns a tall report ``(check_name string, col_name string,
    violations bigint, passed boolean)`` with one row per check, ordered
    as given. The single ``agg`` keeps this a one-scan job regardless of
    how many rules are attached — partial aggregation collapses each
    partition to one row of counters before the 1-row exchange.
    """
    aggs = [c.violations.cast("long").alias(f"_m{i}") for i, c in enumerate(checks)]
    row = df.agg(*aggs)
    # unpivot the 1-row metrics frame to the tall report (driver-free:
    # stack runs on the executor holding the single row)
    pairs = ", ".join(
        f"'{c.name}', '{c.column}', _m{i}" for i, c in enumerate(checks)
    )
    tall = row.select(
        F.expr(
            f"stack({len(checks)}, {pairs}) AS (check_name, col_name, violations)"
        )
    )
    return tall.select(
        "check_name",
        "col_name",
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )


def foreign_key_check(
    fact: DataFrame,
    fact_col: str,
    dim: DataFrame,
    dim_col: str,
    name: str | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Referential integrity as an anti-join count — the one rule class
    that needs a second relation. ``broadcast_dim=True`` (the common
    small-dimension case) keeps it shuffle-free on the fact side; for a
    large dimension let AQE pick the shuffled join. Returns the same
    uniform report row shape as ``check_constraints``."""
    d = dim.select(F.col(dim_col).alias("_fk")).distinct()
    if broadcast_dim:
        d = F.broadcast(d)
    orphans = (
        fact.select(F.col(fact_col).alias("_fk"))
        .filter(F.col("_fk").isNotNull())
        .join(d, "_fk", "left_anti")
    )
    return orphans.agg(
        F.count(F.lit(1)).cast("long").alias("violations")
    ).select(
        F.lit(name or f"{fact_col}_fk").alias("check_name"),
        F.lit(fact_col).alias("col_name"),
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def validation_report(
    df: DataFrame,
    checks: Sequence[Check],
    fk_checks: Sequence[DataFrame] = (),
) -> DataFrame:
    """Union the one-pass scalar report with any FK report rows."""
    report = check_constraints(df, checks)
    for fk in fk_checks:
        report = report.unionByName(fk)
    return report
