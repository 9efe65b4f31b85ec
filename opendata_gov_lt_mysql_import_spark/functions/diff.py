"""Change detection — the reference's asymmetric deep-diff (F5).

``was_changed`` (/root/reference/odgovlt.py:112-124) compares a *new*
document against an *old* one recursively, but only over the NEW side's
structure:

- dict: recurse on new's keys only — keys present only in old are ignored;
- list: index-wise; ``len(new) > len(old)`` ⇒ changed, trailing old
  elements ignored;
- scalar: ``!=``.

The DataFrame form (``changed_rows``) reproduces the same asymmetry by
canonicalizing ONLY the new side's fields on both frames and comparing the
canonical JSON projection — rows whose new-side projection differs (or that
don't exist in old) are "changed" and flow to the sink; everything else is
pruned before any write. This turns the reference's per-row dict walk into
one join + one expression, fully Catalyst-planned.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def was_changed(new, old, path: tuple = ()) -> bool:
    """Pure-Python asymmetric deep-diff (reference semantics, incl. the
    quirk that list comparison recurses with ``old[i]`` possibly absent →
    length check first)."""
    if isinstance(new, dict):
        old = old if isinstance(old, dict) else {}
        return any(
            was_changed(new[k], old.get(k), path + (k,)) for k in new
        )
    if isinstance(new, (list, tuple)):
        if not isinstance(old, (list, tuple)) or len(new) > len(old):
            return True
        return any(
            was_changed(new[i], old[i], path + (i,)) for i in range(len(new))
        )
    return new != old


def _canonical(df: DataFrame, fields: Sequence[str]) -> F.Column:
    """Canonical JSON over exactly ``fields`` (new side's structure)."""
    return F.to_json(F.struct(*[F.col(f) for f in fields]))


def changed_rows(
    new: DataFrame,
    old: DataFrame,
    key: str | Sequence[str],
    compare_fields: Sequence[str] | None = None,
) -> DataFrame:
    """Rows of ``new`` that are absent from ``old`` or differ on new's
    fields. Output columns = new's columns plus ``_change_kind``
    ('create' | 'update').

    Scale notes: comparison is a single equi-join on the key (shuffle or
    broadcast as Catalyst decides) with the canonical-JSON equality pushed
    into the join's filter — no per-row Python, no collect.
    """
    keys = [key] if isinstance(key, str) else list(key)
    fields = [c for c in (compare_fields or new.columns) if c not in keys]

    new_c = new.withColumn("_canon_new", _canonical(new, fields))
    old_c = old.select(
        *[F.col(k).alias(f"_old_{k}") for k in keys],
        _canonical(old, fields).alias("_canon_old"),
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_old_{k}"))

    joined = new_c.join(old_c, on=cond, how="left")
    out = joined.withColumn(
        "_change_kind",
        F.when(F.col("_canon_old").isNull(), F.lit("create")).when(
            F.col("_canon_new") != F.col("_canon_old"), F.lit("update")
        ),
    ).filter(F.col("_change_kind").isNotNull())
    return out.select(*new.columns, "_change_kind")
