"""Registry-level guards: every driver query must carry an oracle, or be
on the documented rows-only list (engine-specific hashes / Bernoulli
sampling / bin-packing heuristics, each pytest-pinned elsewhere)."""

from __future__ import annotations

import __spark_entry__ as entrymod

# Every rows-only query and WHY its semantics are not SQL-expressible.
ROWS_ONLY = {
    "minhash_lsh_pairs": "xxhash64 signature permutations are JVM-specific",
    "simhash_pairs": "xxhash64 bit votes are JVM-specific",
    "ngram_jaccard_verify_lsh": "candidate set comes from xxhash64 LSH",
    "approx_distinct_users": "HLL++ sketch estimate is engine-specific",
    "approx_percentile_price": "KLL sketch estimate is engine-specific",
    "sample_stratified_by_lang": "Bernoulli draws are engine-specific",
    "pack_sequences": "greedy first-fit packing order is engine-specific",
}


def test_every_query_has_oracle_or_documented_reason():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert set(ROWS_ONLY) == q - o, (
        "queries without an oracle must be added to ROWS_ONLY with a "
        f"reason (or given an oracle): {sorted((q - o) ^ set(ROWS_ONLY))}"
    )
    # oracles for queries that don't exist are dead weight
    assert not o - q


def test_registry_is_nontrivially_large():
    # the §2 inventory plus the training-data surface; shrinkage here
    # means a registration import broke
    assert len(entrymod.queries()) >= 99
