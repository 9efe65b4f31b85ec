"""Registry-level guards: every driver query must carry an oracle, or be
on the documented rows-only list (engine-specific hashes / Bernoulli
sampling / bin-packing heuristics, each pytest-pinned elsewhere)."""

from __future__ import annotations

import __spark_entry__ as entrymod

# Every rows-only query and WHY its semantics are not SQL-expressible.
ROWS_ONLY = {
    "approx_distinct_users": "HLL++ sketch estimate is engine-specific",
    "approx_percentile_price": "KLL sketch estimate is engine-specific",
    "sample_stratified_by_lang": "Bernoulli draws are engine-specific",
    "weighted_sample_orders": "A-ES keys use -ln(u)/w; ln differs in the "
    "last ulp across libms so the top-k boundary is engine-specific "
    "(inclusion-probability contract pinned in tests/test_splits.py)",
    "semantic_dedup_arrow": "BLAS gram-matrix pair scores can differ in "
    "the last ulp exactly at the 0.3 threshold (semantic_dedup is the "
    "oracle-exact HOF twin; set-equality pinned in tests/test_operators.py)",
    "hll_sketch_rollup_merge": "DataSketches HLL estimates are "
    "engine-specific (merge-losslessness + error bound pinned in "
    "tests/test_operators.py)",
    "image_dhash_dedup": "pixel decode + perceptual dHash of real BMP "
    "bytes is not SQL-expressible; scale-invariance, pattern "
    "separation and hamming pinned in tests/test_multimodal.py",
    "audio_envelope_dedup": "WAV decode + perceptual envelope hashing "
    "of real RIFF/PCM16 bytes is not SQL-expressible; gain invariance, "
    "resample invariance and pattern separation pinned in "
    "tests/test_multimodal.py",
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
    assert len(entrymod.queries()) >= 111


def test_driver_visible_window_is_curated():
    """The driver records correctness rows for only the first 50 registry
    entries (CORRECTNESS_r01/r02 both contain exactly the first 50 names
    in registration order). Pin the curated window so a new registration
    can never silently push a §2 operator or family representative out of
    the driver's sight."""
    from opendata_gov_lt_mysql_import_spark.queries import DRIVER_TOP50

    assert len(DRIVER_TOP50) == 50
    assert len(set(DRIVER_TOP50)) == 50
    names = list(entrymod.queries())
    assert names[:50] == list(DRIVER_TOP50)
    # curated entries are oracle-checked, with a small explicit
    # exception list: round-6 rotated rows-only families (documented in
    # ROWS_ONLY above) into the window per the round-5 review, so those
    # families earn a driver row at all — the driver records their
    # weaker rows-only check and their invariants stay pytest-pinned.
    # Cap the contingent so rows-only entries can never crowd out
    # oracle rows. (pagerank_k left this list the same round: its
    # fixed-point integer rewrite made K rounds bit-identical across
    # engines, so it carries a full unrolled-CTE oracle now.)
    allowed_rows_only = {"weighted_sample_orders"}
    oracles = entrymod.oracle_sql()
    missing = [
        n for n in DRIVER_TOP50
        if n not in oracles and n not in allowed_rows_only
    ]
    assert not missing, f"driver-visible window needs oracles: {missing}"
    assert allowed_rows_only <= set(ROWS_ONLY)
    assert len(allowed_rows_only & set(DRIVER_TOP50)) <= 2
