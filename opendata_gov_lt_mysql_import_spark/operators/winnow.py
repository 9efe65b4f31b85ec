"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm).

Beyond-reference LLM-pipeline surface (no counterpart in the reference
harvester, odgovlt.py — cited per repo convention): position-robust
local fingerprinting with the paper's guarantee — any shared substring
of at least w + k - 1 characters contributes at least one SHARED
fingerprint, because both documents see the same k-gram hash window and
select the same minimum. This makes the winnowed set a deterministic,
alignment-free evidence base for overlap detection, complementing the
probabilistic MinHash signatures (operators/dedup.py) and the exact
window-hash span family (operators/substring.py): winnowing selects an
EXACT subset of content hashes (no banding false positives) while
staying ~2/(w+1) dense instead of keeping every position.

Hashing is the repo's engine-portable md5 idiom (first 13 hex digits as
BIGINT, the kmv/kfold 52-bit discipline), so a SQL oracle rebuilds the
identical fingerprint sets and every downstream count is hash-exact.

HOF discipline (the round-7 recapture lesson, operators/dedup.py
word_ngrams): the k-gram hash array is BOUND once per row through the
1-element ``transform`` wrapper before the window-min pass touches it —
captured directly, the O(n) md5 array would re-evaluate per window.
Window minima use ``w`` fixed ``F.get`` lookups (O(1) each, NULL past
the end, skipped by ``least``) rather than ``slice`` (which copies a
w-element array per window).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["kgram_hashes", "winnow_fingerprints"]

#: 52-bit hash domain: 13 md5 hex digits (see operators/sketches.py
#: KMV_SCALE for the overflow/collision rationale).
_HEX_DIGITS = 13


def kgram_hashes(text: Column, k: int = 16, hash_fn: str = "md5") -> Column:
    """Array of hashes of every k-character gram of ``text``
    (positions 1..len-k+1; a document shorter than k contributes the
    single hash of its whole text — the same degenerate-input rule as
    the substring window family).

    ``hash_fn``: 'md5' (default) is the engine-portable 52-bit
    verification idiom a SQL oracle can replay; 'xxhash64' is the
    JVM-native production path (~3-5x cheaper per gram, full signed-64
    domain) — rows-only checkable, like the minhash family's xxhash
    twin. The winnowing guarantee is hash-agnostic."""
    n_kg = F.greatest(F.length(text) - (k - 1), F.lit(1))
    if hash_fn == "xxhash64":
        return F.transform(
            F.sequence(F.lit(1), n_kg),
            lambda i: F.xxhash64(F.substr(text, i, F.lit(k))),
        )
    if hash_fn != "md5":
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    return F.transform(
        F.sequence(F.lit(1), n_kg),
        lambda i: F.conv(
            F.substring(F.md5(F.substr(text, i, F.lit(k))), 1, _HEX_DIGITS),
            16,
            10,
        ).cast("long"),
    )


def winnow_fingerprints(
    text: Column, k: int = 16, w: int = 8, hash_fn: str = "md5"
) -> Column:
    """Distinct winnowed fingerprint set: the minimum hash of each
    window of ``w`` consecutive k-gram hashes, deduplicated. Guarantee:
    documents sharing a substring of >= w + k - 1 chars share a
    fingerprint; expected density is 2/(w+1) of all positions."""

    def select_mins(hs: Column) -> Column:
        n_win = F.greatest(F.size(hs) - (w - 1), F.lit(1))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n_win - 1),
                # least() skips the NULLs that F.get yields past the
                # array end, so the single degenerate window of a short
                # document is the min of whatever exists — identical to
                # the oracle's truncated list_min slice.
                lambda j: F.least(*[F.get(hs, j + i) for i in range(w)]),
            )
        )

    return F.element_at(
        F.transform(F.array(kgram_hashes(text, k, hash_fn)), select_mins), 1
    )
