"""Corpus-preparation operators for LLM training-data pipelines
(beyond-reference surface; sits alongside textanalysis/dedup).

Chunking, PII scrubbing, and sequence packing — the document-shaping
stages that run between dedup/quality-filter and tokenizer export.

Chunking and scrubbing are pure JVM column expressions (codegen'd,
linear in partitions — no Python anywhere per-row). Sequence packing is
inherently order-dependent imperative logic, so it runs as an
Arrow-batched ``applyInPandas`` *within* salted partition groups: each
group packs independently, bins never span groups, so the operator
scales out with no global coordination — the right 100 TB shape (a
global optimal packing would serialize the corpus; greedy-within-shard
is what production packers do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

# --------------------------------------------------------------------------
# Chunking
# --------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Split each document into fixed-size character windows with overlap.

    Chunk starts are ``1, 1+stride, 1+2*stride, …`` (1-based, stride =
    size - overlap) up to the text length; each chunk is
    ``substring(text, start, size)``. Empty/null text yields one empty
    chunk (start=1), so no document silently disappears.

    Pure JVM and shuffle-free: the (start, chunk) pairs are built as an
    array of structs and posexploded in one pass — whole-stage codegen,
    output partitioning inherits the scan. Chunking is embarrassingly
    parallel; at 100 TB this stage is bounded by scan + write only.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    n = F.coalesce(F.length(F.col(text_col)), F.lit(0))
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.struct(
                    s.cast("long").alias("chunk_start"),
                    F.substring(F.col(text_col), s, size).alias("chunk_text"),
                ),
            )
        ).alias("chunk_id", "c"),
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.chunk_start").alias("chunk_start"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


# --------------------------------------------------------------------------
# PII scrubbing
# --------------------------------------------------------------------------

# Patterns restricted to the Java-regex ∩ RE2 common subset so the same
# literal pattern runs on Spark (Java) and the DuckDB oracle (RE2).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d()-]{7,}\d", "<PHONE>"),
)


def scrub_pii(text: F.Column) -> F.Column:
    """Redact emails, IPv4 addresses, and phone-like digit runs.

    Order matters: emails first (usernames may contain digits), then
    IPs (dotted quads would otherwise match the phone run), then
    phones. A chain of regexp_replace — single codegen'd projection,
    no shuffle, no Python.
    """
    out = text
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def scrub_pii_sql(expr: str) -> str:
    """The DuckDB-oracle twin of :func:`scrub_pii` (RE2 needs the 'g'
    option — DuckDB replaces only the first match by default)."""
    out = expr
    for pattern, token in PII_PATTERNS:
        escaped = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{escaped}', '{token}', 'g')"
    return out


# --------------------------------------------------------------------------
# Sequence packing
# --------------------------------------------------------------------------

PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("bin_id", LongType(), False),
        StructField("bin_fill", LongType(), False),
    ]
)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    cap: int = 512,
    shards: int = 64,
) -> DataFrame:
    """Greedy first-fit-decreasing bin packing of documents into
    ``cap``-token training sequences.

    Documents longer than ``cap`` get a singleton bin (callers chunk
    first). Packing runs independently inside ``shards`` deterministic
    hash shards (``pmod(xxhash64(id), shards)``): one shuffle to group,
    then pure-Python FFD over each shard's (small) doc list inside an
    Arrow-batched ``applyInPandas``. Bin ids are globally unique —
    ``shard * 2^40 + local_bin``. Deterministic: shard hash is seeded,
    FFD sorts by (-n_tokens, doc_id).

    Scale note: greedy-within-shard trades ≤ a few % packing efficiency
    for linear scale-out; a global FFD would pull the whole corpus to
    one node. Shard count should track cluster parallelism (64 here for
    local[32]; thousands on a real cluster).
    """
    import pandas as pd  # noqa: F401  (applyInPandas contract)

    def pack(pdf):
        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        shard = int(pdf["_shard"].iloc[0])
        bins: list[int] = []  # remaining capacity per local bin
        assign: list[int] = []
        for t in pdf[tokens_col]:
            t = int(t)
            placed = -1
            for b, rem in enumerate(bins):
                if rem >= t:
                    placed = b
                    break
            if placed < 0:
                bins.append(max(cap - t, 0))
                placed = len(bins) - 1
            else:
                bins[placed] -= t
            assign.append(placed)
        out = pdf[[id_col, tokens_col]].copy()
        out["bin_id"] = [shard * (1 << 40) + b for b in assign]
        out.columns = ["doc_id", "n_tokens", "bin_id"]
        fills = out.groupby("bin_id")["n_tokens"].transform("sum")
        out["bin_fill"] = fills
        return out

    sharded = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)).alias("_shard"),
    )
    return sharded.groupBy("_shard").applyInPandas(pack, PACK_SCHEMA)
