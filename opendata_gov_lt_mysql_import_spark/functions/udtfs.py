"""Python user-defined table functions (Spark 4 UDTF API).

The reference has no table-function surface; this demonstrates the
engine's extension point for row→many-rows logic that doesn't decompose
into ``explode`` of a built-in expression (per-row stateful emission,
early termination, multi-column yields).

Scale guidance: a UDTF is PYTHON-path — every input row crosses the
JVM↔Python boundary (Arrow-batched here via ``useArrow``). For anything
expressible as ``posexplode(split(...))`` prefer the JVM route (see
operators/textanalysis.py, which keeps tokenization in whole-stage
codegen). Reach for a UDTF only when the emission logic is genuinely
imperative — and then it still parallelizes per partition like any
Arrow UDF.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string", useArrow=True)
class TokenizeHead:
    """Emit the first ``limit`` whitespace tokens of ``text`` with their
    positions (0-based). Early-terminates per row — the UDTF advantage
    over explode(slice(split(...))) is that it never materializes the
    full token array for a 10 MB document when only the head is needed."""

    def eval(self, text: str, limit: int):
        if not text:
            return
        for i, tok in enumerate(text.split()):
            if i >= limit:
                return
            yield i, tok


def register_udtfs(spark) -> None:
    """Register all shipped UDTFs for SQL/LATERAL use."""
    spark.udtf.register("tokenize_head", TokenizeHead)
