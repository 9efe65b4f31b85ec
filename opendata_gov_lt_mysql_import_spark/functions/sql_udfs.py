"""The reference's scalar library as Spark SQL UDFs (Spark 4 `CREATE
FUNCTION ... RETURN <expr>`).

The reference exposes its helpers as Python functions importable by any
script (fixcase/tagify, /root/reference/odgovlt.py:32-36, 74-86); the
engine's DataFrame twins live in functions/text.py. This module closes
the third consumption path: plain-SQL users. SQL UDFs are Catalyst
MACROS, not black boxes — the body inlines into the calling plan, so a
`fixcase(c_name)` in a WHERE clause still folds, pushes down, and stays
in whole-stage codegen, unlike a Python UDF which would fence the plan.

Registered functions:
- ``fixcase(s)``   — acronym-protecting first-letter lowercasing (F1)
- ``tagify(s)``    — tag normalization: strip non-letter/digit/space,
                     collapse whitespace, lowercase (F3)
- ``tag_ok(s)``    — the reference's tag length/truthiness filter (P8/P9)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# one CREATE statement per function; bodies mirror functions/text.py
# column expressions exactly ((?U) = unicode-aware Java regex classes so
# Lithuanian letters count as alphabetic)
_DEFS = [
    r"""
    CREATE OR REPLACE TEMPORARY FUNCTION fixcase(s STRING) RETURNS STRING
    RETURN CASE
      WHEN length(s) > 1
       AND substring(s, 1, 1) RLIKE '^(?U)\\p{L}$'
       AND substring(s, 2, 1) RLIKE '^(?U)\\p{L}$'
       AND substring(s, 1, 1) RLIKE '^\\p{Lu}$'
       AND substring(s, 2, 1) RLIKE '^\\p{Ll}$'
      THEN concat(lower(substring(s, 1, 1)), substring(s, 2, 2147483647))
      ELSE s END
    """,
    r"""
    CREATE OR REPLACE TEMPORARY FUNCTION tagify(s STRING) RETURNS STRING
    RETURN trim(regexp_replace(s, '(?U)\\W+', ' '))
    """,
    r"""
    CREATE OR REPLACE TEMPORARY FUNCTION tag_ok(s STRING) RETURNS BOOLEAN
    RETURN s IS NOT NULL AND length(s) >= 2 AND length(s) <= 100
    """,
]


def register_sql_functions(spark: SparkSession) -> None:
    """Install the scalar library for SQL consumers (idempotent)."""
    for ddl in _DEFS:
        spark.sql(ddl)
