"""Parity pins for the round-14 FNV MinHash SQL replay
(`queries_ml._minhash_fnv_ctes`): the claim that moved the PRODUCTION
(Arrow-hash) MinHash-LSH entries off the rows-only list is that
`minhash_signatures_arrow`'s gram hash + affine permutation minima
replay bit-exactly on DuckDB HUGEINTs. The oracle gate checks the
end-to-end pair sets; these tests pin the layer beneath — the 64
signature components themselves — so a future drift (hash constant,
shingle width, padding rule) is caught at the signature, not as an
opaque pair-set diff."""

from __future__ import annotations

import duckdb
import pytest

from opendata_gov_lt_mysql_import_spark.operators.dedup import (
    minhash_signatures_arrow,
)
from opendata_gov_lt_mysql_import_spark.queries_ml import (
    _XXH_M,
    _documents_with_dups,
    _minhash_fnv_ctes,
)


def _duck_sigs(rows: list[tuple[int, str | None]]) -> dict[int, list[int]]:
    """Unsigned 64-component signatures via the oracle CTE chain."""
    con = duckdb.connect()
    con.execute("CREATE TABLE docs_in (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs_in VALUES (?, ?)", rows)
    sql = f"""
    WITH docs AS (SELECT * FROM docs_in),
    {_minhash_fnv_ctes('docs', est_min=0.5, cap=4096)}
    SELECT * FROM msig ORDER BY doc_id
    """
    return {
        int(r[0]): [int(v) for v in r[1:]]
        for r in con.execute(sql).fetchall()
    }


def _spark_sigs(spark, df) -> dict[int, list[int]]:
    out = minhash_signatures_arrow(df, "text", "doc_id").collect()
    return {r["id"]: [int(v) % _XXH_M for v in r["sig"]] for r in out}


# `full` tier (round-16): see pytest.ini — excluded from the default driver-window run
@pytest.mark.full
def test_fnv_signatures_match_arrow_on_dup_corpus(spark, sf_dir):
    """Every signature component of every doc (incl. the planted
    clones) matches the numpy FNV + affine-min computation bit-exactly."""
    d = _documents_with_dups(spark, sf_dir)
    sp = _spark_sigs(spark, d)
    rows = [(r["doc_id"], r["text"]) for r in d.select("doc_id", "text").collect()]
    du = _duck_sigs(rows)
    assert set(sp) == set(du)
    mismatched = [i for i in sp if sp[i] != du[i]]
    assert not mismatched, f"signature drift on docs {mismatched[:5]}"


@pytest.mark.parametrize(
    "text",
    [
        "",  # empty -> one gram of 9 NUL bytes on both engines
        "a",  # shorter than the shingle -> right-NUL-padded single gram
        "12345678",  # len 8: still one padded gram
        "123456789",  # exactly one full-width gram
        "1234567890",  # two grams
        " leading and trailing  whitespace kept verbatim ",
        "repeat repeat repeat repeat repeat",  # duplicate grams (min unaffected)
    ],
)
def test_fnv_signature_edge_lengths(spark, text):
    """NUL padding and the max(len-8, 1) gram count replay exactly at
    the short-document boundary (the fixture never exercises it — every
    doc is >= 47 bytes — so pin it directly)."""
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    sp = _spark_sigs(spark, df)
    du = _duck_sigs([(1, text)])
    assert sp[1] == du[1]


def test_fnv_null_text_matches(spark):
    """NULL text hashes like '' (numpy fillna('') vs SQL COALESCE)."""
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert _spark_sigs(spark, df)[1] == _duck_sigs([(1, None)])[1]


class TestXxh64Str31:
    """Parity pins for `_xxh64_str31_ctes` — the variable-length
    (< 32 byte) XXH64 replay that unlocked the simhash oracle."""

    def _duck(self, vals: list[str]) -> dict[int, int]:
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            _xxh64_str31_ctes,
        )

        con = duckdb.connect()
        con.execute("CREATE TABLE src_in (i BIGINT, _t VARCHAR)")
        con.executemany(
            "INSERT INTO src_in VALUES (?, ?)", list(enumerate(vals))
        )
        sql = (
            "WITH src AS (SELECT * FROM src_in),\n"
            f"{_xxh64_str31_ctes('src', '_xh')}\nSELECT i, _xh FROM xhs"
        )
        return {int(r[0]): int(r[1]) for r in con.execute(sql).fetchall()}

    def test_matches_spark_every_length_0_to_31(self, spark):
        """Four random printable-ASCII strings of EVERY length 0..31 —
        covers all word-round/4-byte/tail-byte combinations of the
        small-input path."""
        import random

        import pyspark.sql.functions as F

        rng = random.Random(7)
        chars = [chr(c) for c in range(32, 127)]
        vals = list(
            dict.fromkeys(
                "".join(rng.choice(chars) for _ in range(ln))
                for ln in range(32)
                for _ in range(4)
            )
        )
        du = self._duck(vals)
        sp = {
            r["i"]: int(r["h"]) % _XXH_M
            for r in spark.createDataFrame(
                list(enumerate(vals)), "i long, t string"
            )
            .select("i", F.xxhash64("t").alias("h"))
            .collect()
        }
        assert sp == du

    def test_contract_violations_raise_not_mishash(self):
        """>= 32 bytes and non-ASCII both error() loudly — a wrong hash
        would vanish into sum()'s NULL-skipping, so the guard must be
        an error, not a NULL."""
        with pytest.raises(Exception, match="32 bytes"):
            self._duck(["x" * 32])
        with pytest.raises(Exception, match="non-ASCII"):
            self._duck(["café"])
