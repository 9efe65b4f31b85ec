"""Unit tests for the scalar function library, pinned to the reference's
golden values (reference tests/test_odgovlt.py:362-399)."""

from __future__ import annotations

import pytest

from opendata_gov_lt_mysql_import_spark.functions.text import (
    fixcase,
    get_package_tags,
    slugify,
    tagify,
    transliterate,
)

GOLDEN_TITLE = (
    "Radiacinės saugos centro išduotų galiojančių "
    "licencijų verstis veikla su jonizuojančiosios spinduliuotės "
    "šaltiniais duomenys"
)


class TestSlugify:
    def test_golden_truncation(self):
        # reference tests/test_odgovlt.py:391-399
        assert slugify(GOLDEN_TITLE, length=42) == "radiacines-saugos--duomenys-saltiniais"
        assert len(slugify(GOLDEN_TITLE, length=42)) < 42

    def test_empty(self):
        assert slugify() == ""
        assert slugify(None) == ""
        assert slugify("") == ""

    def test_no_truncation_under_budget(self):
        assert slugify("Šiluma ir dujos") == "siluma-ir-dujos"

    def test_name_with_id_suffix(self):
        # reference group naming: slugify(PAVADINIMAS + ' ' + str(ID))
        assert slugify("Testas1 1") == "testas1-1"

    def test_special_chars_stripped(self):
        assert slugify("a,b.c!d?e(f)g 1-2") == "abcdefg-1-2"

    def test_truncation_boundary_exact_length(self):
        assert slugify("x" * 90) == "x" * 90
        out = slugify("x" * 91, length=90)
        assert out.startswith("x" * 90) is False  # truncated form contains '--'
        assert "--" in out


class TestFixcase:
    def test_golden(self):
        # reference tests/test_odgovlt.py:362-363
        assert fixcase("Testas9") == "testas9"

    def test_acronym_protected(self):
        assert fixcase("VMI") == "VMI"

    def test_short_and_nonalpha(self):
        assert fixcase("A") == "A"
        assert fixcase("1b") == "1b"
        assert fixcase("a1") == "a1"
        assert fixcase("") == ""

    def test_lithuanian(self):
        assert fixcase("Šiluma") == "šiluma"


class TestTagify:
    def test_collapses_nonword(self):
        assert tagify('licencijuojamos; veiklos... teritorija') == (
            "licencijuojamos veiklos teritorija"
        )

    def test_unicode_word_chars_kept(self):
        assert tagify("šilumos tiekėjai") == "šilumos tiekėjai"


class TestGetPackageTags:
    def test_golden_filtering(self):
        # reference tests/test_odgovlt.py:364-375
        tags = get_package_tags(
            "a" * 120 + ",testas2 testas3, testas4 testas5; testas6"
        )
        assert tags == ["testas2 testas3", "testas4 testas5", "testas6"]

    def test_golden_lithuanian_with_zwsp(self):
        # leading zero-width space survives the pipeline
        t = get_package_tags(
            "​Šilumos tiekimo licencijas turinčių įmonių sąrašas,"
            "šiluma,šilumos tiekėjai,licencijos,"
            "licencijuojamos veiklos teritorija"
        )
        assert sorted(t) == [
            "licencijos",
            "licencijuojamos veiklos teritorija",
            "šiluma",
            "šilumos tiekimo licencijas turinčių įmonių sąrašas",
            "šilumos tiekėjai",
        ]

    def test_short_tag_dropped(self):
        assert get_package_tags('keliai,eismo intensyvumas,"e"') == [
            "keliai",
            "eismo intensyvumas",
        ]

    def test_empty_inputs(self):
        assert get_package_tags(None) == []
        assert get_package_tags("") == []


class TestTransliterate:
    @pytest.mark.parametrize(
        "src,expected",
        [
            ("ąčęėįšųūž", "aceeisuuz"),
            ("ĄČĘĖĮŠŲŪŽ", "ACEEISUUZ"),
            ("Radiacinės", "Radiacines"),
            ("ascii stays", "ascii stays"),
            ("øßł", "ossl"),
        ],
    )
    def test_table(self, src, expected):
        # must hold on BOTH paths: the unidecode package (when installed)
        # and the table+NFKD fallback
        assert transliterate(src) == expected

    @pytest.mark.parametrize(
        "src,expected",
        [
            ("ąčęėįšųūž", "aceeisuuz"),
            ("Radiacinės", "Radiacines"),
            ("øßł", "ossl"),
            ("café naïve", "cafe naive"),
        ],
    )
    def test_fallback_path(self, src, expected, monkeypatch):
        """Pin the dependency-free path explicitly, so an environment that
        does have unidecode still exercises the fallback."""
        import opendata_gov_lt_mysql_import_spark.functions.text as textmod

        monkeypatch.setattr(textmod, "_unidecode", None)
        assert transliterate(src) == expected

    def test_unidecode_path_when_available(self):
        """When the real package is importable, it handles scripts the
        fallback can't (Cyrillic/Greek); otherwise the fallback's known
        limitation is documented: non-decomposable scripts drop to ''."""
        try:
            import unidecode  # noqa: F401
        except ImportError:
            assert transliterate("привет") == ""
        else:
            assert transliterate("привет") == "privet"


class TestSqlUdfLibrary:
    """functions/sql_udfs.py: the SQL-UDF forms must agree with the
    Python/Column forms on the SAME golden inputs, including the
    unicode-sensitive Lithuanian cases the driver oracle (ASCII
    fixture) never exercises."""

    def test_sql_udfs_match_python_goldens(self, spark):
        from opendata_gov_lt_mysql_import_spark.functions.sql_udfs import (
            register_sql_functions,
        )

        register_sql_functions(spark)
        cases = ["Testas9", "VMI", "A", "1b", "a1", "Šiluma", "ŠILUMA"]
        got = {
            r["s"]: r["f"]
            for r in spark.createDataFrame([(c,) for c in cases], "s string")
            .selectExpr("s", "fixcase(s) AS f")
            .collect()
        }
        for c in cases:
            assert got[c] == fixcase(c), c

        tag_cases = [
            "licencijuojamos; veiklos... teritorija",
            "šilumos tiekėjai",
        ]
        got_t = {
            r["s"]: r["t"]
            for r in spark.createDataFrame([(c,) for c in tag_cases], "s string")
            .selectExpr("s", "tagify(s) AS t")
            .collect()
        }
        for c in tag_cases:
            assert got_t[c] == tagify(c), c

    def test_sql_udf_inlines_into_plan(self, spark):
        """SQL UDFs are macros: the call must leave no UDF/python node in
        the physical plan — just the inlined CASE expression."""
        from opendata_gov_lt_mysql_import_spark.functions.sql_udfs import (
            register_sql_functions,
        )

        register_sql_functions(spark)
        df = spark.range(5).selectExpr("fixcase(CAST(id AS STRING)) AS f")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
