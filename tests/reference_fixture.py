"""Replica of the reference's five-table test fixture
(reference tests/test_odgovlt.py:120-389) as plain DataFrames — shared by
the in-memory pipeline e2e test and the live-JDBC (Derby) variant."""

from __future__ import annotations

R_ZODZIAI_1 = (
    "​Šilumos tiekimo licencijas turinčių įmonių sąrašas,"
    "šiluma,"
    "šilumos tiekėjai,"
    "licencijos,"
    "licencijuojamos veiklos teritorija"
)


def build_reference_tables(spark):

    user = spark.createDataFrame(
        [
            (1, "User1", "secret123", "testas1@testas1.com", "Jonas", "Jonaitis"),
            (2, "User2", "secret123", "testas2@testas2.com", "Tomas", "Tomauskas"),
        ],
        "ID int, LOGIN string, PASS string, EMAIL string, FIRST_NAME string, LAST_NAME string",
    )
    istaiga = spark.createDataFrame(
        [
            (1, "Testinė organizacija nr. 1", "888", "Testinė g. 9"),
            (2, "Testinė organizacija nr. 2", "777", "Testinė g. 91"),
        ],
        "ID int, PAVADINIMAS string, KODAS string, ADRESAS string",
    )
    rinkmena = spark.createDataFrame(
        [
            (
                1,
                "Testinė rinkmena nr. 1",
                "Testas nr. 1",
                "http://www.testas1.lt",
                R_ZODZIAI_1,
                "testas1@testas1.com",
                "U",
                1,
                1,
                "kodas-1",
            ),
            (
                2,
                "Testinė rinkmena nr. 2",
                "Testas nr. 2",
                "http://www.testas2.lt",
                'keliai,eismo intensyvumas,"e"',
                "testas2@testas2.com",
                "U",
                2,
                2,
                "kodas-2",
            ),
            # unknown user + org → default fallbacks (reference :360-361)
            (
                3,
                "Testinė rinkmena nr. 3",
                "Testas nr. 3",
                "http://www.testas3.lt",
                "zyma",
                "testas3@testas3.com",
                "U",
                3,
                3,
                None,
            ),
            # unpublished → filtered out (P1)
            (
                4,
                "Nematoma rinkmena",
                "–",
                "http://nematoma.lt",
                "",
                "x@x.lt",
                "P",
                1,
                1,
                None,
            ),
        ],
        "ID int, PAVADINIMAS string, SANTRAUKA string, TINKLAPIS string, "
        "R_ZODZIAI string, K_EMAIL string, STATUSAS string, USER_ID int, "
        "istaiga_id int, KODAS string",
    )
    kategorija = spark.createDataFrame(
        [
            (1, "testas1", 0, 1),
            (2, "testas2", 0, 1),
            (3, "testas3", 1, 2),
            (4, "testas4", 2, 2),
            (5, "testas5", 3, 3),
            (6, "testas6", 4, 3),
            (7, "testas7", 4, 3),
        ],
        "ID int, PAVADINIMAS string, KATEGORIJA_ID int, LYGIS int",
    )
    kategorija_rinkmena = spark.createDataFrame(
        [(1, 1, 1), (2, 3, 2)],
        "ID int, KATEGORIJA_ID int, RINKMENA_ID int",
    )
    return {
        "user": user,
        "istaiga": istaiga,
        "rinkmena": rinkmena,
        "kategorija": kategorija,
        "kategorija_rinkmena": kategorija_rinkmena,
    }
