"""Handcrafted micro-fixtures ported from the reference's test data.

The reference's correctness methodology is fixture-based inspection
(/root/reference/src/notebooks/scala/AddTestData.scala:29-96): tiny
papers/paa/pr tables with a known coauthorship topology and labeled
citation edge cases (self-citation :86-87, citing two papers of one
author in a year :88-89, same paper cited twice in a year :90-91).
Ported here per FIXTURES.md §2-3 as in-memory DataFrames (S9 local
collection source) so pytest goldens replace eyeball inspection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# AddTestData.scala:39-52 — 10 papers, controlled years (two share 2007).
PAPER_YEARS = [
    (0, 1993), (1, 1992), (2, 1991), (3, 1990), (4, 2004),
    (5, 2005), (6, 2006), (7, 2007), (8, 2007), (9, 2007),
]

# AddTestData.scala:61-70 — testPaa1 coauthorship topology.
TEST_PAA1 = [
    (0, 1), (0, 2), (0, 3),
    (1, 1), (1, 2),
    (2, 2), (2, 3), (2, 4),
    (3, 2), (3, 5),
    (4, 1), (4, 2), (4, 3),
    (5, 4), (5, 5),
    (6, 6), (6, 7),
    (7, 6), (7, 7),
    (8, 5),
    (9, 7),
]

# AddTestData.scala:81-91 — testPr1 citation edges with labeled edge cases.
TEST_PR1 = [
    (0, 1), (0, 3),
    (1, 2), (1, 3),
    (2, 3),
    (6, 5),
    (7, 1), (7, 3),
    (7, 6),   # self-citation: papers 7 and 6 share authors {6,7}
    (7, 5), (7, 8),  # one paper citing two papers of author 5 in a year
    (9, 8),   # paper 8 cited twice in the same year (with (7,8))
]

# PySparkles.ipynb cells 31-34 indicator fixture (FIXTURES.md §3).
T_AFFS = [(1, "RO"), (2, "EN"), (3, "IT")]
T_PAA = [(1, 2, 1), (1, 3, 1), (2, 3, 1), (2, 1, 1), (3, 2, 1),
         (1, 5, 2), (3, 3, 1), (3, 5, 2), (4, 7, 3)]
T_PR = [(1, 2), (3, 2), (3, 4), (4, 1)]
T_PAPERS = [(1, 2007), (2, 2008), (3, 2008), (4, 2009)]


def paper_years_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(PAPER_YEARS, "paper long, year long")


def paa_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TEST_PAA1, "paper long, author long")


def pr_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TEST_PR1, "citing long, cited long")


def t_affs_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(T_AFFS, "affiliation long, country_code string")


def t_paa_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(T_PAA, "paper long, author long, affiliation long")


def t_pr_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(T_PR, "citing long, cited long")


def t_papers_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(T_PAPERS, "paper long, year long")
