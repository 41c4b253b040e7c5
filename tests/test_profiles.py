"""h-index expression goldens + profile pipeline on the AddTestData fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from iconic_data_science_spark import fixtures
from iconic_data_science_spark.functions import h_index_from_counts
from iconic_data_science_spark.operators.profiles import author_profiles


def test_h_index_expression(spark):
    cases = [
        (1, [0, 0, 0], 0),
        (2, [1], 1),
        (3, [5, 4, 3, 2, 1], 3),   # classic: 3 papers with >=3 citations
        (4, [10, 10], 2),
        (5, [1, 1, 1, 1], 1),
        (6, [], 0),
        (7, [25], 1),
        (8, [7, 7, 7, 7, 7, 7, 7], 7),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in cases], "id long, vec array<long>"
    ).select("id", h_index_from_counts("vec", alias="h"))
    got = {r.id: r.h for r in df.collect()}
    for i, _, expected in cases:
        assert got[i] == expected, f"case {i}: got {got[i]} want {expected}"


def test_author_profiles_fixture(spark):
    """Hand-derived profile for author 5 on the AddTestData topology.

    Author 5's papers: 3 (1990), 5 (2005), 8 (2007).
    Citation edges (testPr1) onto them, with cite year = citing paper's year:
      paper 3 cited by 0(1993), 1(1992), 2(1991), 7(2007) → cum at 2007 = 4
      paper 5 cited by 6(2006), 7(2007) → cum at 2007 = 2
      paper 8 cited by 7(2007), 9(2007) → cum at 2007 = 2
    At year 2007: papers_cum=3, citations_cum=8, vector [4,2,2] → h=2.
    At year 1990: papers_cum=1 (paper 3), citations_cum=0, h=0.
    At year 1993: paper 3 has cites 1991,1992,1993 → 3; h=1.
    """
    paa = fixtures.paa_df(spark)
    py = fixtures.paper_years_df(spark)
    years = py.select("year").distinct()
    cited_years = py.select(F.col("paper").alias("citing"), F.col("year").alias("cite_year"))
    pr = fixtures.pr_df(spark).join(cited_years, "citing").select("citing", "cited", "cite_year")

    prof = {
        (r.author, r.year): (r.papers_cum, r.citations_cum, r.h_index)
        for r in author_profiles(paa, py, pr, years).collect()
    }
    assert prof[(5, 2007)] == (3, 8, 2)
    assert prof[(5, 1990)] == (1, 0, 0)
    assert prof[(5, 1993)] == (1, 3, 1)
    # author 7: papers 6(2006),7(2007),9(2007); cites: 6 cited by 7(2007);
    # 7,9 uncited → at 2007: papers 3, citations 1, h=1
    assert prof[(7, 2007)] == (3, 1, 1)
