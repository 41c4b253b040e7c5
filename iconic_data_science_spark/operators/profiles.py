"""Per-author/year bibliometric profiles — the ProfileConversion pipeline.

Reference (/root/reference/src/notebooks/scala/ProfileConversion.scala):
per author and year, the running totals of papers and citations plus the
h-index, built from a year spine (S10, :91-95), zero-filled citation
counts (union + re-aggregate, :106,137 — J9/U1/A8), cumulative windows
(:114-115,139-143 — W1/W2) and an h-index aggregate over the collected
per-paper citation vector (:123-125,148-152 — A5/A7/A9).

Differences from the reference, by design (SURVEY.md §4):
  - the h-index is a JVM-side expression over a collected array
    (``functions.hindex``), not a Scala UDF;
  - zero-fill rows come from a broadcast join against the (tiny) year
    dim rather than a driver-configured year range;
  - null years would be imputed with the sentinel 3000 upstream (P7,
    PersonalNet.scala:81-84) — the synthetic tables have none.

Scale posture: the year dim is O(10) rows → broadcast; every other step
is an equi-join/groupBy/window on (paper) or (author) keys. The windows
partition by paper/author — high-cardinality keys, so no single-partition
bottleneck. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions import h_index_from_counts


def paper_year_spine(paper_years: DataFrame, years: DataFrame) -> DataFrame:
    """S10/J6: (paper, year) for every year >= the paper's publication year.

    ``years`` is the tiny year dim (distinct years); broadcast so the
    non-equi join is a broadcast nested loop over O(10) rows, not a
    shuffle (the reference cross-joined papers × configured years,
    ProfileConversion.scala:103,135).
    """
    p = paper_years.select(F.col("paper"), F.col("year").alias("pub_year"))
    y = years.select(F.col("year"))
    return p.join(F.broadcast(y), y["year"] >= p["pub_year"]).select("paper", "pub_year", "year")


def zero_filled_citations(citations_by_year: DataFrame, spine: DataFrame) -> DataFrame:
    """J9/U1/A8: merge observed per-year citation counts with zero rows.

    Reference shape (ProfileConversion.scala:106,137): union the real
    counts with a zero row per (paper, year), then groupBy-sum so the
    zeros vanish where a real count exists.
    """
    zeros = spine.select("paper", "year", F.lit(0).cast("long").alias("n_cit"))
    observed = citations_by_year.select(
        F.col("cited").alias("paper"), F.col("cite_year").alias("year"), F.col("n_cit")
    )
    return (
        zeros.unionByName(observed)
        # partition on paper alone: hash(paper) satisfies the
        # groupBy(paper, year) clustering requirement AND the
        # downstream window's partitionBy(paper) — one shuffle where
        # Catalyst's default hash(paper, year) would force a second
        # exchange before the cumulative window
        .repartition("paper")
        .groupBy("paper", "year")
        .agg(F.sum("n_cit").alias("n_cit"))
    )


def cumulative_citations(filled: DataFrame) -> DataFrame:
    """W1: running citation total per paper over years
    (ProfileConversion.scala:114-115)."""
    w = W.partitionBy("paper").orderBy("year").rowsBetween(W.unboundedPreceding, W.currentRow)
    return filled.select("paper", "year", F.sum("n_cit").over(w).alias("cum_cit"))


def author_profiles(
    paa: DataFrame,
    paper_years: DataFrame,
    citation_edges: DataFrame,
    years: DataFrame,
) -> DataFrame:
    """The full ProfileConversion output:
    (author, year, papers_cum, citations_cum, h_index).

    ``citation_edges``: (citing, cited, cite_year).
    Multi-authored papers count fully for each author (reference
    semantics — author rollups join through the paa bridge).
    """
    cit_by_year = citation_edges.groupBy("cited", "cite_year").agg(F.count("*").alias("n_cit"))
    spine = paper_year_spine(paper_years, years)
    filled = zero_filled_citations(cit_by_year, spine)
    cum = cumulative_citations(filled)

    author_paper = paa.select("paper", "author").distinct()
    apy = author_paper.join(cum, "paper")
    return (
        apy.groupBy("author", "year")
        .agg(
            F.count("*").alias("papers_cum"),
            F.sum("cum_cit").alias("citations_cum"),
            F.collect_list("cum_cit").alias("_cit_vec"),
        )
        .select(
            "author",
            "year",
            "papers_cum",
            "citations_cum",
            h_index_from_counts("_cit_vec", alias="h_index"),
        )
    )
