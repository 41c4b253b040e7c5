"""Coauthor-edge extraction (G1/G2) — the shared graph primitive.

Reference semantics:
  - G1: from the paper↔author bridge, per (author, year) the distinct set
    of coauthors, self-pairs removed
    (/root/reference/src/notebooks/scala/PersonalNet.scala:88-98;
    ProfileConversion.scala:57-70). The reference builds it two ways —
    groupBy+collect_list+explode (PersonalNet.scala) and a pure relational
    self-join (PersonalNet_2.scala); we use the self-join: it avoids
    materializing per-paper author arrays (a mega-paper would make one
    giant array) and lets Catalyst pick the join strategy.
  - G2: first-collaboration year = min(year) per (ego, alter) pair
    (PersonalNet_2.scala:125).
  - Undirected edges are stored as both directed pairs
    (``doubleTuple``, StaticNet.scala:299) — i.e. the (ego, alter) table
    contains both orientations.

Scale posture: the self-join shuffles on ``paper`` once; both sides are
the same (deduped, 2-column) projection, so the shuffle is minimal and
AQE handles skewed papers (a 1000-author paper → the O(k²) pair explosion
is the known risk, SURVEY.md §7; ``max_authors_per_paper`` mirrors the
reference's truncation knob ``papersToLookAt``, StaticNet.scala:314).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def paper_authors(paa: DataFrame, paper_col: str = "paper", author_col: str = "author") -> DataFrame:
    """Distinct (paper, author) bridge — dedupes multi-row authorship."""
    return paa.select(F.col(paper_col).alias("paper"), F.col(author_col).alias("author")).distinct()


def coauthor_pairs(
    paa: DataFrame,
    paper_col: str = "paper",
    author_col: str = "author",
    max_authors_per_paper: int | None = None,
) -> DataFrame:
    """Directed coauthor pair per shared paper: (paper, ego, alter_id).

    Self-pairs removed (P3, PersonalNet.scala:98). Both orientations kept
    (undirected-as-two-directed, StaticNet.scala:299).
    """
    pa = paper_authors(paa, paper_col, author_col)
    if max_authors_per_paper is not None:
        pa = _drop_mega_papers(pa, max_authors_per_paper)
    a = pa.alias("a")
    b = pa.alias("b")
    return (
        a.join(b, (F.col("a.paper") == F.col("b.paper")) & (F.col("a.author") != F.col("b.author")))
        .select(
            F.col("a.paper").alias("paper"),
            F.col("a.author").alias("ego"),
            F.col("b.author").alias("alter_id"),
        )
    )


def _drop_mega_papers(pa: DataFrame, cap: int) -> DataFrame:
    """Mega-paper truncation as a broadcast ANTI join against the
    OVER-cap set: papers exceeding the cap are the pathological few
    (that is the premise of capping), so the broadcast side stays tiny
    at any corpus size — whereas semi-joining the under-cap set would
    try to broadcast nearly every paper at 100 TB and fall back to a
    full shuffle join. The count is a partial-aggregated groupBy(paper)
    (one row per paper out)."""
    mega = (
        pa.groupBy("paper")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > cap)
        .select("paper")
    )
    return pa.join(F.broadcast(mega), "paper", "left_anti")


def coauthor_edges(
    paa: DataFrame,
    paper_years: DataFrame,
    min_papers_together: int = 1,
    max_authors_per_paper: int | None = None,
) -> DataFrame:
    """G1+G2 edge table: (ego, alter_id, papers_together, first_year).

    ``paper_years`` is (paper, year). ``papers_together`` is the reference's
    edge weight (``Link(src, dst, papersTogether)``, StaticNet.scala:209);
    ``first_year`` is G2's min collaboration year (PersonalNet_2.scala:125).
    ``min_papers_together`` thresholds edge strength — the scale knob that
    keeps dense graphs tractable.
    """
    pa = paper_authors(paa)
    if max_authors_per_paper is not None:
        pa = _drop_mega_papers(pa, max_authors_per_paper)
    # Attach the year BEFORE the self-join, and self-join the year-joined
    # frame with ITSELF: when paper_years is filtered (e.g. BFS restricts
    # to one year), BOTH pairing inputs shrink by the selectivity before
    # the O(k²) fan-out — pairs require a.paper == b.paper, so
    # restricting b identically is semantics-preserving, and an
    # unrestricted b would shuffle the whole bridge just to drop
    # non-matching papers at the join. Identical subplans on both sides
    # also let Catalyst reuse the exchange (one distinct+year join, not
    # two).
    ay = pa.join(paper_years, "paper")
    a = ay.alias("a")
    b = ay.alias("b")
    edges = (
        a.join(b, (F.col("a.paper") == F.col("b.paper")) & (F.col("a.author") != F.col("b.author")))
        .groupBy(F.col("a.author").alias("ego"), F.col("b.author").alias("alter_id"))
        .agg(
            F.count("*").alias("papers_together"),
            F.min("a.year").alias("first_year"),
        )
    )
    if min_papers_together > 1:
        edges = edges.filter(F.col("papers_together") >= min_papers_together)
    return edges
