"""Mapping of the driver's TPC-H-ish star schema onto the MAG shapes.

The engine's operators are written against the reference's abstract shapes
(paa bridge, paper→year dim, author dim, country dim). The driver's
synthetic tables (TESTDATA.md) map onto them as FIXTURES.md §6 prescribes:

    paa      ≈ lineitem  (paper=l_orderkey, author=l_suppkey)
    papers   ≈ orders    (id=o_orderkey, year=year(o_orderdate))
    authors  ≈ supplier
    country  ≈ nation via s_nationkey (affiliation country enrichment)
    pr       ≈ self-FK pairs on orders (citation edges)

Everything returns lazy DataFrames; year is BIGINT everywhere so Spark and
the DuckDB oracle agree on output schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import Catalog


def paa(cat: Catalog) -> DataFrame:
    """paper↔author bridge (models.scala:24 shape) from lineitem."""
    return cat.lineitem.select(
        F.col("l_orderkey").alias("paper"),
        F.col("l_suppkey").alias("author"),
    )


def paper_years(cat: Catalog) -> DataFrame:
    """(paper, year) dim from orders; year as BIGINT for oracle parity."""
    return cat.orders.select(
        F.col("o_orderkey").alias("paper"),
        F.year("o_orderdate").cast("long").alias("year"),
    )


def years_dim(cat: Catalog) -> DataFrame:
    """Tiny year dimension (distinct order years) — broadcast everywhere."""
    return cat.orders.select(F.year("o_orderdate").cast("long").alias("year")).distinct()


def citation_edges(cat: Catalog) -> DataFrame:
    """pr-shaped citation graph (models.scala:28): a later order of a
    customer 'cites' each earlier order of the same customer. Temporal
    direction (citing strictly after cited) makes it a DAG, like real
    citations. (citing, cited, cite_year)."""
    o1 = cat.orders.alias("o1")
    o2 = cat.orders.alias("o2")
    return (
        o1.join(
            o2,
            (F.col("o1.o_custkey") == F.col("o2.o_custkey"))
            & (F.col("o2.o_orderdate") > F.col("o1.o_orderdate")),
        )
        .select(
            F.col("o2.o_orderkey").alias("citing"),
            F.col("o1.o_orderkey").alias("cited"),
            F.year("o2.o_orderdate").cast("long").alias("cite_year"),
        )
    )


def author_country(cat: Catalog) -> DataFrame:
    """author → country code (the PySparkles country enrichment,
    /root/reference/src/notebooks/python/PySparkles.ipynb cell 41)."""
    return (
        cat.supplier.join(cat.nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_suppkey").alias("author"), F.col("n_name").alias("country"))
    )
