"""SQL front end: registered views + spark.sql produce the same results
as the DataFrame DSL (one Catalyst IR under both, SURVEY.md §3)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from iconic_data_science_spark.catalog import Catalog


def test_sql_and_dsl_share_results(spark, sf_dir):
    Catalog(spark, sf_dir).register_views()
    via_sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS count_order,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    via_dsl = entrymod.queries()["q1_pricing_summary"](spark, sf_dir).select(
        "l_returnflag", "l_linestatus", "count_order", "sum_qty"
    )
    a = {tuple(r) for r in via_sql.collect()}
    b = {tuple(r) for r in via_dsl.collect()}
    assert a == b


def test_sql_over_coauthor_views(spark, sf_dir):
    """A reference user's ad-hoc SQL works against the registered views."""
    Catalog(spark, sf_dir).register_views()
    out = spark.sql(
        """
        WITH paa AS (SELECT DISTINCT l_orderkey AS paper, l_suppkey AS author FROM lineitem)
        SELECT a.author AS ego, COUNT(DISTINCT b.author) AS n_coauthors
        FROM paa a JOIN paa b ON a.paper = b.paper AND a.author <> b.author
        GROUP BY a.author
        """
    )
    dsl = entrymod.queries()["g7_ego_indicators"](spark, sf_dir).select("ego", "n_coauthors")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in dsl.collect()}
