"""Bucketed-layout co-location: a join between two tables bucketed on
the join key must plan WITHOUT a shuffle exchange — the 100 TB answer to
repeated joins on the same key (SURVEY §4 partitioned-layout row)."""

from __future__ import annotations

from iconic_data_science_spark.catalog import Catalog
from iconic_data_science_spark.operators.skew import write_bucketed
from iconic_data_science_spark.plans import inspect


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.select("l_orderkey", "l_quantity")
    od = cat.orders.select("o_orderkey", "o_totalprice")
    try:
        write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets=8)
        write_bucketed(od.withColumnRenamed("o_orderkey", "l_orderkey"), "b_orders",
                       ["l_orderkey"], num_buckets=8)
        joined = spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey")
        n_shuffles = inspect.shuffle_count(joined)
        # co-located buckets: sort-merge join needs sorts but NO exchange
        assert n_shuffles == 0, inspect.formatted_plan(joined)
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_dedup_clusters_fixture(spark):
    from iconic_data_science_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        # two components: {1,2,3,9} (chain), {5,7}
        [(1, 2), (2, 3), (3, 9), (5, 7)],
        "id1 long, id2 long",
    )
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 7: 5}
