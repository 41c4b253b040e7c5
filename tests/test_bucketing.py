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


def test_ngram_jaccard_hashed_equals_string_shingles(spark):
    """The hashed-shingle default must produce the same pair set and
    jaccard values as a string-shingle reference run (collision-free on
    the fixture, so the two key types are equivalent)."""
    from pyspark.sql import functions as F
    from iconic_data_science_spark.operators.dedup import (
        _pair_jaccard,
        ngram_jaccard_pairs,
        shingle_table,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "a completely different sentence with no overlap at all"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    key = lambda df: {
        (r.id1, r.id2): round(r.jaccard, 9) for r in df.collect()
    }
    string_ref = _pair_jaccard(shingle_table(docs, n=3)).filter(F.col("jaccard") >= 0.3)
    assert key(ngram_jaccard_pairs(docs, threshold=0.3)) == key(string_ref)


def test_dedup_clusters_local_equals_distributed(spark):
    """Union-find fast path vs min-label fixpoint (local_solve_rows=0
    forces the distributed loop): identical labels, including on a
    star, a long chain, and merged components."""
    from iconic_data_science_spark.operators.dedup import dedup_clusters

    edges = (
        [(0, i) for i in range(1, 8)]              # star at 0
        + [(100 + i, 101 + i) for i in range(20)]  # chain
        + [(7, 100)]                               # merge star into chain
        + [(500, 501), (502, 501)]                 # separate triple
    )
    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    local = {(r.doc_id, r.cluster_id) for r in dedup_clusters(pairs).collect()}
    dist = {
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters(pairs, local_solve_rows=0).collect()
    }
    assert local == dist


def test_bucketed_paa_layout_same_results_fewer_shuffles(spark, sf_dir, monkeypatch):
    """The bench's bucketed fast path (magmap.prepare_bucketed_tables +
    SPARK_GRAFT_BUCKETED=1) must return byte-identical g1 results while
    removing pairing-join exchanges from the plan."""
    from iconic_data_science_spark import magmap
    from iconic_data_science_spark.operators.coauthor import coauthor_edges

    cat = Catalog(spark, sf_dir)
    monkeypatch.delenv("SPARK_GRAFT_BUCKETED", raising=False)
    plain_df = coauthor_edges(magmap.paa(cat), magmap.paper_years(cat))
    plain = {(r.ego, r.alter_id): (r.papers_together, r.first_year) for r in plain_df.collect()}
    plain_shuffles = inspect.shuffle_count(plain_df)
    try:
        magmap.prepare_bucketed_tables(cat)
        monkeypatch.setenv("SPARK_GRAFT_BUCKETED", "1")
        b_df = coauthor_edges(magmap.paa(cat), magmap.paper_years(cat))
        bucketed = {(r.ego, r.alter_id): (r.papers_together, r.first_year) for r in b_df.collect()}
        assert bucketed == plain
        b_shuffles = inspect.shuffle_count(b_df)
        assert b_shuffles < plain_shuffles, (b_shuffles, plain_shuffles)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {magmap.BUCKETED_PAA}")
        spark.sql(f"DROP TABLE IF EXISTS {magmap.BUCKETED_PY}")


def test_minhash_band_sigs_array_native_equals_postings_path(spark):
    """The map-side band-signature fast path must emit exactly the same
    (doc_id, band, band_sig) rows as the posting-list groupBy path."""
    from iconic_data_science_spark.operators.dedup import (
        hashed_shingle_arrays,
        hashed_shingle_table,
        minhash_band_sigs_from_arrays,
        minhash_signatures,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "a completely different sentence with no overlap at all"),
            (4, "short doc"),  # < n tokens -> no shingles -> no signature
        ],
        "doc_id long, text string",
    )
    fast = {
        (r.doc_id, r.band, r.band_sig)
        for r in minhash_band_sigs_from_arrays(hashed_shingle_arrays(docs)).collect()
    }
    sigs = minhash_signatures(hashed_shingle_table(docs))
    banded = sigs.withColumn("band", (F.col("i") / 4).cast("int"))
    slow = {
        (r.doc_id, r.band, r.band_sig)
        for r in banded.groupBy("doc_id", "band")
        .agg(F.collect_list(F.struct("i", "minhash")).alias("_p"))
        .select(
            "doc_id", "band",
            F.array_join(F.transform(F.array_sort("_p"), lambda x: x["minhash"].cast("string")), "-").alias("band_sig"),
        )
        .collect()
    }
    assert fast == slow
    assert not any(d == 4 for d, _, _ in fast)  # shingle-less doc excluded
