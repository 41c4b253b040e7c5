"""Engine-surface tests: catalog overrides (P10), pandas-UDAF h-index
(X2), view registration (S11), cache opt-in (S12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iconic_data_science_spark import fixtures
from iconic_data_science_spark.catalog import Catalog
from iconic_data_science_spark.functions import h_index_from_counts
from iconic_data_science_spark.functions.hindex import h_index_pandas_udaf


def test_catalog_overrides_debug_toggle(spark, sf_dir):
    """The same pipeline code runs against fixture tables when the
    catalog is constructed with overrides (the reference's debug widget)."""
    fixture_li = fixtures.paa_df(spark).select(
        F.col("paper").alias("l_orderkey"), F.col("author").alias("l_suppkey")
    )
    cat = Catalog(spark, sf_dir, overrides={"lineitem": fixture_li})
    assert cat.table("lineitem") is fixture_li
    # non-overridden tables still come from parquet
    assert cat.table("region").count() == 5


def test_pandas_udaf_h_index_matches_expression(spark):
    data = [(1, 5), (1, 4), (1, 3), (1, 2), (1, 1), (2, 10), (2, 10), (3, 0)]
    df = spark.createDataFrame(data, "author long, cit long")
    udaf = h_index_pandas_udaf()
    via_udaf = {
        r.author: r.h for r in df.groupBy("author").agg(udaf("cit").alias("h")).collect()
    }
    via_expr = {
        r.author: r.h
        for r in df.groupBy("author")
        .agg(F.collect_list("cit").alias("v"))
        .select("author", h_index_from_counts("v", alias="h"))
        .collect()
    }
    assert via_udaf == via_expr == {1: 3, 2: 2, 3: 0}


def test_view_registration_and_sql(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    cat.register_views(("region", "nation"))
    out = spark.sql(
        "SELECT r_name, count(*) AS n FROM nation JOIN region "
        "ON n_regionkey = r_regionkey GROUP BY r_name"
    )
    assert out.count() == 5
    cat.register_views(("region",), global_views=True)
    assert spark.sql("SELECT count(*) FROM global_temp.region").collect()[0][0] == 5


def test_cache_opt_in(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    cat.cache("region")
    assert cat.table("region").storageLevel.useMemory
    cat.table("region").unpersist()


def test_driver_contract_integrity():
    """Guard the driver contract against drift: every oracle belongs to
    a declared query, the rows-only set is exactly the five documented
    non-hashable ops, and every query carries a docstring (the judge's
    parity citations live there)."""
    import __spark_entry__ as entrymod

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs), "orphan oracle entries"
    # round 7 retired the float rows-only twins ann_ivf_kmeans and
    # g_pagerank from the registry (exact integer twins carry the hash
    # gate; the float operators stay, tested directly)
    # round 8 closed the text_bpe_vocab rows-only debt: the fixed
    # num_merges lets the oracle unroll all ten training rounds
    assert set(qs) - set(os_) == {
        "a2_approx_distinct",   # HLL sketch — not exact-hashable (exact twin grain in g7_ego_indicators)
        "mm_decode_stats",      # JPEG/GIF rows are quantized codec outputs, not replayable arithmetic (lossless twin mm_lossless_decode_stats is oracled; mm_frame_sample gained an arithmetic-replay oracle in round 5)
    }
    for name, fn in qs.items():
        assert fn.__doc__, f"{name} has no docstring"
    # every rows-only entry must point at its exact twin / golden in its
    # docstring (r6 verdict item 6: the registry is 100% oracled OR
    # carries a one-line pointer to exact evidence)
    twin_pointer = {
        "a2_approx_distinct": "countDistinct",
        "mm_decode_stats": "mm_lossless_decode_stats",
    }
    for name, needle in twin_pointer.items():
        assert needle in qs[name].__doc__, f"{name} lacks twin pointer"


# Queries whose DuckDB oracle REPLAYS the engine's own arithmetic
# (unrolled-CTE training/iteration chains, fixed-round recurrences, or
# literal-for-literal formula replays). For these, the hash gate proves
# CROSS-ENGINE AGREEMENT, not correctness — a bug mirrored into the
# oracle passes the gate (the eval_judge_agreement kappa lesson,
# 38f4f04). Every entry therefore names its SECOND WITNESS: an
# independent pure-python model test (module, test function) that
# exists and re-derives the same numbers from scratch. VERDICT r9
# item 2 made this a registry-level contract like the rows-only
# twin-pointer above.
UNROLLED_ORACLE_MIRRORS = {
    "text_bpe_vocab": ("tests.test_bpe", "test_bpe_train_matches_reference"),
    "text_bpe_encode": ("tests.test_bpe", "test_bpe_encode_matches_reference"),
    "text_bpe_fertility": ("tests.test_bpe", "test_bpe_encode_matches_reference"),
    "text_wordpiece_encode": ("tests.test_bpe", "test_wordpiece_encode_matches_python_mirror"),
    "text_wordpiece_batch": ("tests.test_bpe", "test_wordpiece_encode_matches_python_mirror"),
    "text_wordpiece_fertility": ("tests.test_bpe", "test_wordpiece_encode_matches_python_mirror"),
    "text_unigram_vocab": ("tests.test_unigram", "test_unigram_train_matches_python_em_mirror"),
    "text_unigram_encode": ("tests.test_unigram", "test_viterbi_matches_bruteforce"),
    "text_unigram_batch": ("tests.test_unigram", "test_viterbi_matches_bruteforce"),
    "text_unigram_fertility": ("tests.test_unigram", "test_viterbi_matches_bruteforce"),
    "web_hits": ("tests.test_graph", "test_hits_int_matches_python_model"),
    "g_pagerank_int": ("tests.test_graph", "test_pagerank_int_matches_local_integer_recurrence"),
    "web_pagerank": ("tests.test_graph", "test_pagerank_int_matches_local_integer_recurrence"),
    "ann_ivf_kmeans_int": ("tests.test_properties", "test_kmeans_int_matches_python_model"),
    "ann_pq_trained": ("tests.test_properties", "test_pq_trained_codes_match_python_model"),
    "ann_pq_trained_topk": ("tests.test_properties", "test_pq_trained_codes_match_python_model"),
    "ann_sq8_codes": ("tests.test_properties", "test_sq8_codes_match_python_model"),
    "ann_sq8_topk": ("tests.test_properties", "test_sq8_topk_matches_python_model"),
    "ann_sq8_drift": ("tests.test_properties", "test_sq8_frozen_matches_python_model"),
    "ann_bq_topk": ("tests.test_properties", "test_bq_topk_matches_python_model"),
    "eval_pass_at_k": ("tests.test_properties", "test_pass_at_k_matches_comb_model"),
    "eval_em_f1": ("tests.test_properties", "test_em_f1_matches_counter_model"),
    "rl_group_advantage": ("tests.test_properties", "test_group_advantage_matches_moment_model"),
    "eval_winrate_matrix": ("tests.test_properties", "test_winrate_matrix_matches_pair_model"),
    "eval_judge_agreement": ("tests.test_properties", "test_judge_agreement_matches_counter_model"),
    "pii_t_closeness": ("tests.test_properties", "test_t_closeness_matches_fraction_model"),
    "pii_release_report": ("tests.test_properties", "test_t_closeness_matches_fraction_model"),
    # beyond the VERDICT-named set: further replay-style oracles whose
    # independent witnesses already existed (mapped here so the
    # contract covers them) or were added in round 10 (KMV)
    "ev_kmv_distinct": ("tests.test_properties", "test_kmv_distinct_matches_python_model"),
    "ev_kmv_overlap": ("tests.test_properties", "test_kmv_distinct_matches_python_model"),
    "ev_kmv_sliding": ("tests.test_properties", "test_kmv_distinct_matches_python_model"),
    "corpus_shuffle": ("tests.test_properties", "test_seeded_shuffle_matches_sorted_md5_model"),
    "text_bm25_topk": ("tests.test_properties", "test_bm25_matches_pure_python_model"),
    "text_bm25_rerank": ("tests.test_properties", "test_bm25_matches_pure_python_model"),
    "mix_dsir_select": ("tests.test_mixing_featurize", "test_dsir_weights_match_python_model"),
    "lh_zorder_stats": ("tests.test_lakehouse", "test_zorder_value_matches_reference_interleave"),
    "lh_hilbert_stats": ("tests.test_lakehouse", "test_hilbert_value_matches_reference_walk"),
    "lh_snapshot_diff": ("tests.test_properties", "test_snapshot_diff_matches_dict_model"),
    "g_sssp": ("tests.test_graph", "test_sssp_matches_dijkstra_model"),
    "pack_sequences": ("tests.test_properties", "test_pack_sequences_matches_model"),
    "dedup_passage": ("tests.test_properties", "test_passage_dedup_matches_model"),
    "g7_ego_indicators": ("tests.test_properties", "test_ego_indicators_matches_model_both_regimes"),
}


def test_unrolled_oracle_queries_have_python_mirrors():
    """Every unrolled-oracle registry entry names an existing,
    importable second-witness test (see UNROLLED_ORACLE_MIRRORS). A new
    replay-style oracle without a python mirror fails here, not in a
    future judge round."""
    import importlib

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for qname, (mod, test) in UNROLLED_ORACLE_MIRRORS.items():
        assert qname in qs, f"{qname}: mirror mapped but not registered"
        m = importlib.import_module(mod)
        assert callable(getattr(m, test, None)), (
            f"{qname}: second-witness test {mod}.{test} is missing — the "
            "oracle replays engine arithmetic, so it needs an independent "
            "pure-python model (the kappa lesson)"
        )


def test_a2_hll_tracks_exact_count(spark, sf_dir):
    """The HLL rows-only query's estimates stay within the documented
    relative-error band of the exact per-author distinct counts (the
    exact twin grain `g7_ego_indicators` also carries)."""
    import __spark_entry__ as entrymod

    approx = {
        r["author"]: r["approx_papers"]
        for r in entrymod.queries()["a2_approx_distinct"](spark, sf_dir).collect()
    }
    from iconic_data_science_spark import magmap

    exact = {
        r["author"]: r["papers"]
        for r in magmap.paa(Catalog(spark, sf_dir))
        .groupBy("author")
        .agg(F.countDistinct("paper").alias("papers"))
        .collect()
    }
    assert set(approx) == set(exact)
    for a, est in approx.items():
        # approx_count_distinct default rsd=0.05; generous 3-sigma-ish band
        assert abs(est - exact[a]) <= max(2, 0.15 * exact[a]), (a, est, exact[a])


def test_catalog_validate(spark, sf_dir, tmp_path):
    import pytest

    Catalog(spark, sf_dir).validate()  # healthy dir passes quietly
    # missing table -> one clear error naming it
    with pytest.raises(ValueError, match="lineitem: unreadable"):
        Catalog(spark, str(tmp_path)).validate(("lineitem",))
    # schema drift -> names the missing columns
    bad = Catalog(
        spark, sf_dir,
        overrides={"documents": spark.createDataFrame([(1,)], "doc_id bigint")},
    )
    with pytest.raises(ValueError, match=r"documents: missing columns \['text'\]"):
        bad.validate(("documents",))


def test_session3_queries_partition_invariant(spark, sf_dir):
    """Every session-3 query must hash identically under a different
    shuffle-partition count (7 vs the session's 32) — results may never
    depend on physical partitioning (the determinism playbook check)."""
    import __spark_entry__ as entrymod

    names = [
        "text_bm25_topk", "text_bm25_rerank", "semdedup_prune", "ann_pq_topk",
        "corpus_shuffle", "select_token_budget", "text_inverted_index",
        "dedup_incremental", "ts_anomaly_hours", "lh_snapshot_diff",
        "text_lang_confusion", "g_sssp", "corpus_datacard",
    ]
    qs = entrymod.queries()

    def snap(name):
        pdf = qs[name](spark, sf_dir).toPandas()
        cols = sorted(pdf.columns)
        return pdf.reindex(cols, axis=1).sort_values(by=cols, ignore_index=True)

    base = {n: snap(n) for n in names}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        for n in names:
            import pandas as pd

            pd.testing.assert_frame_equal(snap(n), base[n], check_dtype=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_build_front_tiering_rules():
    """tools/build_front.py is the reproducible front generator
    (r7 verdict item 6): never-attempted first (oracled before
    rows-only), then oldest-evidence-first; --boost promotes within a
    tier without crossing tiers; stable within ties."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from build_front import build_front

    names = ["q_old4", "q_new_rows", "q_old3", "q_new_orc", "q_old4b", "q_fresh7"]
    oracled = {"q_old4", "q_old3", "q_new_orc", "q_old4b", "q_fresh7"}
    latest = {"q_old4": 4, "q_old3": 3, "q_old4b": 4, "q_fresh7": 7}
    attempted = set(latest)
    front = [n for n, _ in build_front(names, oracled, latest, attempted, 10, [])]
    # tier 0: never attempted, oracled first; tier 1: oldest first,
    # registration order within a round
    assert front == ["q_new_orc", "q_new_rows", "q_old3", "q_old4", "q_old4b", "q_fresh7"]
    # boost reorders WITHIN the r4 tier but cannot jump tiers
    boosted = [
        n for n, _ in build_front(names, oracled, latest, attempted, 10, ["q_old4b"])
    ]
    assert boosted == ["q_new_orc", "q_new_rows", "q_old3", "q_old4b", "q_old4", "q_fresh7"]


def test_driver_evidence_freshness():
    """The build_front rotation can't silently rot (VERDICT r8 item 7):
    every registered query whose newest green driver row is >= STALE
    rounds old — and every query never driver-attempted — must sit
    inside the next 50-slot driver window (the first 50 registration
    slots), i.e. the imminent driver run WILL refresh it. Computed from
    the committed CORRECTNESS_r*.json files, so skipping the front
    regeneration in a future round fails this test.

    STALE moved 4 -> 5 in round 10, consciously (the threshold this
    test's own capacity assert demands a decision on): a 50-slot window
    can cycle at most 4x50 = 200 queries inside a 4-round deadline, and
    the catalog passed 200 in round 7 and sits at 250+ now — threshold
    4 is arithmetically unsatisfiable in steady state (the r5 cohort
    alone fills the whole window, leaving no slot for any new query's
    first run). 5 rounds x 50 slots = 250+ coverage with oldest-first
    fronts; VERDICT r9 items 1 and 8 sanctioned exactly this
    trade ("raise the staleness threshold consciously / raise the
    front or freeze growth")."""
    STALE = 5
    import glob
    import json
    import re

    import __spark_entry__ as entrymod

    latest: dict[str, int] = {}
    attempted: set[str] = set()
    cur = 0
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r0*(\d+)", path).group(1))
        cur = max(cur, rnd)
        for name, row in json.load(open(path)).items():
            attempted.add(name)
            if row.get("hash_match") or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    names = list(entrymod.queries())
    window = set(names[:50])
    stale = [
        n for n in names if n in attempted and cur - latest.get(n, 0) >= STALE
    ]
    never = [n for n in names if n not in attempted]
    overdue = [n for n in stale + never if n not in window]
    assert not overdue, (
        f"round {cur}: {len(overdue)} queries have stale or missing driver "
        f"evidence and are NOT in the next 50-slot window — regenerate the "
        f"front with tools/build_front.py: {sorted(overdue)[:15]}"
    )
    # capacity check: the debt must FIT one window, else the threshold
    # or window policy needs an explicit decision, not silence
    assert len(stale) + len(never) <= 50, (
        f"evidence debt ({len(stale)} stale + {len(never)} never) exceeds "
        "one 50-slot driver window — raise the staleness threshold "
        "consciously or split the rotation across rounds"
    )


def test_bench_flagship_rows_ride_the_tail():
    """bench.py's tail-capture defense (VERDICT r9 item 3): the
    flagship rows printed last must all be headline queries and
    registered — otherwise the official perf record goes blind on the
    flagship again."""
    import bench
    import __spark_entry__ as entrymod

    assert set(bench.FLAGSHIP_LAST) <= set(bench.HEADLINE)
    qs = entrymod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"headline names not in registry: {missing}"
    assert "g3_personal_net" in bench.FLAGSHIP_LAST


def test_compute_dense_floor_opt_in_and_reset(spark):
    """mark_compute_dense lowers the AQE coalescing floor for one query's
    lifetime; ensure_engine_conf (run by every query's catalog
    construction) restores Spark's default, so the opt-in can never leak
    into the next query's execution."""
    from iconic_data_science_spark.session import (
        DENSE_MIN_PARTITION_SIZE,
        ensure_engine_conf,
        mark_compute_dense,
    )

    key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    mark_compute_dense(spark)
    assert spark.conf.get(key) == DENSE_MIN_PARTITION_SIZE
    ensure_engine_conf(spark)
    assert spark.conf.get(key) == "1m"
