#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": sf}.

Each query is forced to full execution with the noop sink (no driver
collect — measures the distributed plan, not result transfer).

The stdout line is kept under 2000 chars (2-decimal rounding, streaming
summarized to totals, flagship rows printed LAST) so the driver's tail
capture parses it whole; the full-precision record, including the
per-pipeline streaming detail, lands in BENCH_DETAIL.json next to this
file. A fixed scan+agg calibration probe is timed first and last each
session ("calibration_sec": [first, last]) so cross-round deltas can be
load-normalized against host drift.
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iconic_data_science_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

# Headline subset: flagship + one per operator family.
HEADLINE = [
    "g3_personal_net",
    "g1_coauthor_edges",
    "q1_pricing_summary",
    "w1_cumulative_papers",
    "a1_papers_per_author",
    "profile_conversion",
    "g7_ego_indicators",
    "g5_hierarchy_roots",
    "g4_bfs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_lsh_topk",
    "st_session_5m",
    "f7_json_extract",
    "asof_signup_value",
    "q5_nation_revenue",
    "dedup_clusters",
    "g_triangle_count",
    # TPC-H-shape suite representatives (multi-dim-join rollup; EXISTS +
    # NOT EXISTS at pair grain)
    "q9_product_profit",
    "q21_waiting_suppliers",
    # curation v2 (broadcast-benchmark 5-gram overlap scan)
    "decontaminate_ngram",
    # round-2 continuation additions: training-batch assembly, BPE
    # encoding, passage dedup, last-touch attribution
    "pack_sequences",
    "dedup_passage",
    "text_bpe_encode",
    "ev_attribution",
    # session-3 additions: lexical retrieval, semantic pruning, PQ-ANN,
    # deterministic corpus order, inverted-index build
    "text_bm25_topk",
    "semdedup_prune",
    "ann_pq_topk",
    "corpus_shuffle",
    "text_inverted_index",
    # incremental (batch-vs-index) dedup — the production crawl shape
    "dedup_incremental",
    # round-3 additions: engine-exact sketch, z-order layout stats,
    # content-defined chunking, label-propagation communities
    "ev_kmv_distinct",
    "lh_zorder_stats",
    "lh_hilbert_stats",
    "text_cdc_chunks",
    "g_label_propagation",
    # round-5 second-continuation additions: temperature resampling
    # (map-side keep rule), fixed-dim feature hashing (the corpus
    # explode/regroup), in-doc window dedup (pure in-row HOFs), and the
    # crawl->links->PageRank composition (iterative, checkpointed)
    "mix_temperature_sample",
    "text_hashed_tfidf",
    "text_intra_dedup",
    "web_pagerank",
    # round-6 additions: the integer k-means twin (map-side argmin over
    # literal centroids), the gate operating-curve sweep (one in-row
    # scoring pass), and the targeted-salt flagship (hot-set detection
    # riding plain G3). The trainer and the banding audit are excluded
    # by design: one is epoch-latency-bound, the other a sample-scale
    # Σdf² audit — neither measures a plan.
    "ann_ivf_kmeans_int",
    "text_classifier_eval",
    "g3_personal_net_salted",
    # round-7 continuation additions: C4 line cleaning (pure map over
    # synthesized pages), DSIR importance selection (bounded histogram
    # -> literal weights -> in-row scoring + TakeOrdered), and their
    # composition. dedup_keep_best is excluded: its cost IS the jaccard
    # pair generation already measured by dedup_ngram_jaccard.
    "text_c4_line_filter",
    "mix_dsir_select",
    "curation_pipeline_v8",
    # round-8 additions: JL projection composed under the hyperplane
    # candidate generator (the scale form whose brute twin ann_rp_topk
    # measured 96 s at sf1 — this one must stay ~linear), and the
    # bigram-LM perplexity scorer (one corpus-grain aggregate + probe
    # join). The pruned-LM gate is excluded: a zero-exchange map over
    # the same scan that c4/dsir already measure.
    "ann_rp_lsh_topk",
    "text_bigram_surprisal",
    # round-8 continuation: late-interaction rerank (token-bucket
    # candidates + in-row MaxSim — the brute twin is a truth baseline)
    # and the CCNet tercile assignment (bounded histogram CDF +
    # broadcast thresholds). ann_maxsim_topk and web_url_gate excluded:
    # one is the quadratic anchor, the other a zero-exchange map.
    "ann_maxsim_rerank",
    "text_ppl_buckets",
    # integer HITS (two shuffles x 5 rounds + 1-row normalizers — the
    # hubs/authorities companion to web_pagerank) and hypertable
    # gap-fill (one events-grain exchange, fills on the bounded spine)
    "web_hits",
    "ts_gap_fill",
    # WordPiece batch twin is the headline (fold per DISTINCT word +
    # join-back — the 100 TB backfill shape); the zero-exchange map
    # form (text_wordpiece_encode) stays the documented streaming
    # ingest gate, row-identical and ~1.9x slower per corpus scan
    "text_wordpiece_batch",
    # the composed crawl-to-corpus front end (URL dedup -> C4 -> LM
    # gate): measures the three learned stages end to end
    "curation_pipeline_v10",
    # round 9: Unigram-LM batch twin is the headline (Viterbi DP per
    # DISTINCT word + join-back, the wordpiece_batch pattern; the map
    # form text_unigram_encode stays the streaming gate), and DPO pair
    # assembly (the one prompt-grain min/max-struct exchange).
    # text_fim excluded: a zero-exchange map over the same scan
    # c4/chat_render measure.
    "text_unigram_batch",
    "dpo_pairs",
    # round-9 continuation: the quantized-embedding serving pair (SQ8
    # asymmetric ADC behind hyperplane buckets; the BQ band-pigeonhole
    # + Hamming + rescore funnel) and pass@k estimation (one
    # task-grain aggregate + factorial folds). ann_sq8_codes and
    # eval_em_f1 excluded: zero-exchange maps over scans the family
    # already measures; rl_group_advantage excluded: one window over
    # the dpo_pairs synth already timed.
    "ann_sq8_topk",
    "ann_bq_topk",
    "eval_pass_at_k",
]


# Streaming micro-bench (VERDICT r3 item 7): the four batch-twin
# Structured Streaming pipelines, drained over the sf events/documents
# files with trigger(availableNow) into the noop sink — wall time +
# input rows/sec, so streaming throughput regressions are visible
# round to round, not just stream==batch correctness.
def _streaming_bench(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from iconic_data_science_spark.session import ensure_engine_conf

    ensure_engine_conf(spark)  # reset any query's compute-dense AQE floor

    from iconic_data_science_spark.catalog import Catalog
    from iconic_data_science_spark.streaming import documents as sdoc
    from iconic_data_science_spark.streaming import events as sev

    n_events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    n_docs_new = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .filter(F.col("doc_id") % 2 == 1)
        .count()
    )

    def rollup():
        return sev.tumbling_counts(sev.read_event_stream(spark, sf_dir)), "complete", n_events

    def session():
        return sev.session_windows(sev.read_event_stream(spark, sf_dir)), "complete", n_events

    def funnel():
        return sev.funnel_stage_state(sev.read_event_stream(spark, sf_dir)), "update", n_events

    # Doc-dedup measures PROBE throughput against a standing index (r6
    # verdict item 4): the index is built once per bench session (the
    # production shape — a persisted table the crawl loop maintains via
    # minhash_index_upsert/write_snapshot), and the stream input is the
    # documents file replicated DOC_REPLICAS× into a temp dir so probe
    # work dominates the fixed availableNow micro-batch overhead (~1 s)
    # instead of drowning in it at 2.5k rows.
    DOC_REPLICAS = 8
    from iconic_data_science_spark.operators.dedup import minhash_index_build

    _corpus = Catalog(spark, sf_dir).documents.filter(F.col("doc_id") % 2 == 0)
    _doc_index = minhash_index_build(
        _corpus, n=3, num_perm=16, rows_per_band=4
    ).localCheckpoint()

    def _replicated_docs_dir() -> str:
        import shutil
        import tempfile

        src = os.path.join(sf_dir, "documents.parquet")
        base = os.path.join(
            tempfile.gettempdir(),
            f"ids_bench_docs_x{DOC_REPLICAS}_{os.path.basename(os.path.normpath(sf_dir))}",
        )
        os.makedirs(base, exist_ok=True)
        for i in range(DOC_REPLICAS):
            dst = os.path.join(base, f"documents_{i}.parquet")
            if not os.path.exists(dst) or os.path.getmtime(dst) < os.path.getmtime(src):
                shutil.copyfile(src, dst)
        return base

    def doc_dedup():
        rep_dir = _replicated_docs_dir()
        schema = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).schema
        stream_new = (
            spark.readStream.format("parquet")
            .schema(schema)
            .load(rep_dir)
            .filter(F.col("doc_id") % 2 == 1)
        )
        return (
            sdoc.stream_dedup_against_index(
                stream_new,
                index=_doc_index,
                n=3,
                num_perm=16,
                rows_per_band=4,
                threshold=0.5,
            ),
            "append",
            n_docs_new * DOC_REPLICAS,
        )

    def ingest_gate():
        from iconic_data_science_spark.operators.dedup import bloom_decontaminate_inrow

        docs = Catalog(spark, sf_dir).documents
        bench = docs.filter(F.col("doc_id") % 10 == 0)
        stream_train = sdoc.read_document_stream(spark, sf_dir).filter(
            F.col("doc_id") % 10 != 0
        )
        n_train = docs.filter(F.col("doc_id") % 10 != 0).count()
        return bloom_decontaminate_inrow(stream_train, bench, n=5), "append", n_train

    def classifier_gate():
        from iconic_data_science_spark.operators.featurize import linear_classifier_gate
        from iconic_data_science_spark.streaming import documents as sdoc2

        n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
        weights = [((f * 2654435761) % 2001) - 1000 for f in range(256)]
        return (
            linear_classifier_gate(
                sdoc2.read_document_stream(spark, sf_dir), weights, bias_micro=0
            ),
            "append",
            n_docs,
        )

    def quality_gate():
        from iconic_data_science_spark.operators.text import (
            quality_gate_against_cutoff,
        )

        docs = Catalog(spark, sf_dir).documents
        n_docs = docs.count()
        return (
            quality_gate_against_cutoff(
                sdoc.read_document_stream(spark, sf_dir), docs, min_decile=5
            ),
            "append",
            n_docs,
        )

    pipelines = {
        "st_run_rollup": rollup,
        "st_run_session": session,
        "st_run_funnel": funnel,
        "st_run_doc_dedup": doc_dedup,
        "st_run_ingest_gate": ingest_gate,
        "st_run_classifier": classifier_gate,
        "st_run_quality_gate": quality_gate,
    }
    def _drain(df, mode) -> float:
        t0 = time.perf_counter()
        q = (
            df.writeStream.outputMode(mode)
            .format("noop")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return time.perf_counter() - t0

    # Same warm discipline as the batch queries (one untimed run so the
    # sample measures steady state, not codegen/JVM warm-up), honored
    # by the same flag.
    warm = os.environ.get("SPARK_GRAFT_BENCH_WARM", "1") != "0"
    out: dict[str, dict] = {}
    for name, build in pipelines.items():
        if warm:
            df, mode, _ = build()
            _drain(df, mode)
        df, mode, rows = build()
        sec = _drain(df, mode)
        out[name] = {
            "sec": round(sec, 3),
            "input_rows": rows,
            "rows_per_sec": round(rows / sec, 1),
        }
    return out


# The five rows VERDICT r9 found missing from every BENCH_r* artifact:
# the driver keeps only the LAST 2000 stdout chars, so whatever prints
# first falls off. These print last so the official record always
# carries the flagship.
FLAGSHIP_LAST = [
    "g5_hierarchy_roots",
    "g7_ego_indicators",
    "profile_conversion",
    "q1_pricing_summary",
    "g3_personal_net",
]


def _calibration(spark, sf_dir: str) -> float:
    """Fixed synthetic load probe (VERDICT r9 item 4): one scan+agg over
    lineitem into the noop sink, identical every round — its wall time
    moves with host load, not with any plan change, so cross-round
    per-query deltas can be read against the calibration ratio instead
    of a worktree bisect. Timed FIRST and LAST in every session."""
    from pyspark.sql import functions as F

    from iconic_data_science_spark.session import ensure_engine_conf

    ensure_engine_conf(spark)  # reset any query's compute-dense AQE floor

    t0 = time.perf_counter()
    (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="ids-spark-bench")

    all_queries = entrymod.queries()
    names = [n for n in HEADLINE if n in all_queries]
    # perf-iteration convenience: SPARK_GRAFT_BENCH_QUERIES=g4_bfs,g3_personal_net
    # times just those (any catalog query, not only the headline set)
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip() in all_queries]

    # Bucketed base-table layout (default on; SPARK_GRAFT_BUCKETED=0 to
    # compare): paa + paper-year dim bucketed by paper, so the pairing
    # self-joins in the g-family plan without exchanges. The one-time
    # write happens before timing — the ingest-time cost a production
    # deployment pays once, not per query.
    if os.environ.get("SPARK_GRAFT_BUCKETED", "1") != "0":
        os.environ["SPARK_GRAFT_BUCKETED"] = "1"
        from iconic_data_science_spark.catalog import Catalog
        from iconic_data_science_spark import magmap

        magmap.prepare_bucketed_tables(Catalog(spark, sf_dir))

    # Warmup: one throwaway action so JVM/codegen startup isn't billed to
    # the first timed query (we measure query execution, not JVM boot).
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).write.mode(
        "overwrite"
    ).format("noop").save()

    _calibration(spark, sf_dir)  # untimed codegen warm for the probe shape
    cal_first = _calibration(spark, sf_dir)

    # Median of N runs per query: this host shows 2-3x run-to-run noise
    # on short iterative queries (noisy-neighbor VM), and a single sample
    # would grade the noise, not the plan.
    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))
    # Warm-cache mode (default on; SPARK_GRAFT_BENCH_WARM=0 for the old
    # behavior): one untimed run per query before the timed iterations,
    # so every sample measures the same steady state (OS page cache +
    # codegen warm) and cross-round deltas are attributable to plan
    # changes rather than which iteration happened to be cold.
    warm = os.environ.get("SPARK_GRAFT_BENCH_WARM", "1") != "0"
    timings: dict[str, float] = {}
    for name in names:
        if warm:
            all_queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            df = all_queries[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        # Between-queries hygiene, OUTSIDE every timed region: drop the
        # last query's python-side frame references and collect, so the
        # JVM blocks behind earlier queries' localCheckpoints are
        # eligible for py4j/ContextCleaner release before the next query
        # is timed, instead of piling up across a 59-query session.
        # Standard interference reduction; the timed work is unchanged.
        df = None
        gc.collect()

    # Streaming rows ride along unless a query subset was requested or
    # SPARK_GRAFT_BENCH_STREAMING=0.
    streaming: dict = {}
    if not only and os.environ.get("SPARK_GRAFT_BENCH_STREAMING", "1") != "0":
        streaming = _streaming_bench(spark, sf_dir)

    cal_last = _calibration(spark, sf_dir)

    total = round(sum(timings.values()), 3)

    # Full-precision record (3 decimals, per-pipeline streaming detail)
    # goes to a side file; stdout gets ONE compact line that fits the
    # driver's 2000-char tail capture (VERDICT r9 item 3: the old long
    # line lost its head — including every flagship row — every round).
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "iters_per_query": iters,
        "warm": warm,
        "calibration_sec": [cal_first, cal_last],
        "wall_clock": round(time.time(), 1),
    }
    if streaming:
        detail["streaming"] = streaming
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        detail_path = None  # read-only checkout: the stdout line stands alone

    ordered = [n for n in names if n not in FLAGSHIP_LAST] + [
        n for n in FLAGSHIP_LAST if n in names
    ]
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "iters": iters,
        "warm": warm,
        "calibration_sec": [cal_first, cal_last],
        "trimmed": 0,
        "queries": {n: round(timings[n], 2) for n in ordered},
    }
    if streaming:
        st_sec = sum(v["sec"] for v in streaming.values())
        st_rows = sum(v["input_rows"] for v in streaming.values())
        payload["st_sec"] = round(st_sec, 2)
        payload["st_rows_per_sec"] = round(st_rows / st_sec, 1) if st_sec else None
    if detail_path:
        payload["detail"] = os.path.basename(detail_path)

    # Hard budget: the line must survive the tail capture intact so the
    # driver's `parsed` field is the real dict, not null. If the catalog
    # ever grows the headline set past the budget, trim from the HEAD
    # (the same rows raw truncation would eat — but parseably, counted).
    line = json.dumps(payload, separators=(",", ":"))
    while len(line) > 1990 and payload["queries"]:
        dropped = next(iter(payload["queries"]))
        del payload["queries"][dropped]
        payload["trimmed"] += 1
        line = json.dumps(payload, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
