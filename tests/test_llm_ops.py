"""Behavioral tests for the LLM-pipeline operators (similarity, text,
multimodal) beyond the oracle parity harness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iconic_data_science_spark.catalog import Catalog
from iconic_data_science_spark.operators import multimodal
from iconic_data_science_spark.operators.similarity import brute_force_topk, lsh_topk


def test_ann_lsh_results_subset_of_bucket_and_exact_cosines(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    queries = cat.embeddings.filter(F.col("vec_id") % 50 == 0)
    bf = {(r.query_id, r.neighbor_id): r.cosine for r in brute_force_topk(cat.embeddings, queries, k=5).collect()}
    lsh = {(r.query_id, r.neighbor_id): r.cosine for r in lsh_topk(cat.embeddings, queries, k=5).collect()}
    # LSH cosines must be exact (same lattice) wherever pairs overlap
    for pair, cos in lsh.items():
        if pair in bf:
            assert cos == bf[pair]
    # each query returns at most k neighbors, ranks contiguous from 1
    from collections import Counter

    per_q = Counter(q for q, _ in lsh.items())
    assert all(v <= 5 for v in per_q.values())


def test_multimodal_features_deterministic_and_normalized(spark):
    media = multimodal.synth_media(spark, 64)
    f1 = {r.media_id: list(r.features) for r in multimodal.byte_histogram_features(media).collect()}
    f2 = {r.media_id: list(r.features) for r in multimodal.byte_histogram_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == multimodal.FEATURE_DIM for v in f1.values())
    for v in f1.values():
        assert abs(sum(v) - 1.0) < 1e-5  # L1-normalized


def test_multimodal_decode_stub_gated(spark):
    media = multimodal.synth_media(spark, 8)
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(media)  # codec libs absent -> must raise
    # fake path runs end to end
    out = multimodal.decode_media(media, require_codecs=False)
    assert out.count() == 8
    with pytest.raises(NotImplementedError):
        multimodal.frame_sample(media)


def test_multimodal_resize_stub(spark):
    media = multimodal.synth_media(spark, 12)
    with pytest.raises(NotImplementedError):
        multimodal.resize_images(media)
    out = multimodal.resize_images(media, width=8, height=8, require_codecs=False)
    rows = out.collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images
    # every payload exactly the pixel budget; dims rewritten
    assert all(len(r.payload) == 8 * 8 * 3 for r in rows)
    assert all(r.width == 8 and r.height == 8 for r in rows)
    # deterministic: same ids -> same bytes on rerun
    again = {r.media_id: r.payload for r in multimodal.resize_images(
        media, width=8, height=8, require_codecs=False).collect()}
    assert {r.media_id: r.payload for r in rows} == again


def test_media_stats_schema(spark):
    stats = multimodal.media_stats(multimodal.synth_media(spark, 32)).collect()
    kinds = {r.kind for r in stats}
    assert kinds == {"image", "audio", "video"}
    assert all(r.total_bytes > 0 for r in stats)
