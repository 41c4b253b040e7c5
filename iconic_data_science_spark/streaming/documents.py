"""Streaming document curation: continuous-crawl dedup against a
persisted MinHash index.

The streaming twin of ``operators/dedup.minhash_lsh_incremental`` — the
shape a production crawl runs: the corpus-side band signatures and
shingle sets are a static (persisted, periodically-compacted) index;
each micro-batch of incoming documents computes its signatures
*map-side* (no explode, no shuffle — `minhash_band_sigs_from_arrays`),
stream-static joins the index on (band, band_sig) for candidates, and
verifies with an exact set-Jaccard computed per row from the two
shingle arrays (``array_intersect`` — both arrays are distinct sets).
No streaming aggregation anywhere except the final candidate
de-duplication, so the pipeline is watermark-free append mode.

Stream-equals-batch is the correctness contract
(tests/test_streaming.py::test_stream_dedup_equals_incremental_batch):
the streamed result must equal ``minhash_lsh_incremental`` on the same
split, jaccard values bit-for-bit (array_intersect size == the
explode-join intersection count on distinct sets).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import hashed_shingle_arrays, minhash_band_sigs_from_arrays


def read_document_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (tests/demos; a
    production crawl points the same pipeline at Kafka or autoloader)."""
    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def stream_dedup_against_index(
    new_docs_stream: DataFrame,
    corpus: DataFrame,
    n: int = 3,
    num_perm: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """(corpus_id, new_id, jaccard) append stream — incoming documents
    that near-duplicate the existing corpus.

    ``corpus`` is static: its shingle arrays + band signatures are
    computed once here (in production: read from the persisted index
    table that ``write_snapshot`` maintains). The stream side is
    entirely map-side until the stream-static candidate join; the
    verify touches only candidate rows and is a per-row array
    expression, so state is bounded to the candidate-pair
    ``dropDuplicates`` set (no watermark needed for a finite backfill;
    a production deployment bounds it by keying state on a crawl-batch
    column).
    """
    # The WHOLE corpus index materializes at build time — band sigs and
    # shingle arrays, not just the intermediate ca: every micro-batch
    # re-executes the static side's lazy plan, so an un-checkpointed
    # csigs recomputes all num_perm corpus permutations per batch
    # (measured: ~1.5 s of the ~2.2 s batch at sf0.1 was corpus-side
    # recompute; with the index checkpointed the batch spends its time
    # on stream-side work only). In production these two frames ARE the
    # persisted index table that write_snapshot maintains.
    ca = hashed_shingle_arrays(corpus, n=n).localCheckpoint()
    csigs = (
        minhash_band_sigs_from_arrays(ca, num_perm=num_perm, rows_per_band=rows_per_band)
        .select(F.col("doc_id").alias("corpus_id"), "band", "band_sig")
        .localCheckpoint()
    )
    carr = ca.select(
        F.col("doc_id").alias("corpus_id"), F.col("shingles").alias("corpus_shingles")
    ).localCheckpoint()
    na = hashed_shingle_arrays(new_docs_stream, n=n)
    nsigs = minhash_band_sigs_from_arrays(
        na, num_perm=num_perm, rows_per_band=rows_per_band, keep_shingles=True
    ).select(F.col("doc_id").alias("new_id"), "shingles", "band", "band_sig")
    cand = (
        nsigs.join(csigs, ["band", "band_sig"])
        .select("corpus_id", "new_id", "shingles")
        .dropDuplicates(["corpus_id", "new_id"])
    )
    inter = F.size(F.array_intersect("shingles", "corpus_shingles"))
    union = F.size("shingles") + F.size("corpus_shingles") - inter
    return (
        cand.join(carr, "corpus_id")
        .select("corpus_id", "new_id", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
