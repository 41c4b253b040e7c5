"""Training-batch assembly operators: sequence packing, passage-level
dedup, and source-weighted epoch mixing.

These are the steps between a curated corpus and a training run that the
reference never needed (its corpus was MAG metadata, not LLM text — the
closest surface is the dwarfing sampler, MagDwarf.scala:63-147), but a
100 TB data pipeline does:

- ``pack_sequences``: the GPT-style concat-and-chunk schedule — shard the
  corpus, concatenate token streams per shard, cut into fixed-length
  training sequences, and report each document's placement. One shuffle
  (the shard repartition); the per-shard prefix sum is a window over the
  shard partition, so shards scale out independently (pick shards ≈
  cluster parallelism at 100 TB; each shard's window sorts only its own
  partition).
- ``passage_dedup``: exact dedup at sub-document (passage) granularity —
  fixed-width token windows hashed and first-occurrence-kept, the
  C4/RefinedWeb-style pass that document-level dedup misses. Hash
  group-by, no all-pairs anything.
- ``mix_epochs``: source-weighted epoch replication (e.g. wiki ×2.5,
  crawl ×0.5) with the fractional epoch chosen by the same deterministic
  content-hash bucket the samplers use — reproducible across runs,
  engines, and partitionings. Map-side only: a per-row sequence explode,
  no shuffle.

All pure built-in expressions; integer outputs; every hash is the
md5-prefix fold shared with the DuckDB oracles (operators/text.hash_bucket,
operators/dedup.token_hash48).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .dedup import words
from .text import hash_bucket


def pack_sequences(
    documents: DataFrame,
    seq_len: int = 512,
    shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing plan.

    Documents are assigned to ``shards`` by content hash, ordered by id
    within each shard, and their whitespace-token streams laid head to
    tail; training sequences are the ``seq_len``-token cuts of each
    shard's stream (documents may straddle a cut — the standard
    concat-and-chunk recipe; no padding waste).

    Returns one row per document:
    (doc_id, shard, n_tokens, tok_start, first_seq, last_seq) — all
    BIGINT; ``tok_start`` is the document's offset in its shard's token
    stream, ``first_seq``/``last_seq`` the shard-local training-sequence
    indices it lands in.
    """
    base = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(words(text_col)).cast("long").alias("n_tokens"),
    )
    return pack_token_counts(base, seq_len=seq_len, shards=shards).select(
        "doc_id", "shard", "n_tokens", "tok_start", "first_seq", "last_seq"
    )


def pack_token_counts(
    rows: DataFrame,
    seq_len: int = 512,
    shards: int = 8,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
) -> DataFrame:
    """The concat-and-chunk placement arithmetic over PRECOMPUTED
    per-row token counts (the grain any tokenizer/renderer emits):
    appends (shard, tok_start, first_seq, last_seq) to the input rows,
    preserving every other column — so rendered SFT transcripts pack by
    their own counts with loss-mask columns riding along. Same shape as
    :func:`pack_sequences` (one shard window per partition)."""
    w = (
        W.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(count_col).over(w)
    return (
        rows.withColumn("shard", hash_bucket(id_col, shards))
        .withColumn("tok_end", cum)
        .withColumn("tok_start", F.col("tok_end") - F.col(count_col))
        .withColumn("first_seq", F.expr(f"tok_start div {int(seq_len)}"))
        .withColumn("last_seq", F.expr(f"(tok_end - 1) div {int(seq_len)}"))
        .drop("tok_end")
    )


def passage_dedup(
    documents: DataFrame,
    passage_tokens: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Passage-level exact dedup report.

    Each document's token stream is cut into fixed ``passage_tokens``-wide
    passages (tail passage may be shorter); a passage is a duplicate when
    an identical passage occurs earlier in the corpus (smaller
    (doc_id, passage_idx)). First occurrences are the keepers — the
    standard sub-document dedup pass over a crawl corpus.

    Returns (doc_id, n_passages, dup_passages, dup_tokens): BIGINT counts
    of a document's passages / how many are duplicates of earlier text /
    the token mass those duplicates carry.

    Scale shape: explode to one row per passage, hash group-by for the
    per-passage keeper (min struct — a partial-aggregatable min, no
    all-pairs join), broadcast-free equi-join back on the passage hash.
    Passage cardinality is ~corpus tokens / passage_tokens; the group-by
    key (the hash) is uniform, so no skew handling is needed.
    """
    pt = passage_tokens
    passages = (
        documents.select(
            F.col(id_col).alias("doc_id"), words(text_col).alias("_toks")
        )
        .withColumn("_np", F.expr(f"(size(_toks) + {pt - 1}) div {pt}").cast("int"))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("_np") - 1),
                    lambda i: F.array_join(
                        F.slice(F.col("_toks"), i * pt + 1, pt), " "
                    ),
                )
            ).alias("p_idx", "passage"),
        )
        .select(
            "doc_id",
            F.col("p_idx").cast("long").alias("p_idx"),
            F.conv(F.substring(F.md5("passage"), 1, 12), 16, 10)
            .cast("long")
            .alias("p_hash"),
            F.size(F.split(F.col("passage"), " ")).cast("long").alias("p_tokens"),
        )
    )
    keepers = passages.groupBy("p_hash").agg(
        F.min(F.struct("doc_id", "p_idx")).alias("keeper")
    )
    tagged = passages.join(keepers, "p_hash").withColumn(
        "is_dup",
        (F.struct("doc_id", "p_idx") != F.col("keeper")).cast("long"),
    )
    return tagged.groupBy("doc_id").agg(
        F.count("*").alias("n_passages"),
        F.sum("is_dup").alias("dup_passages"),
        F.sum(F.col("is_dup") * F.col("p_tokens")).alias("dup_tokens"),
    )


def pack_manifest(
    documents: DataFrame,
    seq_len: int = 512,
    shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The loader-facing view of :func:`pack_sequences`: one row per
    (shard, seq, document) with the document's token span INSIDE that
    training sequence — what a data loader needs to assemble attention
    masks / loss boundaries for concat-and-chunk batches.

    (shard, seq, doc_id, start_in_seq, end_in_seq): the document
    occupies [start_in_seq, end_in_seq) of sequence ``seq`` (0-based
    within the sequence, end exclusive). Derived arithmetically from the
    packing prefix sums — explode of each document's spanned sequence
    ids, all BIGINT.
    """
    p = pack_sequences(
        documents, seq_len=seq_len, shards=shards, id_col=id_col, text_col=text_col
    )
    return (
        p.select(
            "shard",
            "doc_id",
            "tok_start",
            (F.col("tok_start") + F.col("n_tokens")).alias("tok_end"),
            F.explode(F.sequence(F.col("first_seq"), F.col("last_seq"))).alias("seq"),
        )
        .select(
            "shard",
            "seq",
            "doc_id",
            F.greatest(F.lit(0).cast("long"), F.col("tok_start") - F.col("seq") * seq_len).alias(
                "start_in_seq"
            ),
            F.least(F.lit(seq_len).cast("long"), F.col("tok_end") - F.col("seq") * seq_len).alias(
                "end_in_seq"
            ),
        )
    )


def pack_bins_nextfit(
    documents: DataFrame,
    capacity: int = 512,
    shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Next-fit bin packing that RESPECTS document boundaries: within a
    shard (content-hash bucket, ordered by id) each document lands whole
    in the current bin, and a document that would overflow ``capacity``
    closes the bin and opens the next; an oversized document occupies a
    bin alone. The padding-free alternative to :func:`pack_sequences`
    when documents must not straddle training sequences.

    The bin index depends on every previous placement decision — a
    sequential recurrence no window frame expresses — so each shard runs
    as a grouped-map pandas UDF (``applyInPandas``): O(1) state, one
    pass over the shard's rows. Scale shape: one shuffle to group by
    shard; set ``shards`` ≈ cluster parallelism at 100 TB so every
    sequential scan is small and they all run at once. (The DuckDB
    oracle walks the same recurrence as a recursive CTE.)

    Returns (doc_id, shard, n_tokens, bin_idx, bin_fill) — all BIGINT;
    ``bin_fill`` is the bin's token count after placing the document.
    """
    import pandas as pd

    base = documents.select(
        F.col(id_col).alias("doc_id"),
        hash_bucket(id_col, shards).alias("shard"),
        F.size(words(text_col)).cast("long").alias("n_tokens"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_idx, bin_fill = [], []
        b, fill = 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if fill > 0 and fill + t > capacity:
                b, fill = b + 1, 0
            fill += t
            bin_idx.append(b)
            bin_fill.append(fill)
        return pdf.assign(bin_idx=bin_idx, bin_fill=bin_fill)

    return base.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard long, n_tokens long, bin_idx long, bin_fill long"
    )


def mix_epochs(
    documents: DataFrame,
    weights_pct: dict[str, int],
    default_pct: int = 100,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Source-weighted epoch replication for training-mix assembly.

    ``weights_pct`` maps a source to an integer percentage of epochs:
    250 ⇒ every document appears in epochs 1 and 2, and the
    deterministic half of documents (content-hash bucket < 50) also in
    epoch 3; 50 ⇒ half the documents appear once, the rest not at all;
    unlisted sources get ``default_pct``. The fractional choice is
    ``hash_bucket(doc_id) < pct % 100`` — the same md5 fold as the
    samplers, so the mix is reproducible anywhere.

    Returns (doc_id, source, epoch) — one row per replicated occurrence.
    Map-side only (sequence + explode per row): no shuffle at any scale.
    """
    pct = F.lit(default_pct)
    for src, p in sorted(weights_pct.items()):
        pct = F.when(F.col(source_col) == src, F.lit(p)).otherwise(pct)
    copies = (pct / 100).cast("long") + (
        hash_bucket(id_col) < pct % 100
    ).cast("long")
    return (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            copies.alias("_copies"),
        )
        .filter(F.col("_copies") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("_copies"))).alias(
                "epoch"
            ),
        )
    )


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking: overlapping ``chunk_tokens``-token
    windows every ``stride`` tokens — the embedding/retrieval prep step
    (overlap = chunk_tokens - stride keeps boundary context in two
    chunks). The final window is the shorter tail; a document shorter
    than one chunk yields exactly one window.

    (doc_id, chunk_idx, tok_start, n_tokens, chunk_text) — integers
    BIGINT, chunk_text the space-joined window. Map-side explode: no
    shuffle, output rows ≈ corpus_tokens / stride.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    base = documents.select(
        F.col(id_col).alias("doc_id"), words(text_col).alias("_t")
    ).withColumn(
        # number of windows: 1 + ceil(max(0, n - chunk) / stride)
        "_nw",
        (
            F.lit(1)
            + F.expr(
                f"(greatest(0, size(_t) - {chunk_tokens}) + {stride - 1}) div {stride}"
            )
        ).cast("int"),
    )
    return base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("_nw") - 1),
                lambda i: F.array_join(
                    F.slice(F.col("_t"), i * stride + 1, chunk_tokens), " "
                ),
            )
        ).alias("chunk_idx", "chunk_text"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * stride).cast("long").alias("tok_start"),
        F.size(F.split(F.col("chunk_text"), " ")).cast("long").alias("n_tokens"),
        "chunk_text",
    )


def seeded_shuffle(
    documents: DataFrame,
    seed: int = 42,
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """(doc_id, shuffle_pos) — deterministic global training order.

    A seeded pseudo-random permutation of the corpus: rows sort by
    md5(seed:id) and receive their 1-based global position. The position
    is the dataloader contract — the same seed yields the same order on
    any engine, any partitioning, any run (unlike rand()/TABLESAMPLE).

    Scale shape — the distributed global-enumeration recipe, NOT a
    single-partition window: range-repartition on the shuffle key, sort
    within partitions, count rows per partition, prefix-sum the counts
    on a partitions-sized frame (broadcast back), then number within
    each partition and add the partition's offset. Every step is
    bounded by one partition's data except the counts frame, which has
    one row per partition. Positions depend only on the total key
    order, so partition boundaries (range-sampling) never change the
    result.
    """
    spark = documents.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism
    keyed = documents.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))).alias("skey"),
    )
    part = (
        keyed.repartitionByRange(p, "skey")
        .sortWithinPartitions("skey")
        .withColumn("pid", F.spark_partition_id())
    )
    counts = part.groupBy("pid").agg(F.count("*").cast("long").alias("cnt"))
    w_off = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).cast("long").alias("poffset")
    )
    w_rn = W.partitionBy("pid").orderBy("skey")
    return (
        part.join(F.broadcast(offsets), "pid")
        .withColumn("shuffle_pos", (F.col("poffset") + F.row_number().over(w_rn)).cast("long"))
        .select("doc_id", "shuffle_pos")
    )


def curriculum_order(
    documents: DataFrame,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """(doc_id, decile, curriculum_pos) — anneal-phase training order:
    the whole corpus ordered low-quality → high-quality (the
    FineWeb/OLMo-style anneal recipe: END training on the best data),
    deterministic within each decile via the seeded md5 permutation
    (same dataloader contract as :func:`seeded_shuffle` — the order is
    a pure function of (corpus, seed), independent of engine,
    partitioning, and run).

    Scale shape: deciles come from :func:`text.quality_deciles`'s
    bounded histogram (no global rank over the corpus), and the global
    enumeration is the seeded_shuffle recipe on the COMPOSITE key
    (decile, skey, doc_id): range-repartition, sort within partitions,
    one partitions-sized counts frame prefix-summed and broadcast
    back, partition-local row_number + offset. Never a
    single-partition sort.
    """
    from .text import quality_deciles

    spark = documents.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism
    keyed = quality_deciles(documents, id_col=id_col, text_col=text_col).select(
        "doc_id",
        "decile",
        F.md5(
            F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))
        ).alias("skey"),
    )
    part = (
        keyed.repartitionByRange(p, "decile", "skey", "doc_id")
        .sortWithinPartitions("decile", "skey", "doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    counts = part.groupBy("pid").agg(F.count("*").cast("long").alias("cnt"))
    w_off = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).cast("long").alias("poffset")
    )
    w_rn = W.partitionBy("pid").orderBy("decile", "skey", "doc_id")
    return (
        part.join(F.broadcast(offsets), "pid")
        .withColumn(
            "curriculum_pos",
            (F.col("poffset") + F.row_number().over(w_rn)).cast("long"),
        )
        .select("doc_id", "decile", "curriculum_pos")
    )


def select_token_budget(
    documents: DataFrame,
    budget_tokens: int = 2000,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Quality-ranked selection under a per-source token budget.

    The data-mixing step after scoring: within each source, take
    documents best-quality-first until the source's token budget is
    spent (a document is in iff the running total *through it* fits).
    Quality is the engine's fixed-order-double heuristic
    (operators/text.quality_score), so ranking is bit-reproducible;
    everything else is integer.

    Returns selected rows only:
    (doc_id, source, n_tokens, cum_tokens) — cum_tokens ≤ budget.

    Scale shape: one shuffle on source; the running sum is a window per
    source partition (sources ≫ 1 in a crawl corpus — the global-budget
    variant would instead reuse the seeded_shuffle prefix-sum recipe).
    """
    t = F.col(text_col)
    toks = F.split(F.lower(t), " ")
    n_chars = F.length(t).cast("long")
    n_words = F.size(toks).cast("long")
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", "")).cast("long")
    score = F.least(n_words, F.lit(100)).cast("double") / F.lit(100.0) * (n_alpha / n_chars)
    base = documents.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        n_words.alias("n_tokens"),
        score.alias("score"),
    )
    w = (
        W.partitionBy("source")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )
