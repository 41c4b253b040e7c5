"""Behavioral tests for the training-batch assembly operators
(operators/packing.py): sequence packing, passage dedup, epoch mixing.
Goldens are hand-computed on tiny fixtures; the corpus-scale hash check
is tests/test_oracle_parity.py."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from iconic_data_science_spark.operators.packing import (
    mix_epochs,
    pack_sequences,
    passage_dedup,
)


def _bucket(key, buckets=100) -> int:
    """Python twin of operators/text.hash_bucket (md5-prefix fold)."""
    return int(hashlib.md5(str(key).encode()).hexdigest()[:12], 16) % buckets


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_pack_sequences_single_shard_layout(spark):
    # one shard => pure sequential concat; seq_len 5 tokens
    rows = [
        (1, "a b c", "s"),          # 3 tokens: [0,3) -> seq 0
        (2, "d e f g", "s"),        # 4 tokens: [3,7) -> seqs 0..1
        (3, "h", "s"),              # 1 token:  [7,8) -> seq 1
        (4, "i j k l m n", "s"),    # 6 tokens: [8,14) -> seqs 1..2
    ]
    out = {
        r["doc_id"]: r
        for r in pack_sequences(_docs(spark, rows), seq_len=5, shards=1).collect()
    }
    assert out[1]["tok_start"] == 0 and out[1]["first_seq"] == 0 and out[1]["last_seq"] == 0
    assert out[2]["tok_start"] == 3 and out[2]["first_seq"] == 0 and out[2]["last_seq"] == 1
    assert out[3]["tok_start"] == 7 and out[3]["first_seq"] == 1 and out[3]["last_seq"] == 1
    assert out[4]["tok_start"] == 8 and out[4]["first_seq"] == 1 and out[4]["last_seq"] == 2
    assert all(r["shard"] == 0 for r in out.values())


def test_pack_sequences_shard_streams_are_contiguous(spark):
    rows = [(i, " ".join(["w"] * (i % 7 + 1)), "s") for i in range(60)]
    df = pack_sequences(_docs(spark, rows), seq_len=8, shards=4)
    per_shard = (
        df.groupBy("shard")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.max(F.col("tok_start") + F.col("n_tokens")).alias("stream_end"),
            F.min("tok_start").alias("stream_start"),
        )
        .collect()
    )
    # head-to-tail: no gaps/overlaps — the stream is exactly the token sum
    for r in per_shard:
        assert r["stream_start"] == 0
        assert r["stream_end"] == r["total"]
    # shard assignment matches the portable hash
    for r in df.collect():
        assert r["shard"] == _bucket(r["doc_id"], 4)


def test_passage_dedup_counts_and_tail(spark):
    rows = [
        (1, "a b c d e", "s"),   # passages (pt=3): "a b c", "d e" (tail)
        (2, "a b c x y z", "s"), # "a b c" duplicates doc1's first passage
        (3, "d e", "s"),         # "d e" duplicates doc1's tail passage
    ]
    out = {
        r["doc_id"]: r
        for r in passage_dedup(_docs(spark, rows), passage_tokens=3).collect()
    }
    assert out[1]["n_passages"] == 2 and out[1]["dup_passages"] == 0
    assert out[2]["n_passages"] == 2 and out[2]["dup_passages"] == 1
    assert out[2]["dup_tokens"] == 3
    assert out[3]["n_passages"] == 1 and out[3]["dup_passages"] == 1
    assert out[3]["dup_tokens"] == 2  # tail passage carries 2 tokens


def test_passage_dedup_first_occurrence_is_kept(spark):
    # identical docs: every passage of the later doc is a duplicate
    rows = [(1, "p q r s t u", "s"), (2, "p q r s t u", "s")]
    out = {
        r["doc_id"]: r
        for r in passage_dedup(_docs(spark, rows), passage_tokens=3).collect()
    }
    assert out[1]["dup_passages"] == 0
    assert out[2]["dup_passages"] == 2 and out[2]["dup_tokens"] == 6


def test_mix_epochs_weights(spark):
    rows = [(i, "t", f"src{i % 3}") for i in range(30)]
    out = mix_epochs(
        _docs(spark, rows), {"src0": 250, "src1": 50, "src2": 0}
    ).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    for i in range(30):
        src = f"src{i % 3}"
        pct = {"src0": 250, "src1": 50, "src2": 0}[src]
        expect = pct // 100 + (1 if _bucket(i) < pct % 100 else 0)
        got = sorted(per_doc.get(i, []))
        assert got == list(range(1, expect + 1)), (i, src, got, expect)


def test_mix_epochs_default_weight_is_one_epoch(spark):
    rows = [(i, "t", "unlisted") for i in range(10)]
    out = mix_epochs(_docs(spark, rows), {"src0": 250}).collect()
    assert sorted((r["doc_id"], r["epoch"]) for r in out) == [
        (i, 1) for i in range(10)
    ]


def test_packing_partition_invariance(spark):
    """Same results under a different shuffle-partition count (the
    determinism playbook check for new operators)."""
    rows = [(i, " ".join(["tok%d" % (j % 5) for j in range(i % 9 + 1)]), f"src{i%4}") for i in range(40)]
    df = _docs(spark, rows)
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        a = sorted(map(tuple, pack_sequences(df, seq_len=7, shards=3).collect()))
        b = sorted(map(tuple, passage_dedup(df, passage_tokens=2).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a2 = sorted(map(tuple, pack_sequences(df, seq_len=7, shards=3).collect()))
        b2 = sorted(map(tuple, passage_dedup(df, passage_tokens=2).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert a == a2
    assert b == b2


def test_pack_bins_nextfit_boundaries_and_oversize(spark):
    from iconic_data_science_spark.operators.packing import pack_bins_nextfit

    rows = [
        (1, "a b c", "s"),        # 3 -> bin 0 (fill 3)
        (2, "d e f", "s"),        # 3 -> bin 0 (fill 6)
        (3, "g h", "s"),          # 2 would make 8 > 7 -> bin 1 (fill 2)
        (4, " ".join(["x"] * 9), "s"),  # oversized (9 > 7) -> bin 2 alone
        (5, "y", "s"),            # 1 after oversized -> bin 3
    ]
    out = {
        r["doc_id"]: r
        for r in pack_bins_nextfit(_docs(spark, rows), capacity=7, shards=1).collect()
    }
    assert (out[1]["bin_idx"], out[1]["bin_fill"]) == (0, 3)
    assert (out[2]["bin_idx"], out[2]["bin_fill"]) == (0, 6)
    assert (out[3]["bin_idx"], out[3]["bin_fill"]) == (1, 2)
    assert (out[4]["bin_idx"], out[4]["bin_fill"]) == (2, 9)
    assert (out[5]["bin_idx"], out[5]["bin_fill"]) == (3, 1)


def test_pack_bins_nextfit_invariants(spark):
    from pyspark.sql import functions as F

    from iconic_data_science_spark.operators.packing import pack_bins_nextfit

    rows = [(i, " ".join(["w"] * (i % 11 + 1)), "s") for i in range(80)]
    df = pack_bins_nextfit(_docs(spark, rows), capacity=16, shards=4)
    # no bin overfills unless it holds a single oversized document
    per_bin = df.groupBy("shard", "bin_idx").agg(
        F.sum("n_tokens").alias("fill"), F.count("*").alias("n")
    )
    bad = per_bin.filter((F.col("fill") > 16) & (F.col("n") > 1)).count()
    assert bad == 0
    # bin ids are contiguous from 0 within each shard
    for r in per_bin.groupBy("shard").agg(
        F.min("bin_idx").alias("lo"),
        F.max("bin_idx").alias("hi"),
        F.countDistinct("bin_idx").alias("nb"),
    ).collect():
        assert r["lo"] == 0 and r["nb"] == r["hi"] + 1


def test_pack_manifest_spans_tile_sequences(spark):
    from iconic_data_science_spark.operators.packing import pack_manifest

    rows = [(i, " ".join(["w"] * (i % 13 + 1)), "s") for i in range(50)]
    m = pack_manifest(_docs(spark, rows), seq_len=10, shards=2)
    # per document: spans sum to its token count
    per_doc = m.groupBy("doc_id").agg(
        F.sum(F.col("end_in_seq") - F.col("start_in_seq")).alias("tok")
    )
    toks = {i: i % 13 + 1 for i in range(50)}
    for r in per_doc.collect():
        assert r["tok"] == toks[r["doc_id"]]
    # per (shard, seq): spans tile [0, seq_len) exactly for every
    # sequence except each shard's last (which may be partial)
    per_seq = (
        m.groupBy("shard", "seq")
        .agg(
            F.sum(F.col("end_in_seq") - F.col("start_in_seq")).alias("fill"),
            F.min("start_in_seq").alias("lo"),
            F.max("end_in_seq").alias("hi"),
        )
        .collect()
    )
    last_seq = {r["shard"]: r["m"] for r in m.groupBy("shard").agg(F.max("seq").alias("m")).collect()}
    for r in per_seq:
        assert r["lo"] == 0
        if r["seq"] < last_seq[r["shard"]]:
            assert r["fill"] == 10 and r["hi"] == 10
        else:
            assert r["fill"] == r["hi"] <= 10


def test_chunk_documents_overlap_and_tail(spark):
    from iconic_data_science_spark.operators.packing import chunk_documents

    rows = [
        (1, "a b c d e f g h i j", "s"),  # 10 tokens, chunk 4 stride 3
        (2, "x y", "s"),                   # shorter than one chunk
    ]
    out = chunk_documents(_docs(spark, rows), chunk_tokens=4, stride=3).collect()
    d1 = sorted((r["chunk_idx"], r["chunk_text"]) for r in out if r["doc_id"] == 1)
    # windows: 1 + ceil((10-4)/3) = 3, starts 0/3/6, all full
    assert d1 == [
        (0, "a b c d"),
        (1, "d e f g"),
        (2, "g h i j"),
    ]
    d2 = [r for r in out if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "x y" and d2[0]["n_tokens"] == 2
    # every consecutive pair overlaps by chunk_tokens - stride = 1 token
    for (i1, t1), (i2, t2) in zip(d1, d1[1:]):
        assert t1.split(" ")[3:] == t2.split(" ")[:1]


def test_curriculum_order_invariants(spark, sf_dir):
    """curriculum_pos is a 1..N permutation, non-decreasing in decile
    (low quality first — the anneal contract), deterministic within a
    decile via the seeded md5 key, and invariant to input partitioning."""
    from iconic_data_science_spark.catalog import Catalog
    from iconic_data_science_spark.operators.packing import curriculum_order

    docs = Catalog(spark, sf_dir).documents
    rows = curriculum_order(docs, seed=42).collect()
    n = len(rows)
    assert sorted(r.curriculum_pos for r in rows) == list(range(1, n + 1))
    by_pos = sorted(rows, key=lambda r: r.curriculum_pos)
    deciles = [r.decile for r in by_pos]
    assert deciles == sorted(deciles), "decile order violated"
    # within-decile order follows md5(seed:id)
    for a, b in zip(by_pos, by_pos[1:]):
        if a.decile == b.decile:
            ka = hashlib.md5(f"42:{a.doc_id}".encode()).hexdigest()
            kb = hashlib.md5(f"42:{b.doc_id}".encode()).hexdigest()
            assert (ka, a.doc_id) < (kb, b.doc_id)
    again = curriculum_order(docs.repartition(13), seed=42).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
    # a different seed permutes within deciles but keeps the decile order
    other = {r.doc_id: r.curriculum_pos for r in curriculum_order(docs, seed=7).collect()}
    assert any(other[r.doc_id] != r.curriculum_pos for r in rows)


def test_pack_token_counts_preserves_columns_and_matches_pack_sequences(spark):
    """pack_token_counts over whitespace counts must place documents
    exactly like pack_sequences (it IS its arithmetic), while carrying
    arbitrary extra columns through."""
    from pyspark.sql import functions as F

    from iconic_data_science_spark.operators.dedup import words
    from iconic_data_science_spark.operators.packing import (
        pack_sequences,
        pack_token_counts,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i % 7)), f"m{i}") for i in range(1, 40)],
        "doc_id long, text string, meta string",
    )
    a = sorted(
        map(tuple, pack_sequences(docs, seq_len=5, shards=3).collect())
    )
    counted = docs.select(
        "doc_id", "meta", F.size(words("text")).cast("long").alias("n_tokens")
    )
    out = pack_token_counts(counted, seq_len=5, shards=3)
    assert "meta" in out.columns  # extra columns ride along
    b = sorted(
        map(
            tuple,
            out.select(
                "doc_id", "shard", "n_tokens", "tok_start", "first_seq", "last_seq"
            ).collect(),
        )
    )
    assert a == b


def test_sft_pack_invariants(spark, sf_dir):
    """Composed SFT path: loss tokens never exceed rendered tokens,
    rendered streams are contiguous within a shard, and loss density
    is the exact integer per-mille."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["sft_pack"](spark, sf_dir).collect()
    assert rows
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.n_loss_tokens <= r.n_tokens
        assert r.loss_milli == r.n_loss_tokens * 1000 // max(r.n_tokens, 1)
        assert r.first_seq == r.tok_start // 512
        by_shard.setdefault(r.shard, []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rs:
            assert r.tok_start == off
            off += r.n_tokens
