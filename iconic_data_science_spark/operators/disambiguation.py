"""Author-name disambiguation candidates — the workload the reference
collected literature for but never built (/root/reference/archive/
links.md:1-39: KDD Cup 2013 author disambiguation, Microsoft ALIAS).

Standard blocked record-linkage shape, relational end to end:

  1. normalize names (lowercase, strip punctuation, collapse spaces);
  2. block on cheap keys so candidate generation is an equi-join, never
     O(n²): last name-token + first initial (the classic bibliometric
     blocking key — catches "A. Smith" vs "Alice Smith");
  3. verify inside blocks with exact similarity: name-token Jaccard and
     Levenshtein on the normalized strings.

Scale posture: the block key is the shuffle key; block sizes are the
cost — the ``max_block_size`` cap drops degenerate blocks (the "J. Lee"
problem) exactly like the shingle df cap in dedup (same skew-control
pattern, SURVEY §4). All built-ins; both similarity measures are exact
integers/single-divisions, so the operator is oracle-able if wired to a
query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_name(col) -> F.Column:
    """lowercase, punctuation → space, collapsed/trimmed whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", " "), r" +", " "))


def blocking_key(norm_col) -> F.Column:
    """last token + first initial — 'a smith' and 'alice smith' share
    block 'smith|a'; empty names block to ''."""
    c = F.col(norm_col) if isinstance(norm_col, str) else norm_col
    toks = F.split(c, " ")
    return F.when(
        F.size(toks) >= 1,
        F.concat_ws("|", F.element_at(toks, -1), F.substring(F.element_at(toks, 1), 1, 1)),
    ).otherwise(F.lit(""))


def candidate_author_pairs(
    authors: DataFrame,
    id_col: str = "author",
    name_col: str = "name",
    min_token_jaccard: float = 0.3,
    max_edit_distance: int = 10,
    max_block_size: int | None = 1000,
) -> DataFrame:
    """(id1, id2, token_jaccard, edit_distance) — same-block author pairs
    passing both verify thresholds, id1 < id2.

    ``max_block_size`` drops blocks larger than the cap before pairing
    (a block of b authors emits b²/2 pairs; degenerate keys would
    dominate the whole job) — the disambiguation twin of the shingle
    document-frequency cap.
    """
    base = authors.select(
        F.col(id_col).alias("id"),
        normalize_name(name_col).alias("norm"),
    ).withColumn("block", blocking_key("norm")).withColumn(
        "toks", F.array_distinct(F.split(F.col("norm"), " "))
    )
    if max_block_size is not None:
        ok = (
            base.groupBy("block")
            .agg(F.count("*").alias("_bs"))
            .filter(F.col("_bs") <= max_block_size)
            .select("block")
        )
        base = base.join(ok, "block", "left_semi")
    a = base.select(
        F.col("block"), F.col("id").alias("id1"), F.col("norm").alias("n1"), F.col("toks").alias("t1")
    )
    b = base.select(
        F.col("block"), F.col("id").alias("id2"), F.col("norm").alias("n2"), F.col("toks").alias("t2")
    )
    inter = F.size(F.array_intersect("t1", "t2"))
    union = F.size(F.array_union("t1", "t2"))
    return (
        a.join(b, "block")
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            (inter / union).alias("token_jaccard"),
            F.levenshtein("n1", "n2").cast("long").alias("edit_distance"),
        )
        .filter(
            (F.col("token_jaccard") >= min_token_jaccard)
            & (F.col("edit_distance") <= max_edit_distance)
        )
    )
