"""Reproducible sampling operators.

The reference samples with ``shuf -n 1000`` (scripts/get_samples.sh:7) and
FK-closed dwarfing (MagDwarf.scala:63-147 → operators/joins.fk_closure_sample).
Both are non-deterministic across runs; a 100 TB pipeline needs samples
that are stable under reruns, engine swaps, and repartitioning, so the
engine's sampling primitive is the content-hash bucket
(functions shared with the train/val/test splitter in operators/text.py):
row kept iff ``hash(key) mod 100 < pct``. No shuffle, no state — a
map-side filter that composes with any downstream plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .text import hash_bucket


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its key's hash
    bucket (0-99) is below the stratum's percentage. Unlisted strata get
    ``default_pct`` (0 = drop). Unlike ``df.sampleBy``, the output is
    identical on every run and engine — the property training-data
    pipelines need for audit/repro.
    """
    rate: Column = F.lit(default_pct)
    for value, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    return df.withColumn("_bucket", hash_bucket(key_col)).filter(
        F.col("_bucket") < rate
    ).drop("_bucket")


def weighted_bernoulli_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    target_n: int,
    bucket_space: int = 1_000_000,
) -> DataFrame:
    """Reproducible sampling with per-ROW weights — the quality- or
    size-proportional corpus subset step (DCLM / FineWeb style: sample
    documents proportionally to a quality score or token count rather
    than uniformly). Row *i* is kept iff

        (md5-fold(key) mod S) * W_total  <  target_n * weight_i * S

    i.e. an independent Bernoulli draw with p_i = min(1, target_n *
    w_i / W_total), so E[|sample|] = ``target_n`` whenever no single
    weight saturates. Every term is an exact integer — the comparison
    runs in DECIMAL so it is bit-identical on any engine and safe far
    past int64 (u < 1e6 is DECIMAL(7), W_total at 100 TB-corpus scale
    ~1e14 fits DECIMAL(20); the product stays ≤ DECIMAL(27) on both
    sides, well under Spark's 38-digit cap). Contrast ``df.sample``:
    partition-order-dependent and unweighted.

    Plan shape: one partial+final aggregate for W_total (a 1-row
    exchange), broadcast back via cross join — the filter itself is
    map-side, no data shuffle, no collect. Weights must be non-negative
    integers (cast upstream; e.g. a milli-score or ``n_chars``).
    """
    # Guarded casts: a non-ANSI decimal overflow is a silent NULL that
    # would silently EMPTY the sample (NULL keep predicate) — validate
    # the Python-int parameters eagerly and fail loudly on data.
    if bucket_space > 10_000_000:
        raise ValueError(
            f"bucket_space={bucket_space} exceeds 1e7 (u is decimal(7,0))"
        )
    if int(target_n) * int(bucket_space) >= 10**20:
        raise ValueError(
            f"target_n*bucket_space = {int(target_n) * int(bucket_space)} "
            "exceeds the decimal(20,0) literal budget"
        )
    u = hash_bucket(key_col, bucket_space).cast("decimal(7,0)")
    # Sum in decimal (precision 30) so W_total cannot wrap int64 at
    # 100 TB weight sums; u(7) × W_total(30) → 38 digits, exactly at
    # Spark's cap but never past it.
    total = df.agg(
        F.sum(F.col(weight_col).cast("decimal(20,0)")).alias("_w_total")
    )
    w_i = F.when(
        F.col(weight_col) >= F.lit(10_000_000_000_000),
        F.raise_error(
            F.lit("weighted_bernoulli_sample: weight overflows decimal(13,0)")
        ).cast("decimal(13,0)"),
    ).otherwise(F.col(weight_col).cast("decimal(13,0)"))
    keep = u * F.col("_w_total") < (
        F.lit(str(int(target_n) * int(bucket_space))).cast("decimal(20,0)") * w_i
    )
    return df.crossJoin(F.broadcast(total)).filter(keep).drop("_w_total")


def group_uniform_k(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """EXACTLY min(k, |group|) rows per group, uniform over the group
    and reproducible anywhere — rank rows inside each group by the md5
    content hash of their key and keep the first k. The eval-set /
    per-source-cap builder: ``stratified_hash_sample`` gives a *rate*
    (size drifts with the group), ``quota_sample`` admits by *arrival
    order* (biased toward early rows); this is the unbiased fixed-SIZE
    cut. Ties cannot occur (the hash is folded from the key, and equal
    keys are ordered by the key itself as the deterministic tiebreak).

    One shuffle on the group column; the rank is a window row_number —
    Spark's WindowGroupLimit pushes the k-cut into each partial sort at
    scale, so no group ever materializes fully sorted.
    """
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    w = W.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def global_uniform_n(
    df: DataFrame,
    key_col: str,
    n: int,
) -> DataFrame:
    """EXACTLY min(n, |df|) rows, uniform over the whole input and
    reproducible anywhere — the global fixed-size cut completing the
    sampling family (stratified = per-stratum RATE, group_k = per-GROUP
    size, quota = arrival order, weighted = per-row weights; this is
    "give me exactly N, same N on any engine/partitioning"). Rank by
    the md5 content hash of the key (ties → the key itself) and keep
    the first n: one TakeOrderedAndProject — no global sort
    materializes, each partition forwards ≤ n candidates.

    Contrast ``df.sample``: partition-order-dependent and
    approximately-sized; ``df.limit``: arbitrary rows."""
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    return (
        df.withColumn("_h", h)
        .orderBy("_h", key_col)
        .limit(int(n))
        .drop("_h")
    )
