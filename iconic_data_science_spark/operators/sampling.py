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
