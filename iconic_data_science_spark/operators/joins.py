"""Join-shape helpers: OR-join rewrite (J7), FK-closed sampling (J12).

J7: the reference joins a dim against either of two key expressions
(``$"id"===$"words"(0) || $"id"===$"words"(1)``,
/root/reference/src/notebooks/scala/MagDwarf.scala:115-120,130-135).
Catalyst can only execute a disjunctive join predicate as a broadcast
nested loop — O(n·m). ``or_join`` rewrites it as a union of equi-joins +
dedup (SURVEY.md §4.2): each branch hash-joins, and the union dedupes on
the output key set. At 100 TB this is the difference between a shuffle
join and an impossible cartesian.

J12: ``MagDwarf`` dwarfs the dataset by sampling papers and semi-joining
every other table against the sampled keys (MagDwarf.scala:63-147).
``fk_closure_sample`` is that as a reusable utility: a predicate picks the
seed rows, ``left_semi`` joins close the FK neighborhood.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def or_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_keys: Sequence[Column | str],
    dim_key: Column | str,
    output_cols: Sequence[str],
) -> DataFrame:
    """Join ``fact`` to ``dim`` where ANY of ``fact_keys`` equals
    ``dim_key``; returns distinct ``output_cols``.

    Executes as len(fact_keys) hash equi-joins unioned + dedup, instead
    of one broadcast nested loop over the disjunction.
    """
    dk = F.col(dim_key) if isinstance(dim_key, str) else dim_key
    branches = []
    for fk in fact_keys:
        fkc = F.col(fk) if isinstance(fk, str) else fk
        branches.append(fact.join(dim, fkc == dk).select(*output_cols))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.distinct()


def fk_closure_sample(seed: DataFrame, seed_key: str, related: DataFrame, fk: str) -> DataFrame:
    """J12: keep ``related`` rows whose ``fk`` hits the sampled ``seed``
    keys (left-semi, the scalable form of the reference's broadcast
    id-set filters, StaticNet.scala:250-256)."""
    keys = seed.select(F.col(seed_key).alias(fk)).distinct()
    return related.join(keys, fk, "left_semi")
