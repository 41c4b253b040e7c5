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


def dwarf_star(cat, pct: int = 10) -> dict:
    """Full-star dwarf (the reference's whole-fileset MagDwarf,
    MagDwarf.scala:63-147, over the driver's TPC-H-ish schema): sample
    orders by deterministic content-hash bucket, then close every
    FK-linked table with left-semi joins so the dwarf is referentially
    consistent — sampled lineitems' orders exist, their customers and
    suppliers exist, dims are restricted to what is referenced.

    Unlinked corpora (documents, embeddings) sample independently by
    their own key at the same rate; tiny dims (nation, region) pass
    through whole, as the reference keeps the fos hierarchy intact.
    Deterministic (hash buckets, not rand()): two runs, or two engines,
    produce the same dwarf.
    """
    from .text import hash_bucket

    orders = cat.orders.filter(hash_bucket("o_orderkey") < pct)
    lineitem = fk_closure_sample(orders, "o_orderkey", cat.lineitem, "l_orderkey")
    customer = fk_closure_sample(orders, "o_custkey", cat.customer, "c_custkey")
    supplier = fk_closure_sample(lineitem, "l_suppkey", cat.supplier, "s_suppkey")
    part = fk_closure_sample(lineitem, "l_partkey", cat.part, "p_partkey")
    return {
        "orders": orders,
        "lineitem": lineitem,
        "customer": customer,
        "supplier": supplier,
        "part": part,
        "nation": cat.nation,
        "region": cat.region,
        "events": cat.events.filter(hash_bucket("event_id") < pct),
        "documents": cat.documents.filter(hash_bucket("doc_id") < pct),
        "embeddings": cat.embeddings.filter(hash_bucket("vec_id") < pct),
    }
