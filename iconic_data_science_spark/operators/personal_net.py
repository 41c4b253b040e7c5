"""Personal network with triadic closure (G3) — the flagship query.

Reference spec (/root/reference/src/notebooks/scala/PersonalNet.scala:118-124,
markdown): for each ego, every pair of the ego's alters (a1 < a2) that has
ALSO collaborated directly, with the pair's year =
``max(minYear(ego,a1), minYear(ego,a2), minYear(a1,a2))`` — the year the
triangle closed.

The reference implements it twice: a flatMap cross-product form
(PersonalNet.scala:143-201, RowEncoder UDTF-style) and a pure relational
form (PersonalNet_2.scala:125-136) — two self-joins plus ``greatest``.
We use the relational form; Catalyst turns it into shuffle/broadcast hash
joins and the O(k²) pair expansion happens executor-side, streamed, never
as a per-ego in-memory array.

Shape: J4 self theta-join (equi on ego + ``alter1 < alter2`` — the
triangular predicate kills duplicates and self-pairs) then J5 two-key
closure join, then F2 ``greatest`` (PersonalNet_2.scala:130,135).

Scale posture (this is the O(k²)-per-ego query — SURVEY.md §7 risk
register):
  - pre-aggregate edges to (ego, alter, min_year) BEFORE pairing
    (the reference's own cardinality-reducing join order,
    PersonalNet_2.scala:125-131) — the pair join runs on the reduced
    edge table, not the raw bridge;
  - ``egos`` / ``min_papers_together`` / ``max_authors_per_paper``
    truncation knobs mirror StaticNet.scala:313-314;
  - the closure probe joins on (alter1, alter2), a different key than the
    pair build (ego) — one extra shuffle, unavoidable in any engine; AQE
    splits skewed egos.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def personal_net_flatmap_form(edges: DataFrame, egos: DataFrame | None = None) -> DataFrame:
    """The reference's OTHER formulation (PersonalNet.scala:143-201):
    collect each ego's alters, cross the pairs per ego, then check
    closure. The flatMap+RowEncoder UDTF (X4) becomes an explode over a
    built-in pair-expression — no Python row loop, but the per-ego alter
    array materializes in memory, so the relational ``personal_net`` is
    the scale default. Kept for parity (and as the A5 discipline demo:
    collect_list(struct) + array_sort, never zip of two collect_lists —
    the reference's order-dependence bug, PersonalNet.scala:143-145).

    Returns the same (ego, alter1, alter2, year) as ``personal_net``.
    """
    e = edges.select("ego", "alter_id", "first_year")
    focal = e if egos is None else e.join(egos.select("ego").distinct(), "ego", "left_semi")
    per_ego = focal.groupBy("ego").agg(
        F.array_sort(F.collect_list(F.struct("alter_id", "first_year"))).alias("alters")
    )
    # UDTF-equivalent: explode the triangular index pairs (i < j)
    n = F.size("alters")
    idx_pairs = F.filter(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.transform(F.sequence(F.lit(1), n), lambda j: F.struct(i.alias("i"), j.alias("j"))),
            )
        ),
        lambda p: p["i"] < p["j"],
    )
    pairs = (
        per_ego.select("ego", "alters", F.explode(idx_pairs).alias("p"))
        .select(
            "ego",
            F.element_at("alters", F.col("p.i"))["alter_id"].alias("alter1"),
            F.element_at("alters", F.col("p.i"))["first_year"].alias("y1"),
            F.element_at("alters", F.col("p.j"))["alter_id"].alias("alter2"),
            F.element_at("alters", F.col("p.j"))["first_year"].alias("y2"),
        )
    )
    ap = e.select(
        F.col("ego").alias("alter1"),
        F.col("alter_id").alias("alter2"),
        F.col("first_year").alias("y3"),
    )
    return (
        pairs.join(ap, ["alter1", "alter2"])
        .select("ego", "alter1", "alter2", F.greatest("y1", "y2", "y3").alias("year"))
    )


def personal_net(edges: DataFrame, egos: DataFrame | None = None) -> DataFrame:
    """Triadic-closure personal networks from a coauthor edge table.

    ``edges``: (ego, alter_id, first_year) — output of
    ``coauthor.coauthor_edges`` (already strength-thresholded if desired).
    ``egos``: optional 1-column (ego) frame restricting the focal authors
    (the reference computes nets per selected author, not for everyone).

    Returns (ego, alter1, alter2, year) — J4 + J5 + greatest.
    """
    e = edges.select("ego", "alter_id", "first_year")
    focal = e
    if egos is not None:
        focal = e.join(egos.select("ego").distinct(), "ego", "left_semi")

    c1 = focal.alias("c1")
    c2 = focal.alias("c2")
    # J4: alter pairs per ego, triangular (alter1 < alter2) — PersonalNet_2.scala:128-131
    pairs = c1.join(
        c2,
        (F.col("c1.ego") == F.col("c2.ego")) & (F.col("c1.alter_id") < F.col("c2.alter_id")),
    ).select(
        F.col("c1.ego").alias("ego"),
        F.col("c1.alter_id").alias("alter1"),
        F.col("c2.alter_id").alias("alter2"),
        F.col("c1.first_year").alias("y1"),
        F.col("c2.first_year").alias("y2"),
    )
    # J5: closure — did alter1 and alter2 collaborate? — PersonalNet_2.scala:133-136
    ap = e.select(
        F.col("ego").alias("alter1"),
        F.col("alter_id").alias("alter2"),
        F.col("first_year").alias("y3"),
    )
    closed = pairs.join(ap, ["alter1", "alter2"])
    # F2: year the triangle closed — greatest of the three first-collab years
    return closed.select(
        "ego",
        "alter1",
        "alter2",
        F.greatest("y1", "y2", "y3").alias("year"),
    )
