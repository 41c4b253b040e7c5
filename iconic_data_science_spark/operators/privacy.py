"""Privacy auditing: k-anonymity and l-diversity over quasi-identifier
groups.

Extends the PII surface next to :func:`text.pii_redact` (pattern
redaction) with the RELEASE-side audit every privacy review runs before
a dataset ships (Sweeney 2002, "k-Anonymity: a model for protecting
privacy"; Machanavajjhala et al. 2007, "l-Diversity: privacy beyond
k-anonymity"):

- a record is k-anonymous iff at least ``k`` records share its full
  quasi-identifier tuple (the re-identification bound);
- a quasi-group is l-diverse iff it contains at least ``l`` DISTINCT
  values of the sensitive attribute (k-anonymity alone fails when the
  whole group shares one sensitive value — the homogeneity attack).

Shape: ONE quasi-tuple-grain aggregate (count + exact distinct of the
sensitive column per group — both map-side partial); output is the
quasi-group table, bounded by the identifier domain product, never by
records. At 100 TB this is a single shuffle at the natural audit grain.
All outputs are exact integers — engine-agnostic by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    records: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """(quasi..., group_size, n_sensitive, k_anonymous, l_diverse,
    at_risk) — the per-quasi-group privacy audit:

      - group_size: records sharing the quasi tuple (the "k" of this
        group);
      - n_sensitive: exact distinct sensitive values in the group (the
        "l");
      - k_anonymous / l_diverse: the two gates at the given thresholds;
      - at_risk: the release blocker — a group failing EITHER gate
        (small enough to re-identify, or homogeneous enough to infer
        the sensitive value).

    Null quasi values form their own group (SQL GROUP BY semantics on
    both engines); a null sensitive value counts as one distinct value
    — counted WITHOUT a string sentinel (a sentinel like ' null'
    collides with a genuine string value ' null', merging two distinct
    values and undercounting n_sensitive): n_sensitive is the exact
    distinct of the raw column (COUNT DISTINCT skips nulls on both
    engines) plus 1 iff the group contains a null. Deterministic and
    collision-free for every column type."""
    s = F.col(sensitive_col)
    return (
        records.select(*quasi_cols, s.alias("_s"))
        .groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_size"),
            (
                F.countDistinct("_s")
                + F.max(F.when(F.col("_s").isNull(), 1).otherwise(0))
            )
            .cast("long")
            .alias("n_sensitive"),
        )
        .select(
            *quasi_cols,
            "group_size",
            "n_sensitive",
            (F.col("group_size") >= int(k)).cast("long").alias("k_anonymous"),
            (F.col("n_sensitive") >= int(l)).cast("long").alias("l_diverse"),
            (
                (F.col("group_size") < int(k))
                | (F.col("n_sensitive") < int(l))
            ).cast("long").alias("at_risk"),
        )
    )


def anonymity_summary(audit: DataFrame, quasi_cols: list[str]) -> DataFrame:
    """(n_groups, n_records, min_k, n_at_risk_groups, n_at_risk_records,
    risk_milli) — the one-row release decision over a
    :func:`k_anonymity_audit` frame: the dataset's effective k (the
    minimum group size — the number privacy reviews quote), how many
    records sit in failing groups, and the at-risk record share
    per-mille (floor, exact). Aggregates the bounded group table — no
    second pass over the records. ``quasi_cols`` declares the audit
    frame's expected grouping columns and is VALIDATED against it (a
    summary over the wrong audit frame is a silent release-decision
    error, so the mismatch raises)."""
    missing = [c for c in quasi_cols if c not in audit.columns]
    if missing:
        raise ValueError(
            f"anonymity_summary: quasi columns {missing} not in the audit "
            f"frame (has {audit.columns}) — was this frame produced by "
            "k_anonymity_audit over the same quasi-identifier tuple?"
        )
    # SUM over an empty audit is NULL; the release decision for an
    # empty dataset is 0 records / 0 at risk (min_k stays NULL — there
    # is no group whose size could be quoted). Same NULL-on-empty
    # class as judge_agreement's pe_num (see NOTES_r9).
    return audit.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.coalesce(F.sum("group_size"), F.lit(0))
        .cast("long")
        .alias("n_records"),
        F.min("group_size").cast("long").alias("min_k"),
        F.coalesce(F.sum("at_risk"), F.lit(0))
        .cast("long")
        .alias("n_at_risk_groups"),
        F.coalesce(F.sum(F.col("at_risk") * F.col("group_size")), F.lit(0))
        .cast("long")
        .alias("n_at_risk_records"),
    ).select(
        "n_groups",
        "n_records",
        "min_k",
        "n_at_risk_groups",
        "n_at_risk_records",
        F.when(F.col("n_records") > 0,
               F.floor(
                   F.lit(1000) * F.col("n_at_risk_records")
                   / F.col("n_records")
               ).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("risk_milli"),
    )
