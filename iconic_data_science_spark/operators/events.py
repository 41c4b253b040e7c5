"""Batch event-analytics operators over the ``events`` table.

Beyond the reference's surface (its only temporal analysis is
year-grained bibliometrics — ProfileConversion.scala:91-143); these are
the product-analytics shapes an events pipeline needs, expressed as
pure DataFrame ops so Catalyst handles pushdown and join strategy. The
streaming twins live in streaming/events.py; these batch forms are the
backfill / replay path over the same parquet.

Determinism discipline: timestamps are only compared, never emitted;
week arithmetic is integer days-since-epoch-date ``div`` 7 (date_trunc
week-start conventions differ across engines, integer division does
not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPOCH = "2024-01-01"  # cohort day-0 anchor (first day of the dataset)


def funnel(
    events: DataFrame, stages: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered-funnel conversion: (stage, n_users) — users counted at a
    stage only if they performed it strictly AFTER their entry into the
    previous stage (min-timestamp chaining, the standard product-funnel
    semantics: a click before any view is not funnel progress).

    One aggregation per stage on (user_id), each joined to the previous
    stage's entry time — user_id-keyed shuffles throughout, no window
    over raw events, state bounded by users, not events.
    """
    prev: DataFrame | None = None
    out_rows: list[DataFrame] = []
    spark = events.sparkSession
    for idx, stage in enumerate(stages):
        e = events.filter(F.col("event_type") == stage)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col("_entry_ts"))
        entered = e.groupBy("user_id").agg(F.min("ts").alias("_entry_ts"))
        cnt = entered.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(stage).alias("stage"),
            "n_users",
        )
        out_rows.append(cnt)
        prev = entered
    out = out_rows[0]
    for df in out_rows[1:]:
        out = out.unionByName(df)
    return out


def retention_cohorts(
    events: DataFrame, cohort_event: str = "signup", epoch: str = EPOCH
) -> DataFrame:
    """Weekly retention triangle: (cohort_week, week_offset, n_users) —
    users bucketed by the week of their first ``cohort_event``, counted
    once per later week in which they have ANY event.

    Weeks are ``datediff(day, epoch) div 7`` — integer arithmetic both
    engines share (date_trunc('week') week-start conventions do not
    match across engines/locales). The activity set dedups map-side to
    (user, week) before the count — the shuffle carries user×week rows,
    not raw events.
    """
    wk = (F.datediff(F.to_date("ts"), F.lit(epoch).cast("date"))).cast("long")
    first = (
        events.filter(F.col("event_type") == cohort_event)
        .groupBy("user_id")
        .agg(F.min("ts").alias("_first_ts"))
        .select(
            "user_id",
            F.floor(
                F.datediff(F.to_date("_first_ts"), F.lit(epoch).cast("date")) / 7
            ).cast("long").alias("cohort_week"),
        )
    )
    act = (
        events.select("user_id", F.floor(wk / 7).cast("long").alias("week"))
        .distinct()
        .join(first, "user_id")
        .filter(F.col("week") >= F.col("cohort_week"))
    )
    return act.groupBy(
        "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
    ).agg(F.countDistinct("user_id").cast("long").alias("n_users"))
