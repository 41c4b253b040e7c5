"""Time-decayed aggregation on an exact integer lattice.

Recency-weighted rollups (user engagement value, source trust, item
popularity) classically compute Σ value·2^(−age/half_life) in floats —
which neither reproduces across engines nor sums associatively. This
operator keeps the exponential-decay semantics but pins every step to
integers:

    weight(age)   = 10⁶ div 2^age_buckets          (integer, exact)
    decayed_micro = value_cents · weight(age)       (BIGINT, exact)

so partial aggregation, re-ordering, and engine swaps cannot change a
bit. ``value_cents`` is the DECIMAL(12,2) cast of the raw double —
IEEE round-half-even of a double to 2 decimals is deterministic in
every engine — scaled by 100. Ages beyond ``max_age_buckets`` get
weight 0 (the standard truncation; 2^-21 < 1 micro anyway).

Plan shape: the reference point (max event hour) is a 1-row aggregate
broadcast back; the weighting itself is map-side; one final group-grain
rollup. No window, no per-row state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decayed_value(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    bucket_hours: int = 24,
    max_age_buckets: int = 20,
) -> DataFrame:
    """(event_type, n_events, decayed_micro) — per-group sum of
    value·2^(−age) with age in ``bucket_hours`` buckets relative to the
    newest event in the table; exact integers end to end (see module
    docstring). ``decayed_micro`` is in value-cents·micro units
    (divide by 10⁸ for the float view downstream)."""
    hour = F.expr(f"unix_timestamp({ts_col}) div 3600")
    with_hour = events.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
        hour.alias("_h"),
    )
    ref = with_hour.agg(F.max("_h").alias("_h_max"))
    age = F.expr(f"(_h_max - _h) div {int(bucket_hours)}")
    cents = (F.col("v").cast("decimal(12,2)") * 100).cast("long")
    weight = F.when(
        age <= max_age_buckets, F.expr(f"1000000 div shiftleft(1L, CAST((_h_max - _h) div {int(bucket_hours)} AS INT))")
    ).otherwise(F.lit(0))
    return (
        with_hour.crossJoin(F.broadcast(ref))
        .select(
            "grp",
            (cents * weight).alias("_d"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("_d").cast("long").alias("decayed_micro"),
        )
        .select(F.col("grp").alias(group_col), "n_events", "decayed_micro")
    )


def decay_oracle_sql(
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    table: str = "events",
    bucket_hours: int = 24,
    max_age_buckets: int = 20,
) -> str:
    """DuckDB twin — same epoch-hour floor, same cents cast, same
    truncating power-of-two weight, same BIGINT sum."""
    return f"""
        WITH e AS (
            SELECT {group_col} AS grp,
                   CAST(CAST({value_col} AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
                   CAST(floor(epoch({ts_col})) AS BIGINT) // 3600 AS h
            FROM {table}
        ),
        r AS (SELECT MAX(h) AS h_max FROM e),
        w AS (
            SELECT grp, cents,
                   (h_max - h) // {int(bucket_hours)} AS age
            FROM e, r
        )
        SELECT grp AS {group_col},
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(cents * CASE WHEN age <= {int(max_age_buckets)}
                                     THEN 1000000 // (1::BIGINT << CAST(age AS INT))
                                     ELSE 0 END) AS BIGINT) AS decayed_micro
        FROM w GROUP BY 1
    """
