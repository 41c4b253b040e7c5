"""Time-series rollup operators (hypertable-style continuous aggregates).

The reference's temporal analysis is year-grained panel data
(ProfileConversion.scala:91-143); an events stream at 100 TB needs the
multi-granularity rollup every time-series store precomputes. Expressed
as ONE scan: each event emits (grain, bucket) structs via an array
explode, then a single grouped count — instead of a UNION ALL of three
aggregations re-scanning the source per grain. At scale the explode
triples shuffle rows but map-side partial aggregation collapses them to
~(grains × buckets × types) before the exchange, so the shuffle stays
dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAINS = ("minute", "hour", "day")


def multi_grain_counts(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    grains: tuple[str, ...] = GRAINS,
) -> DataFrame:
    """(grain, bucket_us, event_type, n_events) for every grain in one
    pass. ``bucket_us`` is the truncated bucket start as unix micros."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(g).alias("grain"),
                F.unix_micros(F.date_trunc(g, F.col(ts_col))).alias("bucket_us"),
            )
            for g in grains
        ]
    )
    return (
        events.select(F.explode(pairs).alias("gb"), F.col(type_col).alias("event_type"))
        .groupBy("gb.grain", "gb.bucket_us", "event_type")
        .agg(F.count("*").alias("n_events"))
    )
