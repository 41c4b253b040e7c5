"""Numeric column expressions.

Two concerns live here:

1. **Deterministic aggregation discipline.** Floating-point ``SUM`` is
   order-dependent; on a cluster the combine order varies run to run, so
   two correct engines can disagree in the last ulps. Every summed double
   in an oracle-checked query goes through ``dec_sum``: cast each value to
   an exact DECIMAL, sum exactly (order-independent), cast the total back.
   This is also the right call at 100 TB — results become reproducible
   across partitionings and AQE re-plans.

2. **Defaulted casts** mirroring the reference's PERMISSIVE parsing where
   a malformed cell becomes 0, not null (``safeToInt/safeToLong/safeToDouble``,
   /root/reference/src/notebooks/scala/StaticNet.scala:51-55,82-85).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 digits, 4 fractional: exact for sums of ~1e9 values up to ~1e5 each.
DEC = "decimal(28,4)"


def dec_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM over a double column (exact decimal lattice).

    DuckDB-oracle equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def dec_avg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum / count, one IEEE division.

    DuckDB-oracle equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def safe_long(col: Column | str, default: int = 0) -> Column:
    """Cast-to-long with reference semantics: malformed → default, not null
    (StaticNet.scala:83-85)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("long"), F.lit(default))


def safe_double(col: Column | str, default: float = 0.0) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("double"), F.lit(default))
