"""Literal-collection expression builders that avoid py4j chatter.

Building a K-element literal array as ``F.array(*[F.lit(v) for v in vs])``
costs one py4j round trip per element (~1 ms each on this driver): a
2048-element literal costs about a second of serial driver time before
Spark ever sees the query, and the cost recurs on every query
construction (measured in tools/profile_bench.py: construction was ~half
the bench).  Rendering the same literal as ONE SQL string parsed
server-side costs ~2 ms for the same expression (a CreateArray /
CreateMap of foldable literals), so the optimized plan, the results, and
the oracle hashes are unchanged — only the driver-side build time drops.
This is guide §1.2/§7.3 territory: planning and expression construction
are single-threaded driver work and bound how fast the driver can issue
rounds of an iterative operator at any scale.

Value rendering is exact: integers print in full; doubles use Python's
shortest round-trip ``repr`` with a ``D`` suffix (Spark parses double
literals with Java's ``Double.parseDouble``, which round-trips shortest
decimal forms bit-exactly); strings escape backslash and quote.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_I32 = 2**31


def _long_sql(v) -> str:
    return f"{int(v)}L"


def _int_sql(v) -> str:
    v = int(v)
    # py4j promotes out-of-int32 python ints to java Long; mirror that
    return str(v) if -_I32 <= v < _I32 else f"{v}L"


def _double_sql(v) -> str:
    v = float(v)
    if v != v or v in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite literal: {v}")
    return f"{v!r}D"


def _string_sql(v) -> str:
    s = str(v).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{s}'"


def lit_longs(values) -> Column:
    """array<bigint> literal column, one server-side parse."""
    vals = list(values)
    if not vals:
        return F.expr("CAST(array() AS array<bigint>)")
    return F.expr("array(" + ",".join(_long_sql(v) for v in vals) + ")")


def lit_ints(values) -> Column:
    """array<int> literal column (elements out of int32 promote to long,
    matching ``F.array(*[F.lit(int(v))...])``)."""
    vals = list(values)
    if not vals:
        return F.expr("CAST(array() AS array<int>)")
    return F.expr("array(" + ",".join(_int_sql(v) for v in vals) + ")")


def lit_doubles(values) -> Column:
    """array<double> literal column, bit-exact element round-trip."""
    vals = list(values)
    if not vals:
        return F.expr("CAST(array() AS array<double>)")
    return F.expr("array(" + ",".join(_double_sql(v) for v in vals) + ")")


def lit_strings(values) -> Column:
    """array<string> literal column."""
    vals = list(values)
    if not vals:
        return F.expr("CAST(array() AS array<string>)")
    return F.expr("array(" + ",".join(_string_sql(v) for v in vals) + ")")


def lit_str_long_map(pairs) -> Column:
    """map<string,bigint> literal column from (key, value) pairs."""
    items = list(pairs)
    if not items:
        return F.expr("map()").cast("map<string,bigint>")
    body = ",".join(f"{_string_sql(k)},{_long_sql(v)}" for k, v in items)
    return F.expr(f"map({body})")
