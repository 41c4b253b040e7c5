"""Array-column helpers.

The reference zips two parallel ``collect_list`` results and relies on
their co-order (/root/reference/src/notebooks/scala/PersonalNet.scala:143-145,174)
— non-deterministic under Spark's unordered aggregation. The engine rule
(SURVEY.md §4.3): collect structs, sort the array, then project. These
helpers make that discipline one call.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def collect_sorted_list(*cols: Column | str, alias: str | None = None) -> Column:
    """Deterministic collect_list: ``array_sort(collect_list(struct(...)))``.

    With one column, yields a sorted array of values; with several, a
    sorted array of structs (sorted lexicographically by field order).
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    inner = cs[0] if len(cs) == 1 else F.struct(*cs)
    out = F.array_sort(F.collect_list(inner))
    return out.alias(alias) if alias else out


def flatten_distinct(col: Column | str, alias: str | None = None) -> Column:
    """Built-in replacement for the reference's flatten UDF
    (``udf((xs: Seq[Seq[Long]]) => xs.flatten.distinct)``,
    PersonalNet.scala:94; ProfileConversion.scala:61) — stays JVM-side.
    Sorted for determinism."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.array_sort(F.array_distinct(F.flatten(c)))
    return out.alias(alias) if alias else out
