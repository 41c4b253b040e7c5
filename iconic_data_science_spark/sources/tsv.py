"""MAG-style TSV/CSV readers (S1-S4) with the reference's parsing semantics.

Reader variants in the reference:
  S1 — schema'd TSV: ``option("delimiter","\\t").schema(st).csv(path)``
       (/root/reference/src/scala/utils/SparkUtils.scala:10-15,
       SetUpEnv.scala:60-65);
  S3 — raw text + manual ``split("\\t",-1)`` + trim + defaulted casts
       (StaticNet.scala:51-55,82-85) — malformed numeric cells become 0,
       not null (PERMISSIVE-with-defaults);
  S4 — all-string CSV, cast later (PySparkles.ipynb cell 7-8).

At scale S1 is the right default (Spark's CSV reader is vectorized and
prunes columns at parse); S3 exists for files too dirty for the CSV
parser and is expressed as split+transform built-ins, not an RDD map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.numeric import safe_double, safe_long


def read_tsv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    delimiter: str = "\t",
) -> DataFrame:
    """S1: schema'd delimited read (PERMISSIVE — malformed cells → null)."""
    return (
        spark.read.option("delimiter", delimiter)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(path)
    )


def read_tsv_all_string(
    spark: SparkSession, path: str, header: bool = True, delimiter: str = "\t"
) -> DataFrame:
    """S4: strings-first read, casting deferred to the caller."""
    return (
        spark.read.option("delimiter", delimiter)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_raw_split(
    spark: SparkSession, path: str, schema: T.StructType | str, delimiter: str = "\t"
) -> DataFrame:
    """S3: text → split(delim, -1) → trim → defaulted casts.

    Reference semantics preserved: a malformed numeric cell becomes 0
    (``safeToInt/safeToLong/safeToDouble``, StaticNet.scala:83-85), a
    missing trailing field becomes null for strings / 0 for numerics.
    """
    st = T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    parts = F.split(F.col("value"), delimiter, -1)
    cols = []
    for i, field in enumerate(st.fields):
        raw = F.trim(F.element_at(parts, i + 1))
        if isinstance(field.dataType, (T.LongType, T.IntegerType)):
            c = safe_long(raw).cast(field.dataType)
        elif isinstance(field.dataType, (T.DoubleType, T.FloatType)):
            c = safe_double(raw).cast(field.dataType)
        elif isinstance(field.dataType, T.DateType):
            c = F.to_date(raw)
        else:
            c = raw.cast(field.dataType)
        cols.append(c.alias(field.name))
    return spark.read.text(path).select(*cols)
