"""JSONL (newline-delimited JSON) source and sink — the de-facto
interchange format of LLM training-data pipelines (every public corpus
release — C4, The Pile, RedPajama, FineWeb — ships as compressed JSONL
of {"text": ..., "meta": ...} records).

The reference has no JSON I/O at all (its sources end at TSV/CSV,
magMap.scala:1-40); this extends the S-family for the training-data use
case. Design rules for 100 TB:

- **Never infer schema.** ``spark.read.json`` without a schema runs a
  full extra pass over the data just to guess types — at corpus scale
  that doubles the scan bill, and a single malformed line can flip a
  column to string. Schema is a required argument here (DDL string,
  Catalyst-parsed, like schemas.py's convention).
- **Malformed lines are data, not exceptions.** PERMISSIVE mode with a
  ``_corrupt_record`` column keeps bad lines (crawl output always has
  some) addressable for a quarantine sink instead of failing the job;
  ``read_jsonl(..., mode="FAILFAST")`` opts into hard failure for
  trusted inputs.
- One JSON record per line, no multiline: line-splittable files keep
  every input split independently parseable (multiline JSON forces
  whole-file parsing — one task per file, no parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON with an EXPLICIT schema (DDL
    string). ``keep_corrupt=True`` appends ``_corrupt_record`` so
    malformed lines survive as quarantine rows (all data columns null,
    the raw line in the corrupt column); otherwise malformed lines are
    dropped: we parse with a corrupt column and filter
    ``_corrupt_record IS NULL`` before projecting it away, so all-null
    ghost rows never reach downstream pipelines (PERMISSIVE still
    never fails the job).

    The drop path reads the file as text and parses via ``from_json``
    rather than the raw JSON source: Spark disallows plans whose only
    referenced data-source column is the internal corrupt record
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — e.g. a
    downstream ``.count()`` after column pruning), and the documented
    ``.cache()`` workaround is a non-starter at corpus scale. Text
    lines + ``from_json`` is the same single scan through the same
    Jackson parser, JVM-side, with no such restriction."""
    if mode.upper() == "FAILFAST" or keep_corrupt is False:
        if mode.upper() == "FAILFAST":
            return (
                spark.read.schema(schema)
                .option("mode", mode)
                .option("multiLine", "false")
                .json(path)
            )
        full = schema + f", {CORRUPT_COL} string"
        # from_json only supports PERMISSIVE/FAILFAST; DROPMALFORMED's
        # semantics are exactly what the corrupt-null filter below
        # implements, so normalize it rather than raising at analysis
        # time (the raw datasource path accepted it).
        parse_mode = "PERMISSIVE" if mode.upper() == "DROPMALFORMED" else mode
        parsed = (
            spark.read.text(path)
            # The JSON datasource skips blank lines; match it here —
            # from_json('') returns a NULL struct (corrupt col null
            # too), which would otherwise project an all-null ghost row.
            .filter(F.trim(F.col("value")) != "")
            .select(
                F.from_json(
                    F.col("value"),
                    full,
                    {"mode": parse_mode, "columnNameOfCorruptRecord": CORRUPT_COL},
                ).alias("r")
            )
        )
        return (
            parsed.filter(
                F.col("r").isNotNull() & F.col(f"r.{CORRUPT_COL}").isNull()
            )
            .select("r.*")
            .drop(CORRUPT_COL)
        )
    full = schema + f", {CORRUPT_COL} string"
    df = (
        spark.read.schema(full)
        .option("mode", mode)
        .option("multiLine", "false")
        .json(path)
    )
    return df


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line, one file per partition (the standard
    shard layout — downstream readers parallelize over shards)."""
    df.write.mode(mode).json(path)
