"""The 'UDFs are the slow path' rule, held to account: the engine's
built-in expressions must agree exactly with Arrow-batched pandas-UDF
reimplementations (which is what makes the fast path safe to prefer)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from iconic_data_science_spark.catalog import Catalog
from iconic_data_science_spark.operators.text import token_counts


def test_token_counts_builtin_equals_pandas_udf(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    builtin = {r.doc_id: (r.ws_tokens, r.re_tokens) for r in token_counts(docs).collect()}

    import re

    pattern = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 ]")

    @F.pandas_udf("long")
    def ws_udf(texts: pd.Series) -> pd.Series:
        return texts.str.lower().str.split(" ").str.len().astype("int64")

    @F.pandas_udf("long")
    def re_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: len(pattern.findall(t.lower()))).astype("int64")

    via_udf = {
        r.doc_id: (r.ws, r.re)
        for r in docs.select(
            "doc_id", ws_udf("text").alias("ws"), re_udf("text").alias("re")
        ).collect()
    }
    assert builtin == via_udf
