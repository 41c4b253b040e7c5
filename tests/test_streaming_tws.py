"""transformWithStateInPandas (Spark 4 stateful API) — stream equals batch.

transformWithState requires the RocksDB state store provider (a
runtime-settable conf) and the protobuf-based streaming Python runner.
Skips cleanly when either is unavailable (this container lacks
google.protobuf; the operator itself is exercised on deployments that
have it).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from iconic_data_science_spark.catalog import Catalog
from iconic_data_science_spark.session import get_spark
from iconic_data_science_spark.streaming import events as ev

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


@pytest.fixture(scope="module")
def tws_spark():
    try:
        from pyspark.sql.streaming.stateful_processor import StatefulProcessor  # noqa: F401
    except ImportError:
        pytest.skip("transformWithStateInPandas API not available")
    try:
        # the TWS streaming Python runner serializes state over protobuf;
        # without it the runner crashes at init (observed in this container)
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable — TWS python runner cannot start")
    s = get_spark(
        app_name="ids-spark-tws",
        shuffle_partitions=4,
        driver_memory="4g",
        extra_conf={"spark.sql.streaming.stateStore.providerClass": ROCKSDB},
    )
    s.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    yield s


def test_tws_running_totals_stream_equals_batch(tws_spark, sf_dir):
    spark = tws_spark
    stream = ev.running_user_totals_tws(ev.read_event_stream(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_tws")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.sql("SELECT * FROM t_tws")
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    want = (
        Catalog(spark, sf_dir)
        .events.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    assert list(got.user_id) == list(want.user_id)
    assert list(got.n_events) == list(want.n_events)
    pd.testing.assert_series_equal(
        got.total_value, want.total_value, rtol=1e-9, check_names=False
    )
