"""transformWithState (Spark 4 stateful API): per-key state survives
across micro-batches, RocksDB-backed."""

from __future__ import annotations

import pytest

from milan_telecom_etl__spark.streaming.stateful import running_totals_stream

# transformWithState ships state protos over protobuf; without a working
# google.protobuf the TWS driver worker crashes. Environment-gated, not
# logic-gated: the processor itself is plain pandas.
try:
    from google.protobuf import descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False


@pytest.mark.skipif(not _HAS_PROTOBUF, reason="google.protobuf unavailable")
def test_running_totals_accumulate_across_batches(spark, tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    (d / "b1.csv").write_text("user_id,value\n1,10.0\n1,5.0\n2,1.0\n")
    (d / "b2.csv").write_text("user_id,value\n1,7.0\n")
    import os

    os.utime(d / "b1.csv", (1000000000, 1000000000))
    os.utime(d / "b2.csv", (1000000100, 1000000100))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("header", True)
            .option("maxFilesPerTrigger", 1)
            .csv(str(d))
        )
        q = (
            running_totals_stream(stream)
            .writeStream.format("memory")
            .queryName("running_totals")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    rows = spark.table("running_totals").collect()
    # last emission per user reflects accumulated state: user 1 saw
    # batch1 (10+5) then batch2 (+7) -> n=3 total=22 max=10
    latest = {}
    for r in rows:  # memory sink appends per batch; later rows win
        latest[r.user_id] = (r.n, r.total, r.max_value)
    assert latest[1] == (3, 22.0, 10.0)
    assert latest[2] == (1, 1.0, 1.0)
