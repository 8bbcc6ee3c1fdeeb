"""Stateful streaming sessionization: sessions close across micro-batch
boundaries when the inactivity gap is exceeded."""

from __future__ import annotations

import pytest

from milan_telecom_etl__spark.streaming.sessions import sessionize_stream


@pytest.fixture(scope="module")
def feed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sessions")
    # batch 1: two events 10 min apart (one open session for user 1)
    (d / "batch-1.csv").write_text(
        "ts,user_id,value\n"
        "2024-01-01 00:00:00,1,1.0\n"
        "2024-01-01 00:10:00,1,2.0\n"
    )
    # batch 2: 2h later → gap > 30 min closes session 1 (emitted);
    # the 02:00 event opens a new session that stays in state
    (d / "batch-2.csv").write_text(
        "ts,user_id,value\n"
        "2024-01-01 02:00:00,1,5.0\n"
    )
    # the file source orders batches by modification time — pin it so
    # batch-1 is processed first
    import os

    os.utime(d / "batch-1.csv", (1000000000, 1000000000))
    os.utime(d / "batch-2.csv", (1000000100, 1000000100))
    return str(d)


def test_sessions_close_across_batches(spark, feed_dir):
    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("header", True)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .csv(feed_dir)
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("closed_sessions").collect()
    assert len(rows) == 1  # exactly the batch-1 session, closed by batch 2
    s = rows[0]
    assert s["user_id"] == 1
    assert s["session_start"].isoformat() == "2024-01-01T00:00:00"
    assert s["session_end"].isoformat() == "2024-01-01T00:10:00"
    assert s["n_events"] == 2 and s["total_value"] == pytest.approx(3.0)
