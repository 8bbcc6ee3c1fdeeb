"""Observation-based metrics ride the consuming action (no extra scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from milan_telecom_etl__spark.listener import executor_snapshot, run_observed


def test_observed_metrics_match_data(spark):
    df = spark.range(0, 100).select(
        "id", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v")
    )
    run = run_observed(df, value_col="v")
    assert len(run.result) == 100
    assert run.metrics["n_rows"] == 100
    assert run.metrics["v_nulls"] == 10


def test_executor_snapshot_shape(spark):
    snap = executor_snapshot(spark)
    assert snap["default_parallelism"] >= 1
    assert "active_jobs" in snap and "active_stages" in snap
