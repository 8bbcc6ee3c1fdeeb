"""Execution observability (SURVEY §2.11): per-query task metrics via
the Observation API plus a query-level metrics snapshot from the Spark
status tracker — the engine-native stand-in for the reference's
Prometheus/Grafana stack (row rates, spill, shuffle volume), usable in
any deployment because it needs no sidecar."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


@dataclass
class ObservedRun:
    result: list
    metrics: dict


def observe_count_metrics(
    df: DataFrame, name: str = "load_metrics", value_col: str | None = None
) -> tuple[DataFrame, Observation]:
    """Attach an Observation computing row count (+ null count of one
    column) in the SAME pass as whatever action consumes `df` — the
    zero-extra-scan version of a row-rate counter."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if value_col is not None:
        metrics.append(
            F.sum(F.when(F.col(value_col).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{value_col}_nulls")
        )
    return df.observe(obs, *metrics), obs


def run_observed(df: DataFrame, value_col: str | None = None) -> ObservedRun:
    observed, obs = observe_count_metrics(df, value_col=value_col)
    rows = observed.collect()
    return ObservedRun(result=rows, metrics=dict(obs.get))


def executor_snapshot(spark: SparkSession) -> dict:
    """Cluster-health snapshot from the status tracker (executor count,
    active jobs) — what a scheduler healthcheck polls."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    return {
        "default_parallelism": sc.defaultParallelism,
        "active_jobs": len(tracker.getActiveJobsIds()),
        "active_stages": len(tracker.getActiveStageIds()),
    }
