"""Derived views (A2-A3, SURVEY.md §2.5).

`v_hourly_traffic` (reference src/database.py:101-112): collapse the
(10-min, cell, countrycode) grain to (hour, cell) with per-metric SUMs
plus a total. In Spark this is a single hash aggregation with map-side
partial aggregation — the shuffle moves only (hour, cell) partial sums,
not raw rows, so at 100 TB the exchanged volume is bounded by
|hours| × |cells| × partitions, orders of magnitude below the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import TRAFFIC_METRICS


def hourly_traffic(fact_traffic: DataFrame) -> DataFrame:
    """A2: the hourly roll-up view (reference src/database.py:101-112)."""
    total = None
    for m in TRAFFIC_METRICS:
        total = F.col(m) if total is None else total + F.col(m)
    aggs = [F.sum(m).alias(f"total_{m}") for m in TRAFFIC_METRICS]
    aggs.append(F.sum(total).alias("total_activity"))  # A3 row-wise sum
    return fact_traffic.groupBy(
        F.date_trunc("hour", F.col("datetime")).alias("hour"),
        F.col("cell_id"),
    ).agg(*aggs)


def hourly_events(events: DataFrame) -> DataFrame:
    """The same roll-up shape over the driver's `events` stand-in table
    (FIXTURES.md §7: ts→datetime, user_id→cell_id, value→metric)."""
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("user_id").alias("cell_id"),
    ).agg(
        F.sum("value").alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
