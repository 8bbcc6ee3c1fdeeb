"""SparkSession factory with scale-oriented defaults.

The defaults here are chosen for the 100 TB / 1000-executor target and
merely *tested* on local[N]:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting —
  the reference's traffic data is heavy-tailed per SURVEY.md §6, and the
  same holds for any real CDR feed).
- Arrow on (every pandas-UDF boundary is Arrow-batched).
- Session timezone pinned to UTC — the reference feeds naive local
  strings into TIMESTAMPTZ columns (reference src/database.py:82); we fix
  UTC as the parity convention (SURVEY.md §7.4.5).
- shuffle.partitions left to the caller/env: tests use 32 (matching
  local[32]); a real cluster sets this (or relies on AQE's coalescing
  from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "milan_telecom_etl__spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # driver-local testing niceties; harmless on a cluster
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
