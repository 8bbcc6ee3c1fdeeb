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
        # Whole-stage-codegen cache sizing (VERDICT r8 #1): the default
        # generated-class cache holds 100 entries; a 224-entry registry
        # sweep compiles thousands of codegen units, so cross-entry (and
        # even within-entry, for wide plans) eviction forces Janino
        # recompilation and C2 re-JIT — measured as a broad +5..20% tail
        # that grows with registry size (PLANS.md "r8 drift root cause").
        # Static conf, so it must be set before the first session.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "4096"),
        )
        # The JVM's JIT code cache defaults to 240 MB; keeping thousands
        # of generated classes hot needs headroom or the JIT flushes /
        # stops compiling and everything degrades to interpreter speed.
        # APPEND to any driver options supplied via the environment
        # rather than replacing them (ADVICE r9 #5: a bare .config()
        # would clobber deployment-supplied JVM flags; note this — like
        # every driver JVM option — is ineffective when getOrCreate
        # attaches to an already-running context).
        .config(
            "spark.driver.extraJavaOptions",
            (
                os.environ.get("SPARK_DRIVER_OPTS", "").strip() + " "
                + "-XX:ReservedCodeCacheSize="
                + os.environ.get("SPARK_GRAFT_CODE_CACHE", "1g")
            ).strip(),
        )
        # driver-local testing niceties; harmless on a cluster
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
