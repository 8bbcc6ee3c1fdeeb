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

import math
import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# The spill lever as a sizing law (VERDICT r13 #6). The sf30 A/B
# (scripts/spill_ab.py, SCALE.md) measured that candidate-join spill is
# defaultParallelism-bound, not shuffle-width-bound: dp 32->128 at
# identical shuffle.partitions dropped spill 20x/90x at identical
# results. A real cluster moves this lever by construction (1000
# executors x cores); a fixed-core tier sweep must move it with DATA
# VOLUME instead, the same spirit as bucketed.derived_n_buckets. The
# divisor is ~64 MB of SOURCE bytes per task — conservative because the
# candidate-join family inflates input ~8x before the first shuffle
# (SCALE.md replicated-density law) — and reproduces both measured
# points: sf10 (1.8 GB) -> 32 (measured spill-free), sf30 (5.0 GB) ->
# 128 (the measured spill-free leg).
TARGET_DP_SOURCE_BYTES = 64 << 20


def derived_default_parallelism(tier_bytes: int, cores: int) -> int:
    """Data-volume-derived spark.default.parallelism for a scale tier,
    rounded to a power of two (stable under small corpus drift), never
    below the core count."""
    n = max(cores, math.ceil(tier_bytes / TARGET_DP_SOURCE_BYTES))
    return 1 << (n - 1).bit_length()


def tier_bytes(sf_dir: str) -> int:
    """Total bytes under a LOCAL tier directory (the scale scripts run
    against local dirs; a cluster derives dp from its executor count
    instead and never needs this)."""
    total = 0
    for root, _dirs, files in os.walk(sf_dir):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


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
