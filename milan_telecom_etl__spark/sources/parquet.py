"""Parquet sources — the engine's warehouse format.

Columnar scan + predicate pushdown + column pruning come free; at scale
the fact tables are written partitioned by date (see pipeline.py), so a
time-range predicate (P6) becomes partition pruning — the Spark
substitute for the reference's B-tree time index
(reference src/database.py:115; SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Event-time columns whose parquet physical type has varied across
# driver testdata generations: TIMESTAMP(NANOS) (Spark only reads as
# long under spark.sql.legacy.parquet.nanosAsLong) through round 4,
# TIMESTAMP(MICROS) isAdjustedToUTC=false (Spark 4 infers
# TIMESTAMP_NTZ) since round 5. Either way the engine normalizes to
# session-TZ TIMESTAMP with the session pinned to UTC (the parity
# convention, SURVEY.md §7.4.5) so downstream `cast(ts as bigint)`
# epoch math works and the wall-clock matches the oracle's naive read:
# - long nanos → floor ns→µs (same truncation DuckDB applies fetching
#   TIMESTAMP_NS) → timestamp_micros
# - TIMESTAMP_NTZ → cast to TIMESTAMP (interpreted in the UTC session
#   TZ, so the wall-clock is preserved bit-for-bit)
_EVENT_TS_COLS = {"events": ["ts"]}


def adapt_table(df: DataFrame, name: str) -> DataFrame:
    """The per-table physical-type normalization load_table applies —
    exposed so callers that read a SUBSET of a table's files directly
    (the append-only partials/index paths) get identical semantics."""
    for c in _EVENT_TS_COLS.get(name, []):
        if isinstance(df.schema[c].dataType, T.LongType):
            # `div` = integer division: ns/1000 as a double would lose
            # precision (epoch-ns ≈ 1.7e18 > 2^53) and round µs up.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(df.schema[c].dataType, T.TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


# Inferred-schema memo keyed on (path, mtime, size): re-inferring a
# table's schema re-reads parquet footers on EVERY DataFrame build —
# measured ~130 ms per load_table call at sf0.1 vs ~25 ms with an
# explicit schema (r15 optimization round), and a full 254-entry bench
# sweep builds each entry 4x (warmup + median-of-3), so inference was
# tens of seconds of pure metadata re-reads per sweep. At cluster scale
# the same applies against object storage (a footer round-trip per
# query per table). The memo holds SCHEMAS (metadata), never data or
# results; the mtime+size key drops it the moment a file changes; and
# it is per-process, so every bench/oracle invocation still derives
# everything from the parquet inputs. The first read per (file state)
# infers under the same session confs load_table always sets, so the
# memoized schema is exactly what inference would return (long for
# TIMESTAMP(NANOS) under nanosAsLong, TIMESTAMP_NTZ for MICROS).
_SCHEMA_CACHE: dict[tuple[str, float, int], T.StructType] = {}


_ROW_COUNT_CACHE: dict[tuple[str, float, int], int] = {}


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a testdata table from parquet FOOTER metadata
    (memoized per file state) — identical by construction to
    `load_table(spark, sf_dir, name).count()` (plain parquet: footer
    num_rows is exact, there are no deletes), without paying a Spark
    job per call. The auto-sizing operators (LSH plane counts, semdedup
    k) derive layout parameters from the raw table's cardinality; at
    sf0.1 each such count() job measured ~0.4-0.66 s WARM, paid on
    every bench rep of every auto entry (r15 optimization round). At
    cluster scale the equivalent is deriving from catalog/footer
    statistics instead of scanning. Pinned equal to count() in
    tests/test_sources_parquet.py."""
    path = f"{sf_dir}/{name}.parquet"
    st = os.stat(path)
    key = (path, st.st_mtime, st.st_size)
    n = _ROW_COUNT_CACHE.get(key)
    if n is None:
        import pyarrow.parquet as pq

        n = pq.ParquetFile(path).metadata.num_rows
        _ROW_COUNT_CACHE[key] = n
    return n


def _parquet_schema(spark: SparkSession, path: str) -> T.StructType:
    st = os.stat(path)
    key = (path, st.st_mtime, st.st_size)
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        sch = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = sch
    return sch


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    return adapt_table(
        spark.read.schema(_parquet_schema(spark, path)).parquet(path), name
    )


# last-registered sf_dir per session (app id) — re-registering on every
# SQL-front-door call re-reads 10 parquet footers per run, the fixed
# ~0.3 s that made top_cells_sql ~2x the DataFrame flagship (VERDICT
# r8 #8). Tracking the LAST dir (not a seen-set) keeps alternating
# sf_dirs within one session (scale_bench's small/big pattern) correct:
# any dir change re-registers.
_REGISTERED: dict[str, str] = {}


def register_testdata(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, force: bool = False
) -> None:
    """Register every testdata parquet as a temp view (same names DuckDB
    pre-registers for the oracle). Idempotent while the session's
    registered sf_dir is unchanged (repeat calls are a dict lookup) —
    pass force=True after dropping views manually."""
    app = spark.sparkContext.applicationId
    if not force and _REGISTERED.get(app) == sf_dir:
        return
    for name in TESTDATA_TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _REGISTERED[app] = sf_dir
