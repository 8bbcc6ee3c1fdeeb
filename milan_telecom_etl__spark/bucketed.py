"""Bucketed warehouse tables — the index substitute, demonstrated.

SURVEY.md §4.2 maps the reference's B-tree indexes
(`src/database.py:115-117`: idx_traffic_time / idx_traffic_cell /
idx_traffic_composite) onto partitioning + bucketing. Partition
pruning has standing plan pins (P6); this module closes the other
half: a build-once BUCKETED copy of a fact table, hash-clustered and
sorted on its join key, so that every later join or aggregation ON
THAT KEY is exchange-free — the per-query shuffle of the largest
table is paid once at ingest, exactly like building the index.

Mechanics (and why they hold on a real cluster):
- The bucketed copy is written with `bucketBy(n, key).sortBy(key)`
  after a `repartition(n, key)`: Spark's bucket id is
  `pmod(murmur3(key), n)` — the same hash family repartition uses —
  so each write task holds exactly one bucket and emits ONE file per
  bucket. One file per bucket lets the scan report per-bucket sort
  order, so downstream sort-merge joins skip both the Exchange and
  (on the scan side) the Sort.
- Registration is catalog-based (`saveAsTable` external at a
  warehouse path). A FRESH session re-registers the existing files
  with `CREATE TABLE ... USING PARQUET CLUSTERED BY ... SORTED BY ...
  INTO n BUCKETS LOCATION path` — metadata-only, no rewrite. The
  build itself runs once per (corpus location, corpus fingerprint),
  same staleness discipline as `artifacts.py`.
- At 100 TB the same two statements run against an object store
  (the path is resolved through the Hadoop FileSystem, never
  os.path), with n sized so a bucket is a few hundred MB; 16 here
  matches local[32] testdata.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .artifacts import _fs_exists, artifact_root, corpus_fingerprint, loc_key
from .sources.parquet import load_table

N_BUCKETS = 16


def _table_name(sf_dir: str, table: str, key: str, n: int = N_BUCKETS) -> str:
    # identity = (corpus location, corpus fingerprint, table, key, n)
    # PLUS the artifact root: the catalog entry is keyed by this NAME
    # while the files live under the root, so a root change mid-session
    # (e.g. a test monkeypatching SPARK_GRAFT_ARTIFACTS) must miss the
    # catalog and rebuild instead of serving files under the old root
    # (r12 review). n is identity too — two widths of the same table
    # are two distinct physical layouts.
    loc = loc_key(sf_dir, extra=os.path.abspath(artifact_root()))
    return f"bkt_{loc}_{corpus_fingerprint(sf_dir, table)}_{table}_{key}_{n}"


def bucketed_table(
    spark: SparkSession, sf_dir: str, table: str, key: str, n: int = N_BUCKETS
) -> DataFrame:
    """Return `table` as a catalog-registered bucketed table clustered
    and sorted on `key` into `n` buckets, building the bucketed copy
    exactly once per (corpus, fingerprint) and re-registering existing
    files metadata-only in fresh sessions."""
    name = _table_name(sf_dir, table, key, n)
    if spark.catalog.tableExists(name):
        return spark.table(name)
    path = os.path.join(artifact_root(), "bucketed", name)
    if _fs_exists(spark, path):
        ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in spark.read.parquet(path).schema.fields
        )
        spark.sql(
            f"CREATE TABLE `{name}` ({ddl}) USING PARQUET "
            f"CLUSTERED BY (`{key}`) SORTED BY (`{key}`) INTO {n} BUCKETS "
            f"LOCATION '{path}'"
        )
    else:
        (
            load_table(spark, sf_dir, table)
            .repartition(n, key)
            .write.bucketBy(n, key)
            .sortBy(key)
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(name)
        )
    return spark.table(name)
