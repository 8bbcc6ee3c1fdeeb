"""JSON-lines source — the interchange format of web-scale text
corpora (one document per line). Explicit schema always: schema
inference reads the data twice and guesses wrong on empty batches;
a 100 TB crawl read is one pass with a declared contract.

Unparseable lines land in `_corrupt_record` (PERMISSIVE mode) instead
of failing the job — the quarantine column is part of the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession,
    path_glob: str,
    schema: T.StructType,
    quarantine: bool = True,
) -> DataFrame:
    reader = spark.read.schema(
        schema.add("_corrupt_record", T.StringType()) if quarantine else schema
    )
    return reader.option("mode", "PERMISSIVE").json(path_glob)


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows, quarantined raw lines). The cache() is required:
    Spark refuses to answer queries that project ONLY `_corrupt_record`
    from a raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN) — materializing the parsed batch first is the
    documented contract, and the ingest pipeline wants the batch
    materialized anyway before double-reading good + bad splits."""
    df = df.cache()
    bad = df.filter(df["_corrupt_record"].isNotNull()).select("_corrupt_record")
    good = df.filter(df["_corrupt_record"].isNull()).drop("_corrupt_record")
    return good, bad
