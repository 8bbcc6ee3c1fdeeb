"""JSONL source contract + parquet schema evolution."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from milan_telecom_etl__spark.sources.jsonl import read_jsonl, split_quarantine

JSONL = """{"doc_id": 1, "text": "hello world", "lang": "en"}
{"doc_id": 2, "text": "bonjour", "lang": "fr"}
not json at all
{"doc_id": 3, "text": "ciao", "lang": "it"}
"""

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(JSONL)
    df = read_jsonl(spark, str(p), SCHEMA)
    good, bad = split_quarantine(df)
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2, 3]
    assert bad.count() == 1
    assert "not json" in bad.collect()[0][0]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    base = str(tmp_path / "evolving")
    spark.range(0, 5).select(F.col("id").alias("k"), F.lit("old").alias("v")).write.parquet(
        base + "/batch=1"
    )
    # the next batch adds a column — old files must still read
    spark.range(5, 10).select(
        F.col("id").alias("k"), F.lit("new").alias("v"), (F.col("id") * 2).alias("extra")
    ).write.parquet(base + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"k", "v", "extra", "batch"}
    assert merged.count() == 10
    # rows from the pre-evolution batch surface NULL for the new column
    assert merged.filter(F.col("batch") == 1).filter(F.col("extra").isNull()).count() == 5
