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


def test_synthetic_datasource_deterministic_and_partition_invariant(spark):
    from milan_telecom_etl__spark.sources.synthetic import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    r8 = (
        spark.read.format("synthetic_events")
        .option("n_rows", 500)
        .option("n_partitions", 8)
        .load()
    )
    assert r8.count() == 500
    assert [f.name for f in r8.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value",
    ]
    # same dataset regardless of parallelism (cluster-size invariance)
    r3 = (
        spark.read.format("synthetic_events")
        .option("n_rows", 500)
        .option("n_partitions", 3)
        .load()
    )
    assert r8.exceptAll(r3).count() == 0 and r3.exceptAll(r8).count() == 0
    # distributed scan: the plan reports the requested input partitions
    assert r8.rdd.getNumPartitions() == 8


def test_orc_roundtrip(spark, tmp_path):
    # ORC sink/scan parity with parquet (built-in columnar alternative)
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "k long, s string, v double"
    )
    path = str(tmp_path / "t.orc")
    df.write.orc(path)
    back = spark.read.orc(path)
    assert {(r.k, r.s, r.v) for r in back.collect()} == {(1, "a", 1.5), (2, "b", 2.5)}


def test_synthetic_stream_source_microbatches(spark, tmp_path):
    """Streaming Python DataSource: offsets advance by rows_per_batch;
    availableNow drains exactly max_rows with no dupes (offset-defined
    batches regenerate identically on replay)."""
    from milan_telecom_etl__spark.sources.synthetic import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 40)
        .option("max_rows", 100)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()  # drains: offset stops advancing at max_rows
    q.stop()
    rows = spark.table("synth_stream").collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == list(range(100))  # complete, exactly-once
    # batch and stream generators agree row-for-row
    batch = (
        spark.read.format("synthetic_events")
        .option("n_rows", 100)
        .option("n_partitions", 4)
        .load()
    )
    assert batch.exceptAll(spark.table("synth_stream")).count() == 0


def test_expand_hourly_udtf_lateral_join(spark):
    from milan_telecom_etl__spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "2024-01-01 00:30:00", "2024-01-01 03:10:00")],
        "id long, s string, e string",
    ).createOrReplaceTempView("iv")
    rows = spark.sql(
        """
        SELECT id, h.hour_start, h.hour_index
        FROM iv, LATERAL expand_hourly(CAST(s AS timestamp), CAST(e AS timestamp)) h
        ORDER BY hour_index
        """
    ).collect()
    # 00:30 rounds up to 01:00; hours 01:00, 02:00, 03:00 are < 03:10
    assert [r.hour_start.hour for r in rows] == [1, 2, 3]
    assert [r.hour_index for r in rows] == [0, 1, 2]


def test_binaryfile_media_ingest(spark, tmp_path):
    """binaryFile → MEDIA shape: payloads intact, modality from
    extension, deterministic path-hash ids, and the size cap filters on
    file-length METADATA (oversized content never read)."""
    from milan_telecom_etl__spark.sources.binary import read_media_files

    (tmp_path / "a.png").write_bytes(b"\x89PNG-bytes-a")
    (tmp_path / "b.wav").write_bytes(b"RIFF-bytes-b")
    (tmp_path / "big.mp4").write_bytes(b"x" * 10_000)
    (tmp_path / "notes.txt").write_bytes(b"not media")

    df = read_media_files(spark, str(tmp_path), glob="*.{png,wav,mp4}", max_bytes=5_000)
    rows = {r["modality"]: r for r in df.collect()}
    assert set(rows) == {"image", "audio"}  # mp4 over cap, txt unglobbed
    assert bytes(rows["image"]["payload"]) == b"\x89PNG-bytes-a"
    assert rows["audio"]["n_bytes"] == 12
    # deterministic ids: same path → same id across reads
    again = {r["source_path"]: r["media_id"] for r in read_media_files(
        spark, str(tmp_path), glob="*.{png,wav,mp4}", max_bytes=5_000).collect()}
    assert all(again[r["source_path"]] == r["media_id"] for r in rows.values())
    # plumbs straight into the multimodal decode stage
    from milan_telecom_etl__spark.operators.multimodal import decode_media

    decoded = decode_media(df).collect()
    assert all(r["ok"] for r in decoded) and len(decoded) == 2


def test_table_row_count_and_schema_memo_match_spark(spark):
    """r15 optimization round: the footer-metadata row count the
    auto-sizing operators consume must equal count() on the freshly
    loaded table, and the memoized explicit-schema read must return
    exactly the schema inference would — for every testdata table the
    registry derives layout parameters from."""
    from milan_telecom_etl__spark.sources.parquet import (
        _SCHEMA_CACHE,
        load_table,
        table_row_count,
    )

    from milan_telecom_etl__spark.sources.parquet import _file_state_key

    sf = "/root/testdata/sf0.001"
    for name in ("documents", "embeddings", "events"):
        df = load_table(spark, sf, name)
        assert table_row_count(sf, name) == df.count(), name
        # the memo is populated now; a fresh inference must agree
        path = f"{sf}/{name}.parquet"
        cached = _SCHEMA_CACHE[_file_state_key(path)]
        assert spark.read.parquet(path).schema == cached, name


def test_table_row_count_and_schema_on_directory_tables(spark, tmp_path):
    """VERDICT r15 #3: at the 100 TB posture every table is a DIRECTORY
    of parquet parts — the footer row count must sum per-file footers
    (the tier_bytes_uncompressed pattern), the schema memo must read
    the directory layout, and both memos must invalidate when a part
    file changes."""
    import time

    from milan_telecom_etl__spark.sources.parquet import (
        _file_state_key,
        load_table,
        table_row_count,
    )

    sf_dir = str(tmp_path)
    tbl = tmp_path / "documents.parquet"
    spark.range(0, 137).selectExpr(
        "id AS doc_id", "concat('text-', id) AS text"
    ).repartition(4).write.parquet(str(tbl))
    parts = sorted(p for p in tbl.iterdir() if p.name.endswith(".parquet"))
    assert len(parts) > 1, "fixture must be a multi-file table"

    df = load_table(spark, sf_dir, "documents")
    assert table_row_count(sf_dir, "documents") == df.count() == 137

    # memo-invalidation pin: rewrite one part in place — the key must
    # change and the recomputed count must track the new contents
    import pyarrow as pa
    import pyarrow.parquet as pq

    key_before = _file_state_key(str(tbl))
    n_dropped = pq.ParquetFile(str(parts[0])).metadata.num_rows
    time.sleep(0.01)  # a distinguishable mtime_ns even on fast fs
    pq.write_table(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}),
        str(parts[0]),
    )
    assert _file_state_key(str(tbl)) != key_before
    assert table_row_count(sf_dir, "documents") == 137 - n_dropped
