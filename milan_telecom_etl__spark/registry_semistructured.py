"""Registry entries: semi-structured data, skew-safe aggregation,
subqueries, cumulative windows, sketches.

`events.props` is a JSON string column — the CDR-world analog of
vendor-specific attachment blobs; these operators make it queryable
without a schema migration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries_registry import register
from .sources.parquet import load_table


@register(
    "json_extract_props",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from a string column (get_json_object —
    JVM-side, no parse-to-struct materialization)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select("event_id", k.alias("k_value")).filter(F.col("k_value").isNotNull())


@register(
    "json_k_histogram",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n, round(sum(value), 6) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def q_json_k_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate keyed on an extracted JSON field — pushdown-friendly
    (the JSON path evaluates in the scan stage projection)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy((k % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value")
    )


@register(
    "salted_type_totals",
    """
    SELECT event_type, count(*) AS n_events, round(sum(value), 6) AS total_value
    FROM events GROUP BY event_type
    """,
)
def q_salted_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: only 5 distinct event_type keys
    exist, so a naive groupBy lands all 100 TB on 5 reducers. Salt the
    key (16-way), partially aggregate (key, salt), then merge partials
    per key — identical results (the oracle is the plain GROUP BY),
    shuffle load spread 16×. AQE's skew handling covers joins; salting
    covers single-hot-key aggregations."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("__salt", (F.col("event_id") % 16).cast("int"))
    partial = salted.groupBy("event_type", "__salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("value").alias("pv")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"), F.round(F.sum("pv"), 6).alias("total_value")
    )


@register(
    "above_avg_balance",
    """
    SELECT c_custkey, c_name, round(c_acctbal, 6) AS c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def q_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: customers above the mean balance. Spark
    plans the scalar agg as a broadcast single-row join — two passes
    over a dimension, no shuffle of the probe side."""
    cust = load_table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("__cust_tmp")
    return spark.sql(
        """
        SELECT c_custkey, c_name, round(c_acctbal, 6) AS c_acctbal
        FROM __cust_tmp
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM __cust_tmp)
        """
    )


@register(
    "running_user_totals",
    """
    SELECT event_id, user_id, ts,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING), 6) AS running_value,
           CAST(row_number() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS event_seq
    FROM events
    """,
)
def q_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user totals + event sequence — the running-balance
    window pattern; single shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 6).alias(
            "running_value"
        ),
        F.row_number().over(w).cast("long").alias("event_seq"),
    )


# Sketch-based distinct counting: HLL implementations differ between
# engines, so the ESTIMATE can't value-match an oracle — instead this is
# a bracket oracle (VERDICT r1 #2): the query emits the exact count plus
# a boolean asserting the HLL++ estimate landed within 3·rsd of it; the
# oracle emits the exact count and TRUE. An out-of-bound estimate
# hash-mismatches and fails the gate. (The exact count here exists to
# *verify the estimator* — production profiling runs only the sketch.)
@register(
    "approx_distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS within_3rsd
    FROM events GROUP BY event_type
    """,
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=0.02) per event_type —
    the constant-memory distinct-count for 100 TB cardinality profiling —
    bracket-checked against the exact count (|est-exact| ≤ 3·rsd·exact,
    the standard ±3σ HLL guarantee, +1 for integer-rounding slack)."""
    ev = load_table(spark, sf_dir, "events")
    est = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.count_distinct("user_id")
    return ev.groupBy("event_type").agg(
        exact.alias("exact_users"),
        (F.abs(est - exact) <= 3 * 0.02 * exact + 1).alias("within_3rsd"),
    )


@register(
    "variant_props_stats",
    """
    SELECT event_type,
           count(*) AS n_with_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)
             AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def q_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured via the Spark 4 VARIANT type: parse_json once
    into the binary variant encoding, then variant_get path extraction
    — the open-format answer to schema-on-read (unlike get_json_object,
    the variant parse is amortized across any number of path reads, and
    the binary form is shreddable to parquet). Oracle is the plain
    JSON-string path — proving variant extraction reads the same
    values."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_with_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


# Sketch MERGEABILITY — the property that makes sketches the 100 TB
# distinct-count answer: per-day partial sketches (tiny standing
# aggregates, one write at ingest) union into the corpus-wide count
# without ever re-scanning history. Same bracket-oracle discipline as
# approx_distinct_users: estimates can't value-match across engines,
# so the query emits the exact count plus booleans asserting BOTH the
# merged-partials estimate and the direct one-pass estimate land
# within the sketch's ±4·RSE bracket (3·RSE is only ~99.7%
# per estimate — see q_hll_partial_merge's docstring).
HLL_LG_K = 14  # DataSketches HLL: RSE = 1.04 / sqrt(2^lgK) ≈ 0.81%


@register(
    "hll_partial_merge",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS merged_within_4rse,
           TRUE AS direct_within_4rse
    FROM events GROUP BY event_type
    """,
)
def q_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregated distinct counting: hll_sketch_agg per (event_type,
    day) — the partials a 100 TB pipeline persists at ingest — then
    hll_union_agg across days reconstitutes the global per-type
    distinct-user estimate. The direct single-pass sketch and the exact
    count ride the same query only to VERIFY the estimator (production
    keeps just the partials). Bracket: |est − exact| ≤ 4·RSE·exact + 1
    for both paths (RSE = 1.04/√2^lgK, the DataSketches HLL bound).
    4·RSE, not 3: the bound is PROBABILISTIC (≈99.7% per estimate at
    3·RSE under the normal approximation), and this oracle hardcodes
    TRUE — with 2 checks × |types| rows × several SF tiers, a
    regenerated corpus could legitimately land one type outside 3·RSE
    (ADVICE r12 #2). At 4·RSE the per-estimate miss odds are ~1e-4-ish;
    if a bracket failure ever shows up, triage is re-tune-the-bound
    (widen or re-seed), not engine bug.

    Scale notes: the day-grain partial table is |types|×|days| rows of
    ≤2^lgK bytes each — the merge job's input is KILOBYTES regardless
    of corpus size, and appending a day updates the global count
    without touching prior days (the reason approx_count_distinct
    alone — one monolithic pass — is NOT the production posture)."""
    ev = load_table(spark, sf_dir, "events")
    partials = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", HLL_LG_K).alias("sk")
    )
    merged = partials.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", HLL_LG_K)).alias(
            "direct_est"
        ),
        F.count_distinct("user_id").alias("exact_users"),
    )
    bound = 4 * (1.04 / (2**HLL_LG_K) ** 0.5) * F.col("exact_users") + 1
    return direct.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (F.abs(F.col("merged_est") - F.col("exact_users")) <= bound).alias(
            "merged_within_4rse"
        ),
        (F.abs(F.col("direct_est") - F.col("exact_users")) <= bound).alias(
            "direct_within_4rse"
        ),
    )


@register(
    "hll_partial_append_serving",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS merged_within_4rse
    FROM events GROUP BY event_type
    """,
)
def q_hll_partial_append_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`hll_partial_merge`'s partials as a STANDING APPEND-ONLY store
    (VERDICT r13 #5's ingest posture applied to mergeable aggregates):
    per-(event_type, day, source-batch) HLL sketches persist in a
    per-file-manifested warehouse artifact
    (`artifacts.load_or_append_partials`) — when new event files land,
    ONLY their rows are sketched and their partial rows appended
    beside history; prior partials are never recomputed or rewritten.
    Query time is `hll_union_agg` over the partial table (kilobytes
    regardless of corpus size — mergeability makes the result
    identical to one-shot partials whatever the refresh history,
    pinned against a physically grown corpus in tests). The exact
    count rides the query only to VERIFY the estimator inside the
    4-RSE bracket (same oracle discipline as `hll_partial_merge`).
    At 100 TB this is the distinct-counting ingest loop: sketch the
    arriving batch, append kilobytes, serve global counts without
    re-scanning history."""
    from .artifacts import load_or_append_partials
    from .sources.parquet import adapt_table

    def build(raw: DataFrame) -> DataFrame:
        ev = adapt_table(raw, "events")
        return ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.hll_sketch_agg("user_id", HLL_LG_K).alias("sk")
        )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    partials = load_or_append_partials(
        spark, sf_dir, f"hll_user_partials_lgk{HLL_LG_K}", build, table="events"
    )
    merged = partials.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    bound = 4 * (1.04 / (2**HLL_LG_K) ** 0.5) * F.col("exact_users") + 1
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (F.abs(F.col("merged_est") - F.col("exact_users")) <= bound).alias(
            "merged_within_4rse"
        ),
    )
