"""Registry entries: temporal frames, argmax/mode, ordered collects,
date-part profiles, fuzzy string matching."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries_registry import register
from .sources.parquet import load_table


@register(
    "sliding_hour_avg",
    """
    SELECT event_id, user_id, ts,
           round(avg(value) OVER (
             PARTITION BY user_id
             ORDER BY date_diff('second', TIMESTAMP '1970-01-01', ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 6) AS avg_1h
    FROM events
    """,
    # integer seconds on BOTH sides: DuckDB epoch(ts) is fractional,
    # Spark cast(long) truncates — mixed precision shifts frame
    # membership at second boundaries (bit at sf0.1)
)
def q_sliding_hour_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based sliding window: per-user average over the trailing
    hour — a RANGE frame on epoch seconds (true event-time window, not
    row-count), one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id", "user_id", "ts", F.round(F.avg("value").over(w), 6).alias("avg_1h")
    )


@register(
    "user_top_type",
    """
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, event_type AS top_type, n AS top_n FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
      FROM c
    ) WHERE rk = 1
    """,
)
def q_user_top_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode per group (argmax with deterministic tiebreak): each user's
    most frequent event type via max_by on a (count, type) struct —
    two hash aggregations, no window, no sort."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    # argmax: max over struct(n, negated-type-rank) — to break count
    # ties toward the lexicographically FIRST type (matching the SQL's
    # ORDER BY n DESC, event_type), order by (n, reversed type) via a
    # struct of (n, negative ordinal) is messy; max_by with a struct key
    # (n, type) ties toward LAST type, so invert: min_by on (-n, type).
    best = F.min_by(
        F.struct(F.col("event_type").alias("t"), F.col("n").alias("n")),
        F.struct((-F.col("n")).alias("neg"), F.col("event_type").alias("t")),
    )
    return counts.groupBy("user_id").agg(best.alias("b")).select(
        "user_id", F.col("b.t").alias("top_type"), F.col("b.n").alias("top_n")
    )


@register(
    "user_type_set",
    """
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
    """,
)
def q_user_type_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct collect rendered as a string (engine-portable
    form of collect_set: sort + join ⇒ deterministic)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types"),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "weekday_hour_profile",
    """
    SELECT isodow(ts) AS weekday, CAST(hour(ts) AS INT) AS hour_of_day,
           count(*) AS n_events, round(avg(value), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def q_weekday_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction profile (ISO weekday × hour heatmap — the
    classic CDR traffic-shape query)."""
    ev = load_table(spark, sf_dir, "events")
    # Spark weekday(): 0=Monday; DuckDB isodow: 1=Monday
    return ev.groupBy(
        (F.weekday(F.col("ts")) + 1).cast("long").alias("weekday"),
        F.hour(F.col("ts")).alias("hour_of_day"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


@register(
    "fuzzy_name_match",
    """
    SELECT n_nationkey, n_name,
           CAST(levenshtein(n_name, 'NATION_1') AS BIGINT) AS dist
    FROM nation
    WHERE levenshtein(n_name, 'NATION_1') <= 2
    """,
)
def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (levenshtein — JVM builtin; the
    conform-stage tool for misspelled dimension keys)."""
    nation = load_table(spark, sf_dir, "nation")
    dist = F.levenshtein(F.col("n_name"), F.lit("NATION_1")).cast("long")
    return nation.select("n_nationkey", "n_name", dist.alias("dist")).filter(
        F.col("dist") <= 2
    )


@register(
    "keep_latest_per_user",
    """
    SELECT event_id, user_id, ts, round(value, 6) AS value FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
    ) WHERE rk = 1
    """,
)
def q_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style dedupe: the latest record per key (deterministic
    tiebreak on event_id) — the upsert-compaction every mutable-source
    ingest needs; one window shuffle on the key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("event_id", "user_id", "ts", F.round("value", 6).alias("value"))
    )


@register(
    "gap_fill_hourly",
    """
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
             sum(CAST(round(value * 1000000) AS BIGINT)) AS su
      FROM events GROUP BY 1, 2
    ), b AS (SELECT min(hour) AS mn, max(hour) AS mx FROM h),
    spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour FROM b),
    grid AS (SELECT hour, event_type FROM spine, (SELECT DISTINCT event_type FROM events))
    SELECT g.hour, g.event_type, CAST(coalesce(n, 0) AS BIGINT) AS n,
           round(last_value(su / (n * 1000000.0) IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled_avg
    FROM grid g LEFT JOIN h ON h.hour = g.hour AND h.event_type = g.event_type
    """,
)
def q_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: hourly per-type counts on a dense
    generated hour spine (missing hours appear as 0) with the hourly
    mean forward-filled across gaps — the resample+ffill step before
    any windowed feature. The spine is sequence()+explode off a 1-row
    bounds aggregate (no driver loop); the fact table is touched once,
    pre-aggregated, and only the tiny hourly table joins the spine."""
    ev = load_table(spark, sf_dir, "events")
    # The hourly mean is kept EXACT: sum integer micro-units (order-
    # insensitive in int64), divide once. A float avg() differs from the
    # oracle's by 1 ulp (summation order), and with thousands of small
    # hourly groups some mean always lands on a rounding boundary.
    h = ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("su"),
    )
    bounds = h.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("hour")
    )
    grid = spine.crossJoin(ev.select("event_type").distinct())
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(h, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.round(
                F.last(F.col("su") / (F.col("n") * 1000000.0), ignorenulls=True).over(w), 6
            ).alias("filled_avg"),
        )
    )


@register(
    "scd2_user_type_intervals",
    """
    WITH ch AS (
      SELECT user_id, event_type, ts, event_id FROM (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events)
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
    FROM ch
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 dimension build: collapse each user's event stream
    into validity intervals that start when the observed attribute
    changes (lag-compare) and end at the next change (lead), open-ended
    on the current value. Two windows over the same (user_id, ts) sort
    — Spark reuses the sort/exchange for both."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", "event_type", "ts", "event_id")
    )
    return ch.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )


@register(
    "transition_matrix",
    """
    WITH t AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    )
    SELECT from_type, to_type, count(*) AS n,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY from_type), 6) AS p
    FROM t WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys:
    P(next event type | current) from per-user lead() pairs — the
    sequence-mining profile behind funnel design. One window shuffle on
    user_id, then a tiny grouped ratio (integer counts divide exactly,
    so 6dp is stable)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = t.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    w_tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(w_tot), 6).alias("p"),
    )


@register(
    "rolling_median",
    """
    SELECT event_id, user_id, ts,
           round(quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
    FROM events
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-row median per user — robust smoothing (the median
    filter) as a windowed exact percentile. No summation-order hazard:
    a median interpolates the same two elements on any engine."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.expr("percentile(value, 0.5D)").over(w), 6).alias("med7"),
    )


@register(
    "scd2_user_state",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             IS NULL AS is_current
    FROM changes
    """,
)
def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from a change stream: collapse each
    user's event-type runs into effective-dated intervals
    (valid_from, valid_to, is_current) — the slowly-changing-dimension
    pattern every warehouse maintains. Two window passes on the SAME
    (user_id) partitioning — lag to detect attribute changes, lead to
    close each interval with the next one's start — so the whole build
    rides one exchange; NULL valid_to marks the open current row."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "event_type", F.col("ts").alias("valid_from"))
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )
