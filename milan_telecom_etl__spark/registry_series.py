"""Registry entries: time-series analytics over the event stream —
trend regression, rolling anomaly detection, time-weighted averages,
and weighted moving smoothing.

Everything is built-in window/aggregate composition (JVM-side, fully
codegen'd): OLS trends use the SQL-standard ``regr_*`` aggregate family
(one hash-agg pass, map-side partial), anomaly z-scores and WMA use
bounded ROWS frames (constant state per partition at any scale), and
the time-weighted mean is a lag/lead + one agg — no UDF anywhere.

Epoch arithmetic is integer microseconds on both engines
(Spark ``unix_micros`` ≡ DuckDB ``epoch_us``) so frame membership and
weights match exactly across engines (see SURVEY.md §7.4.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries_registry import register
from .sources.parquet import load_table

# epoch microseconds of 2024-01-01 00:00:00 UTC — centering constant for
# the OLS x-axis (well-conditioned small numbers instead of epoch-scale
# magnitudes, which would make slope/intercept numerically unstable).
_T0_US = 1_704_067_200 * 1_000_000


@register(
    "regr_value_trend",
    f"""
    SELECT event_type,
           round(regr_slope(value, (epoch_us(ts) - {_T0_US}) / 86400e6), 6)
             AS slope_per_day,
           round(regr_intercept(value, (epoch_us(ts) - {_T0_US}) / 86400e6), 6)
             AS intercept,
           round(regr_r2(value, (epoch_us(ts) - {_T0_US}) / 86400e6), 6) AS r2,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_regr_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS trend (slope / intercept / R²) via the SQL-standard
    regr_* aggregates — a single hash aggregation with map-side partials
    (each partition reduces to 6 moments per group; no data movement
    beyond k·|groups| rows). The x-axis is days since a fixed origin so
    the normal equations stay well-conditioned."""
    ev = load_table(spark, sf_dir, "events")
    x = (F.unix_micros("ts") - F.lit(_T0_US)) / F.lit(86400e6)
    return ev.groupBy("event_type").agg(
        F.round(F.regr_slope("value", x), 6).alias("slope_per_day"),
        F.round(F.regr_intercept("value", x), 6).alias("intercept"),
        F.round(F.regr_r2("value", x), 6).alias("r2"),
        F.count(F.lit(1)).alias("n"),
    )


_HOURLY_CTE = """
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             round(sum(value), 6) AS total
      FROM events GROUP BY 1, 2
    )
"""


@register(
    "rolling_zscore_anomalies",
    f"""
    WITH {_HOURLY_CTE},
    scored AS (
      SELECT event_type, h, total,
             avg(total) OVER w AS mu,
             stddev_samp(total) OVER w AS sd,
             count(*) OVER w AS n_hist
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, h, total, round((total - mu) / sd, 6) AS z
    FROM scored
    WHERE n_hist >= 12 AND sd > 0 AND round(abs((total - mu) / sd), 6) > 2
    """,
)
def q_rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detector: hourly per-series totals scored
    against the trailing 24-hour mean/stddev (frame excludes the current
    row so an outlier can't mask itself). Bounded ROWS frame ⇒ O(1)
    window state per partition regardless of history length; the only
    shuffle is the hash-agg to hourly grain + one window sort per
    series. The |z| threshold compares the ROUNDED score on both engines
    so the cut is deterministic across float summation orders."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.sum("value"), 6).alias("total"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    scored = hourly.select(
        "event_type",
        "h",
        "total",
        F.avg("total").over(w).alias("mu"),
        F.stddev_samp("total").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_hist"),
    )
    z = (F.col("total") - F.col("mu")) / F.col("sd")
    return (
        scored.filter(
            (F.col("n_hist") >= 12)
            & (F.col("sd") > 0)
            & (F.round(F.abs(z), 6) > 2)
        )
        .select("event_type", "h", "total", F.round(z, 6).alias("z"))
    )


@register(
    "time_weighted_avg",
    """
    WITH spans AS (
      SELECT user_id, value,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) - epoch_us(ts) AS dt_us
      FROM events
    )
    SELECT user_id,
           round(sum(value * dt_us) / sum(dt_us), 6) AS tw_avg,
           count(*) AS n_spans
    FROM spans WHERE dt_us IS NOT NULL
    GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted mean per user: each reading is held until the next
    event, so its weight is the span length (exact integer microseconds;
    ties broken by event_id for a deterministic lead). One shuffle on
    user_id serves both the window and the final aggregation — Spark
    reuses the partitioning, so no second exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    spans = ev.select(
        "user_id", "value", (F.lead(us).over(w) - us).alias("dt_us")
    ).filter(F.col("dt_us").isNotNull())
    return spans.groupBy("user_id").agg(
        F.round(F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6).alias(
            "tw_avg"
        ),
        F.count(F.lit(1)).alias("n_spans"),
    )


@register(
    "wma_trailing",
    f"""
    WITH {_HOURLY_CTE},
    seq AS (
      SELECT event_type, h, total,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hourly
    ),
    sums AS (
      SELECT event_type, h, rn,
             sum(total) OVER w AS s0,
             sum(rn * total) OVER w AS s1,
             count(*) OVER w AS c,
             sum(rn) OVER w AS sr
      FROM seq
      WINDOW w AS (PARTITION BY event_type ORDER BY rn
                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, h,
           round(((24 - rn) * s0 + s1) / ((24 - rn) * c + sr), 6) AS wma_24h
    FROM sums
    """,
)
def q_wma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted trailing moving average (most recent hour
    weighted 24, oldest 1) computed WITHOUT per-offset weights: since
    the weight of row i inside the frame is K - (rn_cur - rn_i), the
    weighted sum decomposes into (K - rn_cur)·Σx + Σ(rn·x) — four plain
    window SUMs over a bounded ROWS frame. This is the standard trick
    for making position-dependent weights associative, i.e. computable
    with O(1) state in one pass (and the same algebra both engines run
    bit-identically)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.sum("value"), 6).alias("total"))
    wn = Window.partitionBy("event_type").orderBy("h")
    seq = hourly.select(
        "event_type", "h", "total", F.row_number().over(wn).alias("rn")
    )
    wf = Window.partitionBy("event_type").orderBy("rn").rowsBetween(-23, 0)
    sums = seq.select(
        "event_type",
        "h",
        "rn",
        F.sum("total").over(wf).alias("s0"),
        F.sum(F.col("rn") * F.col("total")).over(wf).alias("s1"),
        F.count(F.lit(1)).over(wf).alias("c"),
        F.sum("rn").over(wf).alias("sr"),
    )
    k = F.lit(24)
    num = (k - F.col("rn")) * F.col("s0") + F.col("s1")
    den = (k - F.col("rn")) * F.col("c") + F.col("sr")
    return sums.select("event_type", "h", F.round(num / den, 6).alias("wma_24h"))


@register(
    "gap_percentiles",
    """
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY event_type, user_id ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    )
    SELECT event_type, count(*) AS n_gaps,
           round(quantile_cont(gap_us / 1e6, 0.5), 6) AS p50_s,
           round(quantile_cont(gap_us / 1e6, 0.9), 6) AS p90_s,
           round(quantile_cont(gap_us / 1e6, 0.99), 6) AS p99_s
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def q_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap distribution per series (lag over exact µs,
    then exact interpolated percentiles). The lag window and the
    aggregation both key on (event_type, user_id)-derived columns, and
    the gap table is orders of magnitude smaller than raw events by the
    time it aggregates. At 100 TB swap percentile → approx_percentile
    (t-digest) for a single-pass sketch."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = ev.select(
        "event_type", ((us - F.lag(us).over(w)) / F.lit(1e6)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(gap_s, 0.9)"), 6).alias("p90_s"),
        F.round(F.expr("percentile(gap_s, 0.99)"), 6).alias("p99_s"),
    )


_REGR_SQL = f"""
    SELECT event_type,
           round(regr_slope(value, (epoch_us(ts) - {_T0_US}) / 86400e6), 6)
             AS slope_per_day,
           round(regr_intercept(value, (epoch_us(ts) - {_T0_US}) / 86400e6), 6)
             AS intercept,
           count(*) AS n
    FROM events GROUP BY event_type
"""


@register("regr_trend_pandas", _REGR_SQL)
def q_regr_trend_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same OLS trend as `regr_value_trend`, but through the Arrow
    grouped-map path (`applyInPandas` + numpy closed form) — the shape
    for per-group model fits the built-in aggregates CAN'T express
    (think per-series ARIMA/changepoint/robust fits). Each group
    arrives as one pandas frame over Arrow; the kernel is vectorized
    numpy, never per-row Python. Oracle-checked against the SQL
    regr_* family, proving the Arrow path computes exactly what the
    JVM does. Skew note: one group = one task; for heavy-tailed group
    sizes pre-aggregate or salt before the grouped map."""
    import pandas as pd  # noqa: F401 (arrow path)

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        ((F.unix_micros("ts") - F.lit(_T0_US)) / F.lit(86400e6)).alias("x"),
        F.col("value").alias("y"),
    )

    def fit(pdf):
        import numpy as np
        import pandas as pd

        x, y = pdf["x"].to_numpy(), pdf["y"].to_numpy()
        xm, ym = x.mean(), y.mean()
        cov = ((x - xm) * (y - ym)).sum()
        var = ((x - xm) ** 2).sum()
        slope = cov / var
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "slope_per_day": [round(slope, 6)],
                "intercept": [round(ym - slope * xm, 6)],
                "n": [len(pdf)],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        fit, "event_type string, slope_per_day double, intercept double, n long"
    )


@register(
    "sliding_window_counts",
    """
    WITH e AS (
      SELECT event_type, value,
             TIMESTAMP '1970-01-01'
               + to_seconds((epoch_us(ts) // 900000000) * 900) AS w0
      FROM events),
    x AS (
      SELECT event_type, value, w0 - to_seconds(k * 900) AS w_start
      FROM e, UNNEST([0, 1, 2, 3]) AS t(k))
    SELECT event_type, w_start, count(*) AS n, round(sum(value), 6) AS total
    FROM x GROUP BY event_type, w_start
    """,
)
def q_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True sliding event-time windows (1 h length, 15 min hop) via the
    built-in `window()` generator — each event lands in exactly 4
    aligned windows (Expand: the fan-out happens inside the scan stage,
    then one hash-agg on (type, window)). This is the batch twin of the
    streaming sliding-window aggregation; the oracle derives the same 4
    window starts arithmetically. At 100 TB note the 4× row fan-out is
    map-side only — partial aggregation collapses it before the
    exchange."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .select("event_type", F.col("w.start").alias("w_start"), "n", "total")
    )


@register(
    "rolling_7d_active_users",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events),
    contrib AS (
      SELECT DISTINCT user_id, d + k AS obs_day
      FROM ud, UNNEST([0, 1, 2, 3, 4, 5, 6]) AS t(k)),
    days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS obs_day
             FROM events)
    SELECT c.obs_day, count(DISTINCT c.user_id) AS wau
    FROM contrib c JOIN days USING (obs_day)
    GROUP BY c.obs_day
    """,
)
def q_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU per day): rolling COUNT DISTINCT
    has no window form, so each (user, day) pair fans out to the ≤7
    observation days it contributes to — bounded Expand, then one
    distinct-agg keyed (day, user). The fan-out happens on the
    user-day GRAIN (already deduped), not raw events: 100 TB of events
    first collapses to |users|×|days| pairs. Restricted to days that
    exist in the data (join with the observed-day set) so the tail
    beyond the last day isn't reported."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    contrib = (
        ud.select(
            "user_id",
            F.explode(
                F.transform(F.sequence(F.lit(0), F.lit(6)), lambda k: F.date_add("d", k))
            ).alias("obs_day"),
        )
        .distinct()
    )
    days = ev.select(F.to_date(F.date_trunc("day", "ts")).alias("obs_day")).distinct()
    return (
        contrib.join(days, "obs_day")
        .groupBy("obs_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


@register(
    "user_gap_stats_arrow",
    """
    SELECT user_id, count(*) AS n_events,
           CAST(max(us) - min(us) AS BIGINT) AS span_us,
           CAST(max(gap) AS BIGINT) AS max_gap_us
    FROM (
      SELECT user_id, epoch_us(ts) AS us,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts) AS gap
      FROM events)
    GROUP BY user_id
    """,
)
def q_user_gap_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().applyInArrow sequence features (VERDICT r1 #9): each
    user's events arrive as ONE pyarrow Table, a numpy kernel
    sorts/diffs the timestamps, exact integer µs out — zero pandas,
    zero per-row Python, one shuffle on user_id. The oracle recomputes
    the same integers with a lag window (adjacent-diff multisets of a
    sorted multiset are permutation-invariant, so both formulations
    agree even under timestamp ties)."""
    from .functions.arrow_groups import user_gap_stats

    return user_gap_stats(load_table(spark, sf_dir, "events"))


@register(
    "sessionize_udtf",
    f"""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM e
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
)
def q_sessionize_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful per-partition UDTF sessionization (VERDICT r1 #9):
    `sessionize_udtf(TABLE(v) PARTITION BY user_id ORDER BY ts,
    event_id)` — one Python UDTF instance per user partition carries
    the open session across rows and flushes on gap/terminate. Checked
    against the SAME oracle as the window-based `sessionize` entry:
    two independent formulations (running-sum window vs streaming
    state) must produce identical sessions. The window variant remains
    the hot path; this pins the TABLE(...) UDTF machinery for sequence
    logic windows can't express."""
    from .functions.udtfs import register_udtfs

    register_udtfs(spark)
    ev = load_table(spark, sf_dir, "events")
    view = "events_for_sessionize_udtf"
    ev.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT * FROM sessionize_udtf(TABLE({view}) "
        "PARTITION BY user_id ORDER BY (ts, event_id))"
    )
