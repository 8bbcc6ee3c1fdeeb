"""Registry of oracle-checked queries — the driver-facing surface.

Each entry maps one SURVEY.md §2 operator (or an extension operator)
onto the driver's testdata tables, with a DuckDB-equivalent oracle SQL.
Column names and float rounding are aligned on both sides
(__spark_entry__ docstring).

EXECUTION PROTOCOL — clearCache between entries (ADVICE r7): several
entries persist() shared subtrees (shingle/words/signature tables,
the knn eval's bits table) and intentionally do NOT unpersist — the
returned DataFrame is lazy, so there is no in-entry point after the
terminal action to hook an unpersist without forcing evaluation or
leaking state anyway. The contract is therefore on the CALLER: run
`spark.catalog.clearCache()` between entries (bench.py does; the
plan-pin tests do per-test), or — finer-grained — call
`caching.release_tracked()`, which unpersists exactly the frames
entries registered via `caching.tracked_persist` (the materializing
eval entries use this so their caches stay warm across a harness's
repeated calls but still have a one-call cleanup — VERDICT r12 #1).
A harness that sweeps many entries without clearing will accumulate
InMemoryRelations — correctness is unaffected, but memory pressure
and plan pins are.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.cleansing import apply_fixups, title_trim
from .operators.constraints import check_audit, fk_enforce, fk_violations, pk_duplicates
from .plans.queries import star_join_revenue, top_cells_events
from .plans.views import hourly_events
from .sources.parquet import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Full-corpus eval diagnostics (`*_full`: exact ground truth over the
# WHOLE corpus — quadratic in duplicate density or |corpus|-linear per
# query) are opt-in: the gated registry defaults are the sampled scale
# postures (VERDICT r10 #1 — no default-gated entry should carry a >3x
# sf3->sf10 decade). Set SPARK_GRAFT_FULL_EVALS=1 to register the full
# twins for a calibration run (e.g. validating that a sampled estimate
# tracks the full corpus on a new dataset).
import os as _os

FULL_EVALS = _os.environ.get("SPARK_GRAFT_FULL_EVALS", "") == "1"


# Diagnostic (opt-in) entries always land here, whatever the env flag:
# the test suite parity-checks them from these side registries, so the
# full twins' oracle SQL cannot silently rot while gated out (ADVICE
# r11 #4). They join QUERIES/ORACLES — the driver-gated surface — only
# under SPARK_GRAFT_FULL_EVALS=1.
DIAGNOSTIC_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
DIAGNOSTIC_ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# Plan-build memo (r16, VERDICT r15 #7): the ~150-entry tail's per-rep
# wall is dominated by the DRIVER — rebuilding an identical py4j
# expression tree and re-analyzing it on every call, not by execution
# (scripts/probe_breakdown.py). For entries whose build is PURE in
# (spark, sf_dir) — no Spark action, no persist, no session/catalog/
# artifact mutation during construction — the UNRESOLVED PLAN is
# metadata, exactly like the schema memo in sources/parquet.py: the
# same DataFrame object can serve every rep, and every action on it
# still computes from the parquet inputs. The memo therefore caches
# DataFrame OBJECTS (plans), never results.
#
# Three independent safeguards keep this strictly metadata:
# - allowlist: only entries in PLAN_MEMO_ENTRIES (statically audited
#   action/persist/artifact-free builds; store-backed serving /
#   appendable / bucketed / temp-view entries are excluded wholesale
#   because their plans pin file listings and catalog state the key
#   below does not cover);
# - runtime purity guard: every non-memoized build is watched — if it
#   launched ANY Spark job, registered a cache entry, or tracked a
#   persist, that build's DataFrame is NOT memoized (a mis-flagged
#   entry degrades to exactly its old behavior). The probe repeats per
#   call rather than branding the entry, because a FIRST build
#   legitimately runs the one-off schema-inference job that
#   sources/parquet.py then memoizes — the second build is pure;
# - file-state key: the memo keys on (session, sf_dir, every file's
#   mtime_ns+size under sf_dir) — a DataFrame pins the scan's file
#   listing at analysis time, so ANY change under the data dir drops
#   the plan (the appendable-table lesson, same key discipline as
#   sources/parquet._file_state_key).
_PLAN_MEMO: dict[tuple, tuple] = {}  # key -> (file_state, DataFrame)

# Statically audited pure-build entries (r16; see the audit criteria
# above). Deliberately EXCLUDED despite auditing pure: store-backed
# entries (*_appendable, *_serving, bucketed_*) whose plans pin
# artifact-warehouse file listings outside the sf_dir key, and
# temp-view/SQL-front-door entries whose plans bind catalog state.
PLAN_MEMO_ENTRIES: frozenset[str] = frozenset(
    {
        # queries_registry
        "conform_names", "constraint_audit", "daily_user_activity",
        "fk_orphan_audit", "hourly_pivot", "hourly_rollup", "pk_dup_audit",
        "semi_join_filter", "star_join_revenue", "top_cells", "topk_per_group",
        # registry_analytics
        "approx_percentile_bracket", "asof_last_click", "burst_pairs",
        "cohort_retention", "cube_type_hour", "event_type_profile",
        "fuzzy_supplier_pairs", "grouping_sets_revenue", "market_basket_rules",
        "pareto_frontier_parts", "price_deciles", "price_percentiles",
        "price_rank_profile", "profile_orders", "quantity_price_correlation",
        "revenue_rollup", "session_window_builtin", "sessionize",
        "set_ops_customers", "signup_purchase_funnel", "snapshot_diff",
        "value_histogram",
        # registry_geo
        "grid_envelope", "spatial_join_zones", "utm_reproject",
        # registry_ml
        "cluster_silhouette", "embedding_centroids", "kmeans_clusters",
        "kmeans_estep", "knn_label_noise_audit", "l2_normalized_vectors",
        "multimodal_decode_features", "multimodal_exact_dedup",
        "multimodal_frames", "multimodal_resize",
        # registry_quality
        "benford_first_digit", "boilerplate_line_purge", "c4_line_filters",
        "class_balance_entropy", "countmin_heavy_hitters", "domain_reweighting",
        "expectations_report", "gopher_quality_flags", "gopher_repetition_flags",
        "group_zscore", "heavy_hitters", "html_strip", "k_anonymity_audit",
        "l_diversity_audit", "mad_outliers", "mutual_information_type_hour",
        "probe_calibration", "psi_price_drift", "quality_linear_probe",
        "quality_probe_eval", "quartile_bins", "revenue_share",
        "salted_join_priority", "unpivot_measures", "url_filter_flags",
        "zorder_keys",
        # registry_sampling
        "bootstrap_mean_ci", "context_packing", "corpus_mixing",
        "deterministic_sample", "padding_waste_buckets",
        # simhash_band_candidates_auto persists during BUILD (tracked
        # cache) — the runtime guard refuses it anyway; kept off the
        # list so the list states only true pure builds (r16 smoke)
        "stratified_cap", "temperature_mixing",
        "train_val_test_split", "training_shards", "weighted_sample",
        # registry_semistructured
        "approx_distinct_users", "hll_partial_merge", "json_extract_props",
        "json_k_histogram", "running_user_totals", "salted_type_totals",
        "variant_props_stats",
        # registry_series
        "gap_percentiles", "regr_trend_pandas", "regr_value_trend",
        "rolling_7d_active_users", "rolling_zscore_anomalies",
        "sliding_window_counts", "time_weighted_avg", "user_gap_stats_arrow",
        "wma_trailing",
        # registry_similarity
        "embedding_health_audit", "embedding_quantization_error",
        "hard_negative_mining", "knn_bruteforce", "knn_ivf", "knn_ivf_pq",
        "knn_lsh", "knn_lsh_multi", "knn_pq_adc", "lsh_bucket_audit",
        "lsh_bucket_histogram", "matryoshka_eval", "rrf_hybrid_retrieval",
        "semantic_decontamination",
        # registry_temporal
        "fuzzy_name_match", "gap_fill_hourly", "keep_latest_per_user",
        "rolling_median", "scd2_user_state", "scd2_user_type_intervals",
        "sliding_hour_avg", "transition_matrix", "user_top_type",
        "user_type_set", "weekday_hour_profile",
        # registry_text
        # bm25_retrieval persists during build — see the
        # simhash_band_candidates_auto note above
        "bigram_counts", "bloom_decontamination",
        "bpe_merge_candidates", "char_entropy_filter",
        "contamination_overlap_ratio", "content_type_profile",
        "decontamination_audit", "dedup_exact_keepers", "doc_fingerprint",
        "dsir_weights", "exact_dup_groups", "exact_dup_groups_plain",
        "importance_resampling", "lang_id", "memorization_attribution",
        "minhash_lsh_candidates", "minhash_lsh_sharp", "minhash_signatures",
        "passage_chunking", "pii_density", "quality_score",
        "quality_threshold_by_source", "regex_redaction", "repetition_ratio",
        "simhash", "t5_span_corruption", "text_stats", "tokenizer_fertility",
        "winnowing_fingerprints",
        # registry_tpch
        "revenue_decimal_exact", "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4",
        "tpch_q5", "tpch_q6", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10",
        "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15",
        "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q20",
        "tpch_q22",
    }
)


def _sf_state(sf_dir: str) -> tuple:
    import os

    entries = []
    for root, dirs, files in os.walk(sf_dir):
        dirs.sort()
        for f in sorted(files):
            p = os.path.join(root, f)
            try:
                st = os.stat(p)
            except OSError:
                continue
            entries.append((p, st.st_mtime_ns, st.st_size))
    return tuple(entries)


def _build_is_pure(spark: SparkSession, build: Callable[[], DataFrame]):
    """Run `build()` under the purity watch: returns (df, pure) where
    pure means no job ran, no cache entry appeared, and no tracked
    persist was registered during construction."""
    from . import caching

    jsc = spark.sparkContext._jsc.sc()
    try:
        jobs0 = jsc.dagScheduler().numTotalJobs()
    except Exception:
        jobs0 = None
    cm = spark._jsparkSession.sharedState().cacheManager()
    cache_empty0 = cm.isEmpty()
    n_tracked0 = len(caching._TRACKED)
    df = build()
    pure = (
        jobs0 is not None
        and jsc.dagScheduler().numTotalJobs() == jobs0
        and cache_empty0
        and cm.isEmpty()
        and len(caching._TRACKED) == n_tracked0
    )
    return df, pure


def register(name: str, oracle: str | None = None, diagnostic: bool = False):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        import functools

        if name in PLAN_MEMO_ENTRIES:

            @functools.wraps(fn)
            def wrapped(
                spark: SparkSession, sf_dir: str, _fn=fn, _name=name
            ) -> DataFrame:
                import os

                # kill switch — also how the A/B in OPTIMIZATION_r16.md
                # measured the memo's contribution under identical code
                if os.environ.get("SPARK_GRAFT_PLAN_MEMO", "1") == "0":
                    return _fn(spark, sf_dir)
                key = (
                    _name,
                    spark.sparkContext.applicationId,
                    sf_dir,
                )
                state = _sf_state(sf_dir)
                hit = _PLAN_MEMO.get(key)
                if hit is not None and hit[0] == state:
                    return hit[1]
                df, pure = _build_is_pure(
                    spark, lambda: _fn(spark, sf_dir)
                )
                if pure:
                    _PLAN_MEMO[key] = (state, df)
                return df

            reg_fn = wrapped
        else:
            reg_fn = fn
        if diagnostic:
            DIAGNOSTIC_QUERIES[name] = reg_fn
            if oracle is not None:
                DIAGNOSTIC_ORACLES[name] = oracle
            if not FULL_EVALS:
                return reg_fn  # importable for tests; not driver-gated
        QUERIES[name] = reg_fn
        if oracle is not None:
            ORACLES[name] = oracle
        return reg_fn

    return deco


# ---------------------------------------------------------------------------
# Flagship + reference-parity analytics (A2-A4, O1, P6 on `events`)
# ---------------------------------------------------------------------------


@register(
    "top_cells",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, user_id AS cell_id,
             sum(value) AS total_value, count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT cell_id, round(avg(total_value), 6) AS avg_load
    FROM hourly
    WHERE hour >= TIMESTAMP '2024-01-08 00:00:00'
    GROUP BY cell_id
    ORDER BY avg_load DESC, cell_id
    LIMIT 10
    """,
)
def q_top_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: reference src/etl.py:283-299 restated on `events`."""
    return top_cells_events(load_table(spark, sf_dir, "events"))


@register(
    "hourly_rollup",
    """
    SELECT date_trunc('hour', ts) AS hour, user_id AS cell_id,
           round(sum(value), 6) AS total_value, count(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: v_hourly_traffic semantics (reference src/database.py:101-112)."""
    df = hourly_events(load_table(spark, sf_dir, "events"))
    return df.withColumn("total_value", F.round(F.col("total_value"), 6))


@register(
    "star_join_revenue",
    """
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: star join with broadcast dims (SURVEY.md §2.6)."""
    return star_join_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


# ---------------------------------------------------------------------------
# Constraint / integrity operators (P7/A5, J1/J2, PK audits)
# ---------------------------------------------------------------------------


@register(
    "constraint_audit",
    """
    SELECT
      CAST(sum(CASE WHEN NOT (l_quantity >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS bad_quantity,
      CAST(sum(CASE WHEN NOT (l_extendedprice >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
      CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0 AND 1) THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
      CAST(sum(CASE WHEN NOT (l_tax >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS bad_tax,
      CAST(sum(CASE WHEN NOT (l_linenumber BETWEEN 1 AND 7) THEN 1 ELSE 0 END) AS BIGINT) AS bad_linenumber
    FROM lineitem
    """,
)
def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/P7: one-pass CHECK audit (reference src/etl.py:302-328 collapsed
    from 9 scans to one partial+final aggregation)."""
    li = load_table(spark, sf_dir, "lineitem")
    return check_audit(
        li,
        {
            "bad_quantity": F.col("l_quantity") >= 0,
            "bad_price": F.col("l_extendedprice") >= 0,
            "bad_discount": F.col("l_discount").between(0, 1),
            "bad_tax": F.col("l_tax") >= 0,
            "bad_linenumber": F.col("l_linenumber").between(1, 7),
        },
    )


@register(
    "pk_dup_audit",
    """
    SELECT l_orderkey, l_linenumber, count(*) AS n_rows
    FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1
    """,
)
def q_pk_dup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK duplicate audit on lineitem's natural key
    (reference PK model src/database.py:90)."""
    return pk_duplicates(load_table(spark, sf_dir, "lineitem"), ["l_orderkey", "l_linenumber"])


@register(
    "fk_orphan_audit",
    """
    SELECT o_orderkey, o_custkey FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
)
def q_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 audit: broadcast left-anti FK check
    (reference FK decls src/database.py:83,95-96)."""
    return fk_violations(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        load_table(spark, sf_dir, "customer"),
        "o_custkey",
        "c_custkey",
    )


@register(
    "semi_join_filter",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
    )
    """,
)
def q_semi_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/P5: membership filter as broadcast left-semi join — the
    reference's isin-against-dim pattern (reference src/etl.py:227-231,260)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return fk_enforce(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        cust,
        "o_custkey",
        "c_custkey",
    )


# ---------------------------------------------------------------------------
# String conform operators (T1/T2) and windowed / pivoted analytics
# ---------------------------------------------------------------------------


@register(
    "conform_names",
    """
    SELECT
      n_nationkey,
      CASE
        WHEN t = 'Nation_0' THEN 'Zero Nation'
        WHEN t = 'Nation_7' THEN 'Lucky Nation'
        ELSE t
      END AS conformed
    FROM (
      SELECT n_nationkey,
             array_to_string(
               list_transform(string_split(lower(trim(n_name)), ' '),
                              w -> upper(w[1]) || w[2:]), ' ') AS t
      FROM nation
    )
    ORDER BY n_nationkey
    """,
)
def q_conform_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+T2: title-case+trim then fixup-map replace (reference
    src/etl.py:256-258). DuckDB lacks initcap, so the oracle hand-rolls
    per-word title-casing."""
    nation = load_table(spark, sf_dir, "nation")
    fixups = {"Nation_0": "Zero Nation", "Nation_7": "Lucky Nation"}
    return (
        nation.select(
            "n_nationkey",
            apply_fixups(title_trim(F.lower(F.col("n_name"))), fixups).alias("conformed"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "topk_per_group",
    """
    SELECT c_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY c_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rk
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rk <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group — deterministic rank with key tiebreak.
    (Beyond the reference surface: SURVEY.md §2.5 notes Spark gives
    windows free; this is the per-entity top-k every CDR analysis wants.)"""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


@register(
    "hourly_pivot",
    """
    SELECT date_trunc('hour', ts) AS hour,
      round(sum(CASE WHEN event_type = 'click'    THEN value ELSE 0 END), 6) AS click,
      round(sum(CASE WHEN event_type = 'error'    THEN value ELSE 0 END), 6) AS error,
      round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 6) AS purchase,
      round(sum(CASE WHEN event_type = 'signup'   THEN value ELSE 0 END), 6) AS signup,
      round(sum(CASE WHEN event_type = 'view'     THEN value ELSE 0 END), 6) AS view
    FROM events GROUP BY 1
    """,
)
def q_hourly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: the multi-metric-per-row shape of the reference's traffic
    fact (smsin/smsout/... are exactly a pivoted event stream). Explicit
    value list ⇒ single-pass, no distinct-values pre-scan, stable schema."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    df = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .pivot("event_type", kinds)
        .agg(F.sum("value"))
    )
    for k in kinds:
        df = df.withColumn(k, F.round(F.coalesce(F.col(k), F.lit(0.0)), 6))
    return df


@register(
    "daily_user_activity",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value,
           round(avg(value), 6) AS avg_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY 1, 2
    """,
)
def q_daily_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate grouped rollup incl. distinct-count — the daily
    per-entity profile (A2 generalized)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.col("user_id"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "top_cells_sql",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, user_id AS cell_id,
             sum(value) AS total_value
      FROM events GROUP BY 1, 2
    )
    SELECT cell_id, round(avg(total_value), 6) AS avg_load
    FROM hourly
    WHERE hour >= TIMESTAMP '2024-01-08 00:00:00'
    GROUP BY 1
    ORDER BY avg_load DESC, cell_id
    LIMIT 10
    """,
)
def q_top_cells_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S10: the flagship as pure SQL text over catalog views —
    spark.sql replaces the reference's pd.read_sql / execute_query
    (reference src/etl.py:295, src/database.py:136-154), incl.
    GROUP-BY-ordinal (spark.sql.groupByOrdinal, SURVEY.md A2)."""
    from .sources.parquet import register_testdata

    register_testdata(spark, sf_dir)
    return spark.sql(
        """
        WITH hourly AS (
          SELECT date_trunc('hour', ts) AS hour, user_id AS cell_id,
                 sum(value) AS total_value
          FROM events GROUP BY 1, 2
        )
        SELECT cell_id, round(avg(total_value), 6) AS avg_load
        FROM hourly
        WHERE hour >= TIMESTAMP '2024-01-08 00:00:00'
        GROUP BY 1
        ORDER BY avg_load DESC, cell_id
        LIMIT 10
        """
    )
