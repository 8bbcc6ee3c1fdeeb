"""Driver contract for the spark-graft builder (PySpark target).

entry()   — flagship top-cells query on sf0.001.
queries() — one entry per implemented operator (SURVEY.md §2).
oracle_sql() — DuckDB-equivalent ANSI SQL per query key.

Convention: every computed/aggregate column is aliased identically on
both sides, and every floating aggregate is ROUND()ed to 6 places on
both sides so order-insensitive value-hashes match despite summation
order (SURVEY.md §7.4.3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from milan_telecom_etl__spark import queries_registry as _reg
from milan_telecom_etl__spark import registry_analytics as _reg_an  # noqa: F401  (registers on import)
from milan_telecom_etl__spark import registry_geo as _reg_geo  # noqa: F401  (registers on import)
from milan_telecom_etl__spark import registry_ml as _reg_ml  # noqa: F401  (registers on import)
from milan_telecom_etl__spark import registry_quality as _reg_qual  # noqa: F401  (registers on import)
from milan_telecom_etl__spark import registry_sampling as _reg_samp  # noqa: F401  (registers on import)
from milan_telecom_etl__spark import registry_semistructured as _reg_semi  # noqa: F401  (registers on import)
from milan_telecom_etl__spark import registry_series as _reg_ser  # noqa: F401  (registers on import)
from milan_telecom_etl__spark import registry_similarity as _reg_sim  # noqa: F401  (registers on import)
from milan_telecom_etl__spark import registry_temporal as _reg_temp  # noqa: F401  (registers on import)
from milan_telecom_etl__spark import registry_text as _reg_text  # noqa: F401  (registers on import)
from milan_telecom_etl__spark import registry_tpch as _reg_tpch  # noqa: F401  (registers on import)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _reg.QUERIES["top_cells"](spark, "/root/testdata/sf0.001")


# Gate ordering (VERDICT r1 #5): round 1's driver artifact captured only
# the first 50 registration-order entries, so newest/least-proven work
# must gate FIRST. Three tiers: entries new or materially changed this
# round, then entries the round-1 artifact never covered, then the 50 it
# already recorded green.
_R2_NEW = [
    "tpch_q2", "tpch_q5", "tpch_q8", "tpch_q9", "tpch_q11", "tpch_q12", "tpch_q16",
    "tpch_q20", "tpch_q21", "tpch_q22",
    "near_dup_clusters", "kmeans_clusters", "approx_distinct_users",
    "multimodal_decode_features",
    "lsh_verified_pairs", "corpus_curation", "pretraining_pipeline",
    "lsh_bucket_audit", "user_gap_stats_arrow", "sessionize_udtf",
    "winnowing_fingerprints", "vocab_oov_rate",
    "approx_percentile_bracket", "pagerank_part_supplier",
    "grouping_sets_revenue", "fuzzy_supplier_pairs", "scd2_user_state",
]
_R1_RECORDED = [
    "top_cells", "hourly_rollup", "star_join_revenue", "constraint_audit",
    "pk_dup_audit", "fk_orphan_audit", "semi_join_filter", "conform_names",
    "topk_per_group", "hourly_pivot", "daily_user_activity", "top_cells_sql",
    "sessionize", "asof_last_click", "burst_pairs", "revenue_rollup",
    "set_ops_customers", "price_percentiles", "event_type_profile",
    "signup_purchase_funnel", "cohort_retention", "value_histogram",
    "profile_orders", "price_deciles", "quantity_price_correlation",
    "snapshot_diff", "cube_type_hour", "session_window_builtin",
    "price_rank_profile", "exists_big_order", "grid_envelope",
    "utm_reproject", "spatial_join_zones", "embedding_centroids",
    "kmeans_estep", "l2_normalized_vectors", "unpivot_measures",
    "quartile_bins", "psi_price_drift", "class_balance_entropy",
    "mad_outliers", "group_zscore", "zorder_keys", "salted_join_priority",
    "expectations_report", "revenue_share", "benford_first_digit",
    "heavy_hitters",
]


def _gate_order(names: list[str]) -> list[str]:
    new = [n for n in _R2_NEW if n in names]
    recorded = set(_R1_RECORDED) | set(new)
    middle = [n for n in names if n not in recorded]
    tail = [n for n in names if n in set(_R1_RECORDED) and n not in set(new)]
    return new + middle + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: _reg.QUERIES[n] for n in _gate_order(list(_reg.QUERIES))}


def oracle_sql() -> dict[str, str]:
    q = _gate_order(list(_reg.QUERIES))
    return {n: _reg.ORACLES[n] for n in q if n in _reg.ORACLES}
