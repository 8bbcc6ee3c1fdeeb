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


# Gate ordering (VERDICT r2 #3): the driver artifact caps at ~50
# entries/round, so the least-externally-proven work must gate FIRST.
# Tier 1: the 42 entries absent from BOTH CORRECTNESS_r01 and _r02
# (never driver-gated). Tier 2: the three r2 hash-fails, re-gated after
# their HUGEINT oracle casts. Tier 3: entries new/changed in round 3.
# Tail: everything already recorded green.
_R3_NEVER_GATED = [
    "salted_type_totals", "above_avg_balance", "running_user_totals",
    "variant_props_stats", "regr_value_trend", "rolling_zscore_anomalies",
    "time_weighted_avg", "wma_trailing", "gap_percentiles",
    "regr_trend_pandas", "sliding_window_counts", "rolling_7d_active_users",
    "knn_bruteforce", "knn_lsh", "embedding_near_dups",
    "lsh_bucket_histogram", "knn_lsh_multi", "knn_pandas_vectorized",
    "knn_ivf", "embedding_quantization_error", "sliding_hour_avg",
    "user_top_type", "user_type_set", "weekday_hour_profile",
    "fuzzy_name_match", "keep_latest_per_user", "gap_fill_hourly",
    "scd2_user_type_intervals", "transition_matrix", "rolling_median",
    "tpch_q1", "tpch_q3", "tpch_q10", "tpch_q6", "tpch_q4", "tpch_q14",
    "tpch_q18", "tpch_q7", "tpch_q13", "tpch_q15", "tpch_q17", "tpch_q19",
]
_R3_FIXED_REDS = ["tpch_q12", "context_packing", "regex_redaction"]
_R3_NEW: list[str] = [
    "streaming_rollup_batch", "streaming_dedupe_batch",
    "streaming_interval_join_batch", "streaming_merge_batch",
]


def _gate_order(names: list[str]) -> list[str]:
    head = [
        n
        for n in _R3_NEVER_GATED + _R3_FIXED_REDS + _R3_NEW
        if n in names
    ]
    seen = set(head)
    # stable de-dup: head tiers first, then registration order
    return head + [n for n in names if n not in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: _reg.QUERIES[n] for n in _gate_order(list(_reg.QUERIES))}


def oracle_sql() -> dict[str, str]:
    q = _gate_order(list(_reg.QUERIES))
    return {n: _reg.ORACLES[n] for n in q if n in _reg.ORACLES}
