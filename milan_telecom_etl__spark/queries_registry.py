"""Registry of oracle-checked queries — the driver-facing surface.

Each entry maps one SURVEY.md §2 operator (or an extension operator)
onto the driver's testdata tables, with a DuckDB-equivalent oracle SQL.
Column names and float rounding are aligned on both sides
(__spark_entry__ docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.queries import star_join_revenue, top_cells_events
from .plans.views import hourly_events
from .sources.parquet import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

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
