"""Analytics queries (A4, O1, P6, J3 — SURVEY.md §2.5-§2.7).

The flagship is `top_cells` (reference src/etl.py:283-299): top-k cells
by average hourly total activity since a cutoff. Physical plan we want
(and get — verified via .explain in tests):

  parquet scan (time filter pushed to partition/row-group pruning)
    → partial hash agg (hour, cell)  → exchange → final agg
    → partial avg (cell)             → exchange → final avg
    → TakeOrderedAndProject(k)       ← true top-k, no global sort

At 1000 executors the only shuffled payload is per-(hour,cell) partials;
the top-k never materializes a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .views import hourly_events, hourly_traffic


def top_cells(
    fact_traffic: DataFrame,
    cutoff: str = "2013-11-01 00:00:00",
    limit: int = 10,
) -> DataFrame:
    """Flagship (reference src/etl.py:283-299): P6 filter → A4 avg-of-
    hourly-sums → O1 top-k. Parameterized, not interpolated (the
    reference f-strings the LIMIT — SURVEY.md §3 EP3)."""
    return (
        hourly_traffic(fact_traffic)
        .filter(F.col("hour") >= F.lit(cutoff).cast("timestamp"))
        .groupBy("cell_id")
        .agg(F.avg("total_activity").alias("avg_load"))
        .orderBy(F.desc("avg_load"), F.asc("cell_id"))  # cell_id tiebreak → deterministic
        .limit(limit)
    )


def top_cells_events(
    events: DataFrame,
    cutoff: str = "2024-01-08 00:00:00",
    limit: int = 10,
) -> DataFrame:
    """Flagship restated over the driver's `events` table."""
    return (
        hourly_events(events)
        .filter(F.col("hour") >= F.lit(cutoff).cast("timestamp"))
        .groupBy("cell_id")
        .agg(F.round(F.avg("total_value"), 6).alias("avg_load"))
        .orderBy(F.desc("avg_load"), F.asc("cell_id"))
        .limit(limit)
    )


def star_join_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """J3: the natural star join the schema is built for (SURVEY.md §2.6)
    — revenue per region/nation, TPC-H Q5 shaped.

    Scale shape: lineitem⋈orders is the one real shuffle (both huge, key
    = orderkey); customer/nation/region are broadcast so the dimension
    joins add no exchanges.
    """
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    revenue: Column = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(revenue), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )
