"""Data-profiling operators: per-column statistics in ONE pass.

The ingestion-side complement of the constraint engine: before loading
100 TB you profile it — null fractions, cardinalities, ranges — and the
whole profile must come from a single scan, not a query per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """One-row profile: count + per-column null counts, distinct counts,
    and numeric min/max/mean — a single aggregation (one scan, one
    reduce), however many columns are profiled."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in numeric_cols or []:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}_nulls"),
            F.round(F.min(c), round_dp).alias(f"{c}_min"),
            F.round(F.max(c), round_dp).alias(f"{c}_max"),
            F.round(F.avg(c), round_dp).alias(f"{c}_mean"),
        ]
    for c in categorical_cols or []:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}_nulls"),
            F.countDistinct(c).alias(f"{c}_distinct"),
        ]
    return df.agg(*aggs)
