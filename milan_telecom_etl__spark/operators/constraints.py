"""Constraint / integrity engine (P7, A5, J2 — SURVEY.md §1.3, §2.2, §2.6).

Spark enforces nothing, so the reference's DB-enforced PK/FK/CHECK model
(reference src/database.py:69-99) and its post-hoc audit
(reference src/etl.py:302-328) become explicit validation operators that
emit audit DataFrames.

Scale shape:
- check_audit: ONE pass over the fact — all violation counts as
  conditional sums in a single partial+final aggregation (vs the
  reference's 9 separate COUNT(*) scans).
- fk_violations: left_anti join; dim side broadcast when small.
- pk_duplicates: hash aggregation on the key — the only shuffle, keyed
  exactly like the table's natural bucketing, so with bucketed storage
  it is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def check_audit(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """A5/P7: one-pass violation counts. `checks` maps audit name → the
    condition that must HOLD; output counts rows violating each."""
    aggs = [
        F.sum(F.when(~cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in checks.items()
    ]
    return df.agg(*aggs)


def pk_duplicates(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """PK audit: key groups appearing more than once, with multiplicity
    (reference PK decls src/database.py:69,76,90)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def dedupe_pk(df: DataFrame, key_cols: list[str], order_col: str | None = None) -> DataFrame:
    """PK enforcement: keep one row per key. With order_col, keeps the
    first by that ordering (deterministic); otherwise dropDuplicates."""
    if order_col is None:
        return df.dropDuplicates(key_cols)
    w = F.row_number().over(Window.partitionBy(*key_cols).orderBy(order_col))
    return df.withColumn("__rn", w).filter(F.col("__rn") == 1).drop("__rn")


def fk_violations(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, broadcast_dim: bool = True
) -> DataFrame:
    """J2 audit: fact rows whose key has no match in the dim
    (reference FK decls src/database.py:83,95-96). Empty ⇒ FK holds."""
    d = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    if broadcast_dim:
        d = F.broadcast(d)
    return fact.join(d, fact_key, "left_anti")


def fk_enforce(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, broadcast_dim: bool = True
) -> DataFrame:
    """J2 as a filter: the reference's ETL-time FK pre-enforcement
    (reference src/etl.py:227-231,260) — left_semi instead of isin."""
    d = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    if broadcast_dim:
        d = F.broadcast(d)
    return fact.join(d, fact_key, "left_semi")


def expectation_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Declarative expectation suite (the Great-Expectations shape on
    Spark): `rules` maps rule name → condition that must HOLD per row.
    ONE aggregation pass computes every rule's violation count; the
    single wide row is then unpivoted to a long (rule, n_violations,
    n_rows, passed) report. Rules must be written null-aware (wrap in
    IS NOT NULL) — a NULL predicate counts as not-violated, matching
    SQL CHECK semantics."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(~cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    long = wide.unpivot(["__n"], list(rules), "rule", "n_violations")
    return long.select(
        "rule",
        "n_violations",
        F.col("__n").alias("n_rows"),
        (F.col("n_violations") == 0).alias("passed"),
    )
