"""Order-insensitive Spark-vs-DuckDB comparison, mirroring the driver's
correctness gate (row-count + schema + value-hash)."""

from __future__ import annotations

import decimal
import math

import duckdb

from milan_telecom_etl__spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Epsilon for sub-ulp engine drift ONLY (documented contract:
        # queries round their own floats to 6dp on both sides). 9dp is
        # strictly tighter than the 6dp convention, so a query that
        # FORGOT its round() surfaces here instead of passing locally
        # and diverging under a stricter external gate (ADVICE r1).
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        # Scale-pinned string, NOT numeric equality: the driver hashes
        # wire renders, so Decimal('1.20') and Decimal('1.2') must NOT
        # compare equal here even though Python says they do (VERDICT r6
        # #1 — revenue_decimal_exact passed locally, failed the driver).
        return f"dec:{v}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


# DuckDB types whose wire representation diverges from any Spark type the
# driver's value-hash can match: sum(INTEGER) widens to HUGEINT (int128)
# while Spark's sum is BIGINT — values equal, hashes differ (VERDICT r2).
# Oracles must CAST these away.
_BANNED_DUCK_TYPES = {"HUGEINT", "UHUGEINT"}


def oracle_output_types(
    con: duckdb.DuckDBPyConnection, sql: str
) -> dict[str, str]:
    """Bind (without executing) an oracle query and return its DuckDB
    output column types, uppercased."""
    rel = con.sql(sql)
    return {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}


def check_oracle_types(
    spark_dtypes: dict[str, str] | None,
    duck_types: dict[str, str],
) -> list[str]:
    """Return a list of type-hazard descriptions (empty = safe).

    HUGEINT/UHUGEINT are always hazards. DECIMAL is now ALWAYS a hazard
    (VERDICT r6 #1): even a same-declared-scale decimal on both wires
    hash-failed the driver while local Decimal-object equality passed.
    Exact-decimal entries must render at the boundary — scale-pinned
    VARCHAR string and/or 6dp DOUBLE (see revenue_decimal_exact)."""
    problems = []
    for col, dt in duck_types.items():
        base = dt.split("(")[0]
        if base in _BANNED_DUCK_TYPES:
            problems.append(f"{col}: duck={dt} (int128 wire type; CAST AS BIGINT)")
        elif base == "DECIMAL":
            problems.append(
                f"{col}: duck={dt} (decimal wire render is engine-specific; "
                "CAST to VARCHAR fixed-scale or round(CAST(.. AS DOUBLE), 6))"
            )
    return problems


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    # Bind the oracle and check type hazards FIRST (ADVICE r3): a binder
    # error or int128 wire type fails fast, before either engine
    # executes, and the oracle is processed once per side, not twice.
    try:
        duck_types = oracle_output_types(con, sql)
    except duckdb.Error as e:
        return False, f"oracle failed to bind: {e}"
    hazards = check_oracle_types(dict(spark_df.dtypes), duck_types)
    if hazards:
        return False, f"oracle type hazard: {hazards}"
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    a, b = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diff}"
    return True, "ok"
