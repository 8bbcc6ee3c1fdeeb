"""Pre-runs the driver's t2 gate locally: every queries() entry with an
oracle must hash-match DuckDB on the same parquet."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.parity import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


def _oracle_cases():
    oracles = entrymod.oracle_sql()
    return [(name, oracles[name]) for name in entrymod.queries() if name in oracles]


@pytest.mark.parametrize("name,sql", _oracle_cases(), ids=[n for n, _ in _oracle_cases()])
def test_query_matches_oracle(spark, name, sql):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    con = duck_connection(SF_DIR)
    ok, msg = compare(df, con, sql)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0 and df.columns
