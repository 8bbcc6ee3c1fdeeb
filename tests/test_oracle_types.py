"""Registry-wide oracle output-type guard (VERDICT r2 item 2).

Round 2's only driver-red rows were oracles whose DuckDB output
contained HUGEINT columns (sum(INTEGER) widens to int128; Spark's sum
is BIGINT) — values identical, value-hash divergent. This walks EVERY
registered oracle, binds it against the sf0.001 views (bind-only, no
execution), and asserts no result column is HUGEINT/UHUGEINT and that
any DECIMAL output is deliberately matched by a Spark decimal column.
Spark dtypes are taken from the query's schema (lazy — no job runs).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.parity import check_oracle_types, duck_connection, oracle_output_types

SF_DIR = "/root/testdata/sf0.001"


def _cases():
    oracles = entrymod.oracle_sql()
    return [(n, oracles[n]) for n in entrymod.queries() if n in oracles]


@pytest.mark.parametrize("name,sql", _cases(), ids=[n for n, _ in _cases()])
def test_oracle_output_types_safe(spark, name, sql):
    con = duck_connection(SF_DIR)
    duck_types = oracle_output_types(con, sql)
    spark_dtypes = dict(entrymod.queries()[name](spark, SF_DIR).dtypes)
    problems = check_oracle_types(spark_dtypes, duck_types)
    assert not problems, f"{name}: {problems}"


def test_norm_cell_pins_decimal_scale():
    """VERDICT r6 #1 regression: Decimal('1.20') == Decimal('1.2') in
    Python, but the driver hashes wire renders where they differ — the
    local normalizer must distinguish them."""
    from decimal import Decimal

    from tests.parity import _norm_cell

    assert _norm_cell(Decimal("1.20")) != _norm_cell(Decimal("1.2"))
    assert _norm_cell(Decimal("1.20")) == _norm_cell(Decimal("1.20"))
    # nested containers normalize too
    assert _norm_cell([Decimal("0.50")]) != _norm_cell([Decimal("0.5")])
