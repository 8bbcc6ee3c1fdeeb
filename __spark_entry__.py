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
from milan_telecom_etl__spark import registry_streaming as _reg_stream  # noqa: F401  (registers on import)
from milan_telecom_etl__spark import registry_temporal as _reg_temp  # noqa: F401  (registers on import)
from milan_telecom_etl__spark import registry_text as _reg_text  # noqa: F401  (registers on import)
from milan_telecom_etl__spark import registry_tpch as _reg_tpch  # noqa: F401  (registers on import)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _reg.QUERIES["top_cells"](spark, "/root/testdata/sf0.001")


# Gate ordering (VERDICT r3 #3/#7): the driver artifact caps at ~50
# entries/round, so the least-externally-proven work must gate FIRST.
# The order is DERIVED, not hand-curated: GATES.json records each
# entry's last green driver gate (round + git sha of the gated code
# state; rebuilt by scripts/update_gates.py), and gating.gate_order()
# leads with (1) entries never gated green, then (2) entries whose
# behavior-bearing source — the decorated entry fn (incl. oracle SQL)
# plus its static reference closure of package functions/classes/
# constants, minus universal modules — differs from the gate-sha
# version, then (3) module-closure staleness, then (4) universal-
# closure-only staleness, then the proven tail in registration order
# (VERDICT r13 #1: fingerprints keep a metadata edit to the
# universally-imported hub from flattening the prioritization, and
# the closure catches helper rewrites sibling-entry edits don't).
# Edits can no longer hide behind prior-round green artifacts.
from milan_telecom_etl__spark.gating import gate_order as _gate_order


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: _reg.QUERIES[n] for n in _gate_order(_reg.QUERIES)}


def oracle_sql() -> dict[str, str]:
    q = _gate_order(_reg.QUERIES)
    return {n: _reg.ORACLES[n] for n in q if n in _reg.ORACLES}
