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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_reg.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_reg.ORACLES)
