"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
deterministic synthetic event generator — the engine's dsdgen-style
load source for stress tests and demos.

Why a DataSource and not `spark.range(...)` + columns: the V2 Python
API gives real scan semantics — a schema, options, and (crucially)
`partitions()`, so generation parallelizes across executors exactly
like a file scan would: each InputPartition is generated independently
from its own seed, so the output is identical for any cluster size or
scheduling order. Rows stream from a generator (never materialized
per-partition), so a 10-billion-row load runs in constant memory.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_TYPES = ["view", "click", "purchase", "signup", "error"]
_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
)
_T0 = dt.datetime(2024, 1, 1)


def _mix(*parts: int) -> int:
    """Deterministic 64-bit mix via md5 — stable across Python builds
    (unlike hash()) and across partitions/executors."""
    h = hashlib.md5(",".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:15], 16)


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events")` with options:
    - n_rows (total rows, default 1000)
    - n_partitions (parallelism, default 8)
    - n_users (user cardinality, default 100)
    - seed (default 0)
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_partitions", 8))
        self.n_users = int(options.get("n_users", 100))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        pid = partition.value
        # contiguous row-id range per partition: ids are globally unique
        # and the full dataset is independent of n_partitions
        lo = pid * self.n_rows // self.n_parts
        hi = (pid + 1) * self.n_rows // self.n_parts
        for i in range(lo, hi):
            m = _mix(self.seed, i)
            ts = _T0 + dt.timedelta(seconds=(m % (30 * 86400)))
            user = m // 7 % self.n_users
            etype = _TYPES[m // 11 % len(_TYPES)]
            value = (m % 100_000) / 100.0
            yield (i, ts, user, etype, value)


# ---------------------------------------------------------------------------
# Streaming variant: SimpleDataSourceStreamReader — the same generator
# exposed as an unbounded source with explicit offsets, so exactly-once
# replay works: a micro-batch is DEFINED by its (start, end) row-id
# range and regenerates identically on recovery.
# ---------------------------------------------------------------------------

class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))
        # same option surface as the batch reader: identical options
        # must yield identical rows in both modes (ADVICE r1)
        self.n_users = int(options.get("n_users", 100))
        self.seed = int(options.get("seed", 0))

    def initialOffset(self):
        return {"row": 0}

    def read(self, start):
        lo = start["row"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        # list-iterator, not a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator (datasource_internal.py)
        return iter(list(self._gen(lo, hi))), {"row": hi}

    def readBetweenOffsets(self, start, end):
        # replay path: regenerate the exact committed range
        return iter(list(self._gen(start["row"], end["row"])))

    def _gen(self, lo, hi):
        for i in range(lo, hi):
            m = _mix(self.seed, i)
            ts = _T0 + dt.timedelta(seconds=(m % (30 * 86400)))
            yield (
                i,
                ts,
                m // 7 % self.n_users,
                _TYPES[m // 11 % len(_TYPES)],
                (m % 100_000) / 100.0,
            )
