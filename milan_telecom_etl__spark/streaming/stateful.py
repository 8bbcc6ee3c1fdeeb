"""Arbitrary stateful streaming via the Spark 4 transformWithState API
(`transformWithStateInPandas`) — the successor to
`applyInPandasWithState` (see sessions.py for that variant): typed
per-key state handles (value/list/map), timers, and TTL, backed by the
RocksDB state store so state size is bounded by disk, not executor
heap — the property that matters when keying 100 TB streams by user.

Processor here: per-user running totals (count / sum / max) that
survive across micro-batches — the simplest useful shape; swap the
handle types for sessionization, CDC materialization, or per-key
model state.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id bigint, n bigint, total double, max_value double"


class RunningTotalsProcessor(StatefulProcessor):
    """ValueState (n, total, max) per user_id, updated per micro-batch;
    emits the running totals for every key seen in the batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState(
            "totals", "n bigint, total double, max_value double"
        )

    def handleInputRows(self, key, rows, timerValues):
        if self.state.exists():
            n, total, mx = self.state.get()
        else:
            n, total, mx = 0, 0.0, float("-inf")
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
        self.state.update((n, total, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "total": [total], "max_value": [mx]}
        )

    def close(self) -> None:
        pass


def running_totals_stream(events_stream):
    """Wire the processor onto a stream keyed by user_id. Requires the
    RocksDB state store provider (set in the session conf)."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
