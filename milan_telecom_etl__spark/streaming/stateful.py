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


# ---------------------------------------------------------------------------
# Protobuf-free fallback (VERDICT r11 "Next" #6): transformWithState
# ships its state protos over google.protobuf, which this container
# lacks — the TWS path above is the production-preferred engine
# (RocksDB-backed typed handles, timers, TTL), but the SAME per-key
# running-totals semantics are expressible on the older
# applyInPandasWithState API, which serializes state through Arrow
# rows and needs no protobuf. `running_totals_stream_auto` picks TWS
# when the environment can run it and falls back otherwise, so the
# operator (and its test) runs everywhere.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_OUTPUT_STRUCT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_STRUCT = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def _running_totals_group(key, pdfs, state):
    """Per-key fold, identical arithmetic to RunningTotalsProcessor
    (float sum/max over the batch merged into (n, total, max) state)."""
    import pandas as pd

    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n": [n], "total": [total], "max_value": [mx]}
    )


def running_totals_stream_fallback(events_stream):
    """applyInPandasWithState spelling of `running_totals_stream` —
    same output schema, same per-batch update semantics, no protobuf
    dependency. State rides the default state store; for disk-bounded
    state at scale, prefer the TWS path where the environment has
    protobuf."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _running_totals_group,
        outputStructType=_OUTPUT_STRUCT,
        stateStructType=_STATE_STRUCT,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def has_transform_with_state_runtime() -> bool:
    """True when the TWS python worker can actually run (google.protobuf
    importable) — the env gate, factored so callers and tests share it."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_totals_stream_auto(events_stream):
    """The shipped entry point: transformWithStateInPandas where the
    runtime supports it, the applyInPandasWithState fallback otherwise.
    Both emit identical rows for the same input batches."""
    if has_transform_with_state_runtime():
        return running_totals_stream(events_stream)
    return running_totals_stream_fallback(events_stream)
