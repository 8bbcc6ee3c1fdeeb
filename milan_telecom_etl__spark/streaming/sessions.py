"""Custom stateful streaming operator: incremental sessionization via
applyInPandasWithState (SURVEY.md §2.9 extension; the one operator class
where built-in windowed aggs genuinely can't express the semantics —
session boundaries depend on per-key event *gaps*, not fixed windows).

State model (per user_id): the currently-open session
(start, last_ts, n_events, total_value). On each micro-batch:
merge the batch's events in timestamp order; whenever the gap to the
next event exceeds `gap` minutes, the open session CLOSES and is
emitted; the newest session stays open in state (emitted on timeout or
a later batch). Exactly the semantics of the batch `sessionize` query
(registry_analytics), made incremental.

Scale shape: state is one small tuple per active user; the stream
shuffles once on user_id; Arrow batches carry the group's rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:
    import pandas as pd

SESSION_GAP_MIN = 30

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# (start_us, last_us, n_events, total_value) — epoch micros keep the
# state schema primitive
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _make_sessionizer(use_timeout: bool):
    """Build the per-group state function; the flag is captured in the
    closure (serialized by value to workers)."""

    def _sessionize_group(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        gap_us = SESSION_GAP_MIN * 60 * 1_000_000

        if state.hasTimedOut:  # idle user: flush the open session
            if state.exists:
                start_us, last_us, n, total = state.get
                state.remove()
                yield pd.DataFrame(
                    [(user_id, pd.Timestamp(start_us, unit="us"),
                      pd.Timestamp(last_us, unit="us"), n, total)],
                    columns=[f.name for f in OUTPUT_SCHEMA.fields],
                )
            return

        events = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        if state.exists:
            cur = list(state.get)
        else:
            cur = None

        closed: list[tuple] = []
        for row in events.itertuples(index=False):
            ts_us = int(pd.Timestamp(row.ts).value // 1000)
            v = float(row.value)
            if cur is None:
                cur = [ts_us, ts_us, 1, v]
            elif ts_us - cur[1] > gap_us:
                closed.append(tuple(cur))
                cur = [ts_us, ts_us, 1, v]
            else:
                cur[1] = ts_us
                cur[2] += 1
                cur[3] += v
        state.update(tuple(cur))
        if use_timeout:
            state.setTimeoutDuration(60 * 60 * 1000)  # flush idle users after 1h

        if closed:
            yield pd.DataFrame(
                [
                    (user_id, pd.Timestamp(s, unit="us"), pd.Timestamp(e, unit="us"), n, t)
                    for (s, e, n, t) in closed
                ],
                columns=[f.name for f in OUTPUT_SCHEMA.fields],
            )


    return _sessionize_group


def sessionize_stream(events_stream: DataFrame, idle_flush: bool = False) -> DataFrame:
    """events stream (ts, user_id, value, ...) → closed sessions.

    idle_flush=True adds a 1-hour processing-time timeout that emits a
    user's open session when no events arrive — correct for continuous
    triggers, but it keeps no-data state-cleanup batches firing, so a
    bounded availableNow drain should leave it off (open sessions then
    simply persist in the state store for the next run).
    """
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(idle_flush),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_flush
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
