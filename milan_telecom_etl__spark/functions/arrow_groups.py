"""groupBy().applyInArrow — the zero-copy per-group kernel tier
(VERDICT r1 #9): each group arrives as ONE pyarrow Table (no pandas
conversion, no per-row Python), the kernel runs vectorized numpy, and
the result goes back as arrow. Complements the existing tiers:
mapInArrow (per-batch, no grouping), applyInPandas (per-group, pandas
semantics), transformWithState (per-key streaming state).

Use when the per-group logic is a numpy/BLAS kernel over the whole
group (sequence features, spectral stats, per-entity model fits) and
the group count is large — grouping is ONE shuffle on the group key,
then kernels run data-parallel per group with Arrow-batch memory
bounds.

Parity discipline: kernels emit EXACT INTEGERS (µs spans), never
Python-rounded floats — Python's round() is half-even while Spark and
DuckDB round half-up-ish on raw binary, so a float crossing the Python
boundary is a parity lottery. Derived ratios belong in engine-side
round() calls, not in the kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAP_SCHEMA = "user_id long, n_events long, span_us long, max_gap_us long"


def user_gap_stats(events: DataFrame) -> DataFrame:
    """Per-user event-sequence features: event count, total span, and
    the largest inter-arrival gap, all in exact integer microseconds.

    The kernel sorts the group's timestamps and diffs them — the
    multiset of adjacent differences of a sorted multiset is
    permutation-invariant, so results are deterministic regardless of
    arrow batch order. Single-event users get span 0 and a NULL gap
    (nothing to diff), matching SQL's lag-over-one-row semantics.
    """

    def stats(table):  # pa.Table (one full group) -> pa.Table
        import numpy as np
        import pyarrow as pa

        us = np.sort(table.column("us").to_numpy())
        uid = table.column("user_id")[0].as_py()
        n = len(us)
        max_gap = int(np.diff(us).max()) if n > 1 else None
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
                "span_us": pa.array([int(us[-1] - us[0])], pa.int64()),
                "max_gap_us": pa.array([max_gap], pa.int64()),
            }
        )

    base = events.select("user_id", F.unix_micros("ts").alias("us"))
    return base.groupBy("user_id").applyInArrow(stats, schema=GAP_SCHEMA)
