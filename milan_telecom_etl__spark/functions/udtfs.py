"""Python UDTFs (Spark 4 `@udtf`) — the lateral-join extension point:
one input row → many output rows with arbitrary Python, registrable
into SQL (`spark.udtf.register`) and usable as
`SELECT ... FROM t, LATERAL fn(col)`.

Kept OFF the hot path by policy (a UDTF is a Python process hop);
they exist for calendar/expansion logic where the row fan-out is the
point and the per-row work is trivial.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.functions import udtf


@udtf(returnType="hour_start timestamp, hour_index int")
class ExpandHourly:
    """Emit one row per hour boundary in [start, end) — the calendar
    spine for gap-filling and SCD interval explosion. Bounded fan-out:
    caps at 10_000 rows per input to keep a bad interval from exploding
    a task."""

    def eval(self, start: dt.datetime, end: dt.datetime):
        if start is None or end is None:
            return
        h = start.replace(minute=0, second=0, microsecond=0)
        if h < start:
            h += dt.timedelta(hours=1)
        i = 0
        while h < end and i < 10_000:
            yield (h, i)
            h += dt.timedelta(hours=1)
            i += 1


def register_udtfs(spark) -> None:
    spark.udtf.register("expand_hourly", ExpandHourly)
