"""Per-entry wall breakdown: DataFrame build vs Catalyst optimize vs
physical planning vs execution, under the bench protocol (1 untimed
warmup, median of 3). Separates plan-size-bound entries (driver-side
re-optimization dominates at small SF) from execution-bound ones.

Usage: python scripts/probe_breakdown.py entry [entry ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from milan_telecom_etl__spark.caching import release_tracked
from milan_telecom_etl__spark.session import get_spark


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-breakdown")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m

    qs = m.queries()
    try:
        qs["top_cells"](spark, sf_dir).count()  # session warmup
    except Exception:
        pass
    print(f"{'entry':40} {'build':>6} {'optim':>6} {'phys':>6} {'exec':>6} {'total':>6}")
    for name in names:
        if name not in qs:
            print(f"{name:40} MISSING")
            continue
        fn = qs[name]
        spark.catalog.clearCache()
        try:
            fn(spark, sf_dir).count()  # untimed warmup rep
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                qe = df._jdf.queryExecution()
                qe.optimizedPlan()
                t2 = time.perf_counter()
                qe.executedPlan()
                t3 = time.perf_counter()
                df.count()
                t4 = time.perf_counter()
                reps.append((t1 - t0, t2 - t1, t3 - t2, t4 - t3, t4 - t0))
            med = [statistics.median(r[i] for r in reps) for i in range(5)]
            print(
                f"{name:40} {med[0]:6.2f} {med[1]:6.2f} {med[2]:6.2f} "
                f"{med[3]:6.2f} {med[4]:6.2f}"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:40} FAIL {e}")
        finally:
            release_tracked()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
