"""Simulate the external driver's gates: vanilla SparkSession, run
entry() + every queries() entry vs its oracle_sql() at a given sf dir.

Usage: python scripts/driver_sim.py [sf_dir]  (default /root/testdata/sf0.01)
Exit code 0 iff everything matches.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m
    from tests.parity import compare, duck_connection

    rows = m.entry(spark).collect()
    print(f"entry: {len(rows)} rows")
    ok_all = len(rows) > 0

    con = duck_connection(sf_dir)
    oracles = m.oracle_sql()
    only = set(sys.argv[2:])  # optional: gate just these query names
    for name, fn in m.queries().items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        if name in oracles:
            ok, msg = compare(df, con, oracles[name])
            print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}")
            ok_all &= ok
        else:
            n = df.count()
            print(f"ROWS-ONLY {name}: {n} rows")
    spark.stop()
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
