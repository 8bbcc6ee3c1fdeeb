"""A/B the three skew postures on a deliberately skewed shuffle join
(VERDICT r10 #8 / r11 "Next" #9 — the data behind SCALE.md's "Salted
joins vs AQE" crossover):

  naive    — AQE skew-split OFF, plain sort-merge join: the hot key's
             partition serializes on one task.
  aqe      — AQE skew-split ON (thresholds scaled to the fixture):
             OptimizeSkewedJoin splits the hot partition at runtime.
  salted   — explicit replicate-and-salt (k=8), the form for skew the
             planner cannot see (stats hidden by bucketing etc.).

Fixture: probe side N rows with FRAC of them on ONE key, build side
small-but-over-broadcast-threshold (broadcast disabled to force the
shuffle join all three postures share).

Usage: python scripts/skew_ab.py [N] [reps]   (default 4e6, 3)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 4_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
KSALT = 8


def fixture(spark):
    left = spark.range(N, numPartitions=32).select(
        F.when(F.col("id") % 3 > 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(50_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return left, right


def agg(j):
    return j.groupBy().agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))


def run(spark, mode):
    left, right = fixture(spark)
    if mode == "salted":
        ls = left.withColumn("__salt", (F.col("v") % KSALT).cast("int"))
        rs = right.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(KSALT)]))
        )
        df = agg(ls.join(rs, (ls.k == rs.k) & (ls.__salt == rs.__salt)))
    else:
        df = agg(left.join(right, "k"))
    t0 = time.perf_counter()
    row = df.collect()[0]
    dt = time.perf_counter() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    return dt, (row["n"], row["sv"]), "skew=true" in plan


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("skew-ab")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # skew thresholds scaled to the fixture (the defaults target
    # 256MB+ partitions; the MECHANISM, not the constants, is under test)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1048576"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1048576")

    out: dict[str, dict] = {}
    answers = set()
    for mode in ("naive", "aqe", "salted"):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled",
            "true" if mode == "aqe" else "false",
        )
        run(spark, mode)  # untimed warmup
        times, fired = [], False
        for _ in range(REPS):
            dt, ans, f = run(spark, mode)
            times.append(dt)
            fired = fired or f
            answers.add(ans)
        out[mode] = {
            "median_sec": round(statistics.median(times), 3),
            "skew_split_fired": fired,
        }
    out["answers_identical"] = len(answers) == 1
    out["n_rows"] = N
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
