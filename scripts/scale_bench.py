"""Scale-proof the registry (VERDICT r5 #1): time every queries() entry
at two scale factors and record per-query growth ratios in
BENCH_SCALE.json. With 10x the data, a scale-safe plan should grow
wall-clock by <= ~10x (linear in SF; fixed overheads usually keep it
well under); anything super-linear is either a quadratic family or a
plan that stopped fitting, and gets flagged for a fix or a named
excuse.

Usage: python scripts/scale_bench.py [small_dir] [big_dir] [out]
  defaults: /root/testdata/sf0.1  .scaledata/sf1.0  BENCH_SCALE.json
(generate the big dir first: python scripts/make_scale_data.py)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PER_QUERY_TIMEOUT = float(os.environ.get("SPARK_GRAFT_SCALE_TIMEOUT", "600"))


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else ".scaledata/sf1.0"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_SCALE.json"
    growth = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0

    from milan_telecom_etl__spark.session import (
        DP_LAW_VERSION,
        derived_dp_for_dir,
        get_spark,
    )

    # derive the spill lever from the BIG tier's data volume (VERDICT
    # r13 #6): on a real cluster defaultParallelism grows with the
    # executor fleet; a fixed-core tier sweep must grow it with data
    # or the sf30 candidate-join family spills on a lever no plan can
    # move (the spill_ab.py measurement, as a default). Law v2 (VERDICT
    # r14 #3): derived from UNCOMPRESSED footer bytes — file bytes
    # under-derived ~4x on compressed events parquet.
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    dp = derived_dp_for_dir(big, cores)
    # BOTH shuffle levers follow the tier law: the r14 per-lever
    # attribution at sf30 measured semdedup_auto's spill as
    # defaultParallelism-bound (17.5 GB -> 0.5 GB at dp=128) and
    # minhash_lsh_candidates' as shuffle-WIDTH-bound (10.4 GB -> 0 at
    # sp=128, dp alone no-op) — a real cluster moves both by
    # construction (executor fleet + AQE initialPartitionNum)
    spark = get_spark(
        app_name="scale-bench",
        shuffle_partitions=dp,
        extra_conf={"spark.default.parallelism": str(dp)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    only = {
        n for n in os.environ.get("SPARK_GRAFT_SCALE_ONLY", "").split(",") if n
    }
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    try:  # JVM warmup; subset tiers (docs-grain sf30/sf100d) lack events
        entrymod.queries()["top_cells"](spark, small).count()
    except Exception:
        next(iter(qs.values()))(spark, small).count()

    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    force_noop = os.environ.get("SPARK_GRAFT_SCALE_FORCE", "") == "noop"
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        rec: dict = {}
        for label, sf_dir in [("small", small), ("big", big)]:
            # min over reps: a single cold run conflates first-touch IO
            # (parquet footers, JIT of fresh codegen) with plan cost and
            # manufactured phantom superlinearity in the r6 profile
            # (spatial_join_zones: 11.7x cold, 2.1x warm)
            walls: list[float] = []
            for _ in range(max(1, reps)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                try:
                    # default protocol: count() — comparable round-over-
                    # round, but Catalyst prunes columns the count does
                    # not need, so pure-projection entries measure only
                    # their scan (the dedup_index_compaction gotcha,
                    # SCALE.md). FORCE=noop materializes EVERY column
                    # through the noop sink — the honest cost of
                    # map-only operators, recorded as a separate
                    # artifact, never merged into count()-protocol runs.
                    if force_noop:
                        df = fn(spark, sf_dir)
                        df.write.format("noop").mode("overwrite").save()
                        n = -1
                    else:
                        n = fn(spark, sf_dir).count()
                    walls.append(round(time.perf_counter() - t0, 3))
                    rec[f"{label}_rows"] = n
                except Exception as e:
                    rec[label] = -1.0
                    rec[f"{label}_err"] = str(e)[:200]
                    break
                if time.perf_counter() - t0 > PER_QUERY_TIMEOUT:
                    rec[f"{label}_timeout"] = True
                    break
            if walls and rec.get(label) != -1.0:
                rec[label] = min(walls)
        if rec.get("small", -1) > 0 and rec.get("big", -1) > 0:
            rec["ratio"] = round(rec["big"] / max(rec["small"], 0.05), 2)
        results[name] = rec
        print(
            f"{name}: small={rec.get('small')} big={rec.get('big')} "
            f"ratio={rec.get('ratio')}",
            file=sys.stderr,
            flush=True,
        )

    ok = {k: v for k, v in results.items() if "ratio" in v}
    ratios = sorted(ok.items(), key=lambda kv: -kv[1]["ratio"])
    sha = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    payload = {
        "protocol": "noop-materialize-all-columns" if force_noop else "count",
        "small_dir": small,
        "big_dir": big,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "dp_law_version": DP_LAW_VERSION,
        "data_growth_x": growth,
        "git_sha": sha,
        "wall_clock_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_queries": len(results),
        "n_failed_big": len([r for r in results.values() if r.get("big", -1) < 0]),
        "median_ratio": sorted(v["ratio"] for v in ok.values())[len(ok) // 2],
        "worst10": {k: v["ratio"] for k, v in ratios[:10]},
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, sort_keys=True, indent=1)
    print(json.dumps({k: payload[k] for k in
                      ("median_ratio", "n_failed_big", "worst10")}))
    spark.stop()


if __name__ == "__main__":
    main()
