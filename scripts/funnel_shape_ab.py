"""curation_funnel gate-shape A/B at scale (VERDICT r15 #8).

r15 measured gate-CHAINING (one fused projection carrying
allowed/doc_pass/gq_pass, zero joins) SLOWER than the committed
join shape at sf0.1 (12.3/13.3 s vs 10.9/8.7 s interleaved) — the
fused mega-projection serializes the three regex batteries into one
codegen unit while the join shape runs them as parallel DAG branches.
The open question was whether the trade flips at sf1+, where the three
corpus-grain shuffle-merge joins carry real data volume.

This script times BOTH shapes of the three-gate section (url -> c4 ->
gopher quality; the repetition/dedup/decontamination stages are
byte-identical in both shapes and excluded so the A/B isolates the
join-vs-fusion trade) interleaved, 2 rounds each, on a chosen sf dir,
and checks the two shapes agree on the funnel counts.

Usage: python scripts/funnel_shape_ab.py [sf_dir]   (default .scaledata/sf1.0)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from milan_telecom_etl__spark.session import get_spark
from milan_telecom_etl__spark.sources.parquet import load_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scaledata/sf1.0"
    spark = get_spark(app_name="funnel-shape-ab")
    spark.sparkContext.setLogLevel("ERROR")

    from milan_telecom_etl__spark.operators import text as X
    from milan_telecom_etl__spark.registry_quality import (
        GOPHER_CORPUS_RULES,
        gopher_flag_frame,
        url_flag_frame,
    )

    def gq_pass_col():
        c = F.lit(True)
        for r in GOPHER_CORPUS_RULES:
            c = c & F.col(r)
        return c.alias("gq_pass")

    def agg(f):
        return f.agg(
            F.sum(F.col("allowed").cast("long")).alias("n2"),
            F.sum((F.col("allowed") & F.col("doc_pass")).cast("long")).alias("n3"),
            F.sum(
                (F.col("allowed") & F.col("doc_pass") & F.col("gq_pass")).cast("long")
            ).alias("n4"),
        )

    def join_shape():
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").persist()
        u = url_flag_frame(docs).select("doc_id", "allowed")
        c4 = X.c4_line_filter(docs).select("doc_id", "doc_pass")
        gq = gopher_flag_frame(docs).select("doc_id", gq_pass_col())
        f = (
            docs.select("doc_id")
            .join(u.hint("merge"), "doc_id")
            .join(c4.hint("merge"), "doc_id")
            .join(gq.hint("merge"), "doc_id")
        )
        return agg(f), docs

    def chained_shape():
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        u = url_flag_frame(docs, extra_cols=("text",)).select(
            "doc_id", "text", "allowed"
        )
        c4 = X.c4_line_filter(u, extra_cols=("allowed", "text")).select(
            "doc_id", "text", "allowed", "doc_pass"
        )
        gq = gopher_flag_frame(c4, extra_cols=("allowed", "doc_pass")).select(
            "doc_id", "allowed", "doc_pass", gq_pass_col()
        )
        return agg(gq), None

    # value agreement first (cold run also warms JIT/footers)
    a, docs_a = join_shape()
    ra = a.collect()[0].asDict()
    if docs_a is not None:
        docs_a.unpersist()
    spark.catalog.clearCache()
    b, _ = chained_shape()
    rb = b.collect()[0].asDict()
    print(f"join-shape counts:    {ra}")
    print(f"chained-shape counts: {rb}")
    assert ra == rb, "shapes disagree — A/B void"

    results: dict[str, list[float]] = {"join": [], "chained": []}
    for rnd in range(2):
        for name, builder in (("join", join_shape), ("chained", chained_shape)):
            spark.catalog.clearCache()
            df, cached = builder()
            t0 = time.perf_counter()
            df.collect()
            dt = time.perf_counter() - t0
            results[name].append(dt)
            if cached is not None:
                cached.unpersist()
            print(f"round {rnd} {name}: {dt:.2f}s", flush=True)
    print(
        f"RESULT sf_dir={sf_dir} join={results['join']} chained={results['chained']}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
