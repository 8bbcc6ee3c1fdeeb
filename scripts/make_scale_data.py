"""Generate a larger synthetic SF by replicating /root/testdata/sf0.1
with key shifting — FK-consistent, distribution-preserving — so the
registry can be scale-profiled above the driver's largest shipped SF
(VERDICT r5 #1). Writes under .scaledata/ (gitignored); never touches
/root/testdata.

Replication contract (replica i of R, replica 0 == the original):
- region/nation: fixed (TPC-H semantics — dimension tables don't scale).
- customer/supplier/part/orders/lineitem: every surrogate/FK key k
  becomes k + i*STRIDE for a stride beyond the base key range, so join
  fan-in/fan-out per key is UNCHANGED and replicas never cross-join.
- events: event_id/user_id shifted; ts shifted by i microseconds so
  event times interleave (window/sessionize workloads see a denser
  stream, same per-user cadence).
- documents: doc_id shifted; for i>0 every 4th word is tagged with the
  replica id, which breaks ~3/4 of word-3-gram shingles, pushing
  cross-replica Jaccard far below every dedup threshold — duplicate
  STRUCTURE (the template corpus) scales linearly instead of
  quadratically across replicas.
- embeddings: vec_id shifted; for i>0 vectors are regenerated from a
  per-(replica, vec_id, dim) splitmix-style hash, uniform in [-1, 1] —
  cross-replica cosines concentrate near 0, so near-dup pair counts
  scale like the corpus, not its square.

Usage: python scripts/make_scale_data.py [R] [out_dir]
  R default 10 (sf0.1 x 10 ~= sf1.0), out .scaledata/sf1.0
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000  # beyond every base key range (max o_orderkey < 1e6)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else ".scaledata/sf1.0"
    # optional 3rd arg: comma-list of tables to generate (default all) —
    # lets a documents-only decade (e.g. sf30 for the text families)
    # skip the 180M-row lineitem replication it would never read
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    threads = int(
        os.environ.get("SPARK_GRAFT_DUCK_THREADS", os.cpu_count() or 8)
    )
    con.execute(f"SET threads TO {threads}")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        if only is not None and t not in only:
            return
        con.execute(
            f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    write("region", f"SELECT * FROM {src('region')}")
    write("nation", f"SELECT * FROM {src('nation')}")

    r = f"(SELECT unnest(range({reps})) AS i)"
    shift = lambda c: f"{c} + i * {STRIDE}"  # noqa: E731

    write(
        "customer",
        f"""SELECT {shift('c_custkey')} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM {src('customer')}, {r}""",
    )
    write(
        "supplier",
        # replica tag appended TWICE: cross-replica name pairs land at
        # Levenshtein 2, outside the fuzzy-join threshold, so fuzzy-pair
        # density stays constant per replica instead of growing
        # quadratically across them (a pure data artifact otherwise)
        f"""SELECT {shift('s_suppkey')} AS s_suppkey,
                   CASE WHEN i = 0 THEN s_name
                        ELSE s_name || '-r' || i || i END AS s_name,
                   s_nationkey, s_acctbal
            FROM {src('supplier')}, {r}""",
    )
    write(
        "part",
        f"""SELECT {shift('p_partkey')} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM {src('part')}, {r}""",
    )
    write(
        "orders",
        f"""SELECT {shift('o_orderkey')} AS o_orderkey,
                   {shift('o_custkey')} AS o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}, {r}""",
    )
    write(
        "lineitem",
        f"""SELECT {shift('l_orderkey')} AS l_orderkey,
                   {shift('l_partkey')} AS l_partkey,
                   {shift('l_suppkey')} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}, {r}""",
    )
    write(
        "events",
        f"""SELECT {shift('event_id')} AS event_id,
                   ts + to_microseconds(i) AS ts,
                   {shift('user_id')} AS user_id,
                   event_type, value, props
            FROM {src('events')}, {r}""",
    )
    write(
        "documents",
        f"""SELECT {shift('doc_id')} AS doc_id,
                   CASE WHEN i = 0 THEN text ELSE
                     array_to_string(
                       list_transform(string_split(text, ' '),
                         (w, j) -> CASE WHEN j % 4 = 0
                                   THEN 'r' || i || w ELSE w END),
                       ' ')
                   END AS text,
                   lang, source, n_chars
            FROM {src('documents')}, {r}""",
    )
    write(
        "embeddings",
        f"""SELECT {shift('vec_id')} AS vec_id,
                   CASE WHEN i = 0 THEN embedding ELSE
                     list_transform(range(1, len(embedding) + 1),
                       d -> CAST(
                         (CAST(hash(i * 1000003 + vec_id * 131 + d)
                               % 2000001 AS BIGINT)
                          - 1000000) / 1000000.0 AS FLOAT))
                   END AS embedding,
                   label
            FROM {src('embeddings')}, {r}""",
    )
    con.close()


if __name__ == "__main__":
    main()
