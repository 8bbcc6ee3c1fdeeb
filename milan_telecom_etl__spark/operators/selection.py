"""Training-data selection & lexical retrieval operators.

DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling") and BM25 scoring — the two
standard ways a pretraining pipeline ranks a raw pool against a target:
by distribution match (hashed n-gram bag models) and by query relevance.

No reference-repo counterpart (extension operators, like the rest of
the LLM-pipeline surface). All hot-path expressions are built-in
pyspark.sql.functions; hashing derives from md5 so the DuckDB oracle
reproduces values bit-for-bit.

Caching contract (ADVICE r8): operators that persist() shared subtrees
(tokenized corpora, term tables) leave them cached — the returned
DataFrame is lazy and still references them. Callers running many
operators in one session release them between calls with
`spark.catalog.clearCache()` (the bench/gate harnesses' per-query
protocol); single-operator library callers clearCache after their
pipeline's terminal action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_int60, _words_df
from .text import normalize_text

# Hashed-feature bucket count. Small enough that the per-bucket
# log-likelihood-ratio table always broadcasts (64 rows regardless of
# corpus size); large enough to separate the synthetic vocab. A real
# deploy raises this to 10k–100k buckets — still broadcast-sized.
DSIR_BUCKETS = 64

BM25_K1 = 1.2
BM25_B = 0.75


def _bucketed_tokens(docs: DataFrame, text_col: str, target_source: str, n_buckets: int):
    """(compact, toks): the persisted pre-explode (doc_id, is_target,
    __words) table — persisted COMPACT, before the explode multiplies
    rows — and its exploded token view with the hashed feature bucket."""
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    compact = (
        docs.select(
            "doc_id",
            (F.col("source") == target_source).alias("is_target"),
            F.split(normalize_text(text_col), " ").alias("__words"),
        )
        .repartition(n_parts, F.col("doc_id"))
        .persist()
    )
    toks = compact.select(
        "doc_id", "is_target", F.explode(F.col("__words")).alias("w")
    ).withColumn("b", _md5_int60(F.col("w")) % F.lit(n_buckets))
    return compact, toks


def dsir_weights(
    docs: DataFrame,
    text_col: str = "text",
    target_source: str = "src0",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-doc DSIR importance weight for every doc in the RAW pool
    (source != target_source): log p_target(doc) - log p_raw(doc) under
    hashed-unigram bag-of-words models with add-1 smoothing,

        weight(d) = sum_{tokens w in d} [ ln (c_t[b(w)]+1)/(T_t+B)
                                        - ln (c_r[b(w)]+1)/(T_r+B) ]

    where b(w) = md5(w) mod B, c_t/c_r are bucket counts over the
    target/raw corpora and T_t/T_r their token totals. High weight ⇒
    the doc looks like the target domain relative to the pool.

    Scale story: the feature space is B buckets by construction, so the
    bucket-count and LLR tables are constant-size broadcasts no matter
    the corpus; the per-doc weight is one explode + broadcast join +
    groupBy(doc_id) sum — a single shuffle keyed on doc_id. Nothing is
    ever collected; 100 TB changes only the map width.
    """
    _, toks = _bucketed_tokens(docs, text_col, target_source, n_buckets)
    counts = toks.groupBy("b").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_t"),
        F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias("c_r"),
    )
    totals = counts.agg(
        F.sum("c_t").alias("t_t"), F.sum("c_r").alias("t_r")
    )
    llr = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("c_t") + F.lit(1.0)) / (F.col("t_t") + F.lit(float(n_buckets))))
            - F.log((F.col("c_r") + F.lit(1.0)) / (F.col("t_r") + F.lit(float(n_buckets))))
        ).alias("llr"),
    )
    return (
        toks.filter(~F.col("is_target"))
        .join(F.broadcast(llr), "b")
        .groupBy("doc_id")
        .agg(F.round(F.sum("llr"), 6).alias("weight"))
    )


def dsir_topk(
    docs: DataFrame,
    k: int = 100,
    text_col: str = "text",
    target_source: str = "src0",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """The resampling step: keep the k raw-pool docs whose hashed-ngram
    distribution best matches the target domain (deterministic top-k by
    rounded weight, doc_id tiebreak — TakeOrderedAndProject, no global
    sort materialized)."""
    return (
        dsir_weights(docs, text_col, target_source, n_buckets)
        .orderBy(F.desc("weight"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk(
    docs: DataFrame,
    text_col: str = "text",
    n_query_terms: int = 3,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k docs per query term (Robertson/Sparck Jones; the
    +1-inside-the-log idf variant, always positive):

        idf(t)      = ln(1 + (N - df + 0.5)/(df + 0.5))
        score(t, d) = idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    The query set is data-derived and deterministic: the n_query_terms
    highest-document-frequency terms (term asc tiebreak) — the shape of
    a retrieval-quality probe over a corpus with no external query log.

    Scale story: the query-term table is n_query_terms rows (broadcast);
    tf is computed ONLY for those terms (the broadcast join prunes the
    token stream map-side before the groupBy), doc lengths are a
    map-only projection of the persisted words table, and N/avgdl ride
    one 1-row broadcast. Per-term top-k is a window over score — the
    only full-width shuffles are the df aggregation and the tf groupBy.
    """
    from pyspark.sql.window import Window

    words = _words_df(docs, text_col).persist()
    toks = words.select("doc_id", F.explode(F.col("__words")).alias("w"))
    df = toks.distinct().groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    top_terms = df.orderBy(F.desc("df"), F.asc("w")).limit(n_query_terms)
    dl = words.select("doc_id", F.size(F.col("__words")).cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.join(F.broadcast(top_terms), "w")
        .groupBy("doc_id", "w", "df")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("w").alias("term"),
            "doc_id",
            F.round(idf * F.col("tf") * F.lit(k1 + 1.0) / denom, 6).alias("score"),
        )
    )
    w_rk = Window.partitionBy("term").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w_rk).cast("int"))
        .filter(F.col("rk") <= k)
    )
