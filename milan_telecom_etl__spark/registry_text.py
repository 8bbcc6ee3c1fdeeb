"""Registry entries: text analysis + dedup operators over `documents`.

Oracle SQL shares the exact normalization/hash pipeline with the Spark
side (md5-derived integers), so values match bit-for-bit; float ratios
are rounded to 6 places on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup as D
from .operators import text as X
from .queries_registry import register
from .sources.parquet import load_table, table_row_count

# --- shared DuckDB fragments ------------------------------------------------

_NORM = (
    r"trim(regexp_replace(regexp_replace(lower({c}), '[^a-zA-Z0-9\s]', '', 'g'),"
    r" '\s+', ' ', 'g'))"
)


def _norm(c: str = "text") -> str:
    return _NORM.format(c=c)


# (doc_id, shingle_hash) CTE — distinct word-3-gram shingles, md5→60-bit int.
# cap = max shingle document frequency (mirrors shingle_table's
# max_shingle_df: stop-shingles above the cap leave both the join AND
# the per-doc sizes).
def _shingle_cte(cap: int | None = None) -> str:
    raw = f"""
  docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
  words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM docs),
  sh_raw AS (
    SELECT DISTINCT doc_id,
           ('0x' || substr(md5(s), 1, 15))::BIGINT AS shingle_hash
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                     i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS s
      FROM words)
  )"""
    if cap is None:
        return raw + ",\n  sh AS (SELECT * FROM sh_raw)"
    return (
        raw
        + f""",
  sh AS (
    SELECT sh_raw.* FROM sh_raw
    WHERE shingle_hash NOT IN (
      SELECT shingle_hash FROM sh_raw GROUP BY 1 HAVING count(*) > {cap})
  )"""
    )


_SHINGLE_CTE = _shingle_cte()


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_stats",
    r"""
    SELECT doc_id,
      CAST(length(text) AS BIGINT) AS n_chars,
      CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT) AS n_words,
      CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_tokens,
      round(CASE WHEN len(regexp_extract_all(text, '[a-zA-Z0-9]+')) > 0
            THEN length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))
                 * 1.0 / len(regexp_extract_all(text, '[a-zA-Z0-9]+'))
            ELSE 0.0 END, 6) AS avg_word_len,
      round(CASE WHEN length(text) > 0
            THEN len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) * 1.0 / length(text)
            ELSE 0.0 END, 6) AS punct_ratio,
      CAST(len(regexp_extract_all(text,
        '(?i)\b(the|a|of|and|to|in|is|on|for|with)\b')) AS BIGINT) AS n_stopwords
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc base features for quality filtering — all JVM-side."""
    return X.text_stats(load_table(spark, sf_dir, "documents"))


@register(
    "quality_score",
    r"""
    WITH s AS (
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT) AS n_words,
        len(regexp_extract_all(text, '(?i)\b(the|a|of|and|to|in|is|on|for|with)\b')) AS n_stop,
        CASE WHEN length(text) > 0
             THEN len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) * 1.0 / length(text)
             ELSE 0.0 END AS pr
      FROM documents)
    SELECT doc_id, n_words,
      round(((CASE WHEN n_words BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
           + least(CASE WHEN n_words > 0 THEN n_stop * 1.0 / n_words ELSE 0.0 END * 5, 1.0)
           + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3, 6) AS quality
    FROM s
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style composite quality heuristic."""
    return X.quality_score(load_table(spark, sf_dir, "documents"))


def _lang_sql() -> str:
    scores = []
    for lang, ws in sorted(X.LANG_PROFILES.items()):
        pat = "(?i)\\\\b(" + "|".join(ws) + ")\\\\b"
        scores.append(f"len(regexp_extract_all(text, e'{pat}')) AS s_{lang}")
    langs_desc = sorted(X.LANG_PROFILES, reverse=True)  # tie → lexicographically last
    best = "greatest(" + ", ".join(f"s_{la}" for la in sorted(X.LANG_PROFILES)) + ")"
    case = " ".join(f"WHEN s_{la} = best THEN '{la}'" for la in langs_desc)
    return f"""
    WITH s AS (SELECT doc_id, {', '.join(scores)} FROM documents),
    m AS (SELECT *, {best} AS best FROM s)
    SELECT doc_id,
           CASE WHEN best > 0 THEN (CASE {case} END) ELSE 'und' END AS lang_pred,
           CAST(best AS BIGINT) AS lang_hits
    FROM m
    """


@register("lang_id", _lang_sql())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word-profile language ID (deterministic heuristic)."""
    return X.lang_id(load_table(spark, sf_dir, "documents"))


@register(
    "doc_fingerprint",
    f"SELECT doc_id, md5({_norm()}) AS fingerprint FROM documents",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint = md5 of normalized text."""
    return X.doc_fingerprint(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


def _fingerprint_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing dedup index: documents projected to (doc_id,
    fingerprint) and BUCKETED on the fingerprint — built once per
    corpus by `bucketed.bucketed_table` (derive + variant identity),
    the reference's computed-column B-tree re-expressed as a
    pay-the-shuffle-once layout. Every exact-dedup-family query on
    the fingerprint key then runs without any Exchange."""
    from .bucketed import bucketed_table

    def derive(docs: DataFrame) -> DataFrame:
        return docs.select(
            "doc_id", F.md5(X.normalize_text("text")).alias("fingerprint")
        )

    # size_fraction: the index is (int64, 32-char hash) ≈ 50 B/row of
    # multi-KB document rows — size its buckets on ITS bytes, not the
    # corpus's (bucketed_table docstring; 1/32 is ~2x conservative)
    return bucketed_table(
        spark,
        sf_dir,
        "documents",
        "fingerprint",
        derive=derive,
        variant="fpidx",
        size_fraction=1 / 32,
    )


@register(
    "exact_dup_groups",
    f"""
    SELECT md5({_norm()}) AS fingerprint,
           count(*) AS n_docs, min(doc_id) AS keeper_doc_id
    FROM documents GROUP BY 1 HAVING count(*) > 1
    """,
)
def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup groups by normalized-content hash, SERVED from the
    standing bucketed fingerprint index (VERDICT r12 #4): the groupBy
    on the fingerprint is satisfied by the index's bucket partitioning
    — a single HashAggregate with zero Exchange (plan-pinned). The
    md5 + shuffle cost that made exact dedup memory-bandwidth-bound at
    sf10 (SCALE.md saturation counters) is paid once at index build,
    not per query. `exact_dup_groups_plain` keeps the scan-and-shuffle
    twin on the clock for measurement."""
    idx = _fingerprint_index(spark, sf_dir)
    return (
        idx.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "exact_dup_groups_plain",
    f"""
    SELECT md5({_norm()}) AS fingerprint,
           count(*) AS n_docs, min(doc_id) AS keeper_doc_id
    FROM documents GROUP BY 1 HAVING count(*) > 1
    """,
)
def q_exact_dup_groups_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measurement twin of `exact_dup_groups`: same semantics,
    computed from the raw documents scan (md5 + shuffle per query) —
    what every query pays WITHOUT the standing index."""
    return D.exact_duplicates(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_exact_keepers",
    f"""
    SELECT min(doc_id) AS doc_id FROM (
      SELECT doc_id, md5({_norm()}) AS fp FROM documents
    ) GROUP BY fp
    """,
)
def q_dedup_exact_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kept doc ids after exact dedup (min doc_id per content),
    served from the standing bucketed fingerprint index — the
    keeper-per-group aggregate rides the index's bucket partitioning
    (zero Exchange) and never touches the text again. Semantics
    identical to `D.dedupe_exact(docs).select("doc_id")` (the plain
    operator keeps full rows; this entry needs only the ids)."""
    idx = _fingerprint_index(spark, sf_dir)
    return idx.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id"
    )


@register(
    "exact_dup_groups_appendable",
    f"""
    SELECT md5({_norm()}) AS fingerprint,
           count(*) AS n_docs, min(doc_id) AS keeper_doc_id
    FROM documents GROUP BY 1 HAVING count(*) > 1
    """,
)
def q_exact_dup_groups_appendable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup groups served from the APPEND-ONLY fingerprint index
    (VERDICT r13 #5): same semantics and zero-Exchange serving plan as
    `exact_dup_groups`, but the standing index refreshes on corpus
    GROWTH by bucketing only the newly arrived files into the standing
    width (`bucketed.appendable_bucketed_table`) instead of rewriting
    history — the missing piece of the 100 TB ingest story, where the
    corpus only ever grows and a fingerprint-keyed identity would pay
    a whole-corpus rewrite per ingest batch. The union read (history
    buckets + delta files) is one bucketed scan, so the groupBy still
    rides the bucket partitioning with no Exchange (plan-pinned, and
    pinned equal to a full rebuild after an append in
    tests/test_plans.py)."""
    from .bucketed import appendable_bucketed_table

    def derive(docs: DataFrame) -> DataFrame:
        return docs.select(
            "doc_id", F.md5(X.normalize_text("text")).alias("fingerprint")
        )

    idx = appendable_bucketed_table(
        spark,
        sf_dir,
        "documents",
        "fingerprint",
        derive=derive,
        variant="fpidx",
        size_fraction=1 / 32,
    )
    return (
        idx.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "ngram_jaccard_pairs",
    f"""
    WITH {_SHINGLE_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, n_common,
           round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) >= 0.1
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup pairs (3-gram shingle Jaccard ≥ 0.1)."""
    return D.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.1)


def _minhash_sql(num_hashes: int = 16) -> str:
    aggs = []
    for i, (a, b) in enumerate(D._hash_params(num_hashes)):
        aggs.append(
            f"min(({a} * (shingle_hash % {D.MERSENNE_31}) + {b}) % {D.MERSENNE_31}) AS mh_{i}"
        )
    return f"WITH {_SHINGLE_CTE} SELECT doc_id, {', '.join(aggs)} FROM sh GROUP BY doc_id"


@register("minhash_signatures", _minhash_sql())
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-permutation MinHash signature per doc."""
    return D.minhash_signatures(load_table(spark, sf_dir, "documents"))


def _lsh_sql(num_hashes: int = 16, band_size: int = 2) -> str:
    n_bands = num_hashes // band_size
    bands = []
    for bi in range(n_bands):
        cols = "||','||".join(
            f"CAST(mh_{bi * band_size + j} AS VARCHAR)" for j in range(band_size)
        )
        bands.append(f"SELECT doc_id, {bi} AS band_id, md5({cols}) AS band_hash FROM sig")
    banded = " UNION ALL ".join(bands)
    return f"""
    WITH {_SHINGLE_CTE},
    sig AS ({_minhash_sql_body(num_hashes)}),
    banded AS ({banded})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    """


def _minhash_sql_body(num_hashes: int = 16) -> str:
    aggs = []
    for i, (a, b) in enumerate(D._hash_params(num_hashes)):
        aggs.append(
            f"min(({a} * (shingle_hash % {D.MERSENNE_31}) + {b}) % {D.MERSENNE_31}) AS mh_{i}"
        )
    return f"SELECT doc_id, {', '.join(aggs)} FROM sh GROUP BY doc_id"


def _lsh_verified_sql(
    threshold: float = 0.5,
    cap: int | None = D.DEFAULT_MAX_SHINGLE_DF,
    num_hashes: int = 64,
    band_size: int = 4,
) -> str:
    """Two-stage near-dup oracle: LSH candidates (inner WITH — its own
    UNCAPPED shingle/minhash pipeline, shadowing the outer CTE names)
    verified by exact Jaccard over the df-CAPPED shingle table, exactly
    mirroring dedup.lsh_verified_pairs(max_shingle_df=cap). Banding
    defaults move in lockstep with the Spark side: sharp 64/4 (the
    scale-linear scheme) since round 8."""
    return f"""
    WITH {_shingle_cte(cap)},
    cand AS (SELECT * FROM ({_lsh_sql(num_hashes, band_size)})),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle_hash = a.shingle_hash
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) >= {threshold}
    """


@register("minhash_lsh_candidates", _lsh_sql())
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs (8 bands × 2 rows) — equality joins only."""
    return D.minhash_lsh_candidates(load_table(spark, sf_dir, "documents"))


_INCR_NEW_MAX_ID = 100


def _incremental_dedup_sql(
    new_max_id: int = _INCR_NEW_MAX_ID,
    num_hashes: int = 64,
    band_size: int = 4,
    threshold: float = 0.5,
    cap: int | None = D.DEFAULT_MAX_SHINGLE_DF,
) -> str:
    """Incremental (new-batch-vs-index) twin of _lsh_verified_sql: the
    candidate join keeps only pairs probing FROM the batch (doc_id <
    new_max_id) — against any index doc, or keep-first within the
    batch — then the same exact-Jaccard verify over the df-capped
    shingle table."""
    n_bands = num_hashes // band_size
    bands = []
    for bi in range(n_bands):
        cols = "||','||".join(
            f"CAST(mh_{bi * band_size + j} AS VARCHAR)" for j in range(band_size)
        )
        bands.append(f"SELECT doc_id, {bi} AS band_id, md5({cols}) AS band_hash FROM sig")
    banded = " UNION ALL ".join(bands)
    cand_inner = f"""
    WITH {_SHINGLE_CTE},
    sig AS ({_minhash_sql_body(num_hashes)}),
    banded AS ({banded})
    SELECT DISTINCT nb.doc_id AS new_doc, c.doc_id AS dup_of
    FROM banded nb JOIN banded c
      ON nb.band_id = c.band_id AND nb.band_hash = c.band_hash
    WHERE nb.doc_id < {new_max_id}
      AND (c.doc_id >= {new_max_id} OR c.doc_id < nb.doc_id)
    """
    return f"""
    WITH {_shingle_cte(cap)},
    cand AS (SELECT * FROM ({cand_inner})),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT c.new_doc, c.dup_of, count(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.new_doc
      JOIN sh b ON b.doc_id = c.dup_of AND b.shingle_hash = a.shingle_hash
      GROUP BY 1, 2
    )
    SELECT new_doc, dup_of, CAST(n_common AS BIGINT) AS n_common,
           round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard,
           dup_of >= {new_max_id} AS in_index
    FROM inter
    JOIN sizes sa ON new_doc = sa.doc_id
    JOIN sizes sb ON dup_of = sb.doc_id
    WHERE round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) >= {threshold}
    """


@register("incremental_dedup", _incremental_dedup_sql())
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch-vs-standing-index near-dup — the PRODUCTION dedup
    shape (daily crawl vs index; re-deduping the whole corpus per
    arrival is quadratic in corpus lifetime). Batch = doc_id < 100, a
    constant-size slice by contract (the batch does not grow with the
    corpus — the fixed-id-range pinning discipline the semantic-decon
    entry established); index = the rest, which DOES grow with SF.
    The batch's banded MinHash signatures broadcast; the corpus-side
    banded table streams through a broadcast-hash join — the corpus is
    never shuffled and never self-joined. Verified by exact shingle
    Jaccard ≥ 0.5 (the lsh_verified_pairs stage restricted to the
    probes). Output rows: every (new_doc, dup_of) verified duplicate
    with in_index flagging index-side matches."""
    return D.incremental_near_dups(
        load_table(spark, sf_dir, "documents"), new_max_id=_INCR_NEW_MAX_ID
    )


@register("incremental_dedup_serving", _incremental_dedup_sql())
def q_incremental_dedup_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`incremental_dedup` in its STANDING-ARTIFACT serving posture
    (the r12 streaming-probe discipline applied to the dedup north
    star): the index side's banded MinHash signature table and its
    UNCAPPED shingle inverted index are warehouse-parquet artifacts
    (artifacts.py — built once per corpus fingerprint by the offline
    index-refresh job `dedup_index_compaction` models), and only the
    arriving batch's signatures/shingles are computed at probe time.
    Identical output to `incremental_dedup` (same oracle; the df
    stop-shingle cap applies to artifact+batch UNION frequencies —
    see operators/dedup.py incremental_near_dups_serving for why the
    artifact must store uncapped shingles). At 100 TB this is the form
    that never rescans the corpus per batch: probe cost is
    O(batch signatures + candidate shingle rows)."""
    from .artifacts import load_or_build

    docs = load_table(spark, sf_dir, "documents")
    b = _INCR_NEW_MAX_ID
    index_docs = docs.filter(F.col("doc_id") >= b)
    banded = load_or_build(
        spark,
        sf_dir,
        f"dedup_banded_64x4_n3_b{b}",
        lambda: D.minhash_banded(index_docs, num_hashes=64, band_size=4),
    )
    shingles = load_or_build(
        spark,
        sf_dir,
        f"dedup_shingles_n3_uncapped_b{b}",
        lambda: D.shingle_table(index_docs, n=3),
    )
    return D.incremental_near_dups_serving(
        docs.filter(F.col("doc_id") < b),
        banded,
        shingles,
        new_max_id=b,
    )


def _banded_bh(docs: DataFrame) -> DataFrame:
    """The appendable LSH index's derived projection: sharp 64x4
    banding with the fused bucket key bh = band_id:band_hash (string
    equality on bh IS the pair predicate). Module-level so the plan-pin
    test can pre-build the same identity at an explicit n>1 width."""
    banded = D.minhash_banded(docs, num_hashes=64, band_size=4)
    return banded.select(
        "doc_id",
        F.concat_ws(":", F.col("band_id"), F.col("band_hash")).alias("bh"),
    )


@register("minhash_candidates_appendable", _lsh_sql(num_hashes=64, band_size=4))
def q_minhash_candidates_appendable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp-banding LSH candidates served from an APPEND-ONLY banded
    signature index (VERDICT r14 #4 — the third consumer of the
    append-only posture, after the fingerprint index and the HLL
    partials store). MinHash signatures are per-doc map-only folds, so
    the banded table is batch-independent and append-only by
    construction on a grow-only corpus: ingest banding computes
    signatures ONLY for newly arrived files' docs and buckets them into
    the standing width (`bucketed.appendable_bucketed_table` — per-file
    manifest, pending-marker crash safety, width-migration rebuild);
    history docs' text is never re-shingled, at append time or at query
    time (the serve plan scans only the index — plan-pinned).

    The bucket key is the FUSED band key `bh = band_id:band_hash`
    (string equality on it is exactly the pair predicate band_id = AND
    band_hash =): Spark's co-partition check requires the join keys to
    match the bucket columns exactly (requireAllClusterKeysForCoPartition),
    so bucketing on band_hash alone and joining on the pair would
    re-shuffle both sides. On the fused key the candidate self-join is
    a bucketed SortMergeJoin with ZERO Exchange below the join —
    delta-vs-history and delta-vs-delta collisions ride the same
    standing buckets (pinned with broadcast disabled at an explicit
    n>1 build). Same oracle as `minhash_lsh_sharp`; pinned equal to a
    full re-fold after an append in tests/test_plans.py."""
    from .bucketed import appendable_bucketed_table

    idx = appendable_bucketed_table(
        spark,
        sf_dir,
        "documents",
        "bh",
        derive=_banded_bh,
        variant="mhband64x4bh",
        # the banded projection is ~4x the corpus bytes (16 rows/doc of
        # high-entropy 37-char md5 keys defeat parquet compression),
        # measured on the documents corpus — buckets size on the
        # INDEX's bytes, not the text's
        size_fraction=4.0,
    )
    a, b = idx.alias("a"), idx.alias("b")
    return (
        a.join(b, ["bh"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def _shingles_n3(docs: DataFrame) -> DataFrame:
    """The appendable shingle store's derived projection: the UNCAPPED
    (doc_id, shingle) inverted-index rows — per-doc map-only, so
    append-only by construction. Uncapped for the same reason the
    fingerprint-keyed artifact stores uncapped shingles: the df
    stop-shingle cap must see the SERVE-TIME corpus frequencies."""
    return D.shingle_table(docs, n=3)


@register("incremental_dedup_appendable", _incremental_dedup_sql())
def q_incremental_dedup_appendable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`incremental_dedup` with BOTH index artifacts served from
    append-only standing stores — the posture where ingest has already
    appended the arriving files to the corpus and to the standing
    indexes, and dedup-at-ingest reads everything from the stores:

    - banded signatures: sliced from the SAME appendable fused-key
      index `minhash_candidates_appendable` serves (bh unfuses back to
      (band_id, band_hash) by splitting on ':'); corpus growth bands
      only the new files' docs — history is never re-banded;
    - shingles: a fourth append consumer — the uncapped (doc_id,
      shingle) inverted index as an appendable store bucketed by
      doc_id (the per-doc size aggregate rides the buckets; the verify
      joins broadcast the candidate set). Corpus growth appends only
      the new files' shingle rows — history text is never re-shingled.

    Probe-time cost reads ZERO document text (plan-pinned: no
    documents.parquet scan anywhere); the only whole-store pass is the
    df stop-shingle cap's frequency count, which must see serve-time
    corpus frequencies by contract (same math as the union cap in
    incremental_near_dups_serving — identical results to the
    train-in-run twin, same oracle)."""
    from .bucketed import appendable_bucketed_table

    b = _INCR_NEW_MAX_ID
    banded_idx = appendable_bucketed_table(
        spark,
        sf_dir,
        "documents",
        "bh",
        derive=_banded_bh,
        variant="mhband64x4bh",
        size_fraction=4.0,
    )
    parts = F.split(F.col("bh"), ":", 2)
    banded_all = banded_idx.select(
        "doc_id",
        parts[0].cast("int").alias("band_id"),
        parts[1].alias("band_hash"),
    )
    new_b = banded_all.filter(F.col("doc_id") < b).select(
        "band_id", "band_hash", F.col("doc_id").alias("new_doc")
    )
    cand = D._incremental_candidates(banded_all, new_b, b)

    sh_idx = appendable_bucketed_table(
        spark,
        sf_dir,
        "documents",
        "doc_id",
        derive=_shingles_n3,
        variant="shidx_n3",
        # exploded 3-gram rows: ~8x the corpus text's parquet bytes
        # (per-word rows defeat the text column's page compression)
        size_fraction=8.0,
    )
    heavy = (
        sh_idx.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > D.DEFAULT_MAX_SHINGLE_DF)
        .select("shingle")
    )
    sh = sh_idx.select("doc_id", "shingle").join(
        F.broadcast(heavy), "shingle", "left_anti"
    )
    return D._incremental_verify(cand, sh, 0.5, b)


@register("minhash_lsh_sharp", _lsh_sql(num_hashes=64, band_size=4))
def q_minhash_lsh_sharp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp-banding MinHash LSH: 64 hashes in 16 bands of 4 rows —
    since round 8 this is the DEFAULT banding of the whole verify chain
    (lsh_verified_pairs, near_dup_clusters, incremental_near_dups and
    their composed entries); this entry pins the layout in isolation.

    Both schemes center the S-curve near J ≈ 0.5 ((1/b)^(1/r): 0.35 for
    r=2/b=8, 0.50 for r=4/b=16), but the per-band collision rate is J^r:
    on a templated corpus where unrelated doc pairs sit at J ≈ 0.25,
    r=2 collides at ~6% per band (any-band ~40%) while r=4 collides at
    ~0.4% (any-band ~6%). The r6 sf3→sf10 profile measured the
    difference: the r=2 twin's candidate rows grew 11× for 3.33× data
    (the fat false-positive tail compounding across replicas of a
    template family) — quadratic-in-family-size survivors the verify
    stage then has to pay for. Sharper bands cost 4× the signature
    hashes (embarrassingly parallel, one shuffle either way) to make
    candidate volume track true near-dup density. The no-free-lunch
    term is recall exactly AT the midpoint: 1-(1-J^4)^16 = 0.64 at
    J = 0.5 vs the r=2 scheme's 0.90 (measured 1.00 on the corpus's
    planted pairs, which sit well above the midpoint — pinned in
    pytest); where borderline-J recall matters, the datasketch-style
    128-hash/32-band config restores it to 0.87 at the same J^4 tail
    (measured: +30% candidates, +0.7 s at sf0.1). Full value oracle:
    the hash/band constants are static SQL literals."""
    return D.minhash_lsh_candidates(
        load_table(spark, sf_dir, "documents"), num_hashes=64, band_size=4
    )


def _simhash_sql(bits: int = 32) -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN v_{b} > 0 THEN (1::BIGINT << {b}) ELSE 0 END)" for b in range(bits)
    )
    return f"""
    WITH docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
    tok AS (
      SELECT doc_id, ('0x' || substr(md5(unnest(string_split(t, ' '))), 1, 15))::BIGINT AS h
      FROM docs),
    v AS (SELECT doc_id, {votes} FROM tok GROUP BY doc_id)
    SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM v
    """


@register("simhash", _simhash_sql())
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signature per doc (bit-majority of token hashes)."""
    return D.simhash(load_table(spark, sf_dir, "documents"))


def _near_dup_clusters_sql(threshold: float = 0.5) -> str:
    """Transitive closure over the SAME LSH-verified pair list the Spark
    side uses, as a DuckDB recursive CTE: walk(doc, lbl) enumerates every
    label reachable from doc; min per doc == smallest doc_id in the
    connected component — exactly the fixpoint of Spark's
    alternating-star component labeling."""
    return f"""
    WITH RECURSIVE
    pairs AS (SELECT doc_a, doc_b FROM ({_lsh_verified_sql(threshold)})),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    walk(doc_id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.src, w.lbl FROM edges e JOIN walk w ON w.doc_id = e.dst
    )
    SELECT doc_id, min(lbl) AS cluster_id FROM walk GROUP BY doc_id
    """


@register("near_dup_clusters", _near_dup_clusters_sql())
def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the LSH-verified near-dup graph
    (alternating large-star/small-star rounds on Spark — Kiveris et
    al. SoCC'14, no collect anywhere; recursive-CTE transitive closure
    in the oracle — both converge to min doc_id per component). The
    edge build touches only LSH band candidates, never an unbanded
    shingle self-join (plan-pinned in tests/test_plans.py)."""
    return D.near_dup_clusters(load_table(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "corpus_curation",
    f"""
    WITH near AS (SELECT DISTINCT doc_b FROM ({_lsh_verified_sql(0.5)})),
    q AS (
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT) AS n_words,
        len(regexp_extract_all(text, '(?i)\\b(the|a|of|and|to|in|is|on|for|with)\\b')) AS n_stop,
        CASE WHEN length(text) > 0
             THEN len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) * 1.0 / length(text)
             ELSE 0.0 END AS pr
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
        round(((CASE WHEN n_words BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
             + least(CASE WHEN n_words > 0 THEN n_stop * 1.0 / n_words ELSE 0.0 END * 5, 1.0)
             + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3, 6) AS quality
      FROM q
    )
    SELECT doc_id FROM scored
    WHERE quality >= 0.5
      AND doc_id NOT IN (SELECT doc_b FROM near)
    """,
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: quality filter + pairwise near-dedup
    (drop the larger id of every ≥0.5-Jaccard pair, pairs from the
    LSH-pruned two-stage path — no unbanded shingle self-join) — the
    composed keep-set a pretraining pipeline materializes."""
    docs = load_table(spark, sf_dir, "documents")
    quality = X.quality_score(docs).select("doc_id", "quality")
    drop = (
        D.lsh_verified_pairs(docs, threshold=0.5)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        quality.filter(F.col("quality") >= 0.5)
        .join(drop, "doc_id", "left_anti")
        .select("doc_id")
    )


@register(
    "tfidf_top_terms",
    f"""
    WITH docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
    words AS (
      SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM docs
    ),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY 1, 2),
    df AS (SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM docs),
    scored AS (
      SELECT tf.doc_id, tf.w,
             round(tf.tf * ln((SELECT n_docs FROM n) * 1.0 / df.df), 6) AS tfidf
      FROM tf JOIN df USING (w)
    )
    SELECT doc_id, w AS term, tfidf, CAST(rk AS INT) AS rk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, w) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per doc: term frequencies (explode+agg), doc
    frequencies (distinct agg), idf broadcast back, window top-k. The
    document-keyword extractor; all shuffles keyed on term or doc_id.
    The compact words table is persisted — tf and df both explode from
    the cached arrays instead of re-running the regex normalization
    per consumer (the nb_lang_confusion pattern)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    words = D._words_df(docs).persist().select(
        "doc_id", F.explode(F.col("__words")).alias("w")
    )
    tf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    df = words.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = table_row_count(sf_dir, "documents")  # footer == raw count()
    scored = tf.join(F.broadcast(df), "w").select(
        "doc_id",
        "w",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
    )
    w_rk = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("w"))
    return (
        scored.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") <= 3)
        .select("doc_id", F.col("w").alias("term"), "tfidf", "rk")
    )


@register(
    "bigram_counts",
    f"""
    WITH docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM docs),
    bg AS (
      SELECT unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                    i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM words
    )
    SELECT bigram, count(*) AS n FROM bg
    GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """,
)
def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts (top-20) — the n-gram LM / phrase-mining
    primitive. Counts keep multiplicity (unlike dedup shingles, which
    are distinct-per-doc); the words array is materialized behind an
    exchange barrier before the per-element lambda (40× pitfall
    otherwise), and top-k is TakeOrderedAndProject, not a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    words = D._words_df(docs)
    k = F.greatest(F.size("__words") - F.lit(1), F.lit(0))
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(
                " ", F.element_at("__words", i), F.element_at("__words", i + F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Repetition ratio: distinct-ngram / total-ngram — the standard
# "degenerate text" signal in corpus curation (boilerplate, loops,
# keyboard mashing collapse the ratio toward 0).
# ---------------------------------------------------------------------------


@register(
    "repetition_ratio",
    f"""
    WITH docs AS (SELECT doc_id, source, {_norm()} AS t FROM documents),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM docs),
    tg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                     i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS s
      FROM words),
    per_doc AS (
      SELECT doc_id, count(*) AS n_grams, count(DISTINCT s) AS n_distinct
      FROM tg GROUP BY doc_id)
    SELECT source,
           count(*) AS n_docs,
           round(avg(n_distinct * 1.0 / n_grams), 6) AS avg_distinct_ratio,
           round(min(n_distinct * 1.0 / n_grams), 6) AS min_distinct_ratio
    FROM per_doc JOIN docs USING (doc_id)
    GROUP BY source
    """,
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source repetition profile: distinct-trigram ratio per doc
    (NON-distinct shingling, unlike the dedup path), aggregated per
    source. count + count(DISTINCT) ride one explode→hash-agg on
    doc_id; the doc→source attach is a co-partitioned join on doc_id
    (both sides already hashed on it — no extra exchange at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    words = D._words_df(docs)
    k = F.greatest(F.size("__words") - F.lit(2), F.lit(0))
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice("__words", i, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_doc = (
        words.select("doc_id", F.explode(grams).alias("s"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.countDistinct("s").alias("n_distinct"),
        )
    )
    ratio = F.col("n_distinct") / F.col("n_grams")
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(ratio), 6).alias("avg_distinct_ratio"),
            F.round(F.min(ratio), 6).alias("min_distinct_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Regex redaction engine (the PII-masking primitive). The synthetic
# corpus contains no emails/phones, so the machinery is demonstrated on
# a pattern that exists in-corpus; swapping the constant for an
# email/phone alternation is a one-line change.
# ---------------------------------------------------------------------------

# dialect-portable regex: \b and alternation behave identically in
# Java regex (Spark) and RE2 (DuckDB).
_REDACT_PAT = r"\b(table|hash|window)\b"


@register(
    "regex_redaction",
    f"""
    SELECT source,
           CAST(sum(len(regexp_extract_all(text, '{_REDACT_PAT}'))) AS BIGINT)
             AS n_matches,
           CAST(sum(CASE WHEN regexp_matches(text, '{_REDACT_PAT}')
               THEN 1 ELSE 0 END) AS BIGINT) AS docs_hit,
           CAST(sum(length(text)
               - length(regexp_replace(text, '{_REDACT_PAT}', '', 'g')))
             AS BIGINT) AS chars_redacted
    FROM documents GROUP BY source
    """,
)
def q_regex_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide regex redaction audit: match counts, affected docs,
    and chars that masking would remove, per source. Pure JVM string
    kernels (regexp_count / regexp_replace) — the scan never leaves
    whole-stage codegen, and the regex is written to the common subset
    of Java regex and RE2 so the oracle runs the same automaton."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.regexp_count("text", F.lit(_REDACT_PAT))
    redacted_len = F.length("text") - F.length(
        F.regexp_replace("text", _REDACT_PAT, "")
    )
    return docs.groupBy("source").agg(
        F.sum(n).alias("n_matches"),
        F.sum(F.when(n > 0, 1).otherwise(0)).alias("docs_hit"),
        F.sum(redacted_len).alias("chars_redacted"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag corpus docs sharing any 5-gram with a
# held-out benchmark set (here: doc_id % 97 == 0 stands in for the
# benchmark). THE standard pre-training hygiene pass.
# ---------------------------------------------------------------------------

_SHINGLE5_CTE = f"""
  docs5 AS (SELECT doc_id, {_norm()} AS t FROM documents),
  words5 AS (SELECT doc_id, string_split(t, ' ') AS ws FROM docs5),
  sh5 AS (
    SELECT DISTINCT doc_id, s
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(ws) - 4, 0) + 1),
                     i -> array_to_string(list_slice(ws, i, i + 4), ' '))) AS s
      FROM words5)
  )
"""


@register(
    "decontamination_audit",
    f"""
    WITH {_SHINGLE5_CTE},
    bench AS (SELECT DISTINCT s FROM sh5 WHERE doc_id % 97 = 0),
    cont AS (
      SELECT DISTINCT a.doc_id
      FROM sh5 a JOIN bench b USING (s)
      WHERE a.doc_id % 97 <> 0
    )
    SELECT d.source, count(*) AS n_docs, count(c.doc_id) AS n_contaminated,
           round(count(c.doc_id) * 1.0 / count(*), 6) AS contamination_rate
    FROM documents d LEFT JOIN cont c ON d.doc_id = c.doc_id
    WHERE d.doc_id % 97 <> 0
    GROUP BY d.source
    """,
)
def q_decontamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥1 distinct word
    5-gram with the benchmark slice are flagged via a semi-join on the
    shingle itself. The benchmark side is DISTINCT-reduced before the
    join (it's tiny relative to the corpus — AQE broadcasts it), so the
    corpus shingle table streams through a broadcast-hash semi-join:
    no corpus-side shuffle. Docs shorter than the shingle width can't
    be flagged and count as clean."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_table(docs, n=5)
    is_bench = (F.col("doc_id") % 97) == 0
    bench_sh = sh.filter(is_bench).select("shingle").distinct()
    cont = (
        sh.filter(~is_bench)
        .join(bench_sh, "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = docs.filter(~is_bench).select("doc_id", "source")
    return (
        corpus.join(cont, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("hit").alias("n_contaminated"),
            F.round(F.count("hit") / F.count(F.lit(1)), 6).alias(
                "contamination_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Two-stage near-dup: LSH candidates -> exact Jaccard verification.
# (_lsh_verified_sql is defined above, next to its banding/minhash
# building blocks, because near_dup_clusters' oracle also composes it.)
# ---------------------------------------------------------------------------


@register("lsh_verified_pairs", _lsh_verified_sql())
def q_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-prune → exact-verify: the standard two-stage corpus dedup.
    Candidates come from the banding equality join (no cross join);
    the exact Jaccard pass then runs only over candidate pairs, so the
    quadratic exact stage is bounded by the LSH recall set."""
    return D.lsh_verified_pairs(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# The flagship composition: everything a pretraining corpus pass does,
# in one plan — quality gate, near-dedup, benchmark decontamination,
# then per-source keep-set statistics.
# ---------------------------------------------------------------------------


@register(
    "pretraining_pipeline",
    f"""
    WITH near AS (SELECT DISTINCT doc_b FROM ({_lsh_verified_sql(0.5)})),
    qq AS (
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT) AS n_words,
        len(regexp_extract_all(text, '(?i)\\b(the|a|of|and|to|in|is|on|for|with)\\b')) AS n_stop,
        CASE WHEN length(text) > 0
             THEN len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) * 1.0 / length(text)
             ELSE 0.0 END AS pr
      FROM documents
    ),
    scored AS (
      SELECT doc_id, n_words,
        round(((CASE WHEN n_words BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
             + least(CASE WHEN n_words > 0 THEN n_stop * 1.0 / n_words ELSE 0.0 END * 5, 1.0)
             + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3, 6) AS quality
      FROM qq
    ),
    {_SHINGLE5_CTE.strip().lstrip()},
    bench AS (SELECT DISTINCT s FROM sh5 WHERE doc_id % 97 = 0),
    cont AS (
      SELECT DISTINCT a.doc_id FROM sh5 a JOIN bench b USING (s)
      WHERE a.doc_id % 97 <> 0
    ),
    keep AS (
      SELECT s.doc_id, s.quality, s.n_words
      FROM scored s
      WHERE s.quality >= 0.5
        AND s.doc_id % 97 <> 0
        AND s.doc_id NOT IN (SELECT doc_b FROM near)
        AND s.doc_id NOT IN (SELECT doc_id FROM cont)
    )
    SELECT d.source, count(*) AS n_docs,
           CAST(sum(k.n_words) AS BIGINT) AS total_words,
           round(avg(k.quality), 6) AS avg_quality
    FROM keep k JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
)
def q_pretraining_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus pass in ONE Spark plan: Gopher-style quality
    gate, near-dedup (drop the larger id of every ≥0.5-Jaccard pair,
    pairs from the LSH-pruned two-stage path — band candidates + df
    cap, never an unbanded shingle self-join), benchmark
    decontamination (5-gram semi-join, benchmark slice itself
    excluded), then per-source keep-set stats. Composability is
    the point — each stage is the already-oracled operator, and
    Catalyst fuses the whole thing: the documents scan is shared, the
    two shingle pipelines (3-gram dedup, 5-gram decontamination) fan
    out from one normalized-words projection, and every anti-join side
    is a deduplicated id set (broadcastable at real benchmark sizes)."""
    docs = load_table(spark, sf_dir, "documents")
    quality = X.quality_score(docs)  # doc_id, n_words, quality
    drop_near = (
        D.lsh_verified_pairs(docs, threshold=0.5)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    sh5 = D.shingle_table(docs, n=5)
    is_bench = (F.col("doc_id") % 97) == 0
    bench_sh = sh5.filter(is_bench).select("shingle").distinct()
    cont = (
        sh5.filter(~is_bench)
        .join(bench_sh, "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    keep = (
        quality.filter((F.col("quality") >= 0.5) & ~is_bench)
        .join(drop_near, "doc_id", "left_anti")
        .join(cont, "doc_id", "left_anti")
    )
    return (
        keep.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling-hash document fingerprinting — the
# MOSS algorithm): hash every ORDERED word 3-gram, slide a w=4 window
# over the hash sequence, keep each window's minimum, dedupe. The
# guarantee: any shared run of >= w+2 words between two docs shares at
# least one fingerprint — position-robust plagiarism/overlap detection
# at a fraction of full-shingle storage.
# ---------------------------------------------------------------------------

_WINNOW_W = 4


@register(
    "winnowing_fingerprints",
    f"""
    WITH docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM docs),
    sh AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
             ('0x' || substr(md5(u.s), 1, 15))::BIGINT AS h
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                 i -> struct_pack(i := i,
                                  s := array_to_string(list_slice(ws, i, i + 2), ' '))))
                 AS u
        FROM words)
    ),
    wm AS (
      SELECT doc_id, pos,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
               AS fp,
             count(*) OVER (PARTITION BY doc_id) AS n
      FROM sh
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp FROM wm WHERE pos <= n - {_WINNOW_W} + 1
    )
    SELECT doc_id, count(*) AS n_fingerprints,
           CAST(min(fp) AS BIGINT) AS min_fp,
           CAST(bit_xor(fp) AS BIGINT) AS fp_checksum
    FROM fps GROUP BY doc_id
    """,
)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing summary per doc: fingerprint count, min fingerprint,
    and an order-independent bit_xor checksum over the selected set
    (the full (doc_id, fp) relation is what a plagiarism index stores;
    the checksum makes the whole selection oracle-checkable without
    shipping it). ORDERED (non-distinct) trigram hashes ride one
    posexplode; the window min is ROWS-framed per doc; docs shorter
    than the window emit nothing (no fingerprintable run). All exact
    integers — no float parity surface at all."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    words = D._words_df(docs)
    k = F.greatest(F.size("__words") - F.lit(2), F.lit(0))
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice("__words", i, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = words.select("doc_id", F.posexplode(grams).alias("pos0", "s")).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        D._md5_int60(F.col("s")).alias("h"),
    )
    w_min = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, _WINNOW_W - 1)
    )
    w_all = Window.partitionBy("doc_id")
    fps = (
        sh.select(
            "doc_id",
            "pos",
            F.min("h").over(w_min).alias("fp"),
            F.count(F.lit(1)).over(w_all).alias("n"),
        )
        .filter(F.col("pos") <= F.col("n") - _WINNOW_W + 1)
        .select("doc_id", "fp")
        .distinct()
    )
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("fp").cast("long").alias("min_fp"),
        F.bit_xor("fp").cast("long").alias("fp_checksum"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV rate — the tokenizer-planning audit: how
# much of each source's token mass a top-N vocabulary covers.
# ---------------------------------------------------------------------------


@register(
    "vocab_oov_rate",
    f"""
    WITH docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
    words AS (SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM docs),
    vocab AS (
      SELECT w FROM (
        SELECT w, count(*) AS c FROM words GROUP BY 1
        ORDER BY c DESC, w LIMIT 1000)
    ),
    j AS (
      SELECT d.source,
             CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
      FROM words
      JOIN documents d USING (doc_id)
      LEFT JOIN vocab v ON words.w = v.w
    )
    SELECT source, count(*) AS n_tokens,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           round(sum(oov) * 1.0 / count(*), 6) AS oov_rate
    FROM j GROUP BY source
    """,
)
def q_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary token rate per source against the corpus's own
    top-1000-word vocabulary (ties broken lexicographically so the
    vocabulary boundary is engine-identical). The vocab is a top-k over
    the word counts (TakeOrderedAndProject) broadcast into a left join
    — membership against a small dictionary never shuffles the token
    stream; per-source rates are exact-integer ratios rounded at 6dp.

    The COMPACT words table is persisted (the nb_lang_confusion
    pattern): vocab build + membership join both explode from the
    cached arrays, so the regex normalization runs once, not twice
    (measured 1.10 -> 0.70 s cold at sf0.1)."""
    docs = load_table(spark, sf_dir, "documents")
    words = D._words_df(docs).persist().select(
        "doc_id", F.explode(F.col("__words")).alias("w")
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(1000)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    j = (
        words.join(F.broadcast(vocab), "w", "left")
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", F.when(F.col("in_vocab").isNull(), 1).otherwise(0).alias("oov"))
    )
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("oov").cast("long").alias("n_oov"),
        F.round(F.sum("oov") * 1.0 / F.count(F.lit(1)), 6).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# Round 5: corpus-trained probabilistic models (classifier + LM scorer)
# ---------------------------------------------------------------------------

# Quantized log-prob: CAST(round(ln(p) * 1e9) AS BIGINT). Both engines
# compute ln to within 1 ulp, so after 9-dp quantization the integer
# agrees (the pagerank per-iteration precedent); all downstream sums and
# argmaxes are then exact integer arithmetic, immune to summation order.


@register(
    "nb_lang_confusion",
    f"""
    WITH docs AS (SELECT doc_id, lang, {_norm()} AS t FROM documents),
    toks AS (
      SELECT doc_id, lang, unnest(string_split(t, ' ')) AS w FROM docs
    ),
    toks_f AS (SELECT * FROM toks WHERE w <> ''),
    doc_tok AS (SELECT doc_id, w, count(*) AS m FROM toks_f GROUP BY 1, 2),
    cnt AS (SELECT lang, w, count(*) AS c FROM toks_f GROUP BY 1, 2),
    tot AS (SELECT lang, count(*) AS tw FROM toks_f GROUP BY 1),
    vocab AS (SELECT count(DISTINCT w) AS v FROM toks_f),
    langs AS (SELECT lang, count(*) AS nl FROM documents GROUP BY 1),
    total AS (SELECT count(*) AS nd FROM documents),
    prior AS (
      SELECT lang, CAST(round(ln(nl * 1.0 / nd) * 1e9) AS BIGINT) AS pq
      FROM langs, total
    ),
    scores AS (
      SELECT dt.doc_id, t.lang,
             sum(dt.m * CAST(round(ln((coalesce(c.c, 0) + 1.0) / (t.tw + v.v))
                                   * 1e9) AS BIGINT)) AS sq
      FROM doc_tok dt
      JOIN tot t ON TRUE
      CROSS JOIN vocab v
      LEFT JOIN cnt c ON c.lang = t.lang AND c.w = dt.w
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT d.doc_id, d.lang AS true_lang, p.lang AS cand, p.pq
      FROM documents d CROSS JOIN prior p
    ),
    scored AS (
      SELECT pr.doc_id, pr.true_lang, pr.cand,
             pr.pq + coalesce(s.sq, 0) AS score
      FROM pairs pr
      LEFT JOIN scores s ON s.doc_id = pr.doc_id AND s.lang = pr.cand
    ),
    pred AS (
      SELECT doc_id, true_lang, cand,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, cand) AS rn
      FROM scored
    )
    SELECT true_lang AS lang, cand AS pred_lang, count(*) AS n_docs
    FROM pred WHERE rn = 1 GROUP BY 1, 2
    """,
)
def q_nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained on the corpus itself (add-1
    smoothing, document-frequency priors) predicting `lang` from word
    tokens, reported as a confusion matrix — the shape of every
    fastText-style quality/language classifier pass over pretraining
    data.

    All probabilities are 1e9-quantized integer log-space, so per-doc
    score sums and the (score desc, lang asc) argmax are exact — no
    float summation-order drift between engines.

    Scale story: training is two hash-aggs with map-side combine
    (token x lang counts, lang totals); scoring joins the corpus token
    table against the model keyed on (lang, token) — the model is
    vocab x n_langs and usually broadcasts; the #langs fan-out rides
    the same row. No driver-side model state."""
    from .operators.text import normalize_text

    # persist the NORMALIZED doc table, not the exploded token table:
    # 4 downstream consumers (doc-term counts, per-lang counts, lang
    # totals, vocab size) would otherwise re-run the regex
    # normalization per consumer — 4 corpus-wide regex passes for one —
    # while caching post-explode tokens costs token-sized storage and
    # measured SLOWER (the explode is cheap; the regex isn't)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", normalize_text("text").alias("t")
    ).persist()
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("t", " ")).alias("w")
    ).filter(F.col("w") != "")
    doc_tok = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("m"))
    cnt = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.groupBy("lang").agg(F.count(F.lit(1)).alias("tw"))
    vocab = toks.agg(F.countDistinct("w").alias("v"))
    langs = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("nl"))
    )
    nd = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("nd")
    )

    def _q(col):
        return F.round(col * F.lit(1e9)).cast("long")

    prior = langs.crossJoin(F.broadcast(nd)).select(
        "lang", _q(F.log(F.col("nl") / F.col("nd"))).alias("pq")
    )
    scores = (
        doc_tok.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vocab))
        .join(cnt, ["lang", "w"], "left")
        .select(
            "doc_id",
            "lang",
            (
                F.col("m")
                * _q(
                    F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                        / (F.col("tw") + F.col("v"))
                    )
                )
            ).alias("contrib"),
        )
        .groupBy("doc_id", "lang")
        .agg(F.sum("contrib").alias("sq"))
    )
    pairs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.col("lang").alias("true_lang"))
        .crossJoin(F.broadcast(prior.select(F.col("lang").alias("cand"), "pq")))
    )
    scored = pairs.join(
        scores.select(
            "doc_id", F.col("lang").alias("cand"), "sq"
        ),
        ["doc_id", "cand"],
        "left",
    ).select(
        "doc_id",
        "true_lang",
        "cand",
        (F.col("pq") + F.coalesce(F.col("sq"), F.lit(0))).alias("score"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.col("true_lang").alias("lang"), F.col("cand").alias("pred_lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "bigram_lm_quality",
    f"""
    WITH docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM docs),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                    i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM words
    ),
    big_cnt AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY 1),
    uni AS (SELECT unnest(ws) AS w FROM words),
    uni_f AS (SELECT w FROM uni WHERE w <> ''),
    uni_cnt AS (SELECT w, count(*) AS cu FROM uni_f GROUP BY 1),
    vocab AS (SELECT count(DISTINCT w) AS v FROM uni_f),
    doc_bg AS (SELECT doc_id, bigram, count(*) AS m FROM bg GROUP BY 1, 2),
    scored AS (
      SELECT d.doc_id,
             sum(d.m) AS nb,
             sum(d.m * CAST(round(ln((b.cb + 1.0) / (u.cu + v.v)) * 1e9)
                            AS BIGINT)) AS sq
      FROM doc_bg d
      JOIN big_cnt b USING (bigram)
      JOIN uni_cnt u ON u.w = split_part(d.bigram, ' ', 1)
      CROSS JOIN vocab v
      GROUP BY 1
    )
    SELECT doc_id, CAST(nb AS BIGINT) AS n_bigrams,
           round(sq * 1.0 / (nb * 1e9), 6) AS avg_logprob
    FROM scored
    """,
)
def q_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: per-doc mean log-probability
    under an add-1-smoothed bigram LM trained on the corpus itself —
    the KenLM-style fluency filter of pretraining pipelines (degenerate
    / boilerplate text scores low, natural prose high), with no model
    artifact: train and score are one plan.

    Same 1e9-quantized integer log-space as nb_lang_confusion: the
    per-doc sum is exact; the only division is the final mean,
    rounded at 6 dp.

    Scale story: LM "training" is two map-side-combined hash-aggs
    (bigram counts, unigram counts); scoring re-joins the per-doc
    bigram table to those counts on the n-gram key. Counts tables are
    corpus-vocabulary-sized and shuffle-join on uniformly-hashed
    string keys; stop-word-ish hot bigrams only skew the count
    build, which the partial aggregation flattens."""
    docs = load_table(spark, sf_dir, "documents")
    scored = _bigram_lm_scored(docs)
    return scored.select(
        "doc_id",
        F.col("nb").cast("long").alias("n_bigrams"),
        F.round(F.col("sq") / (F.col("nb") * F.lit(1e9)), 6).alias("avg_logprob"),
    )


def _bigram_lm_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, nb, sq): per-doc bigram count and exact 1e9-quantized
    log-probability sum under the corpus-trained add-1 bigram LM — the
    shared core of bigram_lm_quality and perplexity_buckets."""
    words = D._words_df(docs)
    k = F.greatest(F.size("__words") - F.lit(1), F.lit(0))
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(
                " ", F.element_at("__words", i), F.element_at("__words", i + F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = words.select("doc_id", F.explode(grams).alias("bigram")).persist()
    # ^ two consumers (corpus counts + per-doc counts): one regex pass
    big_cnt = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("cb"))
    uni = words.select(F.explode("__words").alias("w")).filter(F.col("w") != "")
    uni_cnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    vocab = uni.agg(F.countDistinct("w").alias("v"))
    doc_bg = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("m"))
    scored = (
        doc_bg.join(big_cnt, "bigram")
        .withColumn("w1", F.substring_index("bigram", " ", 1))
        .join(uni_cnt.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "m",
            (
                F.col("m")
                * F.round(
                    F.log((F.col("cb") + F.lit(1.0)) / (F.col("cu") + F.col("v")))
                    * F.lit(1e9)
                ).cast("long")
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("m").alias("nb"), F.sum("contrib").alias("sq"))
    )
    return scored


# ---------------------------------------------------------------------------
# Round 5: exact set-similarity join (prefix filter) + fixed-size-
# broadcast decontamination (expression-level Bloom filter)
# ---------------------------------------------------------------------------


@register(
    "setsim_prefix_join",
    f"""
    WITH docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM docs),
    tok AS (
      SELECT DISTINCT doc_id, s AS w
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                      i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS s
        FROM words)
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.6
    """,
)
def q_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT shingle-set Jaccard >= 0.6 pair join via prefix filtering
    (Bayardo/Chaudhuri PPJoin family) — the deterministic complement to
    the probabilistic MinHash-LSH path: zero false negatives, no
    signature tuning. The set universe is distinct word-3-gram shingles
    (the ngram_jaccard_pairs substrate); unigram sets degenerate on
    template-heavy corpora where every doc shares the same vocabulary.

    Candidate generation joins only each set's PREFIX — its
    |s| - ceil(tau*|s|) + 1 rarest shingles under a global (document
    frequency asc, shingle asc) order; two sets with J >= tau must
    share a prefix shingle. Survivors get an exact intersection count
    and the real Jaccard test. The oracle generates candidates from ANY
    shared shingle (brute force), so the parity gate itself proves the
    prefix filter loses no pairs on this corpus.

    Scale story: the quadratic explosion lives in the candidate join,
    and prefix filtering shrinks it doubly — only rare shingles join
    (frequency order puts boilerplate OUT of prefixes), and only
    prefix-vs-prefix rows pair. The per-doc representation is a
    DISTINCT shingle ARRAY (map-side `array_distinct`, no corpus-wide
    distinct shuffle); prefixes come from one groupBy-doc
    `array_sort(collect_list(struct(df, w)))` whose length IS the set
    size, and exact verification is a single `array_intersect` on the
    two docs' arrays — no per-shingle verify join, no separate size
    joins. Per-doc state is bounded by document length, never corpus
    size, so every stage survives a 100x scale-up (VERDICT r5 #4
    restructure: 12 shuffle stages down to 7, sf0.1 wall 3.9s -> 2.3s)."""
    tau = 0.6
    docs = load_table(spark, sf_dir, "documents")
    words = D._words_df(docs)
    docarr = words.select(
        "doc_id",
        F.array_distinct(D.shingles_of(F.col("__words"), 3)).alias("arr"),
    ).persist()  # three consumers: df counts, prefix build, both verify sides
    tok = docarr.select("doc_id", F.explode("arr").alias("w"))
    dfreq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    # prefix length |s| - ceil(tau*|s|) + 1 over the (df asc, w asc)
    # global rarity order; size(ranked) == |s|, so no size join
    ranked = (
        tok.join(dfreq, "w")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "w"))).alias("ranked"))
    )
    npref = (
        F.size("ranked")
        - F.ceil(F.lit(tau) * F.size("ranked"))
        + F.lit(1)
    ).cast("int")
    prefix = ranked.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice(F.col("ranked"), 1, npref), lambda s: s.getField("w")
            )
        ).alias("w"),
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "w")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    da = docarr.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("aa"))
    db = docarr.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("ab"))
    i = F.size(F.array_intersect("aa", "ab"))
    jac = i / (F.size("aa") + F.size("ab") - i)
    return (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .filter(jac >= tau)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


_BLOOM_M = 65536  # bits
_BLOOM_K = 3  # hash functions, salts "bf0:".."bf2:"


@register(
    "bloom_decontamination",
    f"""
    WITH {_SHINGLE5_CTE},
    bench AS (SELECT DISTINCT s FROM sh5 WHERE doc_id % 89 = 0)
    SELECT a.doc_id, count(*) AS n_hit_shingles
    FROM sh5 a JOIN bench b USING (s)
    WHERE a.doc_id % 89 <> 0
    GROUP BY a.doc_id
    """,
)
def q_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with a FIXED-SIZE broadcast: the benchmark's
    5-gram shingle set is folded into a 65536-bit Bloom filter built as
    a distributed bit_or aggregation (k=3 portable md5 hashes -> bit
    positions -> 64-bit words; map-side partial agg IS the bloom
    merge). The corpus side probes the <=1024-row (word, bits) table
    through a broadcast join — so the broadcast cost is CAPPED at m/64
    rows no matter how many benchmark shingles exist, unlike the plain
    broadcast semi-join of `decontamination_audit` whose build side
    grows with the benchmark. Bloom positives (k/k bits set) are then
    verified EXACTLY against the true shingle set — candidates only —
    so false positives never reach the result and the oracle is plain
    exact SQL.

    This is the hand-rolled, engine-portable twin of Spark's own
    runtime bloom-filter join pruning
    (spark.sql.optimizer.runtime.bloomFilter.enabled)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_table(docs, n=5).distinct()
    is_bench = (F.col("doc_id") % 89) == 0
    bench_sh = sh.filter(is_bench).select("shingle").distinct()
    corpus_sh = sh.filter(~is_bench)

    js = F.array([F.lit(j) for j in range(_BLOOM_K)])

    def _pos(shingle_col, j_col):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bf"), j_col.cast("string"), F.lit(":"), shingle_col)),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        return h % _BLOOM_M

    def _word_mask(df):
        pos = _pos(F.col("shingle"), F.col("j"))
        return df.withColumn("__pos", pos).select(
            df["*"],
            (F.col("__pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").alias(
                "mask"
            ),
        )

    bench_bits = (
        _word_mask(bench_sh.select("shingle", F.explode(js).alias("j")))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    probed = (
        _word_mask(corpus_sh.select("doc_id", "shingle", F.explode(js).alias("j")))
        .join(F.broadcast(bench_bits), "word", "left")
        .select(
            "doc_id",
            "shingle",
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) != 0),
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.sum("hit").alias("k_hits"))
        .filter(F.col("k_hits") == _BLOOM_K)
        .select("doc_id", "shingle")
    )
    verified = probed.join(bench_sh, "shingle", "left_semi")
    return verified.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hit_shingles")
    )


_CHUNK_W = 50  # words per passage
_CHUNK_S = 25  # stride (50% overlap)


@register(
    "passage_chunking",
    f"""
    WITH docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM docs),
    chunks AS (
      SELECT doc_id, len(ws) AS n_words, p,
             array_to_string(
               list_slice(ws, p, least(p + {_CHUNK_W} - 1, len(ws))), ' ')
               AS chunk
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1, {_CHUNK_S})) AS p
            FROM words)
    )
    SELECT doc_id,
           CAST((p - 1) / {_CHUNK_S} AS BIGINT) AS chunk_idx,
           CAST(least({_CHUNK_W}, n_words - p + 1) AS BIGINT) AS n_words_chunk,
           md5(chunk) AS chunk_fp
    FROM chunks
    """,
)
def q_passage_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style passage chunking: split every document into
    50-word windows with 25-word stride (50% overlap), emitting a
    deterministic (doc_id, chunk_idx) key and a content fingerprint —
    the retrieval-index build step of an LLM data platform (chunk →
    embed → ANN-index; the embed step is the knn family's input
    contract).

    Scale story: pure narrow transforms — normalize, split, one
    sequence-explode per doc (fan-out = n_words/stride, bounded by doc
    length), no shuffle at all until a downstream consumer groups or
    joins. Chunking 100 TB is scan-bound, embarrassingly parallel, and
    the deterministic chunk key means re-chunking is idempotent across
    runs (stable ids for incremental embedding refresh)."""
    docs = load_table(spark, sf_dir, "documents")
    words = D._words_df(docs)
    ch = (
        words.select(
            "doc_id",
            F.size("__words").alias("n_words"),
            "__words",
            F.explode(
                F.sequence(
                    F.lit(1), F.size("__words"), F.lit(_CHUNK_S)
                )
            ).alias("p"),
        )
        .select(
            "doc_id",
            "n_words",
            "p",
            F.concat_ws(
                " ", F.slice("__words", F.col("p"), F.lit(_CHUNK_W))
            ).alias("chunk"),
        )
    )
    return ch.select(
        "doc_id",
        ((F.col("p") - 1) / _CHUNK_S).cast("long").alias("chunk_idx"),
        F.least(F.lit(_CHUNK_W), F.col("n_words") - F.col("p") + 1)
        .cast("long")
        .alias("n_words_chunk"),
        F.md5(F.col("chunk")).alias("chunk_fp"),
    )


@register(
    "dedup_keep_best",
    f"""
    WITH clusters AS (SELECT * FROM ({_near_dup_clusters_sql(0.5)})),
    q AS (
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT) AS n_words,
        len(regexp_extract_all(text, '(?i)\\b(the|a|of|and|to|in|is|on|for|with)\\b')) AS n_stop,
        CASE WHEN length(text) > 0
             THEN len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) * 1.0 / length(text)
             ELSE 0.0 END AS pr
      FROM documents),
    scored AS (
      SELECT doc_id,
        round(((CASE WHEN n_words BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
             + least(CASE WHEN n_words > 0 THEN n_stop * 1.0 / n_words ELSE 0.0 END * 5, 1.0)
             + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3, 6) AS quality
      FROM q),
    r AS (
      SELECT c.cluster_id, c.doc_id, s.quality,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY s.quality DESC, c.doc_id) AS rn
      FROM clusters c JOIN scored s ON s.doc_id = c.doc_id
    )
    SELECT cluster_id, doc_id AS keeper_doc_id, quality
    FROM r WHERE rn = 1
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup collapse: within each LSH-verified
    connected component keep the HIGHEST-quality member (C4/Gopher
    composite score; ties to the lowest doc_id) — the curation policy
    real pretraining pipelines use instead of keep-first, because
    near-dup groups typically mix a clean original with mangled
    scrapes.

    Scale story: composes three already-scale-shaped stages — LSH-
    banded edge build (candidates only), alternating-star components
    (state O(dup subgraph)), and a per-doc quality projection (narrow)
    — plus one window over clusters, partitioned on the cluster key."""
    from .operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    clusters = D.near_dup_clusters(docs, threshold=0.5)
    quality = X.quality_score(docs).select("doc_id", "quality")
    from pyspark.sql.window import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        clusters.join(quality, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id", F.col("doc_id").alias("keeper_doc_id"), "quality"
        )
    )


@register(
    "contamination_overlap_ratio",
    f"""
    WITH {_SHINGLE5_CTE},
    bench AS (SELECT DISTINCT s FROM sh5 WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, s FROM sh5 WHERE doc_id % 97 <> 0),
    sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY 1),
    hits AS (
      SELECT c.doc_id, count(*) AS n_hits
      FROM corpus c JOIN bench b USING (s)
      GROUP BY 1
    )
    SELECT s.doc_id, s.n_shingles, h.n_hits,
           round(h.n_hits * 1.0 / s.n_shingles, 6) AS overlap_ratio,
           h.n_hits * 1.0 / s.n_shingles >= 0.2 AS flagged
    FROM sizes s JOIN hits h ON h.doc_id = s.doc_id
    """,
)
def q_contamination_overlap_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded decontamination (Dolma-style): per corpus doc, the
    FRACTION of its distinct 5-gram shingles appearing in the benchmark
    slice, with the >=20% flag — the policy knob between 'any overlap'
    (decontamination_audit) and 'ignore' ; partial template overlap
    stays, wholesale benchmark copies go.

    Scale story: same broadcast semi-join shape as the binary audit,
    plus one per-doc count — the ratio's denominator rides the
    already-computed distinct-shingle table, no extra corpus pass."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_table(docs, n=5).distinct()
    is_bench = (F.col("doc_id") % 97) == 0
    bench = sh.filter(is_bench).select("shingle").distinct()
    corpus = sh.filter(~is_bench)
    sizes = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        corpus.join(bench, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    ratio = F.col("n_hits") / F.col("n_shingles")
    return sizes.join(hits, "doc_id").select(
        "doc_id",
        "n_shingles",
        "n_hits",
        F.round(ratio, 6).alias("overlap_ratio"),
        (ratio >= 0.2).alias("flagged"),
    )


@register(
    "ngram_novelty",
    f"""
    WITH {_SHINGLE5_CTE},
    df5 AS (SELECT s, count(*) AS df FROM sh5 GROUP BY 1),
    per_doc AS (
      SELECT a.doc_id, count(*) AS n_shingles,
             sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS n_novel
      FROM sh5 a JOIN df5 d USING (s)
      GROUP BY 1
    )
    SELECT doc_id, n_shingles, CAST(n_novel AS BIGINT) AS n_novel,
           round(n_novel * 1.0 / n_shingles, 6) AS novelty
    FROM per_doc
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty score: the fraction of a doc's distinct 5-gram
    shingles that appear NOWHERE else in the corpus (document frequency
    = 1) — the third axis of corpus hygiene next to repetition_ratio
    (intra-doc degeneracy) and contamination (vs a benchmark): low
    novelty means the doc is assembled from corpus boilerplate, high
    novelty means it contributes genuinely new text.

    Scale story: one distinct-shingle table feeds both the document-
    frequency agg and the per-doc join (persisted, one regex pass); the
    join is keyed on the shingle — identical shape to the dedup/
    decontamination family, map-side combine on both aggs."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_table(docs, n=5).distinct().persist()
    df5 = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        sh.join(df5, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty"),
    )


@register(
    "duplicate_spans",
    f"""
    WITH docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM docs),
    grams AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(ws, i, i + 7), ' ')) AS g
      FROM (SELECT doc_id, ws,
                   unnest(range(1, greatest(len(ws) - 7, 0) + 1)) AS i
            FROM words)
    ),
    gc AS (SELECT g, count(*) AS cnt FROM grams GROUP BY 1)
    SELECT gr.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN gc.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_positions,
           round(sum(CASE WHEN gc.cnt >= 2 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS dup_fraction
    FROM grams gr JOIN gc ON gr.g = gc.g
    GROUP BY 1
    """,
)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication audit (Lee et al. 2022): fraction of
    each doc's 8-token windows that occur anywhere else in the corpus
    (cross-doc or repeated within-doc). The suffix-array op restated as
    hash-aggs + one join keyed on md5-uniform gram hashes — O(tokens),
    no skew, no quadratic stage (operators/dedup.py
    duplicate_span_stats docstring has the full scale story)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.duplicate_span_stats(docs, k=8)


@register(
    "cross_source_overlap",
    f"""
    WITH docs AS (SELECT doc_id, source, {_norm()} AS t FROM documents),
    words AS (SELECT source, string_split(t, ' ') AS ws FROM docs),
    sg AS (
      SELECT DISTINCT source,
             ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
      FROM (
        SELECT source,
               unnest(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                       i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS s
        FROM words)
    ),
    sz AS (SELECT source, count(*) AS n FROM sg GROUP BY 1)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared,
           round(count(*) * 1.0 / (min(za.n) + min(zb.n) - count(*)), 6)
             AS jaccard
    FROM sg a
    JOIN sg b ON a.h = b.h AND a.source < b.source
    JOIN sz za ON za.source = a.source
    JOIN sz zb ON zb.source = b.source
    GROUP BY 1, 2
    """,
)
def q_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination audit: for every pair of corpus
    sources (think CommonCrawl dumps / data vendors), the number of
    distinct 3-gram shingles they share and the shingle-set Jaccard —
    the matrix that decides which dumps are worth ingesting and which
    are re-crawls of each other.

    Scale story: source-grain dedup sidesteps the Σdf² hazard of the
    doc-grain shingle join — after the DISTINCT(source, shingle)
    hash-agg, a shingle appears at most n_sources times, so the
    self-join on the shingle hash emits <= C(n_sources, 2) rows per
    shingle — LINEAR in corpus size with a constant bounded by the
    (tiny, known) source count. Per-source sizes broadcast (n_sources
    rows)."""
    docs = load_table(spark, sf_dir, "documents")
    # Repartition by doc_id, NOT source (ADVICE r6): source has ~20
    # distinct values, so keying the exchange on it would cap the
    # CPU-heavy normalize+shingle stage at ~20 skew-prone tasks no
    # matter the cluster width. doc_id spreads evenly; the DISTINCT
    # below shuffles by its own (source, h) keys anyway.
    w = docs.select(
        "doc_id", "source", F.split(X.normalize_text("text"), " ").alias("__words")
    ).repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")
    sg = (
        w.select(
            "source", F.explode(D.shingles_of(F.col("__words"), 3)).alias("s")
        )
        .select("source", D._md5_int60(F.col("s")).alias("h"))
        .distinct()
        .persist()
    )
    sz = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = sg.alias("a"), sg.alias("b")
    pairs = (
        a.join(b, "h")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    za = sz.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    zb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(za), "source_a")
        .join(F.broadcast(zb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "duplicate_span_islands",
    f"""
    WITH docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM docs),
    grams AS (
      SELECT doc_id, i,
             md5(array_to_string(list_slice(ws, i, i + 7), ' ')) AS g
      FROM (SELECT doc_id, ws,
                   unnest(range(1, greatest(len(ws) - 7, 0) + 1)) AS i
            FROM words)
    ),
    gc AS (SELECT g, count(*) AS cnt FROM grams GROUP BY 1),
    dup AS (
      SELECT DISTINCT gr.doc_id, gr.i
      FROM grams gr JOIN gc ON gr.g = gc.g WHERE gc.cnt >= 2
    ),
    marked AS (
      SELECT doc_id, i,
             CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 8
                  THEN 1 ELSE 0 END AS brk
      FROM dup
    ),
    isl AS (
      SELECT doc_id, i,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    )
    SELECT doc_id,
           CAST(min(i) AS BIGINT) AS span_start,
           CAST(max(i) + 7 AS BIGINT) AS span_end,
           CAST(max(i) + 7 - min(i) + 1 AS BIGINT) AS span_tokens
    FROM isl GROUP BY doc_id, island
    """,
)
def q_duplicate_span_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated spans per doc (gaps-and-islands over the
    exact-substring dup positions) — the unit Lee et al. 2022 actually
    excise. Full scale story: operators/dedup.py
    duplicate_span_islands docstring."""
    docs = load_table(spark, sf_dir, "documents")
    return D.duplicate_span_islands(docs, k=8)


@register(
    "dedup_span_excise",
    f"""
    WITH docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM docs),
    grams AS (
      SELECT doc_id, i,
             md5(array_to_string(list_slice(ws, i, i + 7), ' ')) AS g
      FROM (SELECT doc_id, ws,
                   unnest(range(1, greatest(len(ws) - 7, 0) + 1)) AS i
            FROM words)
    ),
    gstat AS (
      SELECT g, count(*) AS cnt, min(doc_id * 4294967296 + i) AS first_occ
      FROM grams GROUP BY 1
    ),
    removable AS (
      SELECT DISTINCT gr.doc_id, gr.i
      FROM grams gr JOIN gstat ON gr.g = gstat.g
      WHERE gstat.cnt >= 2 AND gr.doc_id * 4294967296 + gr.i <> gstat.first_occ
    ),
    marked AS (
      SELECT doc_id, i,
             CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 8
                  THEN 1 ELSE 0 END AS brk
      FROM removable
    ),
    isl AS (
      SELECT doc_id, i,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ),
    spans AS (
      SELECT doc_id, min(i) AS s, max(i) + 7 AS e
      FROM isl GROUP BY doc_id, island
    ),
    cut AS (
      SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS pos FROM spans
    ),
    toks AS (
      SELECT doc_id, i AS pos, ws[i] AS w
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM words)
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.w
      FROM toks t LEFT JOIN cut c ON t.doc_id = c.doc_id AND t.pos = c.pos
      WHERE c.doc_id IS NULL
    ),
    agg AS (
      SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS clean_text,
             count(*) AS n_kept FROM kept GROUP BY 1
    )
    SELECT w.doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept_tokens,
           CAST(len(w.ws) - coalesce(a.n_kept, 0) AS BIGINT)
             AS n_removed_tokens
    FROM words w LEFT JOIN agg a ON w.doc_id = a.doc_id
    """,
)
def q_dedup_span_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Lee et al. 2022 rewrite: normalized text with every
    duplicated span excised, keeping the corpus-first occurrence of
    each duplicated gram (exact copies collapse to one surviving text).
    Full policy + scale story: operators/dedup.py dedup_span_excise."""
    docs = load_table(spark, sf_dir, "documents")
    return D.dedup_span_excise(docs, k=8)


@register(
    "quality_threshold_by_source",
    r"""
    WITH s AS (
      SELECT doc_id, source,
        CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT) AS n_words,
        len(regexp_extract_all(text, '(?i)\b(the|a|of|and|to|in|is|on|for|with)\b')) AS n_stop,
        CASE WHEN length(text) > 0
             THEN len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) * 1.0 / length(text)
             ELSE 0.0 END AS pr
      FROM documents),
    q AS (
      SELECT doc_id, source,
        round(((CASE WHEN n_words BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
             + least(CASE WHEN n_words > 0 THEN n_stop * 1.0 / n_words ELSE 0.0 END * 5, 1.0)
             + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3, 6) AS quality
      FROM s),
    c AS (SELECT source, round(quantile_cont(quality, 0.3), 6) AS cutoff
          FROM q GROUP BY 1)
    SELECT q.source, c.cutoff,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN q.quality >= c.cutoff THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keep,
           round(sum(CASE WHEN q.quality >= c.cutoff THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS keep_rate
    FROM q JOIN c ON q.source = c.source
    GROUP BY q.source, c.cutoff
    """,
)
def q_quality_threshold_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality floors: each source gets its own keep-cutoff
    (the 30th percentile of the Gopher-style composite within that
    source) — the curation policy that drops the worst tail of EVERY
    domain instead of letting one clean domain starve the rest under a
    single global threshold. Emits cutoff / keep counts / keep-rate per
    source.

    Scale story: quality is a narrow one-pass projection; the exact
    per-source percentile is one grouped agg (at 100 TB swap in
    approx_percentile — same plan shape, documented exactness trade);
    cutoffs broadcast back (n_sources rows) and the keep/drop audit
    map-side-combines. Nothing wider than one corpus scan twice."""
    docs = load_table(spark, sf_dir, "documents")
    q = X.quality_score(docs).join(docs.select("doc_id", "source"), "doc_id")
    c = q.groupBy("source").agg(
        F.round(F.percentile("quality", F.lit(0.3)), 6).alias("cutoff")
    )
    keep = F.when(F.col("quality") >= F.col("cutoff"), 1).otherwise(0)
    return (
        q.join(F.broadcast(c), "source")
        .groupBy("source", "cutoff")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(keep).cast("long").alias("n_keep"),
            F.round(F.sum(keep) / F.count(F.lit(1)), 6).alias("keep_rate"),
        )
    )


@register(
    "dedup_method_eval_full",
    f"""
    WITH {_SHINGLE_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    exact AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) >= 0.6),
    cand AS (SELECT * FROM ({_lsh_sql()})),
    tp AS (
      SELECT count(*) AS tp FROM exact e
      JOIN cand c ON e.doc_a = c.doc_a AND e.doc_b = c.doc_b)
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST(tp.tp AS BIGINT) AS n_true_positives,
           round(tp.tp * 1.0 / nullif((SELECT count(*) FROM cand), 0), 6)
             AS precision_at_06,
           round(tp.tp * 1.0 / nullif((SELECT count(*) FROM exact), 0), 6)
             AS recall_at_06
    FROM tp
    """,
    diagnostic=True,
)
def q_dedup_method_eval_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-CORPUS diagnostic twin of `dedup_method_eval` (opt-in via
    SPARK_GRAFT_FULL_EVALS=1 — VERDICT r10 #1: the uncapped exact side
    is quadratic in template-family size, 4.35x wall at 3x data; the
    hash-sliced default carries the gate instead).

    The measurement that justifies an LSH configuration: candidate
    precision/recall of the 16-hash/2-row MinHash banding against the
    EXACT shingle-Jaccard pairs at tau=0.6, on the corpus itself.
    One row: n_exact, n_candidates, n_true_positives, precision, recall
    — rerun per corpus before committing band parameters (the S-curve
    says recall ~0.97 at J=0.6 for this scheme; this entry measures it
    rather than trusting the formula).

    Scale story: both sides are the already-audited linear pipelines
    (shingle equality joins, banded signature joins); the comparison
    adds one left-semi join keyed on the (doc_a, doc_b) pair and three
    scalar aggregates crossJoined (1-row broadcasts). At 100 TB you'd
    run it on a deterministic-sample slice (`deterministic_sample`'s
    hash filter composes directly) — the estimate needs thousands of
    pairs, not the full corpus."""
    docs = load_table(spark, sf_dir, "documents")
    # one normalize+split pass shared by BOTH pipelines (the regex is
    # the CPU hot spot; unshared it ran once per side)
    words = D._words_df(docs).persist()
    exact = D.ngram_jaccard_pairs(docs, threshold=0.6, words=words).select(
        "doc_a", "doc_b"
    )
    cand = D.minhash_lsh_candidates(docs, words=words)
    ne = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    tp = exact.join(cand, ["doc_a", "doc_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_true_positives")
    )
    out = ne.crossJoin(nc).crossJoin(tp)
    return out.select(
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("n_true_positives").cast("long").alias("n_true_positives"),
        F.round(
            F.col("n_true_positives")
            / F.when(F.col("n_candidates") > 0, F.col("n_candidates")),
            6,
        ).alias("precision_at_06"),
        F.round(
            F.col("n_true_positives")
            / F.when(F.col("n_exact") > 0, F.col("n_exact")),
            6,
        ).alias("recall_at_06"),
    )


def _split_case(key: str) -> str:
    from .registry_sampling import _HASH_SQL

    h = _HASH_SQL.format(salt="split:", key=key)
    return f"CASE WHEN {h} < 900 THEN 'train' WHEN {h} < 950 THEN 'val' ELSE 'test' END"


@register(
    "split_leakage_audit",
    f"""
    WITH pairs AS (SELECT doc_a, doc_b FROM ({_lsh_verified_sql()})),
    s AS (SELECT doc_id, {_split_case("doc_id")} AS split FROM documents),
    tagged AS (
      SELECT least(sa.split, sb.split) AS split_a,
             greatest(sa.split, sb.split) AS split_b
      FROM pairs p
      JOIN s sa ON sa.doc_id = p.doc_a
      JOIN s sb ON sb.doc_id = p.doc_b
    )
    SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END AS BIGINT)
             AS leaked
    FROM tagged GROUP BY 1, 2
    """,
)
def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit: verified near-dup pairs (the
    two-stage LSH+exact pipeline at J >= 0.5) tagged with each member's
    hash-derived train/val/test split — any pair whose members land in
    DIFFERENT splits (leaked = 1) is evaluation contamination the
    split alone cannot prevent (the reason production pipelines dedup
    BEFORE splitting). Counts per ordered split pair.

    Scale story: the pair pipeline is the already-audited bounded
    two-stage dedup; the audit adds two joins against a projection of
    (doc_id, split) — split is a pure md5 function of doc_id, so the
    join carries no new state — and a 6-key hash-agg. Cost is the
    dedup pipeline's cost plus epsilon."""
    docs = load_table(spark, sf_dir, "documents")
    from .registry_sampling import _hash_bucket

    b = _hash_bucket(F.col("doc_id"), "split:")
    s = docs.select(
        "doc_id",
        F.when(b < 900, "train").when(b < 950, "val").otherwise("test").alias("split"),
    )
    pairs = D.lsh_verified_pairs(docs).select("doc_a", "doc_b")
    sa = s.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    sb = s.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "split_a",
            "split_b",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.when(F.col("split_a") != F.col("split_b"), 1)
            .otherwise(0)
            .cast("long")
            .alias("leaked"),
        )
    )


_SAMPLED_EVAL_BODY = f"""
    {_SHINGLE_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    exact AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) >= 0.6),
    cand AS (SELECT * FROM ({_lsh_sql()})),
    tp AS (
      SELECT count(*) AS tp FROM exact e
      JOIN cand c ON e.doc_a = c.doc_a AND e.doc_b = c.doc_b)
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST(tp.tp AS BIGINT) AS n_true_positives,
           round(tp.tp * 1.0 / nullif((SELECT count(*) FROM cand), 0), 6)
             AS precision_at_06,
           round(tp.tp * 1.0 / nullif((SELECT count(*) FROM exact), 0), 6)
             AS recall_at_06
    FROM tp
    """.replace("FROM documents", "FROM docs_slice")

# the body's CTE list starts directly with the shingle fragment (no WITH
# keyword of its own), so the slice CTE prepends cleanly; the body's
# "FROM documents" references were rewritten to the slice above
_SAMPLED_EVAL_SQL = (
    """
    WITH docs_slice AS (
      SELECT * FROM documents
      WHERE ('0x' || substr(md5('evalslice:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < 500
    ),"""
    + _SAMPLED_EVAL_BODY
)


@register("dedup_method_eval", _SAMPLED_EVAL_SQL)
def q_dedup_method_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH-vs-exact precision/recall eval in its SCALE posture —
    the gated registry default since r11 (VERDICT r10 #1; the
    full-corpus twin is the opt-in `dedup_method_eval_full`
    diagnostic): LSH-vs-exact measured on a deterministic 50%
    hash slice of the corpus (md5 'evalslice:' salt — membership is a
    pure function of doc_id, so the slice is reproducible on any
    engine/cluster/run). The full-corpus twin's uncapped exact side is
    quadratic in template-family size (4.35x wall at 3x data, sf3
    tier); the slice caps that at a constant fraction while the
    recall/precision estimate — a ratio over thousands of pairs —
    keeps its statistical power. Both the candidate and ground-truth
    pipelines see the SAME slice, so the estimate is unbiased for the
    sliced population."""
    docs = load_table(spark, sf_dir, "documents")
    from .registry_sampling import _hash_bucket

    sliced = docs.filter(_hash_bucket(F.col("doc_id"), "evalslice:") < 500)
    words = D._words_df(sliced).persist()
    exact = D.ngram_jaccard_pairs(sliced, threshold=0.6, words=words).select(
        "doc_a", "doc_b"
    )
    cand = D.minhash_lsh_candidates(sliced, words=words)
    ne = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    tp = exact.join(cand, ["doc_a", "doc_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_true_positives")
    )
    out = ne.crossJoin(nc).crossJoin(tp)
    return out.select(
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("n_true_positives").cast("long").alias("n_true_positives"),
        F.round(
            F.col("n_true_positives")
            / F.when(F.col("n_candidates") > 0, F.col("n_candidates")),
            6,
        ).alias("precision_at_06"),
        F.round(
            F.col("n_true_positives")
            / F.when(F.col("n_exact") > 0, F.col("n_exact")),
            6,
        ).alias("recall_at_06"),
    )


# ---------------------------------------------------------------------------
# Training-data selection & lexical retrieval (operators/selection.py)
# ---------------------------------------------------------------------------

_DSIR_TARGET = "src0"


def _dsir_weights_sql(n_buckets: int = 64, target: str = _DSIR_TARGET) -> str:
    return f"""
    WITH dn AS (
      SELECT doc_id, source = '{target}' AS is_target, {_norm()} AS t
      FROM documents
    ),
    toks AS (
      SELECT doc_id, is_target,
             ('0x' || substr(md5(w), 1, 15))::BIGINT % {n_buckets} AS b
      FROM (SELECT doc_id, is_target, unnest(string_split(t, ' ')) AS w FROM dn)
    ),
    counts AS (
      SELECT b,
             sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_t,
             sum(CASE WHEN NOT is_target THEN 1 ELSE 0 END) AS c_r
      FROM toks GROUP BY b
    ),
    totals AS (SELECT sum(c_t) AS t_t, sum(c_r) AS t_r FROM counts),
    llr AS (
      SELECT b, ln((c_t + 1.0) / (t_t + {n_buckets}.0))
               - ln((c_r + 1.0) / (t_r + {n_buckets}.0)) AS llr
      FROM counts, totals
    )
    SELECT doc_id, round(sum(llr), 6) AS weight
    FROM toks JOIN llr USING (b)
    WHERE NOT is_target
    GROUP BY doc_id
    """


@register("dsir_weights", _dsir_weights_sql())
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023) for every raw-pool doc:
    log-likelihood ratio of the doc under hashed-unigram bag models of
    the target domain (source = 'src0') vs the pool, add-1 smoothed.
    The bucket-LLR table is 64 rows (broadcast at any corpus size); the
    per-doc weight is one explode + broadcast join + groupBy(doc_id)."""
    from .operators import selection as SEL

    return SEL.dsir_weights(load_table(spark, sf_dir, "documents"))


@register(
    "importance_resampling",
    f"""
    SELECT doc_id, weight FROM ({_dsir_weights_sql()})
    ORDER BY weight DESC, doc_id LIMIT 100
    """,
)
def q_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR resampling step: the 100 raw-pool docs whose hashed
    n-gram distribution best matches the target domain — deterministic
    top-k by rounded weight (doc_id tiebreak), so the plan is
    TakeOrderedAndProject, never a materialized global sort."""
    from .operators import selection as SEL

    return SEL.dsir_topk(load_table(spark, sf_dir, "documents"), k=100)


def _bm25_sql(n_terms: int = 3, k: int = 10) -> str:
    return f"""
    WITH dn AS (SELECT doc_id, {_norm()} AS t FROM documents),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM dn),
    toks AS (SELECT doc_id, unnest(ws) AS w FROM words),
    df AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w),
    top_terms AS (SELECT w, df FROM df ORDER BY df DESC, w LIMIT {n_terms}),
    dl AS (SELECT doc_id, len(ws) AS dl FROM words),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT t.doc_id, t.w, tt.df, count(*) AS tf
      FROM toks t JOIN top_terms tt USING (w)
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT tf.w AS term, tf.doc_id,
             round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * tf * 2.2
                   / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS score
      FROM tf JOIN dl USING (doc_id), stats
    )
    SELECT term, doc_id, score, CAST(rk AS INT) AS rk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY term ORDER BY score DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= {k}
    """


@register("bm25_retrieval", _bm25_sql())
def q_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 docs per query term (k1=1.2, b=0.75, +1-in-the-log
    idf). The query set is the 3 highest-df terms — deterministic, no
    external query log needed. The broadcast term table prunes the
    token stream map-side before the tf groupBy, so retrieval cost
    scales with hits of 3 terms, not vocabulary size."""
    from .operators import selection as SEL

    return SEL.bm25_topk(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_index_compaction",
    f"""
    WITH incr AS (SELECT * FROM ({_incremental_dedup_sql()})),
    dropped AS (SELECT DISTINCT new_doc AS doc_id FROM incr)
    SELECT d.doc_id,
           CASE WHEN d.doc_id >= {_INCR_NEW_MAX_ID} THEN 'kept_index'
                WHEN dr.doc_id IS NOT NULL THEN 'dropped_dup'
                ELSE 'inserted' END AS status
    FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.doc_id
    """,
)
def q_dedup_index_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing-index MERGE that follows incremental_dedup:
    per-doc verdict of the compacted index (kept_index / inserted /
    dropped_dup). The drop list is the broadcast probe's output (the
    corpus is never self-joined); the verdict itself is one broadcast
    left join — map-only over the index side. In steady state the
    banded-signature refresh appends only the inserted docs' rows."""
    return D.index_compaction(
        load_table(spark, sf_dir, "documents"), new_max_id=_INCR_NEW_MAX_ID
    )


def _ppl_buckets_sql() -> str:
    return f"""
    WITH docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM docs),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                    i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM words
    ),
    big_cnt AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY 1),
    uni AS (SELECT unnest(ws) AS w FROM words),
    uni_f AS (SELECT w FROM uni WHERE w <> ''),
    uni_cnt AS (SELECT w, count(*) AS cu FROM uni_f GROUP BY 1),
    vocab AS (SELECT count(DISTINCT w) AS v FROM uni_f),
    doc_bg AS (SELECT doc_id, bigram, count(*) AS m FROM bg GROUP BY 1, 2),
    scored AS (
      SELECT d.doc_id,
             sum(d.m) AS nb,
             sum(d.m * CAST(round(ln((b.cb + 1.0) / (u.cu + v.v)) * 1e9)
                            AS BIGINT)) AS sq
      FROM doc_bg d
      JOIN big_cnt b USING (bigram)
      JOIN uni_cnt u ON u.w = split_part(d.bigram, ' ', 1)
      CROSS JOIN vocab v
      GROUP BY 1
    ),
    lp AS (
      SELECT s.doc_id, d.source,
             s.sq * 1.0 / (s.nb * 1e9) AS lp_raw,
             round(s.sq * 1.0 / (s.nb * 1e9), 6) AS avg_logprob
      FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT doc_id, source, avg_logprob,
           CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
             AS bucket
    FROM (SELECT *, ntile(3) OVER (
            PARTITION BY source ORDER BY lp_raw DESC, doc_id) AS nt
          FROM lp)
    """


@register("perplexity_buckets", _ppl_buckets_sql())
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every doc under the corpus-trained add-1 bigram LM (the
    bigram_lm_quality core, shared via _bigram_lm_scored), then split
    each SOURCE into head/middle/tail tertiles by model fit — head =
    most-fluent third, the slice CCNet keeps outright; tail = the
    candidate-discard third. Per-source (not global) bucketing is the
    point: it prevents a clean source from monopolizing the keep set.

    Determinism: tertiles order by the exact integer-quantized
    log-probability ratio (sq/nb as one IEEE division — identical in
    Spark and DuckDB), doc_id tiebreak, so ntile assignment is
    engine-stable. Scale story: the LM is two hash-aggs; the bucketing
    is one shuffle keyed on source + an in-partition sort. With very
    few giant sources the exact-ntile sort is the documented small-SF
    contract — at 100 TB you'd swap the window for approx-quantile
    cutoffs per source (percentile_approx is already the established
    posture in gap_percentiles), trading exactness for a map-only
    bucket assignment; semantics otherwise identical."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    scored = _bigram_lm_scored(docs)
    lp = scored.join(docs.select("doc_id", "source"), "doc_id").withColumn(
        "lp_raw", F.col("sq") / (F.col("nb") * F.lit(1e9))
    )
    w_nt = Window.partitionBy("source").orderBy(F.desc("lp_raw"), F.asc("doc_id"))
    return lp.withColumn("nt", F.ntile(3).over(w_nt)).select(
        "doc_id",
        "source",
        F.round("lp_raw", 6).alias("avg_logprob"),
        F.when(F.col("nt") == 1, F.lit("head"))
        .when(F.col("nt") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def _containment_sql(
    threshold: float = 0.8,
    cap: int | None = D.DEFAULT_MAX_SHINGLE_DF,
    m_probes: int = 8,
    min_hits: int = 2,
) -> str:
    """Asymmetric-candidate containment (ADVICE r8): each doc's
    m smallest-hash shingles probe the shingle inverted index (recall
    1.0 for full containment — every shingle of the contained doc is in
    the container; >= min_hits probe hits required per directed pair,
    capped at the prober's probe count), then the exact intersection
    scores both directed containments."""
    return f"""
    WITH {_shingle_cte(cap)},
    probes AS (
      SELECT doc_id, shingle_hash,
             count(*) OVER (PARTITION BY doc_id) AS n_probes
      FROM (
        SELECT doc_id, shingle_hash,
               row_number() OVER (PARTITION BY doc_id ORDER BY shingle_hash)
                 AS rk
        FROM sh)
      WHERE rk <= {m_probes}
    ),
    cand AS (
      SELECT DISTINCT least(src, tgt) AS doc_a, greatest(src, tgt) AS doc_b
      FROM (
        SELECT p.doc_id AS src, s.doc_id AS tgt,
               count(*) AS hits, max(p.n_probes) AS n_probes
        FROM probes p JOIN sh s USING (shingle_hash)
        WHERE p.doc_id <> s.doc_id
        GROUP BY 1, 2)
      WHERE hits >= least({min_hits}, n_probes)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle_hash = a.shingle_hash
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           round(n_common * 1.0 / sa.n, 6) AS containment_a,
           round(n_common * 1.0 / sb.n, 6) AS containment_b
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE greatest(round(n_common * 1.0 / sa.n, 6),
                   round(n_common * 1.0 / sb.n, 6)) >= {threshold}
    """


@register("containment_pairs", _containment_sql())
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup pairs — the doc-in-doc case (quotes,
    boilerplate wrappers, concatenated shards) where Jaccard stays low
    but the small side is fully covered. Candidates come from the
    asymmetric probe index (each doc's 8 smallest-hash shingles vs the
    shingle inverted index — recall 1.0 for full containment, the case
    the r8 symmetric-LSH generator structurally missed, ADVICE r8);
    the verify stage scores both directed containments exactly and
    keeps max >= 0.8."""
    return D.containment_pairs(load_table(spark, sf_dir, "documents"), threshold=0.8)


@register(
    "tokenizer_fertility",
    r"""
    SELECT source,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           round(sum(n_tokens) * 1.0 / sum(n_words), 6) AS fertility
    FROM (
      SELECT source,
             len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS n_words,
             len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]'))
               AS n_tokens
      FROM documents
    )
    GROUP BY source
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (tokens emitted per word) by source — the
    token-budget planning number: a source whose fertility runs high
    (code, non-Latin scripts, noisy punctuation) costs more context
    per word of content, which shifts both mixing weights and cost
    estimates. BPE-ish segmentation regex shared with text_stats.
    Map-only projection + one tiny agg keyed on source."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", X.word_count("text").alias("n_words"),
                    X.bpe_token_count("text").alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.sum("n_tokens") / F.sum("n_words"), 6).alias("fertility"),
        )
    )


# ---------------------------------------------------------------------------
# Typed PII density profile. regex_redaction above demonstrates the
# masking machinery on an in-corpus pattern; this entry carries the
# REAL pattern classes (email / phone / IPv4 / 16-digit card) over a
# deterministically synthesized PII suffix (the corpus itself is
# PII-free), giving the per-source compliance profile a curation run
# needs before release. All patterns live in the Java-regex ∩ RE2
# subset so the oracle runs the identical automata.
# ---------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]" + "{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_CARD_RE = r"\b\d{16}\b"


def _pii_wrap_sql() -> str:
    return (
        "text"
        " || CASE WHEN doc_id % 3 = 0 THEN ' Contact user' ||"
        " CAST(doc_id AS VARCHAR) || '@example.com for details.'"
        " ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' Call 415-555-' ||"
        " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now.'"
        " ELSE '' END"
        " || CASE WHEN doc_id % 11 = 0 THEN ' Logged in from 10.0.' ||"
        " CAST(doc_id % 256 AS VARCHAR) || '.' ||"
        " CAST((doc_id // 7) % 256 AS VARCHAR) || '.'"
        " ELSE '' END"
        " || CASE WHEN doc_id % 13 = 0 THEN ' Card 4111111111111111 on file.'"
        " ELSE '' END"
    )


def _pii_density_sql() -> str:
    cnt = {
        "em": PII_EMAIL_RE,
        "ph": PII_PHONE_RE,
        "ip": PII_IPV4_RE,
        "cd": PII_CARD_RE,
    }
    cols = ", ".join(
        "len(regexp_extract_all(t, '" + pat + "')) AS " + k
        for k, pat in cnt.items()
    )
    return (
        "WITH p AS (SELECT source, " + _pii_wrap_sql() + " AS t FROM documents),\n"
        "    c AS (SELECT source, length(t) AS ln, " + cols + " FROM p)\n"
        "    SELECT source,\n"
        "           CAST(count(*) AS BIGINT) AS n_docs,\n"
        "           CAST(sum(CASE WHEN em + ph + ip + cd > 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS docs_with_pii,\n"
        "           CAST(sum(em) AS BIGINT) AS n_emails,\n"
        "           CAST(sum(ph) AS BIGINT) AS n_phones,\n"
        "           CAST(sum(ip) AS BIGINT) AS n_ips,\n"
        "           CAST(sum(cd) AS BIGINT) AS n_cards,\n"
        "           round(sum(em + ph + ip + cd) * 10000.0 / sum(ln), 6)"
        " AS pii_per_10kchars\n"
        "    FROM c GROUP BY source"
    )


@register("pii_density", _pii_density_sql())
def q_pii_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source typed PII density (emails / phones / IPv4s / card
    numbers per 10k chars, plus affected-doc counts) — the compliance
    profile that decides whether a source needs redaction before
    training. One scan, four regexp_count kernels inside whole-stage
    codegen, then a tiny per-source hash agg: at 100 TB this is
    scan-bound and embarrassingly parallel. PII occurrences are
    synthesized deterministically per doc_id (the testdata corpus is
    PII-free); the patterns and counts are the real operator."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    t = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" Contact user"),
                did.cast("string"),
                F.lit("@example.com for details."),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" Call 415-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
                F.lit(" now."),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" Logged in from 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                (F.floor(did / 7).cast("long") % 256).cast("string"),
                F.lit("."),
            ),
        ).otherwise(F.lit("")),
        F.when(did % 13 == 0, F.lit(" Card 4111111111111111 on file.")).otherwise(
            F.lit("")
        ),
    )
    base = docs.select("source", t.alias("t"))
    em = F.regexp_count("t", F.lit(PII_EMAIL_RE))
    ph = F.regexp_count("t", F.lit(PII_PHONE_RE))
    ip = F.regexp_count("t", F.lit(PII_IPV4_RE))
    cd = F.regexp_count("t", F.lit(PII_CARD_RE))
    tot = em + ph + ip + cd
    return base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(tot > 0, 1).otherwise(0)).cast("long").alias("docs_with_pii"),
        F.sum(em).cast("long").alias("n_emails"),
        F.sum(ph).cast("long").alias("n_phones"),
        F.sum(ip).cast("long").alias("n_ips"),
        F.sum(cd).cast("long").alias("n_cards"),
        F.round(F.sum(tot) * 10000.0 / F.sum(F.length("t")), 6).alias(
            "pii_per_10kchars"
        ),
    )


# ---------------------------------------------------------------------------
# BPE merge-pair candidates — the first iteration of tokenizer training
# (Sennrich et al. 2016): count adjacent symbol pairs across the corpus
# vocabulary, weighted by word frequency. The most frequent pair is the
# first merge a BPE trainer would perform; the ranked table is the
# corpus-statistics input tokenizer training at scale starts from.
# ---------------------------------------------------------------------------

BPE_TOP_PAIRS = 50
BPE_EOW = "</w>"


@register(
    "bpe_merge_candidates",
    f"""
    WITH wf AS (
      SELECT w, count(*) AS freq
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
            FROM documents)
      GROUP BY w
    ),
    pr AS (
      SELECT freq,
             unnest(list_concat(
               list_transform(range(1, greatest(length(w), 1)),
                 i -> {{'a': w[i:i], 'b': w[i+1:i+1]}}),
               [{{'a': w[length(w):length(w)], 'b': '{BPE_EOW}'}}])) AS p
      FROM wf
    ),
    agg AS (
      SELECT struct_extract(p, 'a') AS left_sym,
             struct_extract(p, 'b') AS right_sym,
             CAST(sum(freq) AS BIGINT) AS pair_count
      FROM pr GROUP BY 1, 2
      ORDER BY pair_count DESC, left_sym, right_sym
      LIMIT {BPE_TOP_PAIRS}
    )
    SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, left_sym,
                                   right_sym) AS BIGINT) AS merge_rank,
           left_sym, right_sym, pair_count
    FROM agg
    """,
)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent symbol pairs for the first BPE merge (Sennrich
    2016 §3.2), with the classic end-of-word symbol so terminal pairs
    ('s' + </w>) compete with interior ones. Deterministic rank:
    count desc, then pair lexicographic.

    Scale shape: the corpus collapses to its VOCABULARY first (word
    hash-agg with map-side partials — the same shrink tokenizer
    trainers exploit), so pair expansion runs over distinct words x
    avg_word_len, orders of magnitude smaller than the corpus; the
    pair agg output is bounded by |alphabet|^2. Final top-50 plans as
    TakeOrderedAndProject. No Python, no join, two uniform hash aggs."""
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = F.col("w")
    inner = F.transform(
        F.filter(
            F.sequence(F.lit(1), F.greatest(F.length(w) - 1, F.lit(1))),
            lambda i: i <= F.length(w) - 1,
        ),
        lambda i: F.struct(
            F.substring(w, i, 1).alias("a"), F.substring(w, i + 1, 1).alias("b")
        ),
    )
    terminal = F.array(
        F.struct(
            F.substring(w, F.length(w), 1).alias("a"), F.lit(BPE_EOW).alias("b")
        )
    )
    pairs = (
        wf.select("freq", F.explode(F.concat(inner, terminal)).alias("p"))
        .groupBy(F.col("p.a").alias("left_sym"), F.col("p.b").alias("right_sym"))
        .agg(F.sum("freq").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(BPE_TOP_PAIRS)
    )
    from pyspark.sql import Window

    rank_w = Window.orderBy(F.desc("pair_count"), "left_sym", "right_sym")
    return pairs.select(
        F.row_number().over(rank_w).cast("long").alias("merge_rank"),
        "left_sym",
        "right_sym",
        "pair_count",
    )


# ---------------------------------------------------------------------------
# T5 span corruption — training-example synthesis (Raffel et al. 2020
# §3.1.4): mask ~15% of tokens in mean-length-3 spans, replace each
# span with a sentinel in the input and emit the spans behind their
# sentinels as the target. Span placement is DETERMINISTIC (stratified
# md5 draw) so both engines synthesize identical examples: the token
# stream splits into n_spans equal strata and each span lands at
# md5('t5:'||doc_id||':'||i) % (stratum - 2) inside its stratum —
# non-overlapping and ordered by construction.
# ---------------------------------------------------------------------------

T5_SPAN_LEN = 3  # mean noise-span length used as the fixed span length


def _t5_sql() -> str:
    h = "(('0x' || substr(md5('t5:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15))::BIGINT)"
    idx = "least((i-1)//st, ns-1)"
    s_at = f"starts[{idx}+1]"
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (
      SELECT doc_id, toks, len(toks) AS nw,
             CASE WHEN len(toks) >= {T5_SPAN_LEN}
                  THEN greatest(1, least(len(toks) // 20,
                                         len(toks) // {T5_SPAN_LEN}))
                  ELSE 0 END AS ns
      FROM d
    ),
    s AS (
      SELECT doc_id, toks, nw, ns,
             CASE WHEN ns > 0 THEN nw // ns ELSE 0 END AS st,
             CASE WHEN ns > 0 THEN
               list_transform(range(0, ns),
                 i -> i * (nw // ns) + ({h} % ((nw // ns) - {T5_SPAN_LEN - 1})))
             ELSE []::BIGINT[] END AS starts
      FROM c
    )
    SELECT doc_id,
           CAST(nw AS BIGINT) AS n_words,
           CAST(ns AS BIGINT) AS n_spans,
           CASE WHEN ns = 0 THEN array_to_string(toks, ' ')
           ELSE array_to_string(list_filter(list_transform(toks, (t, i) ->
             CASE WHEN (i-1) >= {s_at} AND (i-1) < {s_at} + {T5_SPAN_LEN}
                  THEN (CASE WHEN (i-1) = {s_at}
                        THEN '<extra_id_' || CAST({idx} AS VARCHAR) || '>'
                        ELSE NULL END)
                  ELSE t END), x -> x IS NOT NULL), ' ')
           END AS input_text,
           CASE WHEN ns = 0 THEN ''
           ELSE array_to_string(list_transform(range(0, ns), i ->
                  '<extra_id_' || CAST(i AS VARCHAR) || '> '
                  || array_to_string(toks[starts[i+1]+1 : starts[i+1]+{T5_SPAN_LEN}], ' ')),
                ' ')
                || ' <extra_id_' || CAST(ns AS VARCHAR) || '>'
           END AS target_text
    FROM s
    """


@register("t5_span_corruption", _t5_sql())
def q_t5_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption example synthesis (the T5 / UL2 denoising
    objective): per doc, ~15% of tokens masked in fixed-length-3
    spans; input carries <extra_id_k> sentinels, target carries the
    masked spans behind their sentinels plus the closing sentinel.
    Stratified deterministic placement (one md5 draw per span inside
    its stratum) keeps spans non-overlapping, ordered, and identical
    across engines and runs — reproducible pretraining examples.

    Scale shape: pure per-row higher-order projection — tokenize,
    place, mask, and reassemble all happen inside one codegen'd map
    over the corpus; zero shuffle, zero Python, embarrassingly
    parallel at any scale. Docs shorter than one span pass through
    uncorrupted (n_spans = 0, empty target)."""
    docs = load_table(spark, sf_dir, "documents")
    L = T5_SPAN_LEN
    toks = F.split(F.col("text"), " ")
    nw = F.size(toks)
    ns = (
        F.when(
            nw >= L,
            F.greatest(F.lit(1), F.least(F.floor(nw / 20), F.floor(nw / L))),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    base = docs.select("doc_id", toks.alias("toks"), nw.alias("nw"), ns.alias("ns"))
    nw, ns = F.col("nw"), F.col("ns")
    st = F.when(ns > 0, F.floor(nw / ns)).otherwise(F.lit(0)).cast("long")
    draw = lambda i: D._md5_int60(
        F.concat(
            F.lit("t5:"), F.col("doc_id").cast("string"), F.lit(":"), i.cast("string")
        )
    )
    starts = F.when(
        ns > 0,
        F.transform(
            F.sequence(F.lit(0), ns - 1),
            lambda i: i.cast("long") * F.floor(nw / ns).cast("long")
            + draw(i) % (F.floor(nw / ns).cast("long") - F.lit(L - 1)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    base = base.withColumn("st", st).withColumn("starts", starts)

    def span_idx(j):
        return F.least(F.floor(j.cast("long") / F.col("st")), (F.col("ns") - 1).cast("long"))

    def start_at(j):
        return F.element_at(F.col("starts"), (span_idx(j) + 1).cast("int"))

    masked = F.transform(
        F.col("toks"),
        lambda t, j: F.when(
            (j.cast("long") >= start_at(j)) & (j.cast("long") < start_at(j) + L),
            F.when(
                j.cast("long") == start_at(j),
                F.concat(F.lit("<extra_id_"), span_idx(j).cast("string"), F.lit(">")),
            ).otherwise(F.lit(None).cast("string")),
        ).otherwise(t),
    )
    input_text = F.when(
        F.col("ns") == 0, F.array_join(F.col("toks"), " ")
    ).otherwise(F.array_join(F.filter(masked, lambda x: x.isNotNull()), " "))
    target_text = F.when(F.col("ns") == 0, F.lit("")).otherwise(
        F.concat(
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.col("ns") - 1),
                    lambda i: F.concat(
                        F.lit("<extra_id_"),
                        i.cast("long").cast("string"),
                        F.lit("> "),
                        F.array_join(
                            F.slice(
                                F.col("toks"),
                                (F.element_at(F.col("starts"), (i + 1).cast("int")) + 1).cast(
                                    "int"
                                ),
                                L,
                            ),
                            " ",
                        ),
                    ),
                ),
                " ",
            ),
            F.lit(" <extra_id_"),
            F.col("ns").cast("string"),
            F.lit(">"),
        )
    )
    return base.select(
        "doc_id",
        F.col("nw").cast("long").alias("n_words"),
        F.col("ns").cast("long").alias("n_spans"),
        input_text.alias("input_text"),
        target_text.alias("target_text"),
    )


# ---------------------------------------------------------------------------
# Memorization attribution — given a generated snippet, which training
# doc did it come from? The winnowing fingerprint index answers it
# position-robustly (any shared run of >= w+2 words shares a
# fingerprint), which is exactly the memorization-audit query run
# against emitted model text.
# ---------------------------------------------------------------------------

_ATTR_PROBE_IDS = (1, 3, 5)  # constant probe set — corpus growth must not grow it
_ATTR_SNIPPET = (11, 30)  # 1-based inclusive word range the "generation" quotes


def _winnow_fps_cte(src: str, idc: str, pre: str) -> str:
    """CTE text for the (id, fingerprint) relation over src(idc, ws) —
    the same trigram-hash + w=4 window-min selection as
    winnowing_fingerprints."""
    return f"""
    {pre}sh AS (
      SELECT {idc}, CAST(u.i AS BIGINT) AS pos,
             ('0x' || substr(md5(u.s), 1, 15))::BIGINT AS h
      FROM (SELECT {idc},
              unnest(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                i -> struct_pack(i := i,
                  s := array_to_string(list_slice(ws, i, i + 2), ' ')))) AS u
            FROM {src})),
    {pre}wm AS (
      SELECT {idc}, pos,
             min(h) OVER (PARTITION BY {idc} ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS fp,
             count(*) OVER (PARTITION BY {idc}) AS n
      FROM {pre}sh),
    {pre}fps AS (SELECT DISTINCT {idc}, fp FROM {pre}wm
                 WHERE pos <= n - {_WINNOW_W} + 1)"""


def _attribution_sql(k: int = 3) -> str:
    ids = ", ".join(str(i) for i in _ATTR_PROBE_IDS)
    a, b = _ATTR_SNIPPET
    return f"""
    WITH docs AS (SELECT doc_id, {_norm()} AS t FROM documents),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM docs),
    {_winnow_fps_cte("words", "doc_id", "c")},
    pw AS (SELECT doc_id AS probe_id, list_slice(ws, {a}, {b}) AS ws
           FROM words WHERE doc_id IN ({ids})),
    {_winnow_fps_cte("pw", "probe_id", "p")},
    j AS (
      SELECT p.probe_id, c.doc_id, count(*) AS n_shared
      FROM pfps p JOIN cfps c ON p.fp = c.fp
      GROUP BY 1, 2)
    SELECT probe_id, doc_id, CAST(n_shared AS BIGINT) AS n_shared,
           CAST(rk AS INT) AS rk
    FROM (SELECT *, row_number() OVER (
            PARTITION BY probe_id ORDER BY n_shared DESC, doc_id) AS rk
          FROM j)
    WHERE rk <= {k}
    """


def _winnow_fp_set(words: DataFrame, id_col: str, words_col: str) -> DataFrame:
    """(id_col, fp): the winnowing fingerprint relation — shared by the
    attribution probe and corpus sides."""
    from pyspark.sql.window import Window

    k = F.greatest(F.size(words_col) - F.lit(2), F.lit(0))
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(words_col, i, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = words.select(id_col, F.posexplode(grams).alias("pos0", "s")).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        D._md5_int60(F.col("s")).alias("h"),
    )
    w_min = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, _WINNOW_W - 1)
    )
    w_all = Window.partitionBy(id_col)
    return (
        sh.select(
            id_col,
            "pos",
            F.min("h").over(w_min).alias("fp"),
            F.count(F.lit(1)).over(w_all).alias("n"),
        )
        .filter(F.col("pos") <= F.col("n") - _WINNOW_W + 1)
        .select(id_col, "fp")
        .distinct()
    )


@register("memorization_attribution", _attribution_sql())
def q_memorization_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute a 'generated' snippet back to its training doc: a
    constant probe set (docs 1/3/5; words 11-30 stand in for emitted
    model text) fingerprints with the SAME winnowing selection as the
    corpus index, and shared-fingerprint counts rank candidate source
    docs (top-3 per probe). The source doc must rank first — pinned in
    pytest — and near-dups of it surface next, which is the audit's
    point.

    Scale shape: the corpus fingerprint relation is the standing
    winnowing index (a stored artifact in production; fraction of
    full-shingle size); the probe side is constant-cardinality by
    contract, so the fp equality join broadcasts the probe set and the
    corpus is never self-joined. No floats anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    words = D._words_df(docs)
    cfps = _winnow_fp_set(words, "doc_id", "__words")
    a, b = _ATTR_SNIPPET
    pw = words.filter(F.col("doc_id").isin(*_ATTR_PROBE_IDS)).select(
        F.col("doc_id").alias("probe_id"),
        F.slice("__words", a, b - a + 1).alias("pws"),
    )
    pfps = _winnow_fp_set(pw, "probe_id", "pws").withColumnRenamed("fp", "pfp")
    j = (
        cfps.join(F.broadcast(pfps), F.col("fp") == F.col("pfp"))
        .groupBy("probe_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("probe_id").orderBy(F.desc("n_shared"), F.asc("doc_id"))
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "probe_id",
            "doc_id",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# Content-type routing — code vs table vs prose, the split a corpus
# makes before choosing tokenizer, mixing weight, and quality rules.
# Deterministic synthesized wrappers (the html_strip/pii_density
# discipline) plant code and table shapes on fixed residues so the
# classifier has all three classes to separate; the RULES are the
# operator, integer-exact throughout.
# ---------------------------------------------------------------------------

CODE_WRAP_MOD = 11  # doc_id % 11 == 0 -> wrapped as a code snippet
TABLE_WRAP_MOD = 13  # doc_id % 13 == 0 (and not code) -> wrapped as a table


def _content_type_sql() -> str:
    return f"""
    WITH w AS (
      SELECT doc_id, source,
             CASE
               WHEN doc_id % {CODE_WRAP_MOD} = 0 THEN
                 'def f_' || CAST(doc_id AS VARCHAR) || '(x) {{' || chr(10)
                 || '  return {{"k": [' || text || ']}};' || chr(10) || '}}'
               WHEN doc_id % {TABLE_WRAP_MOD} = 0 THEN
                 'col_a | col_b | col_c' || chr(10)
                 || replace(text, ' ', ' | ')
               ELSE text
             END AS t
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, length(t) AS n_chars,
             len(regexp_extract_all(t, '[{{}};=()\\[\\]]')) AS n_code,
             len(regexp_extract_all(t, '\\|')) AS n_pipe,
             len(regexp_extract_all(t, '[A-Za-z]+')) AS n_words
      FROM w
    ),
    k AS (
      SELECT doc_id, source, n_chars, n_code, n_pipe,
             CASE
               WHEN 50 * n_code >= n_chars THEN 'code'
               WHEN 20 * n_pipe >= n_words THEN 'table'
               ELSE 'prose'
             END AS content_type
      FROM c
    )
    SELECT source, content_type,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM k GROUP BY source, content_type
    """


@register("content_type_profile", _content_type_sql())
def q_content_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source content-type mix (code / table / prose) by
    integer-exact surface rules: code when structural characters
    ({};=()[]) reach 2% of chars, table when pipe separators reach 5%
    of words, else prose. The routing decision upstream of tokenizer
    choice and mixing weights. One map-only projection + a tiny
    (source x 3)-row aggregation; the code/table wrappers are planted
    deterministically on fixed doc_id residues (see module comment) so
    all three classes exist on the synthetic corpus."""
    docs = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    t = (
        F.when(
            doc_id % CODE_WRAP_MOD == 0,
            F.concat(
                F.lit("def f_"),
                doc_id.cast("string"),
                F.lit("(x) {\n  return {\"k\": ["),
                F.col("text"),
                F.lit("]};\n}"),
            ),
        )
        .when(
            doc_id % TABLE_WRAP_MOD == 0,
            F.concat(
                F.lit("col_a | col_b | col_c\n"),
                F.regexp_replace(F.col("text"), " ", " | "),
            ),
        )
        .otherwise(F.col("text"))
    )
    c = docs.select(
        "doc_id",
        "source",
        F.length(t).alias("n_chars"),
        F.regexp_count(t, F.lit(r"[{};=()\[\]]")).alias("n_code"),
        F.regexp_count(t, F.lit(r"\|")).alias("n_pipe"),
        F.regexp_count(t, F.lit("[A-Za-z]+")).alias("n_words"),
    )
    ct = (
        F.when(50 * F.col("n_code") >= F.col("n_chars"), F.lit("code"))
        .when(20 * F.col("n_pipe") >= F.col("n_words"), F.lit("table"))
        .otherwise(F.lit("prose"))
    )
    return (
        c.select("source", ct.alias("content_type"), "n_chars")
        .groupBy("source", "content_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Character-entropy filter — the cheap "is this even language" screen
# (binary blobs, base64 runs, and aaaa-spam all have degenerate char
# distributions). Shannon entropy over the raw character histogram,
# with the float-summation hazard removed: each char's c*ln(c) term is
# quantized to integer nano-units BEFORE the sum, so the aggregation
# is exact integer arithmetic and both engines derive bit-identical
# entropy from identical counts.
# ---------------------------------------------------------------------------

ENTROPY_MIN_BITS = 2.0


@register(
    "char_entropy_filter",
    f"""
    WITH d AS (
      SELECT doc_id, text AS t, length(text) AS n FROM documents
    ),
    srt AS (
      SELECT doc_id, n,
             list_sort(list_transform(range(1, n + 1), i -> t[i:i])) AS se
      FROM d
    ),
    runs AS (
      SELECT doc_id, n,
             list_filter(range(1, n + 1),
               i -> CASE WHEN i = n THEN true ELSE se[i+1] <> se[i] END) AS ends
      FROM srt
    ),
    c AS (
      SELECT doc_id, n,
             coalesce(len(ends), 0) AS n_distinct_chars,
             coalesce(list_sum(list_transform(range(1, len(ends) + 1), j ->
               CAST(round(
                 (CASE WHEN j = 1 THEN ends[1]
                       ELSE ends[j] - ends[j-1] END)
                 * ln(CASE WHEN j = 1 THEN ends[1]
                           ELSE ends[j] - ends[j-1] END)
                 * 1000000000) AS BIGINT))), 0) AS s_nano
      FROM runs
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
           CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
           CASE WHEN n = 0 THEN 0.0
                ELSE round((ln(n) - (s_nano / 1000000000.0) / n) / ln(2), 6)
           END AS entropy_bits,
           CASE WHEN n = 0 THEN 0.0
                ELSE round((ln(n) - (s_nano / 1000000000.0) / n) / ln(2), 6)
           END >= {ENTROPY_MIN_BITS} AS entropy_ok
    FROM c
    """,
)
def q_char_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character entropy per doc (bits/char) with the
    low-entropy garbage flag (< 2.0 bits: repeated-char spam, base64
    runs, binary leakage). H = log2(n) - (1/n) * sum c*log2(c); the
    per-char c*ln(c) terms quantize to integer nano-units before
    summation, so the only float ops are on identical inputs in a
    fixed expression order — no accumulation-order parity surface.

    Plan: pure per-row HOF projection (distinct chars x count filter —
    O(len * alphabet) per doc with text alphabets ~60 symbols), zero
    shuffle. A pathological-alphabet corpus (CJK, binary) would flip
    to the explode + (doc_id, char) hash-agg shape; for the text
    corpora this screens, the map-only form wins."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n = F.length(t)
    cs = F.transform(F.sequence(F.lit(1), F.greatest(n, F.lit(1))), lambda i: F.substring(t, i, 1))
    cs = F.when(n > 0, cs).otherwise(F.array().cast("array<string>"))
    # counts via sort + run boundaries — O(n log n) per doc instead of
    # the O(n * alphabet) per-distinct-char filter scan. Each stage
    # binds to a COLUMN before the next references it (the shingles_of
    # discipline): an inline array_sort referenced inside a lambda's
    # element_at would re-sort per element access.
    s1 = docs.select("doc_id", n.cast("long").alias("n_chars"), F.array_sort(cs).alias("se"))
    nn = F.col("n_chars")
    se = F.col("se")
    ends = F.filter(
        F.sequence(F.lit(1), F.greatest(nn, F.lit(1)).cast("int")),
        lambda i: F.when(i == nn, F.lit(True)).otherwise(
            (i < nn)
            & (F.element_at(se, (i + 1).cast("int")) != F.element_at(se, i.cast("int")))
        ),
    )
    s2 = s1.select(
        "doc_id",
        "n_chars",
        F.when(nn > 0, ends).otherwise(F.array().cast("array<int>")).alias("ends"),
    )
    endc = F.col("ends")

    def run_len(j):
        return F.when(j == 1, F.element_at(endc, 1)).otherwise(
            F.element_at(endc, j.cast("int")) - F.element_at(endc, (j - 1).cast("int"))
        )

    term = lambda j: F.round(
        run_len(j).cast("double") * F.log(run_len(j).cast("double")) * 1000000000
    ).cast("long")
    s_nano = F.coalesce(
        F.aggregate(
            F.transform(F.sequence(F.lit(1), F.greatest(F.size(endc), F.lit(1))), term),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
        F.lit(0).cast("long"),
    )
    base = s2.select(
        "doc_id",
        "n_chars",
        F.size(endc).cast("long").alias("n_distinct_chars"),
        F.when(F.size(endc) > 0, s_nano).otherwise(F.lit(0).cast("long")).alias("s_nano"),
    )
    h = F.when(F.col("n_chars") == 0, F.lit(0.0)).otherwise(
        F.round(
            (
                F.log(F.col("n_chars").cast("double"))
                - (F.col("s_nano") / 1000000000.0) / F.col("n_chars")
            )
            / F.log(F.lit(2.0)),
            6,
        )
    )
    return base.select(
        "doc_id",
        "n_chars",
        "n_distinct_chars",
        h.alias("entropy_bits"),
        (h >= ENTROPY_MIN_BITS).alias("entropy_ok"),
    )


# ---------------------------------------------------------------------------
# Per-source redundancy report — the curation decision input that says
# WHICH sources are mirror-heavy: within-source exact-copy rate,
# cross-source exact-copy exposure, and near-dup drop rate per source.
# ---------------------------------------------------------------------------


def _dedup_rate_sql() -> str:
    return f"""
    WITH fp AS (SELECT doc_id, source, md5({_norm()}) AS f FROM documents),
    within AS (
      SELECT source, count(*) AS n_docs,
             count(*) - count(DISTINCT f) AS n_exact_within
      FROM fp GROUP BY source
    ),
    multi AS (
      SELECT f FROM fp GROUP BY f HAVING count(DISTINCT source) > 1
    ),
    cross_e AS (
      SELECT source, count(*) AS n_cross_exact
      FROM fp WHERE f IN (SELECT f FROM multi) GROUP BY source
    ),
    near AS (
      SELECT d.source, count(DISTINCT v.doc_b) AS n_near_drop
      FROM (SELECT DISTINCT doc_b FROM ({_lsh_verified_sql(0.5)})) v
      JOIN documents d ON d.doc_id = v.doc_b
      GROUP BY d.source
    )
    SELECT w.source,
           CAST(w.n_docs AS BIGINT) AS n_docs,
           CAST(w.n_exact_within AS BIGINT) AS n_exact_within,
           CAST(coalesce(c.n_cross_exact, 0) AS BIGINT) AS n_cross_exact,
           CAST(coalesce(n.n_near_drop, 0) AS BIGINT) AS n_near_drop,
           round(w.n_exact_within * 1.0 / w.n_docs, 6) AS exact_rate,
           round(coalesce(n.n_near_drop, 0) * 1.0 / w.n_docs, 6) AS near_rate
    FROM within w
    LEFT JOIN cross_e c ON c.source = w.source
    LEFT JOIN near n ON n.source = w.source
    """


@register("dedup_rate_report", _dedup_rate_sql())
def q_dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources are redundant: per source, the within-source
    exact-copy count (docs minus distinct fingerprints), the
    cross-source exact exposure (docs whose content also appears under
    another source — re-crawls and mirrors), and the near-dup drop
    count (sharp-banded verify chain, J >= 0.5). The rates are what a
    mixing/curation pass reads before deciding to down-weight or drop
    a source. Shapes: one fingerprint hash-agg, one multi-source
    fingerprint semi-join (the multi set is bounded by actual
    cross-source duplication), and the standing near-dup drop set
    joined back to sources — all source-grain outputs."""
    docs = load_table(spark, sf_dir, "documents")
    from .operators.text import normalize_text

    fp = docs.select("doc_id", "source", F.md5(normalize_text("text")).alias("f"))
    within = fp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct("f")).alias("n_exact_within"),
    )
    multi = (
        fp.groupBy("f")
        .agg(F.countDistinct("source").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("f")
    )
    cross_e = (
        fp.join(multi, "f", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_cross_exact"))
    )
    near = (
        D.lsh_verified_pairs(docs, threshold=0.5)
        .select("doc_b")
        .distinct()
        .join(docs.select(F.col("doc_id").alias("doc_b"), "source"), "doc_b")
        .groupBy("source")
        .agg(F.countDistinct("doc_b").alias("n_near_drop"))
    )
    return (
        within.join(cross_e, "source", "left")
        .join(near, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_exact_within").cast("long").alias("n_exact_within"),
            F.coalesce(F.col("n_cross_exact"), F.lit(0)).cast("long").alias("n_cross_exact"),
            F.coalesce(F.col("n_near_drop"), F.lit(0)).cast("long").alias("n_near_drop"),
            F.round(F.col("n_exact_within") / F.col("n_docs"), 6).alias("exact_rate"),
            F.round(
                F.coalesce(F.col("n_near_drop"), F.lit(0)) / F.col("n_docs"), 6
            ).alias("near_rate"),
        )
    )


BPE_MERGE_ROUNDS = 8

# One trained-BPE pass per (session, sf_dir, k, mode), shared by the
# three BPE entries (VERDICT r9 #4 — each used to re-run the full
# 8-round training, 3x ~2.5 s per sweep). Last-entry semantics like
# sources.parquet._REGISTERED: an sf_dir/session change retrains and
# releases the stale vocab. The cached value is (merges, vocab) with
# the vocab left PERSISTED for the session — vocabulary-grain, the
# tokenizer-training shrink, exactly the artifact a production
# pipeline trains once and reuses.
_BPE_TRAINED: dict[tuple, tuple] = {}


def _trained_bpe(spark, sf_dir: str, k: int, pre_tokenizer: str = "alpha"):
    from .operators.text import _bpe_train

    slot = (k, pre_tokenizer)
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _BPE_TRAINED.get(slot)
    if cached is not None and cached[0] == key:
        return cached[1]
    if cached is not None:
        try:
            cached[1][1].unpersist()
        except Exception:
            pass  # stale session's frame — nothing to release
    trained = _bpe_train(
        load_table(spark, sf_dir, "documents"), k, pre_tokenizer=pre_tokenizer
    )
    _BPE_TRAINED[slot] = (key, trained)
    return trained


def _bpe_rounds_ctes(
    k: int = BPE_MERGE_ROUNDS, mode: str = "alpha", train_where: str = "TRUE"
) -> str:
    """Chained-CTE twin of operators.text.bpe_merge_rounds (the
    kmeans_estep discipline): round r's best pair is a 1-row CTE and
    round r's vocabulary applies it with the same wrapped-symbol
    exact-string replace, so all k adopted merges are value-checked.
    `mode` mirrors the operator's pre_tokenizer: "alpha" wraps symbols
    in ()/(), "char" keeps the full codepoint stream and wraps in
    \\x01/\\x02 (stripped from the input as control chars — see
    operators.text._BPE_WRAP). `train_where` restricts the TRAINING
    population (the streaming fertility twin trains on the standing
    index only)."""
    if mode == "alpha":
        word_src = "unnest(regexp_extract_all(lower(text), '[a-z]+'))"
        w1, w2 = "(", ")"
        rx_strip, rx_split = r"^\(|\)$", r"\)\("
    else:
        word_src = (
            "unnest(list_filter(string_split("
            "regexp_replace(text, '[\\x00-\\x1f]', ' ', 'g'), ' '),"
            " x -> x <> ''))"
        )
        w1, w2 = "\x01", "\x02"
        # literal control chars — no regex metachars to escape
        rx_strip, rx_split = f"^{w1}|{w2}$", f"{w2}{w1}"
    pair_cte = lambda r: f"""
    p{r} AS (
      SELECT struct_extract(e, 'a') AS a, struct_extract(e, 'b') AS b,
             CAST(sum(freq) AS BIGINT) AS cnt
      FROM (
        SELECT freq, unnest(list_transform(range(1, len(syms)),
                 i -> {{'a': syms[i], 'b': syms[i+1]}})) AS e
        FROM (SELECT freq,
                     string_split_regex(
                       regexp_replace(seq, '{rx_strip}', '', 'g'),
                       '{rx_split}') AS syms
              FROM v{r - 1})
      ) GROUP BY 1, 2
    ),
    best{r} AS (
      SELECT a, b, cnt FROM p{r}
      ORDER BY cnt DESC, a, b LIMIT 1
    ),
    v{r} AS (
      SELECT v.w, replace(v.seq, '{w1}' || b.a || '{w2}{w1}' || b.b || '{w2}',
                     '{w1}' || b.a || b.b || '{w2}') AS seq, v.freq
      FROM v{r - 1} v CROSS JOIN best{r} b
    )"""
    rounds = ",".join(pair_cte(r) for r in range(1, k + 1))
    return f"""
    WITH wf AS (
      SELECT w, count(*) AS freq
      FROM (SELECT {word_src} AS w
            FROM documents WHERE {train_where})
      GROUP BY w
    ),
    v0 AS (
      SELECT w,
             '{w1}' || array_to_string(
               list_concat(
                 list_transform(range(1, length(w) + 1), i -> w[i:i]),
                 ['{BPE_EOW}']), '{w2}{w1}') || '{w2}' AS seq,
             freq
      FROM wf
    ),
    {rounds}
    """


def _bpe_rounds_sql(
    k: int = BPE_MERGE_ROUNDS, mode: str = "alpha", train_where: str = "TRUE"
) -> str:
    """CTE chain + the adopted-merge report SELECT. Twins that need a
    different final SELECT over the same training chain (encode,
    fertility, the streaming probe) compose on _bpe_rounds_ctes
    directly instead of substring surgery on this function's output
    (ADVICE r10: a future template edit adding another `SELECT * FROM`
    would have silently truncated a rindex-based splice)."""
    finals = "\n      UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, a AS left_sym,"
        f" b AS right_sym, cnt AS pair_count FROM best{r}"
        for r in range(1, k + 1)
    )
    return f"""{_bpe_rounds_ctes(k, mode, train_where)}
    SELECT * FROM ({finals}) ORDER BY merge_rank
    """


@register("bpe_merge_rounds", _bpe_rounds_sql())
def q_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-round iterative BPE merge loop (VERDICT r8 #6) —
    completes the tokenizer story bpe_merge_candidates (step 1 only)
    started: the adopted merge TABLE is what tokenizer_fertility and
    context_packing assume exists. See operators.text.bpe_merge_rounds
    for the vocabulary-grain scale shape and the wrapped-symbol
    replace convention shared with the oracle. Training is the shared
    `_trained_bpe` pass — one 8-round loop per (session, sf_dir)
    serves all three BPE entries."""
    return X.bpe_merge_rounds(
        load_table(spark, sf_dir, "documents"),
        k=BPE_MERGE_ROUNDS,
        trained=_trained_bpe(spark, sf_dir, BPE_MERGE_ROUNDS),
    )


@register("bpe_merge_rounds_char", _bpe_rounds_sql(mode="char"))
def q_bpe_merge_rounds_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge training over the FULL codepoint stream (VERDICT r9
    #5): pre-tokenization keeps case, digits, punctuation, and
    non-Latin text (control chars become separators — the standard
    tokenizer cleanup, and what frees \\x01/\\x02 to serve as the
    wrapped-symbol delimiters where the alpha mode used parens). The
    Sennrich/GPT-2 convention modulo bytes-vs-codepoints: symbols are
    codepoints, which Spark substring and DuckDB slicing index
    identically, keeping the oracle a full value twin. Same
    vocabulary-grain scale shape as `bpe_merge_rounds`."""
    return X.bpe_merge_rounds(
        load_table(spark, sf_dir, "documents"),
        k=BPE_MERGE_ROUNDS,
        trained=_trained_bpe(spark, sf_dir, BPE_MERGE_ROUNDS, "char"),
        pre_tokenizer="char",
    )


def _bpe_encode_sql(k: int = BPE_MERGE_ROUNDS, top: int = 30) -> str:
    """Encoded-vocabulary twin of _bpe_rounds_sql: same training CTE
    chain, but the final select reads the k-times-rewritten vocabulary
    v{k} instead of the adopted merges."""
    # the full training CTE chain up to (and including) the last vocab
    # CTE; the merge-report SELECT is replaced by the encode SELECT
    return f"""{_bpe_rounds_ctes(k)}
    SELECT w, CAST(freq AS BIGINT) AS freq,
           CAST(len(syms) AS BIGINT) AS n_tokens,
           array_to_string(syms, ' ') AS encoded
    FROM (
      SELECT w, freq,
             string_split_regex(
               regexp_replace(seq, '^\\(|\\)$', '', 'g'), '\\)\\(') AS syms
      FROM v{k})
    ORDER BY freq DESC, w LIMIT {top}
    """


@register("bpe_encode_vocab", _bpe_encode_sql())
def q_bpe_encode_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary encoded under the corpus's OWN learned BPE merges
    (k = 8 rounds): per top-frequency word, the actual token
    segmentation and token count the trained tokenizer would emit —
    the end of the tokenizer story (train: bpe_merge_rounds; apply:
    this; budget: tokenizer_fertility / context_packing). See
    operators.text.bpe_encode_vocab for the scale shape. Shares the
    `_trained_bpe` pass with the other BPE entries."""
    return X.bpe_encode_vocab(
        load_table(spark, sf_dir, "documents"),
        k=BPE_MERGE_ROUNDS,
        top=30,
        trained=_trained_bpe(spark, sf_dir, BPE_MERGE_ROUNDS),
    )


def _bpe_fertility_sql(k: int = BPE_MERGE_ROUNDS) -> str:
    """Per-source learned fertility: the training CTE chain, the
    vocabulary token counts from v{k}, and a words->vocab join back
    onto the corpus."""
    return f"""{_bpe_rounds_ctes(k)}
    , vt AS (
      SELECT w, CAST(len(string_split_regex(
               regexp_replace(seq, '^\\(|\\)$', '', 'g'), '\\)\\('))
             AS BIGINT) AS w_tokens
      FROM v{k}
    ),
    cw AS (
      SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(w_tokens) AS BIGINT) AS n_tokens,
           round(sum(w_tokens) * 1.0 / count(*), 6) AS learned_fertility
    FROM cw JOIN vt USING (w)
    GROUP BY source
    """


@register("bpe_corpus_fertility", _bpe_fertility_sql())
def q_bpe_corpus_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token budget under the corpus's OWN learned BPE
    tokenizer (k = 8 merges) — the exact number `tokenizer_fertility`
    estimates with a fixed segmentation regex. The (word -> n_tokens)
    vocabulary map is broadcast back onto the corpus words (size-
    guarded — above ~1e7 keys it degrades to a shuffle join); see
    operators.text.bpe_corpus_fertility for the scale shape. Shares
    the `_trained_bpe` pass with the other BPE entries."""
    return X.bpe_corpus_fertility(
        load_table(spark, sf_dir, "documents"),
        k=BPE_MERGE_ROUNDS,
        trained=_trained_bpe(spark, sf_dir, BPE_MERGE_ROUNDS),
    )


def _incremental_containment_sql(
    new_max_id: int = _INCR_NEW_MAX_ID,
    threshold: float = 0.8,
    cap: int | None = D.DEFAULT_MAX_SHINGLE_DF,
    m_probes: int = 8,
    min_hits: int = 2,
) -> str:
    """Twin of operators.dedup.incremental_containment: both directed
    probe passes, the min_hits floor (capped at the prober's probe
    count), exact-intersection verify scoring both containments."""
    b = new_max_id
    return f"""
    WITH {_shingle_cte(cap)},
    probes AS (
      SELECT doc_id, shingle_hash,
             count(*) OVER (PARTITION BY doc_id) AS n_probes
      FROM (
        SELECT doc_id, shingle_hash,
               row_number() OVER (PARTITION BY doc_id ORDER BY shingle_hash)
                 AS rk
        FROM sh)
      WHERE rk <= {m_probes}
    ),
    dir_a AS (
      SELECT p.doc_id AS new_doc, s.doc_id AS other_doc,
             count(*) AS hits, max(p.n_probes) AS np
      FROM probes p JOIN sh s USING (shingle_hash)
      WHERE p.doc_id < {b} AND s.doc_id <> p.doc_id
        AND (s.doc_id >= {b} OR s.doc_id < p.doc_id)
      GROUP BY 1, 2
    ),
    dir_b AS (
      SELECT s.doc_id AS new_doc, p.doc_id AS other_doc,
             count(*) AS hits, max(p.n_probes) AS np
      FROM probes p JOIN sh s USING (shingle_hash)
      WHERE s.doc_id < {b} AND p.doc_id <> s.doc_id
        AND (p.doc_id >= {b} OR p.doc_id < s.doc_id)
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT new_doc, other_doc FROM (
        SELECT new_doc, other_doc FROM dir_a
        WHERE hits >= least({min_hits}, np)
        UNION ALL
        SELECT new_doc, other_doc FROM dir_b
        WHERE hits >= least({min_hits}, np))
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT c.new_doc, c.other_doc, count(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.new_doc
      JOIN sh bb ON bb.doc_id = c.other_doc
               AND bb.shingle_hash = a.shingle_hash
      GROUP BY 1, 2
    )
    SELECT new_doc, other_doc, CAST(n_common AS BIGINT) AS n_common,
           round(n_common * 1.0 / sa.n, 6) AS containment_new,
           round(n_common * 1.0 / sb.n, 6) AS containment_other,
           other_doc >= {b} AS in_index
    FROM inter
    JOIN sizes sa ON new_doc = sa.doc_id
    JOIN sizes sb ON other_doc = sb.doc_id
    WHERE greatest(round(n_common * 1.0 / sa.n, 6),
                   round(n_common * 1.0 / sb.n, 6)) >= {threshold}
    """


@register("incremental_containment", _incremental_containment_sql())
def q_incremental_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup of a new batch against the standing corpus —
    the production lifecycle twin of containment_pairs (as
    incremental_near_dups is of lsh_verified_pairs): batch probe
    shingles broadcast against the streaming corpus, the corpus's
    stored probe table streams against the broadcast batch shingles —
    the index is never shuffled or self-probed. See the operator
    docstring for the recall law and both directed passes."""
    return D.incremental_containment(
        load_table(spark, sf_dir, "documents"),
        new_max_id=_INCR_NEW_MAX_ID,
        threshold=0.8,
    )


_VOCAB_BRACKETS = (1000, 2000, 4000, 8000, 16000)


def _vocab_curve_sql() -> str:
    brackets = ", ".join(str(k) for k in _VOCAB_BRACKETS)
    return f"""
    WITH wf AS (
      SELECT w, count(*) AS freq
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
            FROM documents)
      GROUP BY w
    ),
    r AS (
      SELECT freq, row_number() OVER (ORDER BY freq DESC, w) AS rk FROM wf
    ),
    tot AS (SELECT sum(freq) AS nt, count(*) AS nv FROM wf)
    SELECT k AS vocab_size,
           CAST(least(k, t.nv) AS BIGINT) AS distinct_words,
           CAST(coalesce(sum(r.freq) FILTER (r.rk <= k), 0) AS BIGINT)
             AS tokens_covered,
           round(coalesce(sum(r.freq) FILTER (r.rk <= k), 0) * 1.0 / t.nt, 6)
             AS coverage,
           round(1.0 - coalesce(sum(r.freq) FILTER (r.rk <= k), 0) * 1.0 / t.nt,
                 6) AS oov_rate
    FROM (SELECT unnest([{brackets}]) AS k), r, tot t
    GROUP BY k, t.nv, t.nt
    ORDER BY k
    """


@register("vocab_size_curve", _vocab_curve_sql())
def q_vocab_size_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token coverage as a function of the vocabulary-size cap —
    the curve that picks a tokenizer's vocab size: for each bracket k,
    the share of corpus word occurrences the k most frequent words
    cover and the OOV rate a closed vocab of that size would pay
    (byte-fallback volume for a real tokenizer). Ranking ties break on
    the word itself, so the curve is deterministic on any engine.

    Scale shape: the corpus collapses to its vocabulary in one
    hash-agg (map-side partials); the rank window is bounded BEFORE it
    runs by TakeOrderedAndProject to the largest bracket (top-16k by
    (freq desc, w)) — the global sort the window implies never touches
    more than max-bracket rows, the classic top-k-then-rank fix for
    single-partition window skew. Totals are a 1-row broadcast; the
    bracket fan-out is a 5-row crossJoin at vocabulary grain."""
    from pyspark.sql.window import Window

    max_k = max(_VOCAB_BRACKETS)
    # persisted: the totals branch and the top-k branch would otherwise
    # each re-aggregate the corpus scan; at vocabulary grain the cache
    # is the tokenizer-training shrink (bench clears it between entries)
    wf = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(X._bpe_words("text", "alpha")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    ).persist()
    tot = wf.agg(
        F.sum("freq").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    )
    top = wf.orderBy(F.desc("freq"), "w").limit(max_k)
    rk = F.row_number().over(Window.orderBy(F.desc("freq"), "w"))
    ranked = top.select("freq", rk.alias("rk"))
    ks = spark.createDataFrame(
        [(k,) for k in _VOCAB_BRACKETS], "vocab_size int"
    )
    covered = (
        ranked.crossJoin(F.broadcast(ks))
        .filter(F.col("rk") <= F.col("vocab_size"))
        .groupBy("vocab_size")
        .agg(F.sum("freq").cast("long").alias("tokens_covered"))
    )
    return (
        ks.join(covered, "vocab_size", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "vocab_size",
            F.least(F.col("vocab_size").cast("long"), F.col("nv")).alias(
                "distinct_words"
            ),
            F.coalesce(F.col("tokens_covered"), F.lit(0)).alias("tokens_covered"),
            F.round(
                F.coalesce(F.col("tokens_covered"), F.lit(0)) / F.col("nt"), 6
            ).alias("coverage"),
            F.round(
                1.0 - F.coalesce(F.col("tokens_covered"), F.lit(0)) / F.col("nt"),
                6,
            ).alias("oov_rate"),
        )
        .orderBy("vocab_size")
    )


# (label, num_hashes, band_size) — the three shipped banding presets:
# legacy 16/2 (recall-first), sharp 64/4 (the library default since
# r8), high-recall 128/4.
_S_CURVE_PRESETS = (
    ("legacy_16_2", 16, 2),
    ("sharp_64_4", 64, 4),
    ("high_128_4", 128, 4),
)


def _sq_chain_sql(expr: str, squarings: int) -> str:
    """expr^(2^squarings) as explicit repeated squaring — deterministic
    IEEE multiplications, no pow() libm surface."""
    for _ in range(squarings):
        expr = f"(({expr}) * ({expr}))"
    return expr


def _s_curve_sql() -> str:
    theory = {}
    for label, h, r in _S_CURVE_PRESETS:
        b = h // r
        jr = _sq_chain_sql("j", {2: 1, 4: 2}[r])
        qb = _sq_chain_sql(f"(1.0 - {jr})", {8: 3, 16: 4, 32: 5}[b])
        theory[label] = f"round(1.0 - {qb}, 6)"
    legs = "\n      UNION ALL ".join(
        f"""SELECT '{label}' AS preset, e.j_bucket,
               count(*) AS n_pairs,
               count(c.doc_a) AS n_captured,
               sum(CAST({theory[label]} AS DECIMAL(18,6))) AS tsum
        FROM (SELECT doc_a, doc_b, jaccard AS j,
                     CAST(least(floor(jaccard * 10), 9) AS INT) AS j_bucket
              FROM exact) e
        LEFT JOIN ({_lsh_sql(h, r)}) c USING (doc_a, doc_b)
        GROUP BY 1, 2"""
        for label, h, r in _S_CURVE_PRESETS
    )
    return f"""
    WITH {_shingle_cte(D.DEFAULT_MAX_SHINGLE_DF)},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b
        ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    exact AS (
      SELECT doc_a, doc_b,
             round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
      FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) >= 0.1)
    SELECT preset, j_bucket, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(n_captured AS BIGINT) AS n_captured,
           round(n_captured * 1.0 / n_pairs, 6) AS capture_rate,
           round(CAST(tsum AS DOUBLE) / n_pairs, 6) AS theory_capture
    FROM ({legs})
    ORDER BY preset, j_bucket
    """


@register("lsh_s_curve_full", _s_curve_sql(), diagnostic=True)
def q_lsh_s_curve_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-CORPUS diagnostic twin of `lsh_s_curve` (opt-in via
    SPARK_GRAFT_FULL_EVALS=1 — VERDICT r10 #1 demoted it from the
    gated default: the exact ground-truth leg measured 9.2x wall at
    the 3.33x sf3->sf10 decade because true-pair volume grows with
    duplicate density squared; the hash-sliced default measured 2.10x
    on the same decade with the same estimate power).

    The banding S-curve MEASURED, not assumed: for each shipped
    banding preset (legacy 16/2, sharp 64/4 default, high-recall
    128/4), the fraction of TRUE near-dup pairs (exact shingle Jaccard
    >= 0.1) captured as LSH candidates, per Jaccard decile, next to
    the theoretical capture probability 1-(1-J^r)^b averaged over the
    same pairs — the empirical eval behind the r8 sharp-banding recall
    tradeoff (recall at the J=0.5 midpoint drops ~0.90 -> ~0.64 for
    far fewer false candidates; this entry puts the whole curve on the
    record for the corpus at hand).

    Cross-engine float discipline: J arrives 6dp-rounded; J^r and
    (1-J^r)^b are explicit repeated-squaring chains (deterministic
    IEEE multiplications — no pow() libm surface), per-pair theory is
    rounded then DECIMAL-summed per bucket.

    Scale shape: ONE normalize+shingle pass feeds the exact-Jaccard
    ground truth AND all three banded signature pipelines (shared
    `words`); each preset's capture check is a LEFT join of its
    banded-bucket candidate pairs onto the exact pairs (both sides
    (doc_a, doc_b)-keyed). The ground truth runs over the df-CAPPED
    shingle table — the library's standard near-dup semantics
    (lsh_verified_pairs verifies over the same capped table), and the
    scale bound: uncapped, the stop-shingle self-join measured 8.4x at
    the 3.33x sf3->sf10 decade; capped it is n*df-bounded. At 100 TB
    the ground-truth leg additionally runs on a hash slice — the
    registered `lsh_s_curve` default IS that posture; the banding
    pipelines stay linear."""
    return _s_curve_df(load_table(spark, sf_dir, "documents"))


def _s_curve_df(docs: DataFrame) -> DataFrame:
    # words/exact are TRACKED persists (caching.py): they stay warm
    # across a harness's repeated calls (bench median-of-3 measures
    # steady state again — VERDICT r12 #1) and are released by the
    # harness via release_tracked() / clearCache after the entry, not
    # in-line here. The bounded result (presets x 10 buckets) is still
    # materialized and returned as a local frame.
    out, words, exact = _s_curve_plan(docs)
    rows = out.collect()  # bounded: |presets| x 10 buckets
    return docs.sparkSession.createDataFrame(rows, out.schema)


def _s_curve_plan(docs: DataFrame):
    """The LAZY curve frame plus its persisted intermediates (words,
    exact) — split out so the plan pins can explain() the distributed
    plan (the entry returns a materialized local frame); the persists
    are tracked (caching.py) and released by the harness."""
    from .caching import tracked_persist

    words = tracked_persist(D._words_df(docs))
    exact = (
        D.ngram_jaccard_pairs(
            docs,
            threshold=0.1,
            max_shingle_df=D.DEFAULT_MAX_SHINGLE_DF,
            words=words,
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("jaccard").alias("j"),
            F.least(F.floor(F.col("jaccard") * 10), F.lit(9))
            .cast("int")
            .alias("j_bucket"),
        )
    )
    exact = tracked_persist(exact)

    def sq_chain(col, squarings):
        for _ in range(squarings):
            col = col * col
        return col

    # ONE signature fold at the widest preset, shared by all legs
    # (VERDICT r13 #7): _hash_params is index-derived, so the first k
    # elements of the 128-hash signature ARE the k-hash signature
    # (prefix property, pinned in tests/test_semantics.py) — each
    # preset's banding is a projection over this table instead of its
    # own shingle-stream re-fold, which the r14 profile measured as
    # the entry's dominant cost (3 folds of 16+64+128 hashes vs one
    # of 128).
    max_h = max(h for _, h, _ in _S_CURVE_PRESETS)
    sig = tracked_persist(D._minhash_sig_arr(words, 3, max_h))

    out = None
    for label, h, r in _S_CURVE_PRESETS:
        b = h // r
        jr = sq_chain(F.col("j"), {2: 1, 4: 2}[r])
        qb = sq_chain(F.lit(1.0) - jr, {8: 3, 16: 4, 32: 5}[b])
        theory = F.round(F.lit(1.0) - qb, 6)
        cand = D.minhash_lsh_candidates(
            docs, num_hashes=h, band_size=r, sig=sig
        ).withColumn("hit", F.lit(1))
        leg = (
            exact.join(cand, ["doc_a", "doc_b"], "left")
            .groupBy("j_bucket")
            .agg(
                F.lit(label).alias("preset"),
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.count("hit").cast("long").alias("n_captured"),
                F.sum(theory.cast("decimal(18,6)")).alias("tsum"),
            )
        )
        out = leg if out is None else out.unionByName(leg)
    out = out.select(
        "preset",
        "j_bucket",
        "n_pairs",
        "n_captured",
        F.round(F.col("n_captured") / F.col("n_pairs"), 6).alias("capture_rate"),
        F.round(F.col("tsum").cast("double") / F.col("n_pairs"), 6).alias(
            "theory_capture"
        ),
    ).orderBy("preset", "j_bucket")
    return out, words, exact


def _s_curve_sampled_sql(permille: int = 250) -> str:
    pred = (
        "(('0x' || substr(md5('scurve:' || CAST(doc_id AS VARCHAR)), 1, 15))"
        f"::BIGINT % 1000) < {permille}"
    )
    return _s_curve_sql().replace(
        "FROM documents", f"FROM (SELECT * FROM documents WHERE {pred})"
    )


@register("lsh_s_curve", _s_curve_sampled_sql())
def q_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banding S-curve eval in its SCALE posture — the gated
    registry default since r11 (VERDICT r10 #1; the full-corpus twin
    is the opt-in `lsh_s_curve_full` diagnostic): the three-preset
    banding S-curve measured on a deterministic ~25% md5 hash slice
    of the corpus — membership is a pure function of doc_id, so the
    slice reproduces on any engine/cluster/run. The
    full eval's exact-Jaccard ground truth grows with true-pair
    density (measured 11.35x pairs for 3.33x data on replicated scale
    corpora); slicing docs at rate s cuts the within-group pair volume
    by ~s^2 (both endpoints must survive) while the capture-RATE
    estimate — a ratio per (preset, bucket) — keeps its power. Every
    leg (exact pairs AND all three banding pipelines) sees the SAME
    slice, so rates are unbiased for the sliced population."""
    from .registry_sampling import _hash_bucket

    docs = load_table(spark, sf_dir, "documents").filter(
        _hash_bucket(F.col("doc_id"), "scurve:") < 250
    )
    return _s_curve_df(docs)


@register(
    "dedup_cluster_profile",
    f"""
    WITH c AS (SELECT * FROM ({_near_dup_clusters_sql(0.5)})),
    g AS (SELECT cluster_id, count(*) AS sz FROM c GROUP BY 1),
    t AS (SELECT count(*) AS n_docs FROM c)
    SELECT g.sz AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(count(*) * g.sz AS BIGINT) AS n_docs,
           CAST(count(*) * (g.sz - 1) AS BIGINT) AS n_droppable,
           round(count(*) * g.sz * 1.0 / t.n_docs, 6) AS corpus_share
    FROM g, t
    GROUP BY g.sz, t.n_docs
    ORDER BY cluster_size
    """,
)
def q_dedup_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The duplicate-cluster SIZE PROFILE — the one-page report a dedup
    run publishes: for each connected-component size over the
    LSH-verified near-dup graph, how many clusters exist, how many
    docs they hold, how many are droppable under keep-one-per-cluster,
    and the corpus share. Size-1 rows are the unduplicated mass;
    a heavy tail here (one giant component) is the classic sign of a
    boilerplate shingle or a threshold set too low — the check that
    catches over-merging BEFORE a dedup pass deletes half the corpus.

    Scale shape: reuses near_dup_clusters' converged component labels
    (alternating-star components, LSH-banded edges only), then two
    tiny aggregations — component grain, then size grain. The report
    adds nothing quadratic to the clustering it profiles."""
    c = D.near_dup_clusters(load_table(spark, sf_dir, "documents"), threshold=0.5)
    g = c.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    t = c.agg(F.count(F.lit(1)).cast("long").alias("n_docs_total"))
    return (
        g.groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .crossJoin(F.broadcast(t))
        .select(
            F.col("sz").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            (F.col("n_clusters") * F.col("sz")).cast("long").alias("n_docs"),
            (F.col("n_clusters") * (F.col("sz") - 1))
            .cast("long")
            .alias("n_droppable"),
            F.round(
                F.col("n_clusters") * F.col("sz") / F.col("n_docs_total"), 6
            ).alias("corpus_share"),
        )
        .orderBy("cluster_size")
    )
