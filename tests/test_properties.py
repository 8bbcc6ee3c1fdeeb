"""Property-based differential tests (hypothesis): random inputs, the
Spark operator vs an independent pure-Python reference. These cover the
input space the crafted golden tests can't enumerate — money rounding
near half-way decimals, arbitrary gap layouts for sessionization,
duplicate injection under id permutation."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# money values as exact 2dp decimals in [0.01, 99999.99], discounts 0-10%
_price = st.integers(min_value=1, max_value=9_999_999).map(lambda c: c / 100.0)
_disc = st.integers(min_value=0, max_value=10).map(lambda d: d / 100.0)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(_price, _disc), min_size=1, max_size=40))
def test_exact_cents_revenue_matches_decimal_reference(spark, rows):
    """The TPC-H exact-integer money path must equal Decimal arithmetic:
    sum(round(p*100) * (100 - round(d*100))) over doubles that ARE 2dp
    decimals — including the .xx5 half-way values that break float
    rounding — reproduces the exact cents x basis-points integer."""
    expected = sum(
        int(Decimal(str(p)) * 100) * (100 - int(Decimal(str(d)) * 100))
        for p, d in rows
    )
    df = spark.createDataFrame(rows, "l_extendedprice double, l_discount double")
    got = df.agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
        ).alias("units")
    ).collect()[0]["units"]
    assert got == expected


def _sessionize_reference(ts_list, gap_s=1800):
    """Pure-Python 30-min-gap sessionizer: [(session_id, n, start, end)]."""
    out = []
    sid, n, start, last = 0, 0, None, None
    for t in sorted(ts_list):
        if last is None or (t - last).total_seconds() > gap_s:
            if last is not None:
                out.append((sid, n, start, last))
            sid += 1
            n, start = 1, t
        else:
            n += 1
        last = t
    if last is not None:
        out.append((sid, n, start, last))
    return out


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=7 * 86400),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_sessionize_matches_python_reference(spark, offsets):
    """Window-based sessionization vs an independent sequential
    reference over arbitrary (unique) timestamp layouts."""
    from milan_telecom_etl__spark.registry_analytics import q_sessionize  # noqa: F401
    from pyspark.sql.window import Window

    base = dt.datetime(2024, 1, 1)
    ts = [base + dt.timedelta(seconds=o) for o in offsets]
    df = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate(ts)], "user_id long, event_id long, ts timestamp"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    ws = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    got = sorted(
        (r["session_id"], r["n"], r["s"], r["e"])
        for r in df.withColumn(
            "new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        .withColumn("session_id", F.sum("new_s").over(ws).cast("long"))
        .groupBy("session_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("ts").alias("s"), F.max("ts").alias("e"))
        .collect()
    )
    assert got == _sessionize_reference(ts)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.text(alphabet="abcd ", min_size=1, max_size=30), min_size=1, max_size=20),
    st.permutations(range(40)),
)
def test_exact_dedup_invariant_under_id_permutation(spark, texts, perm):
    """dedupe_exact keeps exactly one doc per normalized content, and
    the keeper is always the minimum doc_id — regardless of how ids are
    assigned or how many duplicates are injected."""
    from milan_telecom_etl__spark.operators.dedup import dedupe_exact
    from milan_telecom_etl__spark.operators.text import normalize_text

    # duplicate every text 1-2x with permuted ids
    docs = []
    ids = iter(perm)
    for t in texts:
        docs.append((next(ids), t))
        docs.append((next(ids), " " + t.upper()))  # normalized dup
    df = spark.createDataFrame(docs, "doc_id long, text string")
    norm = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", normalize_text("text").alias("n")).collect()
    }
    expected = sorted(
        min(i for i, _ in docs if norm[i] == key)
        for key in {norm[i] for i, _ in docs}
    )
    kept = sorted(r["doc_id"] for r in dedupe_exact(df).collect())
    assert kept == expected


def _auc_reference(pairs):
    """Tie-aware Mann-Whitney AUC over (score, label) pairs."""
    from collections import Counter

    by_score = sorted(Counter(s for s, _ in pairs).items())
    ranks = {}
    below = 0
    for s, n in by_score:
        ranks[s] = below + (n + 1) / 2.0
        below += n
    np_ = sum(1 for _, y in pairs if y)
    nn = len(pairs) - np_
    if np_ == 0 or nn == 0:
        return None
    rank_sum = sum(ranks[s] for s, y in pairs if y)
    return (rank_sum - np_ * (np_ + 1) / 2.0) / (np_ * nn)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=20), st.booleans()),
        min_size=2,
        max_size=60,
    ).filter(lambda xs: 0 < sum(y for _, y in xs) < len(xs))
)
def test_auc_rank_math_matches_reference(spark, pairs):
    """The integer rank formula (2*avg_rank is integral) must equal the
    float tie-aware reference on arbitrary tie layouts."""
    df = spark.createDataFrame(
        [(float(s), 1 if y else 0) for s, y in pairs], "score double, pos int"
    )
    g = df.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("n_pos")
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    r = g.select(
        "n",
        "n_pos",
        (2 * (F.sum("n").over(w) - F.col("n")) + F.col("n") + 1).alias("tar"),
    )
    u = r.agg(
        F.sum("n_pos").alias("np"),
        F.sum(F.col("n") - F.col("n_pos")).alias("nn"),
        F.sum(F.col("n_pos") * F.col("tar")).alias("s2"),
    ).first()
    got = (u["s2"] - u["np"] * (u["np"] + 1.0)) / (2.0 * u["np"] * u["nn"])
    want = _auc_reference([(float(s), y) for s, y in pairs])
    assert abs(got - want) < 1e-12


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=80))
def test_countmin_overestimates_every_key(spark, keys):
    """CMS property on arbitrary key multisets: min-over-d estimates
    are >= exact counts for EVERY key (not just the probed top-k)."""
    from collections import Counter

    from milan_telecom_etl__spark.registry_quality import _CM_D, _cm_bucket

    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    js = F.array([F.lit(j) for j in range(_CM_D)])
    fan = df.select("user_id", F.explode(js).alias("j"))
    sketch = (
        fan.withColumn("bucket", _cm_bucket(F.col("user_id"), F.col("j")))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        df.distinct()
        .select("user_id", F.explode(js).alias("j"))
        .withColumn("bucket", _cm_bucket(F.col("user_id"), F.col("j")))
    )
    est = {
        r["user_id"]: r["est"]
        for r in sketch.join(probes, ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est"))
        .collect()
    }
    exact = Counter(keys)
    for k, n in exact.items():
        assert est[k] >= n


def _span_reference(texts, k=8):
    """Pure-Python exact-substring reference: per doc_id, the set of
    duplicated window-start positions (1-based) — a window is duplicated
    iff its k-token gram occurs >= 2 times corpus-wide."""
    from collections import Counter

    toks = {i: t.split() for i, t in enumerate(texts)}
    grams: Counter = Counter()
    pos: dict[int, list[tuple[int, str]]] = {}
    for d, ws in toks.items():
        pos[d] = []
        for i in range(len(ws) - k + 1):
            g = " ".join(ws[i : i + k])
            grams[g] += 1
            pos[d].append((i + 1, g))
    return {
        d: {i for i, g in ps if grams[g] >= 2} for d, ps in pos.items()
    }, {d: len(ps) for d, ps in pos.items()}


_word = st.sampled_from(["aa", "bb", "cc", "dd"])
_doc = st.lists(_word, min_size=0, max_size=24).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_duplicate_spans_matches_python_reference(spark, texts):
    """Differential: duplicate_span_stats against an independent
    pure-Python k-gram counter over random tiny-vocab corpora (tiny
    vocab maximizes collisions — within-doc repeats, cross-doc repeats,
    sub-window overlaps all occur)."""
    from milan_telecom_etl__spark.operators.dedup import duplicate_span_stats

    dup_ref, n_ref = _span_reference(texts, k=8)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_positions"])
        for r in duplicate_span_stats(docs, k=8).collect()
    }
    want = {
        d: (n_ref[d], len(dup_ref[d])) for d in n_ref if n_ref[d] > 0
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_span_islands_match_python_interval_merge(spark, texts):
    """Differential: duplicate_span_islands against a pure-Python
    interval merge of the reference's duplicated positions."""
    from milan_telecom_etl__spark.operators.dedup import duplicate_span_islands

    k = 8
    dup_ref, _ = _span_reference(texts, k=k)
    want = set()
    for d, positions in dup_ref.items():
        run: list[int] = []
        for i in sorted(positions):
            if run and i - run[-1] > k:
                want.add((d, run[0], run[-1] + k - 1))
                run = []
            run.append(i)
        if run:
            want.add((d, run[0], run[-1] + k - 1))
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_span_islands(docs, k=k).collect()
    }
    assert got == want


# random "documents": small vocab so duplicates and near-duplicates
# arise naturally; doc_ids straddle the batch boundary (new < 3)
_doc_text = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]),
    min_size=5,
    max_size=12,
).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(_doc_text, min_size=4, max_size=10))
def test_incremental_dedup_equals_full_dedup_restricted(spark, texts):
    """Differential: the incremental probe must emit EXACTLY the
    full-corpus verified pairs that involve a batch doc — (new, index)
    pairs always, within-batch pairs once in keep-first orientation —
    with identical jaccard values. The batch boundary is doc_id < 3."""
    from milan_telecom_etl__spark.operators.dedup import (
        incremental_near_dups,
        lsh_verified_pairs,
    )

    new_max = 3
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in lsh_verified_pairs(docs, max_shingle_df=None).collect()
    }
    # expected probe rows derived from the full pair set
    expected = {}
    for (a, b), j in full.items():  # a < b by construction
        if b < new_max:
            expected[(b, a)] = j  # within-batch, keep-first
        elif a < new_max:
            expected[(a, b)] = j  # new vs index
    got = {
        (r["new_doc"], r["dup_of"]): r["jaccard"]
        for r in incremental_near_dups(
            docs, new_max_id=new_max, max_shingle_df=None
        ).collect()
    }
    assert got == expected


_word = st.sampled_from(["alpha", "beta", "gamma", "spam", "x1", "lo", "a"])


def _write_docs(spark, tmp_path, texts):
    import os

    rows = [(i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(_word, min_size=1, max_size=120), min_size=1, max_size=6))
def test_t5_span_corruption_reconstructs_any_corpus(spark, tmp_path_factory, docs):
    """For ARBITRARY word streams, splicing each target span over its
    sentinel in the input reconstructs the original text exactly, and
    the span budget matches the n_spans formula."""
    import re

    from milan_telecom_etl__spark import registry_text  # noqa: F401
    from milan_telecom_etl__spark.queries_registry import QUERIES

    texts = [" ".join(ws) for ws in docs]
    d = _write_docs(spark, tmp_path_factory.mktemp("t5"), texts)
    for r in QUERIES["t5_span_corruption"](spark, d).collect():
        orig = texts[r["doc_id"]]
        nw = len(orig.split(" "))
        exp_spans = max(1, min(nw // 20, nw // 3)) if nw >= 3 else 0
        assert r["n_spans"] == exp_spans
        if r["n_spans"] == 0:
            assert r["input_text"] == orig and r["target_text"] == ""
            continue
        parts = re.split(r"<extra_id_(\d+)>", r["target_text"])
        spans = {int(k): c.strip() for k, c in zip(parts[1::2], parts[2::2])}
        rebuilt = re.sub(
            r"<extra_id_(\d+)>", lambda m: spans[int(m.group(1))], r["input_text"]
        )
        assert rebuilt == orig


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(_word, min_size=1, max_size=30), min_size=1, max_size=5))
def test_bpe_pair_counts_match_python_reference(spark, tmp_path_factory, docs):
    """Every returned pair count equals an independent Python recount
    (adjacent chars + </w>, weighted by corpus word frequency), and
    rank 1 carries the global maximum."""
    from collections import Counter

    from milan_telecom_etl__spark import registry_text  # noqa: F401
    from milan_telecom_etl__spark.queries_registry import QUERIES

    import re

    texts = [" ".join(ws) for ws in docs]
    d = _write_docs(spark, tmp_path_factory.mktemp("bpe"), texts)
    ref: Counter = Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            syms = list(w) + ["</w>"]
            for a, b in zip(syms, syms[1:]):
                ref[(a, b)] += 1
    got = QUERIES["bpe_merge_candidates"](spark, d).collect()
    assert got
    for r in got:
        assert ref[(r["left_sym"], r["right_sym"])] == r["pair_count"]
    assert max(r["pair_count"] for r in got) == max(ref.values())


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(_word, min_size=1, max_size=60), min_size=1, max_size=4))
def test_gopher_dup_line_stats_match_python_reference(spark, tmp_path_factory, docs):
    """The shuffle-free duplicate-line folds equal an independent
    Python replication of the synth_lines contract (12-word chunks,
    (doc_id+i)%3 punctuation, chrome + lorem-on-%7)."""
    from milan_telecom_etl__spark import registry_quality  # noqa: F401
    from milan_telecom_etl__spark.operators.text import (
        FOOTER_LINE,
        JS_LINE,
        LINE_CHUNK_WORDS,
        LOREM_LINE,
        NAV_LINE,
    )
    from milan_telecom_etl__spark.queries_registry import QUERIES

    texts = [" ".join(ws) for ws in docs]
    d = _write_docs(spark, tmp_path_factory.mktemp("rep"), texts)

    def synth(doc_id, text):
        ws = text.split(" ")
        lines = [NAV_LINE, JS_LINE]
        n_chunks = (len(ws) + LINE_CHUNK_WORDS - 1) // LINE_CHUNK_WORDS
        for i in range(n_chunks):
            chunk = " ".join(ws[i * LINE_CHUNK_WORDS:(i + 1) * LINE_CHUNK_WORDS])
            lines.append(chunk + ("" if (doc_id + i) % 3 == 0 else "."))
        if doc_id % 7 == 0:
            lines.append(LOREM_LINE)
        lines.append(FOOTER_LINE)
        return lines

    for r in QUERIES["gopher_repetition_flags"](spark, d).collect():
        lines = synth(r["doc_id"], texts[r["doc_id"]])
        distinct = list(dict.fromkeys(lines))
        assert r["n_lines"] == len(lines)
        assert r["n_dup_lines"] == len(lines) - len(distinct)
        assert r["line_chars"] == sum(len(l) for l in lines)
        assert r["dup_line_chars"] == (
            sum(len(l) for l in lines) - sum(len(l) for l in distinct)
        )
