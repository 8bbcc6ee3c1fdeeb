"""The standing-artifact warehouse (artifacts.py): build-once
semantics, fingerprint-keyed staleness, and serving/train twin
equality for the two artifact-backed streaming entries."""

import os
import time

import pyspark.sql.functions as F
import pytest

from milan_telecom_etl__spark.artifacts import (
    artifact_path,
    corpus_fingerprint,
    load_or_build,
)


def _write_corpus(spark, path: str, n: int) -> None:
    (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(path, "documents.parquet"))
    )


def test_load_or_build_builds_exactly_once(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path / "wh"))
    sf = str(tmp_path / "sf")
    _write_corpus(spark, sf, 10)
    calls = []

    def build():
        calls.append(1)
        return spark.range(3).select(F.col("id").alias("v"))

    a = load_or_build(spark, sf, "toy", build).collect()
    b = load_or_build(spark, sf, "toy", build).collect()
    assert len(calls) == 1, "second invocation must serve the warehouse parquet"
    assert sorted(r["v"] for r in a) == sorted(r["v"] for r in b) == [0, 1, 2]


def test_corpus_change_rekeys_artifact(spark, tmp_path, monkeypatch):
    """A corpus change under the same sf_dir must change the artifact
    key (retrain-on-change), and the fingerprint of a missing corpus
    degrades to the documented 'nofp' location-only key."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path / "wh"))
    sf = str(tmp_path / "sf")
    _write_corpus(spark, sf, 10)
    p1 = artifact_path(sf, "toy")
    fp1 = corpus_fingerprint(sf)
    time.sleep(0.01)  # mtime_ns tick
    _write_corpus(spark, sf, 11)
    assert corpus_fingerprint(sf) != fp1
    assert artifact_path(sf, "toy") != p1
    assert corpus_fingerprint(str(tmp_path / "missing")) == "nofp"


def test_serving_entries_match_train_in_run_twins(spark):
    """The artifact-backed serving entries must produce exactly the
    train-in-run twins' rows (same shared scoring plan, same trained
    values — the artifact round-trip through parquet loses nothing,
    decimals included)."""
    from milan_telecom_etl__spark import registry_streaming  # noqa: F401
    from milan_telecom_etl__spark.queries_registry import QUERIES

    sf = "/root/testdata/sf0.001"
    for serve, train, key in (
        ("streaming_fertility_batch", "streaming_fertility_train_batch", "source"),
        (
            "streaming_quality_probe_batch",
            "streaming_quality_probe_train_batch",
            "doc_id",
        ),
    ):
        s = {r[key]: r for r in QUERIES[serve](spark, sf).collect()}
        t = {r[key]: r for r in QUERIES[train](spark, sf).collect()}
        assert s and s.keys() == t.keys()
        assert all(s[k] == t[k] for k in s), f"{serve} != {train}"


def test_fertility_artifact_is_the_trained_vocab(spark):
    """The persisted artifact IS the trained (w, seq, freq) vocabulary:
    loading it back and re-deriving w_tokens gives positive token
    counts for every trained word."""
    from milan_telecom_etl__spark.operators.text import _bpe_syms_col
    from milan_telecom_etl__spark.registry_streaming import _standing_bpe_vocab

    v = _standing_bpe_vocab(spark, "/root/testdata/sf0.001")
    assert set(v.columns) == {"w", "seq", "freq"}
    rows = v.select(
        "w", F.size(_bpe_syms_col("alpha")).alias("n")
    ).collect()
    assert rows and all(r["n"] >= 1 for r in rows)


def test_index_serving_twins_match_train_in_run(spark):
    """The standing-index serving entries (dedup + ANN) must produce
    exactly the train-in-run twins' rows — the artifact round-trip and
    the union-df-cap discipline lose nothing."""
    from milan_telecom_etl__spark import registry_similarity  # noqa: F401
    from milan_telecom_etl__spark import registry_text  # noqa: F401
    from milan_telecom_etl__spark.queries_registry import QUERIES

    sf = "/root/testdata/sf0.001"
    for serve, train, keys in (
        ("incremental_dedup_serving", "incremental_dedup", ("new_doc", "dup_of")),
        ("knn_ivf_serving", "knn_ivf", ("query_id", "rk")),
    ):
        s = {tuple(r[k] for k in keys): r for r in QUERIES[serve](spark, sf).collect()}
        t = {tuple(r[k] for k in keys): r for r in QUERIES[train](spark, sf).collect()}
        assert s and s.keys() == t.keys(), f"{serve} keys != {train}"
        assert all(s[k] == t[k] for k in s), f"{serve} != {train}"


def test_dedup_serving_df_cap_sees_union_frequencies(spark, tmp_path, monkeypatch):
    """The reason the dedup shingle artifact stores UNCAPPED rows: a
    batch can push a shingle over the df cap, and the serving form must
    drop it exactly as the combined computation would. Crafted corpus:
    a shingle at df == cap in the index alone crosses the cap once the
    batch arrives; with cap=2 the serving and train-in-run outputs must
    still agree (both drop it)."""
    import pyspark.sql.functions as F

    from milan_telecom_etl__spark.operators.dedup import (
        incremental_near_dups,
        incremental_near_dups_serving,
        minhash_banded,
        shingle_table,
    )

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),      # batch
        (1, "alpha beta gamma delta epsilon zeta"),      # batch dup of 0
        (100, "alpha beta gamma delta epsilon zeta"),    # index
        (101, "alpha beta gamma delta epsilon eta"),     # index near-dup
        (102, "totally different words entirely here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cap = 2
    train = incremental_near_dups(
        docs, new_max_id=100, max_shingle_df=cap
    ).collect()
    idx = docs.filter(F.col("doc_id") >= 100)
    serve = incremental_near_dups_serving(
        docs.filter(F.col("doc_id") < 100),
        minhash_banded(idx, num_hashes=64, band_size=4),
        shingle_table(idx, n=3),  # UNCAPPED, by contract
        new_max_id=100,
        max_shingle_df=cap,
    ).collect()
    key = lambda r: (r["new_doc"], r["dup_of"])
    assert {key(r): r for r in serve} == {key(r): r for r in train}
