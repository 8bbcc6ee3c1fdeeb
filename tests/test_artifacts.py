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
