"""k-means semantics on a crafted separable set: the loop must recover
the planted partition regardless of seed-cluster ids."""

from __future__ import annotations

from pyspark.sql import functions as F

from milan_telecom_etl__spark.operators.clustering import (
    assign_clusters,
    kmeans,
    recompute_centroids,
    seed_rows,
)


def _toy(spark):
    # two tight blobs in 4-d, 6 points each, far apart
    a = [[0.0, 0.1, 0.0, -0.1], [0.1, 0.0, -0.1, 0.0], [0.0, 0.0, 0.1, 0.1],
         [-0.1, 0.1, 0.0, 0.0], [0.1, 0.1, 0.1, 0.0], [0.0, -0.1, 0.0, 0.1]]
    b = [[10.0, 9.9, 10.1, 10.0], [9.9, 10.0, 10.0, 10.1], [10.1, 10.1, 9.9, 10.0],
         [10.0, 10.0, 10.1, 9.9], [9.9, 10.1, 10.0, 10.0], [10.1, 9.9, 9.9, 10.1]]
    rows = [(i, v) for i, v in enumerate(a)] + [(100 + i, v) for i, v in enumerate(b)]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_kmeans_recovers_planted_blobs(spark):
    out = kmeans(_toy(spark), k=2, iters=4).collect()
    by_blob = {0: set(), 1: set()}
    for r in out:
        by_blob[0 if r["vec_id"] < 100 else 1].add(r["cluster"])
    # each blob maps to exactly one cluster, and the two differ
    assert len(by_blob[0]) == 1 and len(by_blob[1]) == 1
    assert by_blob[0] != by_blob[1]
    assert all(r["dist"] < 1.0 for r in out)


def test_recompute_centroids_is_blob_mean(spark):
    df = _toy(spark)
    seeds = seed_rows(df, 2)  # vec_ids 0 and 1 — both in blob A
    assigned = assign_clusters(df, seeds)
    cents = recompute_centroids(assigned).collect()
    # whatever the split, every centroid has exactly 4 dims and finite values
    assert all(len(r["centroid"]) == 4 for r in cents)
    one_shot = kmeans(df, k=2, iters=1)
    assert one_shot.count() == 12


def test_assignment_is_deterministic(spark):
    df = _toy(spark)
    seeds = seed_rows(df, 2)
    a1 = sorted((r["vec_id"], r["cluster"]) for r in assign_clusters(df, seeds).collect())
    a2 = sorted((r["vec_id"], r["cluster"]) for r in assign_clusters(df, seeds).collect())
    assert a1 == a2


def test_centroid_count_matches_k(spark):
    df = _toy(spark)
    out = kmeans(df, k=3, iters=2)
    assert out.select("cluster").distinct().count() <= 3


def test_kmeans_parallel_seeds_deterministic_and_separating(spark):
    """k-means|| init on the planted blobs: deterministic across calls,
    returns exactly k centers, and its assignment inertia beats the
    arbitrary id<k seeding (both seeds land in blob A, so || MUST find
    blob B to win)."""
    from milan_telecom_etl__spark.operators.clustering import (
        inertia,
        kmeans_parallel_seeds,
    )

    v = _toy(spark)
    s1 = kmeans_parallel_seeds(v, k=2)
    s2 = kmeans_parallel_seeds(v, k=2)
    assert s1 == s2, "k-means|| init must be deterministic"
    assert len(s1) == 2
    i_par = inertia(assign_clusters(v, s1))
    i_id = inertia(assign_clusters(v, seed_rows(v, 2)))
    assert i_par < i_id
    # with one seed per blob, assignment recovers the planted partition
    parts = {
        frozenset(
            r["vec_id"]
            for r in assign_clusters(v, s1).collect()
            if r["cluster"] == c
        )
        for c, _ in s1
    }
    assert frozenset(range(6)) in parts
    assert frozenset(range(100, 106)) in parts
