"""Distributed k-means (Lloyd's algorithm) over embedding columns.

The canonical iterative-ML shape on Spark (same as MLlib's): centroids
are k·d numbers, so they live on the driver and enter the plan as a
literal array folded per row — the E-step assignment is purely
map-side, NO shuffle of the fact table. The only shuffle per iteration
is the M-step's (cluster, dim) mean, whose reduce traffic is k·d
values after map-side partial aggregation. That plan is identical on
local[32] and on 1000 executors over 100 TB.

No UDFs: distances are zip_with/aggregate folds (codegen'd where
bound, and bit-identical to the DuckDB oracle's list_sum over the same
zip — see registry_ml.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _as_double


def sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance — left-fold accumulation, index order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    vectors: DataFrame,
    cent_rows: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """E-step, map-side: per row, fold the centroid literal to the
    (dist², cid) minimum — array_min on the struct picks min distance
    with a deterministic cid tiebreak. Centroids enter as a folded
    constant (the broadcast-variable pattern for k·d driver-side
    numbers); a broadcast one-row relation was tried and measured
    SLOWER warm — the extra per-iteration broadcast exchange outweighs
    literal-plan codegen churn. The scored array is referenced twice
    (cluster, dist), so the k·d fold is evaluated twice per row — still
    cheaper at scale than any formulation that shuffles the vectors
    (CollapseProject would inline a shared column anyway)."""
    cents = F.array(
        *[
            F.struct(
                F.lit(int(cid)).cast("long").alias("cid"),
                F.array(*[F.lit(float(v)) for v in ce]).alias("ce"),
            )
            for cid, ce in cent_rows
        ]
    )
    v = _as_double(F.col(vec_col))
    scored = F.transform(
        cents,
        lambda c: F.struct(sq_dist(v, c["ce"]).alias("d"), c["cid"].alias("cid")),
    )
    return vectors.withColumn("cluster", F.array_min(scored)["cid"]).withColumn(
        "dist", F.sqrt(F.array_min(scored)["d"])
    )


def recompute_centroids(
    assigned: DataFrame, vec_col: str = "embedding", round_dp: int | None = None
) -> DataFrame:
    """M-step: per-cluster mean vector. Explode to (cluster, dim),
    average, and fold back into a dim-ordered array — the shuffle
    carries k·d keys regardless of input size (map-side partials do
    the heavy lifting). `round_dp` quantizes each mean component
    (engine-parity: both Spark and a SQL oracle round their own avg, so
    sub-ulp summation-order drift can't cascade into the next round's
    assignments)."""
    ex = assigned.select("cluster", F.posexplode(vec_col).alias("pos", "v"))
    c = F.avg(F.col("v").cast("double"))
    if round_dp is not None:
        c = F.round(c, round_dp)
    per_dim = ex.groupBy("cluster", "pos").agg(c.alias("c"))
    return per_dim.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )


def seed_rows(
    vectors: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Deterministic seeds: the rows with id < k (ids are dense from 0
    in the testdata tables). A filter is a pushed-down scan predicate —
    no global sort (orderBy().limit() would Sort the whole table to
    pick k rows); k-means|| sampling is the scale upgrade."""
    rows = vectors.filter(F.col(id_col) < k).select(id_col, vec_col).collect()
    return [(r[id_col], [float(x) for x in r[vec_col]]) for r in rows]


def kmeans(
    vectors: DataFrame,
    k: int = 4,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = 6,
) -> DataFrame:
    """Lloyd iterations; returns (id, cluster, dist). Each round
    collects the k·d centroid numbers to the driver — that is the
    broadcast, not a data-path collect — so the lineage stays one
    scan + one tiny agg per iteration. Centroids are quantized to
    `round_dp` decimals each M-step (see recompute_centroids) so the
    full iterative run is oracle-checkable across engines."""
    # cache the (reused-every-round) input — the MLlib convention for
    # iterative algorithms; released once the final assignment below is
    # the only remaining consumer
    vectors = vectors.persist()
    cents = seed_rows(vectors, k, id_col, vec_col)
    for _ in range(iters):
        assigned = assign_clusters(vectors, cents, vec_col)
        cents = sorted(
            (r["cluster"], [float(x) for x in r["centroid"]])
            for r in recompute_centroids(assigned, vec_col, round_dp).collect()
        )
    out = assign_clusters(vectors, cents, vec_col).select(id_col, "cluster", "dist")
    # final E-step output is O(N) id/cluster/dist triples — snapshot it
    # so the input cache releases here instead of leaking to the caller
    out = out.localCheckpoint(eager=True)
    vectors.unpersist()
    return out


def kmeans_parallel_seeds(
    vectors: DataFrame,
    k: int = 4,
    l: int | None = None,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """k-means|| initialization (Bahmani et al., VLDB 2012) — the scale
    upgrade over `seed_rows` promised at `kmeans():90`: instead of k
    arbitrary rows, oversample ~l points per round with probability
    proportional to their distance-squared from the current centers,
    then reduce the O(rounds*l) weighted candidate set to k centers on
    the driver.

    Everything data-sized stays distributed: per-round work is one
    map-side fold against the broadcast center list (same no-shuffle
    E-step shape as assign_clusters) plus one scalar agg for phi; the
    ONLY collects are the sampled candidates (hard-capped at 4*l rows
    by a TakeOrdered, never unbounded) and the k*d seed numbers.
    Sampling is deterministic — u = xxhash64(id, round)-derived uniform
    — so the whole init is reproducible across runs and cluster sizes.
    """
    import math

    l = l if l is not None else 2 * k
    first = vectors.orderBy(F.col(id_col).asc()).select(id_col, vec_col).first()
    centers: list[list[float]] = [[float(x) for x in first[vec_col]]]

    v = _as_double(F.col(vec_col))
    for r in range(rounds):
        lits = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in centers]
        )
        d2 = F.array_min(
            F.transform(lits, lambda c: sq_dist(v, c))
        )
        scored = vectors.select(id_col, vec_col, d2.alias("d2"))
        phi = scored.agg(F.sum("d2")).first()[0]
        if not phi or phi <= 0.0:  # all points already coincide with centers
            break
        u = (
            F.pmod(F.xxhash64(F.col(id_col), F.lit(r)), F.lit(1_000_000))
            / F.lit(1_000_000.0)
        )
        picked = (
            scored.withColumn("u", u)
            .filter(F.col("u") < F.lit(float(l)) * F.col("d2") / F.lit(float(phi)))
            .orderBy(F.col("u").asc(), F.col(id_col).asc())
            .limit(4 * l)  # hard cap: expectation is l, tail is bounded
            .select(id_col, vec_col)
            .collect()
        )
        for row in picked:
            centers.append([float(x) for x in row[vec_col]])

    # weight candidates by how many points they're nearest to (one more
    # broadcast fold + a k'-key agg), then reduce to k on the driver
    cand = list(dict.fromkeys(tuple(c) for c in centers))  # dedupe, keep order
    cent_rows = [(i, list(c)) for i, c in enumerate(cand)]
    assigned = assign_clusters(vectors, cent_rows, vec_col)
    wmap = {
        r["cluster"]: r["w"]
        for r in assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("w")).collect()
    }
    w = [float(wmap.get(i, 0.0)) for i in range(len(cand))]

    # driver-side weighted reduction (candidate count is O(rounds*l),
    # never data-sized): greedy weighted farthest-first init, then
    # weighted Lloyd to convergence — deterministic throughout
    def _sq(a: tuple, b: tuple) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    chosen = [max(range(len(cand)), key=lambda i: (w[i], -i))]
    while len(chosen) < min(k, len(cand)):
        best, best_score = None, -1.0
        for i in range(len(cand)):
            if i in chosen:
                continue
            score = w[i] * min(_sq(cand[i], cand[j]) for j in chosen)
            if score > best_score:
                best, best_score = i, score
        chosen.append(best)
    seeds = [list(cand[i]) for i in chosen]

    for _ in range(25):
        sums = [[0.0] * len(seeds[0]) for _ in seeds]
        wsum = [0.0] * len(seeds)
        for i, c in enumerate(cand):
            j = min(
                range(len(seeds)),
                key=lambda s: (_sq(c, tuple(seeds[s])), s),
            )
            wsum[j] += w[i]
            for dth, x in enumerate(c):
                sums[j][dth] += w[i] * x
        new = [
            [s / wsum[j] for s in sums[j]] if wsum[j] > 0 else seeds[j]
            for j, _ in enumerate(seeds)
        ]
        if all(
            math.isclose(a, b, rel_tol=0.0, abs_tol=1e-12)
            for ns, os_ in zip(new, seeds)
            for a, b in zip(ns, os_)
        ):
            break
        seeds = new

    # stable output order: by first differing component, then index —
    # callers treat seeds as cluster ids 0..k-1
    seeds.sort()
    return [(i, [round(x, 6) for x in c]) for i, c in enumerate(seeds)]


def inertia(assigned: DataFrame) -> float:
    """Sum of squared point-to-centroid distances (the k-means
    objective) from an assign_clusters output."""
    return float(
        assigned.agg(F.sum(F.col("dist") * F.col("dist"))).first()[0] or 0.0
    )
