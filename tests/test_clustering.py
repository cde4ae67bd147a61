"""Clustering correctness.

The testdata embeddings are unit-normalized with heavily overlapping
label groups (between-centroid distance ~0.2 vs within-cluster ~1.0),
so the reference's NMI>0.8 bar is unattainable on any algorithm here.
Instead we assert *algorithm parity*: the distributed K-Means must
reproduce an in-memory NumPy Lloyd run step-for-step from the same
init (a stronger check than a fuzzy NMI), plus determinism, inertia
improvement, and BFR structural invariants.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_mining_map_reduce_spark.operators.clustering import (
    bfr,
    kmeans,
    sufficient_stats,
)
from data_mining_map_reduce_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def points(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    return emb.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
        "label",
    ).cache()


def numpy_lloyd(X: np.ndarray, C: np.ndarray, max_iter: int = 100, tol: float = 1e-4):
    for _ in range(max_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        newC = np.array(
            [X[a == j].mean(0) if (a == j).any() else C[j] for j in range(len(C))]
        )
        move = np.sqrt(((newC - C) ** 2).sum(1)).max()
        C = newC
        if move <= tol:
            break
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    return d.argmin(1), C


def test_kmeans_matches_numpy(spark, points):
    k = 6
    assigned, centroids = kmeans(points, "vec", k=k, seed=7)
    got = {r.id: r.cluster for r in assigned.select("id", "cluster").collect()}

    rows = sorted(points.select("id", "vec").collect(), key=lambda r: r.id)
    ids = [r.id for r in rows]
    X = np.array([r.vec for r in rows])

    # reproduce the engine's deterministic init: k-means++ over the
    # xxhash64-ordered sample (the whole dataset at test scale)
    from data_mining_map_reduce_spark.operators.clustering import kmeanspp_init

    init_rows = (
        points.select("vec")
        .withColumn("_h", F.xxhash64(F.col("vec").cast("array<string>"), F.lit(7)))
        .orderBy("_h")
        .limit(4096)
        .collect()
    )
    C0 = np.array(kmeanspp_init([list(r.vec) for r in init_rows], k, 7))
    expect, _ = numpy_lloyd(X, C0)

    agreement = np.mean([got[i] == e for i, e in zip(ids, expect)])
    assert agreement > 0.99, f"agreement {agreement:.3f}"


def test_kmeans_deterministic(spark, points):
    a, ca = kmeans(points, "vec", k=4, seed=7)
    b, cb = kmeans(points, "vec", k=4, seed=7)
    assert ca == cb
    assert sorted(map(tuple, a.select("id", "cluster").collect())) == sorted(
        map(tuple, b.select("id", "cluster").collect())
    )


def test_kmeans_improves_inertia(spark, points):
    from data_mining_map_reduce_spark.operators.clustering import assign_clusters

    k = 6
    init_rows = (
        points.select("vec")
        .withColumn("_h", F.xxhash64(F.col("vec").cast("array<string>"), F.lit(7)))
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    init_c = [list(r.vec) for r in init_rows]

    from data_mining_map_reduce_spark.functions.vectors import l2

    def inertia(cents):
        a = assign_clusters(points, "vec", cents)
        dists = F.array(
            *[l2(F.col("vec"), F.array(*[F.lit(float(x)) for x in c])) for c in cents]
        )
        return a.select(
            F.sum(F.pow(F.array_min(dists), 2)).alias("i")
        ).collect()[0][0]

    _, final_c = kmeans(points, "vec", k=k, seed=7)
    assert inertia(final_c) < inertia(init_c)


def test_sufficient_stats_identity(spark, points):
    assigned, _ = kmeans(points, "vec", k=4, seed=7)
    stats = sufficient_stats(assigned, "vec").collect()
    assert sum(r.n for r in stats) == points.count()
    for r in stats:
        assert all(s >= 0 for s in r.std)
        assert len(r.mean) == len(r.std)

    # var identity cross-check on one cluster via exact recompute
    rows = assigned.where(F.col("cluster") == stats[0].cluster).collect()
    X = np.array([r.vec for r in rows])
    np.testing.assert_allclose(X.mean(0), np.array(stats[0].mean), rtol=1e-8)
    np.testing.assert_allclose(X.std(0), np.array(stats[0].std), rtol=1e-6, atol=1e-9)


def test_bfr_structure(spark, points):
    k = 6
    n = points.count()
    third = n // 3
    chunks = [
        points.where(F.col("id") < third),
        points.where((F.col("id") >= third) & (F.col("id") < 2 * third)),
        points.where(F.col("id") >= 2 * third),
    ]
    assign, state = bfr(chunks, "vec", "id", k=k, seed=7)
    rows = assign.collect()
    assert len(rows) == n, "every point gets exactly one assignment"
    assert len(state.rounds) == 3
    clusters = {r.cluster for r in rows}
    assert all(c == -1 or 0 <= c < k for c in clusters)
    coverage = sum(1 for r in rows if r.cluster >= 0) / n
    assert coverage > 0.5, f"DS coverage {coverage:.2%}"
    # round stats monotone: DS point mass grows per round
    masses = [r["n_ds_points"] for r in state.rounds]
    assert masses == sorted(masses)


def test_kmeanspp_converges_no_slower_than_sample_init_on_bench_corpus(spark):
    """The r6 verdict asked for the k-means++ claim to be verified
    with data, not asserted: on the BENCH corpus and config (sf0.1
    embeddings, k=8, seed=7 — the kmeans_cluster_sizes query),
    ++-seeding must need no more Lloyd rounds than the
    reference-style first-k-sample seeding. Measured 31 vs 50; the
    margin is wide enough to be robust to float-order drift. The
    claim is scale-dependent — at sf0.001/sf0.01 it reverses (13 vs
    10), which is exactly why this pins the bench corpus."""
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    pp_stats: dict = {}
    sm_stats: dict = {}
    kmeans(emb, "vec", k=8, seed=7, stats_out=pp_stats)
    kmeans(emb, "vec", k=8, seed=7, init="sample", stats_out=sm_stats)
    assert pp_stats["init"] == "kmeans++" and sm_stats["init"] == "sample"
    assert pp_stats["path"] == "local"  # 2000x64 elements, under the cap
    assert 1 <= pp_stats["iterations"] <= sm_stats["iterations"], (
        f"k-means++ took {pp_stats['iterations']} rounds vs "
        f"{sm_stats['iterations']} for sample-seeding"
    )


def test_kmeans_local_path_matches_distributed(spark, points):
    """The bounded-input local Lloyd must land on the same solution
    as the distributed per-round loop — identical rules, so only
    float summation order can differ."""
    import numpy as np

    loc_stats: dict = {}
    dist_stats: dict = {}
    a_loc, c_loc = kmeans(points, "vec", k=4, seed=7, stats_out=loc_stats)
    a_dist, c_dist = kmeans(
        points, "vec", k=4, seed=7, local_elems_cap=0, stats_out=dist_stats
    )
    assert loc_stats["path"] == "local" and dist_stats["path"] == "distributed"
    np.testing.assert_allclose(np.array(c_loc), np.array(c_dist), rtol=1e-6)
    got_loc = {r.id: r.cluster for r in a_loc.select("id", "cluster").collect()}
    got_dist = {r.id: r.cluster for r in a_dist.select("id", "cluster").collect()}
    agreement = np.mean([got_loc[i] == got_dist[i] for i in got_loc])
    assert agreement > 0.99, f"agreement {agreement:.3f}"


def test_kmeans_driver_reduce_matches_groupby(spark, points, monkeypatch):
    """The r17 partition-bounded driver reduce for the distributed
    Lloyd pass must land on the same solution as the groupBy reduce —
    identical per-partition partials, only the final float merge
    order differs."""
    import numpy as np

    dr_stats: dict = {}
    gb_stats: dict = {}
    a_dr, c_dr = kmeans(
        points, "vec", k=4, seed=7, local_elems_cap=0, stats_out=dr_stats
    )
    monkeypatch.setenv("SPARK_GRAFT_KMEANS_REDUCE_PARTS", "0")
    a_gb, c_gb = kmeans(
        points, "vec", k=4, seed=7, local_elems_cap=0, stats_out=gb_stats
    )
    assert dr_stats["path"] == "distributed" == gb_stats["path"]
    assert dr_stats["iterations"] == gb_stats["iterations"]
    np.testing.assert_allclose(np.array(c_dr), np.array(c_gb), rtol=1e-9)
    got_dr = {r.id: r.cluster for r in a_dr.select("id", "cluster").collect()}
    got_gb = {r.id: r.cluster for r in a_gb.select("id", "cluster").collect()}
    assert got_dr == got_gb


def test_kmeans_init_survives_duplicated_corpus(spark):
    """ADVICE r6: a corpus whose hash-smallest init window is swamped
    by duplicates of a few hot vectors must fall back to a distinct
    scan instead of spuriously raising 'fewer distinct points than
    k'. 3 distinct vectors x heavy duplication, k=3, init_cap=4 so
    the window alone cannot see 3 distinct."""
    rows = [([0.0, 0.0],)] * 200 + [([1.0, 1.0],)] * 200 + [([2.0, 2.0],)]
    df = spark.createDataFrame(rows, "vec array<double>")
    assigned, cents = kmeans(df, "vec", k=3, seed=7, init_cap=4, max_iter=5)
    assert len(cents) == 3
    assert assigned.select("cluster").distinct().count() == 3


def test_bfr_round_stats_pinned_counts(spark):
    """The r6 verdict asked for a partial oracle on bfr_round_stats.
    The counts are NOT SQL-replayable (they depend on the k-means
    centroids of the seeded init sample — an iterative float
    algorithm), so this pins the four rounds' counts instead.

    r12 amendment: intermediate DS counts carry a ±2 band, exact
    everywhere else. Root cause of the band: the per-round
    sufficient-stats are DISTRIBUTED float aggregations, and
    Tungsten's partial-aggregate merge order follows task completion
    order — under a loaded box two runs can differ in the last ulp
    of a centroid/std, which can flip a point sitting exactly on the
    alpha*sqrt(d) Mahalanobis boundary (observed once in ~12 rounds
    of suite runs; re-runs in isolation reproduce the pinned values).
    This is the same float-merge-order effect the A15 Pearson rewrite
    eliminated via integer suffstats — BFR is genuinely
    float-iterative, so the honest pin is a 1-point-wide band on the
    boundary-sensitive intermediate counts plus EXACT structural
    invariants: cumulative monotone growth, every point assigned by
    the final round (500, no outliers), and a full 8-cluster DS from
    round 0."""
    from data_mining_map_reduce_spark.queries import SPARK_QUERIES

    rows = [
        tuple(r)
        for r in SPARK_QUERIES["bfr_round_stats"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]
    pinned = [
        (0, 124, 8, 0),
        (1, 249, 8, 0),
        (2, 374, 8, 0),
        (3, 500, 8, 0),
    ]
    assert len(rows) == 4
    for (rid, n_ds, n_cl, n_left), (prid, pn_ds, pn_cl, _pn_left) in zip(
        rows, pinned
    ):
        assert (rid, n_cl) == (prid, pn_cl), rows
        assert abs(n_ds - pn_ds) <= 2, rows  # boundary-flip band
        assert n_left <= 2, rows  # a flipped point lands in CS/RS
    assert [r[1] for r in rows] == sorted(r[1] for r in rows), rows
    # every embedding is accounted for: cumulative DS points plus all
    # rounds' leftovers (which go to CS/RS, never back into DS stats)
    # cover the full 500-vector table
    assert rows[-1][1] + sum(r[3] for r in rows) == 500, rows


def test_kmeanspp_init_properties():
    """Pure-driver seeding contract: k distinct centroids drawn from
    the sample, deterministic under seed, degenerate duplicates fall
    back without raising."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.clustering import kmeanspp_init

    rng = np.random.default_rng(3)
    sample = [list(v) for v in rng.normal(size=(200, 5))]
    a = kmeanspp_init(sample, 8, seed=7)
    b = kmeanspp_init(sample, 8, seed=7)
    assert a == b  # deterministic
    assert len(a) == 8
    sample_set = {tuple(v) for v in sample}
    assert all(tuple(c) in sample_set for c in a)  # members of the sample
    assert len({tuple(c) for c in a}) == 8  # distinct
    # degenerate: all points identical except two — must not raise,
    # must return k rows
    degen = [[0.0, 0.0]] * 50 + [[1.0, 1.0]]
    got = kmeanspp_init(degen, 3, seed=7)
    assert len(got) == 3
