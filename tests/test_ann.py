"""ANN block: hyperplane-LSH recall vs exact cosine top-k, mirroring
the reference's approximate-vs-exact grading pattern (A3 PDF §4.1.4:
accuracy >= 0.8 against ground truth)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_mining_map_reduce_spark.operators.ann import (
    cosine_topk,
    hyperplane_lsh_topk,
    ivf_topk,
)
from data_mining_map_reduce_spark.sources.catalog import load_table

SF_CORRECT = "/root/testdata/sf0.01"


def _probe_set(spark, n=20):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    return emb, emb.where(F.col("vec_id") < n)


def test_exact_topk_matches_numpy(spark):
    import numpy as np

    emb, probes = _probe_set(spark, n=5)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    got = cosine_topk(emb, probes, k=3).collect()
    by_probe: dict[int, list[int]] = {}
    for r in sorted(got, key=lambda r: (r.probe_id, r.rnk)):
        by_probe.setdefault(r.probe_id, []).append(r.neighbor_id)
    for pid, neighbors in by_probe.items():
        i = int(np.where(ids == pid)[0][0])
        sims = mat_n @ mat_n[i]
        sims[i] = -np.inf
        # numpy ground truth with the same (rounded sim desc, id asc) order
        order = sorted(
            range(len(ids)),
            key=lambda j: (-round(float(sims[j]), 6), ids[j]),
        )[:3]
        assert neighbors == [int(ids[j]) for j in order], pid


def test_lsh_recall_vs_exact(spark):
    emb, probes = _probe_set(spark, n=20)
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in cosine_topk(emb, probes, k=5).collect()
    }
    approx = {
        (r.probe_id, r.neighbor_id)
        for r in hyperplane_lsh_topk(
            emb, probes, k=5, num_planes=24, bands=8
        ).collect()
    }
    assert len(exact) == 20 * 5
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall


def test_ivf_recall_vs_exact_clustered(spark):
    """IVF's premise is cluster structure: on a planted-cluster corpus
    it must hit high recall while scanning a small fraction of the
    lists (n_probe=4 of n_list=16 -> ~1/4 of the corpus). The testdata
    embeddings are near-random (mean cosine ~0), where NO partition-
    pruning index can beat its scan fraction — that regime is covered
    by test_ivf_recall_vs_exact_unstructured below."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(10, 16))
    pts = []
    for ci, c in enumerate(centers):
        for j in range(60):
            pts.append((ci * 60 + j, (c + 0.25 * rng.normal(size=16)).tolist()))
    emb = spark.createDataFrame(pts, "vec_id int, embedding array<double>")
    probes = emb.where(F.col("vec_id") % 60 == 0)  # one per cluster
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in cosine_topk(emb, probes, k=5).collect()
    }
    approx = {
        (r.probe_id, r.neighbor_id)
        for r in ivf_topk(emb, probes, k=5, n_list=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_ivf_recall_vs_exact_unstructured(spark):
    """On the (near-random) testdata embeddings IVF degrades towards
    its scan fraction; a quantizer trained on the full (tiny) corpus
    (train_cap covers it, and the sorted-sample training makes the
    centroids partition-order independent, so the measured recall is
    stable across sessions) with n_probe=10 of 16 lists must still
    clear the A3-style 0.8 bar."""
    emb, probes = _probe_set(spark, n=20)
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in cosine_topk(emb, probes, k=5).collect()
    }
    approx = {
        (r.probe_id, r.neighbor_id)
        for r in ivf_topk(emb, probes, k=5, n_list=16, n_probe=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall


def test_exact_topk_probe_guard(spark):
    import pytest

    emb, _ = _probe_set(spark)
    with pytest.raises(ValueError, match="max_probes"):
        cosine_topk(emb, emb, k=5, max_probes=10)


def test_lsh_degenerate_corpus_capped(spark):
    """An all-identical-vector corpus piles every row into one bucket
    per band; max_bucket must drop those buckets so the probe join
    stays bounded instead of going |probes|x|corpus|."""
    n = 2000
    base = [0.3, -1.2, 0.8, 0.05]
    df = spark.createDataFrame(
        [(i, base) for i in range(n)], "vec_id int, embedding array<double>"
    )
    probes = df.where(F.col("vec_id") < 3)
    capped = hyperplane_lsh_topk(
        df, probes, k=5, num_planes=8, bands=4, max_bucket=100
    ).collect()
    # every bucket exceeds the cap -> no candidates survive (the
    # right outcome: a degenerate bucket carries no ranking signal)
    assert capped == []
    uncapped = hyperplane_lsh_topk(
        df, probes, k=5, num_planes=8, bands=4, max_bucket=None
    ).collect()
    assert len(uncapped) == 3 * 5


def test_empty_embeddings_raises_clear_error(spark):
    import pytest

    empty = spark.createDataFrame([], "vec_id int, embedding array<double>")
    probes = empty
    with pytest.raises(ValueError, match="empty embeddings"):
        hyperplane_lsh_topk(empty, probes, k=3)


def test_lsh_deterministic(spark):
    emb, probes = _probe_set(spark, n=5)
    a = sorted(
        (r.probe_id, r.rnk, r.neighbor_id)
        for r in hyperplane_lsh_topk(emb, probes, k=3).collect()
    )
    b = sorted(
        (r.probe_id, r.rnk, r.neighbor_id)
        for r in hyperplane_lsh_topk(emb, probes, k=3).collect()
    )
    assert a == b and len(a) > 0


def test_ivfpq_recall_vs_exact_clustered(spark):
    """IVF-PQ on the planted-cluster corpus: coarse pruning + ADC
    shortlist + exact refinement must stay near the plain-IVF recall
    bar — the PQ stage may only lose candidates the refinement window
    cannot recover."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.ann import ivfpq_topk

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(10, 16))
    pts = []
    for ci, c in enumerate(centers):
        for j in range(60):
            pts.append((ci * 60 + j, (c + 0.25 * rng.normal(size=16)).tolist()))
    emb = spark.createDataFrame(pts, "vec_id int, embedding array<double>")
    probes = emb.where(F.col("vec_id") % 60 == 0)
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in cosine_topk(emb, probes, k=5).collect()
    }
    approx = {
        (r.probe_id, r.neighbor_id)
        for r in ivfpq_topk(
            emb, probes, k=5, n_list=16, n_probe=4, m_sub=4, k_codes=16, refine=10
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # In-cluster sims here are near-tied (cos 0.97 vs 0.968), so the
    # ADC order needs a real refinement window; refine=10 still reads
    # full vectors for only ~1/3 of the probed candidates.
    assert recall >= 0.9, recall
    # and the refinement window is the recall knob: a too-narrow
    # shortlist must do strictly worse than a wide one
    narrow = {
        (r.probe_id, r.neighbor_id)
        for r in ivfpq_topk(
            emb, probes, k=5, n_list=16, n_probe=4, m_sub=4, k_codes=16, refine=1
        ).collect()
    }
    assert len(exact & narrow) / len(exact) < recall


def test_ivfpq_refinement_scores_are_exact(spark):
    """The final cos_sim column must be the EXACT cosine (refinement
    re-scores the shortlist with full vectors), so any returned pair
    that the exact path also returns carries the identical rounded
    similarity."""
    from data_mining_map_reduce_spark.operators.ann import ivfpq_topk

    emb, probes = _probe_set(spark, n=10)
    exact = {
        (r.probe_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk(emb, probes, k=5).collect()
    }
    got = ivfpq_topk(
        emb, probes, k=5, n_list=8, n_probe=6, m_sub=8, k_codes=16, refine=4
    ).collect()
    assert len(got) > 0
    overlap = 0
    for r in got:
        key = (r.probe_id, r.neighbor_id)
        if key in exact:
            overlap += 1
            assert r.cos_sim == exact[key], key
    assert overlap > 0
