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


def test_semantic_pairs_refine_exact_cosine_pairs(spark):
    """SemDeDup pair stage, both directions of the refinement
    contract: every within-cluster pair IS an exact cosine-threshold
    pair with the IDENTICAL rounded similarity (precision 1.0 — the
    verify is exact, clustering only restricts the candidate set),
    and recall stays high because near-dups have near-identical
    embeddings and so co-cluster except on a Voronoi boundary."""
    from data_mining_map_reduce_spark.operators.ann import (
        cosine_near_dup_pairs_exact,
        semantic_near_dup_pairs,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings")
    exact = {
        (r.a, r.b): r.cos_sim
        for r in cosine_near_dup_pairs_exact(emb, threshold=0.4).collect()
    }
    sem = {
        (r.a, r.b): r.cos_sim
        for r in semantic_near_dup_pairs(emb, threshold=0.4).collect()
    }
    assert len(exact) > 0
    assert set(sem) <= set(exact), "semantic pair the exact graph lacks"
    mism = {p for p in sem if abs(sem[p] - exact[p]) > 1e-6}
    assert not mism, f"cos_sim mismatch on {sorted(mism)[:5]}"
    recall = len(sem) / len(exact)
    # deterministic 0.814 at the default n_probe=2 (seeded quantizer,
    # fixed corpus); single-probe measures 0.356 on these weak pairs
    assert recall >= 0.8, f"recall {recall:.3f} ({len(sem)}/{len(exact)})"


def test_semantic_pairs_planted_near_dups_full_recall(spark):
    """The actual SemDeDup regime: near-IDENTICAL embeddings (planted
    dup = base + 1% noise, cos > 0.99) land in the same cluster even
    at n_probe=1, so recall is exactly 1.0 — the multi-probe knob
    exists for weak-cosine corpora, not this one."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.ann import (
        semantic_near_dup_pairs,
    )

    rng = np.random.default_rng(0)
    base = rng.standard_normal((30, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        dup = v + 0.01 * rng.standard_normal(16)
        rows.append((2 * i + 1, [float(x) for x in dup]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.a, r.b)
        for r in semantic_near_dup_pairs(
            emb, threshold=0.95, k=8, n_probe=1
        ).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(30)}
    assert planted <= got, f"missed planted dups: {sorted(planted - got)[:5]}"


def test_semantic_dedup_groups_refine_cosine_closure(spark):
    """r14 verdict task 5 done-criterion: semantic-duplicate groups
    must REFINE the exact cosine-threshold transitive closure — every
    doc's canonical lives in the SAME closure component, so semantic
    dedup never merges docs the exact graph keeps apart. Singletons
    map to themselves and every id is mapped exactly once."""
    from data_mining_map_reduce_spark.operators.ann import (
        cosine_near_dup_pairs_exact,
        semantic_dedup,
    )
    from data_mining_map_reduce_spark.operators.graph import (
        connected_components,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings")
    closure = {
        r.id: r.component
        for r in connected_components(
            cosine_near_dup_pairs_exact(emb, threshold=0.4).select(
                F.col("a").alias("src"), F.col("b").alias("dst")
            )
        ).collect()
    }
    got = semantic_dedup(emb, threshold=0.4).collect()
    n = emb.count()
    assert len(got) == n
    assert len({r.vec_id for r in got}) == n
    merged = 0
    for r in got:
        if r.canonical_id != r.vec_id:
            merged += 1
            assert closure.get(r.vec_id) == closure.get(r.canonical_id), (
                r.vec_id,
                r.canonical_id,
            )
        assert r.is_kept == (r.canonical_id == r.vec_id)
    assert merged > 0, "no semantic duplicates found at threshold 0.4"


def test_semantic_dedup_hot_cluster_guard(spark):
    """A skewed quantizer (every vector identical -> one giant
    cluster) must fail fast with the knob names, not hand one
    straggler task an unbounded quadratic."""
    import pytest as _pytest

    from data_mining_map_reduce_spark.operators.ann import (
        semantic_near_dup_pairs,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 4), 1.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="max_cluster_rows"):
        semantic_near_dup_pairs(
            emb, threshold=0.9, k=2, max_cluster_rows=5
        ).collect()


def test_semantic_pairs_refinement_fuzz_seeds(spark):
    """The refinement invariant under varied geometry: for several
    seeded random corpora (different cluster structure, duplicates,
    and zero vectors), EVERY semantic pair must exist in the exact
    cosine graph with the identical rounded similarity — precision
    1.0 is a structural property of the exact verify, not a fact
    about one corpus."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.ann import (
        cosine_near_dup_pairs_exact,
        semantic_near_dup_pairs,
    )

    for seed in (1, 2):
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((5, 12)) * 2
        rows = []
        for i in range(120):
            v = centers[i % 5] + rng.standard_normal(12) * 0.8
            rows.append((i, [float(x) for x in v]))
        rows.append((120, [0.0] * 12))  # zero vector: norm guard path
        rows.append((121, rows[0][1]))  # exact duplicate of row 0
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        exact = {
            (r.a, r.b): r.cos_sim
            for r in cosine_near_dup_pairs_exact(emb, threshold=0.6).collect()
        }
        sem = {
            (r.a, r.b): r.cos_sim
            for r in semantic_near_dup_pairs(
                emb, threshold=0.6, k=5, seed=seed
            ).collect()
        }
        assert set(sem) <= set(exact), f"seed {seed}: non-exact pair emitted"
        assert all(abs(sem[p] - exact[p]) <= 1e-6 for p in sem), seed
        assert (0, 121) in sem, f"seed {seed}: exact duplicate pair missed"
