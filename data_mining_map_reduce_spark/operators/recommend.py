"""Collaborative filtering, item-based and user-based (SURVEY §2.4
A15 — spec-only in the reference: A3 PDF §4.3 requires BOTH models:
Pearson-over-co-rated-pairs similarity with top-N-neighbor weighted
prediction, and a MinHash-LSH candidate pre-filter for the user-based
model; no reference code exists, so the engine implements the PDF's
math).

Pipeline shapes, all relational:
- similarities: self-join ratings on the co-key (user for item-item,
  item for user-user), Pearson per pair with >= min_co co-ratings
  (covar/stddev partial aggregation is Catalyst-native). One shuffle
  on the co-key join + one on the pair groupBy — the same equi-join
  rewrite as J3.
- prediction: candidate neighbors joined through the similarity
  table (positive sims only), top-N by similarity (window), then the
  weighted average Σ(sim·r)/Σ(sim) — reference formula, A3 PDF §4.3.
- LSH pre-filter (user-based): user→rated-item baskets through the
  MinHash-LSH pair pipeline (operators/similarity.py) — the Pearson
  self-join then runs only over candidate pairs, turning the O(Σ
  raters_i²) pair blow-up into LSH bucket cost. Probabilistic recall
  (banding curve), so the engine keeps it as a separate code path
  from the exact model; agreement is pytest-asserted.
Skew note: hot keys fan out in the self-join; AQE skew-join plus the
min_co filter keep pair counts bounded at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def item_similarities(
    ratings: DataFrame,
    user_col: str = "u",
    item_col: str = "i",
    rating_col: str = "rating",
    min_co: int = 3,
) -> DataFrame:
    """(i1, i2, sim, n_co) — Pearson correlation over co-ratings for
    unordered item pairs with >= min_co common raters; zero-variance
    pairs (corr undefined) are dropped."""
    a = ratings.select(
        F.col(user_col).alias("_u"),
        F.col(item_col).alias("i1"),
        F.col(rating_col).alias("_ra"),
    )
    b = ratings.select(
        F.col(user_col).alias("_u"),
        F.col(item_col).alias("i2"),
        F.col(rating_col).alias("_rb"),
    )
    # Pearson as covar/(σa·σb) with try_divide: ANSI mode makes
    # F.corr THROW on zero-variance groups where SQL engines return
    # NULL; try_divide restores the NULL-and-filter semantics.
    return (
        a.join(b, "_u")
        .where(F.col("i1") < F.col("i2"))
        .groupBy("i1", "i2")
        .agg(
            F.try_divide(
                F.covar_samp("_ra", "_rb"),
                F.stddev_samp("_ra") * F.stddev_samp("_rb"),
            ).alias("_c"),
            F.count(F.lit(1)).alias("n_co"),
        )
        .where((F.col("n_co") >= min_co) & F.col("_c").isNotNull() & ~F.isnan("_c"))
        .select("i1", "i2", F.round("_c", 6).alias("sim"), "n_co")
    )


def predict_ratings(
    ratings: DataFrame,
    sims: DataFrame,
    targets: DataFrame,
    user_col: str = "u",
    item_col: str = "i",
    rating_col: str = "rating",
    top_n: int = 5,
) -> DataFrame:
    """(u, i, pred) for each (user, item) row in ``targets``:
    weighted average of the user's ratings on the top-N most-similar
    items (positive similarity only). Targets with no positive-sim
    co-rated neighbor get no row (the reference falls back to item
    averages; callers can coalesce against one)."""
    # The filtered similarity table is the small side (pairs with
    # >= min_co co-raters, positive sim only): broadcast it so the
    # target/ratings sides never shuffle for the candidate build. At
    # 100 TB the sims table is bounded by item-pair density, not by
    # ratings volume — it stays broadcastable long after ratings
    # don't.
    # Persist before the symmetrizing union: sims is referenced twice
    # and would otherwise be planned (and its Pearson self-join
    # computed) twice — see predict_ratings_user_based.
    sims_m = sims.select("i1", "i2", "sim").persist()
    both = F.broadcast(
        sims_m.unionByName(
            sims_m.select(F.col("i2").alias("i1"), F.col("i1").alias("i2"), "sim")
        ).where(F.col("sim") > 0)
    )
    cand = (
        targets.select(F.col(user_col).alias("_u"), F.col(item_col).alias("_ti"))
        .join(both, F.col("_ti") == both.i1)
        .select("_u", "_ti", F.col("i2").alias("_nbr"), "sim")
        .join(
            ratings.select(
                F.col(user_col).alias("_u"),
                F.col(item_col).alias("_nbr"),
                F.col(rating_col).alias("_r"),
            ),
            ["_u", "_nbr"],
        )
    )
    w = Window.partitionBy("_u", "_ti").orderBy(
        F.col("sim").desc(), F.col("_nbr").asc()
    )
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= top_n)
        .groupBy("_u", "_ti")
        .agg(
            F.round(F.sum(F.col("sim") * F.col("_r")) / F.sum("sim"), 4).alias(
                "pred"
            )
        )
        .select(
            F.col("_u").alias(user_col),
            F.col("_ti").alias(item_col),
            "pred",
        )
    )


def user_candidate_pairs_lsh(
    ratings: DataFrame,
    user_col: str = "u",
    item_col: str = "i",
    threshold: float = 0.02,
    num_hashes: int = 32,
    bands: int = 16,
    max_bucket: int | None = None,
) -> DataFrame:
    """(u1, u2) candidate user pairs whose rated-item sets collide in
    MinHash-LSH buckets (u1 < u2). The A3 §4.3 pre-filter: user
    similarity only gets computed for pairs that plausibly co-rate.

    Candidates-only by design (``verify=False`` downstream): the
    Pearson pass this feeds re-joins the co-ratings and applies its
    own ``min_co`` floor, so an exact-Jaccard verification here would
    re-shuffle the full item-set arrays to filter almost nothing at
    pre-filter thresholds — measured as the single largest cost of
    the LSH-CF query at sf0.1 before removal. ``threshold`` remains
    the banding design point documented below, not an applied filter.

    Banding regime — the crossover that makes the pre-filter pay:
    with r=1 (b=num_hashes) ANY shared minhash makes a candidate, so
    collision = 1-(1-s)^32 ≈ 0.5 even at s=0.02 — half of ALL
    overlapping pairs survive and the pre-filter costs more than the
    exact item-key self-join it replaces (measured 46 s vs 6.4 s at
    sf0.1). Defaults are b=16, r=2: collision = 1-(1-s^2)^16, which
    collapses the low-similarity mass (s=0.01 → 0.2%) while keeping
    genuinely-similar pairs (s=0.3 → 78%, s=0.5 → 99%). On corpora
    whose similarity ceiling sits below ~0.1, r=2 trades recall at the
    threshold for a >100x candidate reduction — the correct trade for
    a *pre-filter*, whose contract is precision 1.0 (exact verify)
    and whose recall knob is (bands, rows) per A3 PDF §4.1.4. Use
    r=1 only when near-total recall at a very low threshold matters
    more than cost."""
    from .similarity import minhash_lsh_pairs

    baskets = ratings.groupBy(user_col).agg(
        F.collect_set(F.col(item_col).cast("string")).alias("_items")
    )
    # max_bucket defaults to None here (unlike the operator): the
    # candidate set is what the cf_user_predictions_lsh ORACLE
    # replays, and the SQL band-OR join cannot model the cap; r=2
    # banding keeps buckets tiny at any realistic rating density, and
    # callers facing genuinely hot buckets can re-enable the cap.
    return minhash_lsh_pairs(
        baskets,
        user_col,
        "_items",
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        key_a="u1",
        key_b="u2",
        verify=False,
        max_bucket=max_bucket,
    ).select("u1", "u2")


def user_similarities(
    ratings: DataFrame,
    user_col: str = "u",
    item_col: str = "i",
    rating_col: str = "rating",
    min_co: int = 3,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """(u1, u2, sim, n_co) — Pearson correlation over co-ratings for
    unordered user pairs with >= min_co co-rated items; zero-variance
    pairs dropped. ``candidate_pairs`` (u1, u2, u1 < u2 — e.g. from
    ``user_candidate_pairs_lsh``) restricts the pair aggregation to
    those pairs; exact mode (None) considers every co-rating pair."""
    a = ratings.select(
        F.col(item_col).alias("_i"),
        F.col(user_col).alias("u1"),
        F.col(rating_col).alias("_ra"),
    )
    b = ratings.select(
        F.col(item_col).alias("_i"),
        F.col(user_col).alias("u2"),
        F.col(rating_col).alias("_rb"),
    )
    if candidate_pairs is not None:
        # Candidates DRIVE the join — co-ratings are assembled only
        # for candidate pairs (|cand| x items-per-user join rows),
        # never via the full item-key self-join. Filtering after the
        # self-join would do strictly more work than exact mode,
        # defeating the pre-filter's entire point.
        joined = (
            candidate_pairs.select("u1", "u2")
            .join(a, "u1")
            .join(b, ["u2", "_i"])
        )
    else:
        joined = a.join(b, "_i").where(F.col("u1") < F.col("u2"))
    # Same ANSI-safe Pearson as item_similarities: try_divide keeps
    # zero-variance pairs NULL instead of throwing.
    return (
        joined.groupBy("u1", "u2")
        .agg(
            F.try_divide(
                F.covar_samp("_ra", "_rb"),
                F.stddev_samp("_ra") * F.stddev_samp("_rb"),
            ).alias("_c"),
            F.count(F.lit(1)).alias("n_co"),
        )
        .where((F.col("n_co") >= min_co) & F.col("_c").isNotNull() & ~F.isnan("_c"))
        .select("u1", "u2", F.round("_c", 6).alias("sim"), "n_co")
    )


def predict_ratings_user_based(
    ratings: DataFrame,
    sims: DataFrame,
    targets: DataFrame,
    user_col: str = "u",
    item_col: str = "i",
    rating_col: str = "rating",
    top_n: int = 5,
) -> DataFrame:
    """(u, i, pred) for each (user, item) row in ``targets``:
    weighted average of the target item's ratings by the top-N users
    most similar to u (positive similarity only) — the user-based
    mirror of ``predict_ratings``. The user-pair similarity table is
    NOT broadcast (user pairs outnumber item pairs at scale); the
    candidate build shuffles on the user key and AQE handles hot
    users."""
    # The symmetrizing union references sims TWICE; without a
    # materialization Catalyst plans two copies of the whole upstream
    # similarity DAG (for the LSH-prefiltered path that doubles the
    # signature->bucket->verify pipeline — measured 13.4 s of a
    # 26.9 s query at sf0.01). sims is bounded (pairs surviving
    # min_co + non-null Pearson), so an in-memory persist is safe at
    # any scale the pair table itself is viable at.
    sims_m = sims.select("u1", "u2", "sim").persist()
    both = sims_m.unionByName(
        sims_m.select(F.col("u2").alias("u1"), F.col("u1").alias("u2"), "sim")
    ).where(F.col("sim") > 0)
    cand = (
        targets.select(F.col(user_col).alias("_u"), F.col(item_col).alias("_ti"))
        .join(both, F.col("_u") == both.u1)
        .select("_u", "_ti", F.col("u2").alias("_nbr"), "sim")
        .join(
            ratings.select(
                F.col(user_col).alias("_nbr"),
                F.col(item_col).alias("_ti"),
                F.col(rating_col).alias("_r"),
            ),
            ["_nbr", "_ti"],
        )
    )
    w = Window.partitionBy("_u", "_ti").orderBy(
        F.col("sim").desc(), F.col("_nbr").asc()
    )
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= top_n)
        .groupBy("_u", "_ti")
        .agg(
            F.round(F.sum(F.col("sim") * F.col("_r")) / F.sum("sim"), 4).alias(
                "pred"
            )
        )
        .select(
            F.col("_u").alias(user_col),
            F.col("_ti").alias(item_col),
            "pred",
        )
    )
