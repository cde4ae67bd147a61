"""Item-item collaborative filtering (SURVEY §2.4 A15 — spec-only in
the reference: A3 PDF §4.3's Pearson-over-co-rated-pairs model with
top-N-neighbor weighted prediction; no reference code exists, so the
engine implements the PDF's math).

Pipeline shapes, all relational:
- similarities: self-join ratings on the user, Pearson ``corr`` per
  item pair with >= min_co co-raters (corr's partial aggregation is
  Catalyst-native). One shuffle on the user join + one on the pair
  groupBy — the same equi-join rewrite as J3.
- prediction: for each (user, target-item), candidate neighbors are
  the user's OTHER rated items joined through the similarity table
  (positive sims only), top-N by similarity (window), then the
  weighted average Σ(sim·r)/Σ(sim) — reference formula, A3 PDF §4.3.
Skew note: hot items fan out in the user self-join; AQE skew-join
plus the min_co filter keep pair counts bounded at scale.
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
    both = F.broadcast(
        sims.select("i1", "i2", "sim")
        .unionByName(
            sims.select(F.col("i2").alias("i1"), F.col("i1").alias("i2"), "sim")
        )
        .where(F.col("sim") > 0)
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
