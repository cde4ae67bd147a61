"""Content-based recommendation (SURVEY §2.4 A16 second half —
spec-only in the reference: A3 PDF §4.2 builds boolean item profiles
from the top TF-IDF terms of each item's text, user profiles by
aggregating the profiles of items the user rated, and predicts with
cosine similarity over the boolean vectors, keeping pairs >= 0.01;
no reference code exists, so the engine implements the PDF's math).

Boolean profiles are represented RELATIONALLY — one (key, term) row
per profile member, never a dense vector: cosine of boolean vectors
is |A∩B| / √(|A|·|B|), so the intersection is an equi-join on term
and the norms are per-key counts. Everything shuffles on (key, term)
pair keys; profile size k bounds the fan-out per key, so target
scoring is O(|targets|·k) join rows — scale-safe.

The reference corpus (Yelp reviews, A3 PDF §4.2) keeps top-200 terms
of long concatenated review texts; profile size is a parameter here
because the engine's test items (part descriptions) are ~10 words.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import tfidf_top_terms


def item_profiles(
    item_docs: DataFrame,
    k: int = 200,
    id_col: str = "i",
    text_col: str = "text",
) -> DataFrame:
    """(i, term): boolean profile = the item's top-k TF-IDF terms
    (tf over max-tf · ln(N/df), rank ties broken by term)."""
    return tfidf_top_terms(item_docs, k=k, id_col=id_col, text_col=text_col).select(
        id_col, "term"
    )


def user_profiles(
    interactions: DataFrame,
    item_profs: DataFrame,
    k: int = 200,
    user_col: str = "u",
    item_col: str = "i",
) -> DataFrame:
    """(u, term): user profile = the k most frequent profile terms
    across the items the user interacted with (count desc, term asc
    — the deterministic aggregate-of-profiles rule)."""
    counts = (
        interactions.select(user_col, item_col)
        .distinct()
        .join(item_profs, item_col)
        .groupBy(user_col, "term")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy(user_col).orderBy(F.col("_c").desc(), F.col("term").asc())
    return (
        counts.withColumn("_rnk", F.row_number().over(w))
        .where(F.col("_rnk") <= k)
        .select(user_col, "term")
    )


def content_based_scores(
    user_profs: DataFrame,
    item_profs: DataFrame,
    targets: DataFrame,
    min_cos: float = 0.01,
    user_col: str = "u",
    item_col: str = "i",
) -> DataFrame:
    """(u, i, cos_sim) for each target pair with boolean-cosine
    |U∩I| / √(|U|·|I|) >= ``min_cos`` (A3 PDF §4.2's cutoff).

    Intersection via double equi-join on (key, term); profile sizes
    join in as per-key counts (broadcastable: one row per user/item).
    """
    usz = user_profs.groupBy(user_col).agg(F.count(F.lit(1)).alias("_nu"))
    isz = item_profs.groupBy(item_col).agg(F.count(F.lit(1)).alias("_ni"))
    inter = (
        targets.select(user_col, item_col)
        .join(user_profs, user_col)
        .join(item_profs, [item_col, "term"])
        .groupBy(user_col, item_col)
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    cos = F.col("_inter") / F.sqrt((F.col("_nu") * F.col("_ni")).cast("double"))
    return (
        inter.join(F.broadcast(usz), user_col)
        .join(F.broadcast(isz), item_col)
        .where(cos >= min_cos)
        .select(user_col, item_col, F.round(cos, 6).alias("cos_sim"))
    )
