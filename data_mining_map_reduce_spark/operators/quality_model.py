"""Model-based document quality filtering — the GPT-3-family recipe
(Brown et al. 2020 arXiv:2005.14165 appendix A; GLaM, PaLM, and
LLaMA's CCNet stage use the same shape): train a linear classifier
to separate a TRUSTED slice of the corpus (positives) from the rest
(negatives), score every document with the classifier's probability,
and keep documents whose score clears a Pareto-noise threshold —
``keep iff score > 1 - pareto(alpha)`` — so high-quality docs are
kept almost surely while low-quality docs still trickle in with
small probability (the paper's hedge against classifier bias).

Spark-first construction, no Python in the hot path:

- features: ``tokenize`` → ``ml.feature.HashingTF`` (the hashing
  trick; JVM-native, no vocabulary state — the property that makes
  the featurizer embarrassingly scalable and streaming-safe);
- model: ``ml.classification.LogisticRegression`` (distributed
  L-BFGS; driver state = one coefficient vector of size
  ``num_features``);
- the Pareto draw is DETERMINISTIC: u = md5(doc_id ⊕ seed) mapped
  through the inverse CDF x = (1-u)^(-1/alpha) - 1 — the same
  content-addressed-randomness contract as every sampler in the
  engine (X22/M4), so the kept set is reproducible and
  layout-invariant, and the draw is SQL-replayable even though the
  model scores are not.

The scores themselves are iterative float training output → the
registered query is rows-only by nature (the semantic_dedup_docs
precedent); correctness is carried by pytests instead: the weak-label
discrimination property (held-out target-slice docs must outscore the
rest on average) and the keep rule's arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash60
from ..functions.text import tokenize

__all__ = ["quality_classifier_scores", "quality_classifier_stats"]

_U_DEN = float(1 << 52)


def quality_classifier_scores(
    docs: DataFrame,
    target_value: str,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 4096,
    pareto_alpha: float = 9.0,
    reg_param: float = 0.01,
    max_iter: int = 50,
    seed: int = 7,
) -> DataFrame:
    """Per-document quality score + Pareto keep flag:
    (id, group, score, keep). ``score`` = P(doc ∈ target slice) under
    a logistic regression on hashed unigram counts, weak-labelled by
    ``group_col == target_value``. ``keep`` = score > 1 - x where
    x ~ Pareto(``pareto_alpha``) via the md5 inverse-CDF draw (GPT-3
    appendix A used alpha = 9).

    Eager-action note (the _guard_lsh_verify convention): building
    this DataFrame runs driver actions before the caller's own — the
    class-count aggregate below (one row) and the L-BFGS ``fit``
    (its own distributed jobs; driver state = one ``num_features``
    coefficient vector). Both are bounded at any corpus size: the
    agg returns two scalars and the fit's driver footprint is the
    vector, never the data. The classifier intentionally trains and
    scores on the SAME rows — the GPT-3 recipe scores the full
    corpus with a weak-labelled model; generalization is pinned by
    the held-out discrimination pytest, not by a train/test split
    here."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_grp"),
        tokenize(F.col(text_col)).alias("_toks"),
    )
    feats = HashingTF(
        inputCol="_toks", outputCol="_features", numFeatures=num_features
    ).transform(base)
    train = feats.withColumn(
        "_label", (F.col("_grp") == target_value).cast("double")
    )
    # balanced class weights: the paper trains positives vs negatives
    # as size-matched corpora; here the target slice is one of many
    # sources, so unweighted training would let the negative mass
    # dominate the loss and push every probability toward 0 (measured
    # 0.13-vs-0.05 means at 25:475) — weight each class by n/(2·n_c)
    # so both halves contribute equally (scores then read as
    # probabilities under a balanced prior)
    n_pos, n_all = train.agg(
        F.sum("_label"), F.count(F.lit(1))
    ).first()
    n_pos = n_pos or 0.0
    if not 0 < n_pos < n_all:
        raise ValueError(
            f"quality_classifier: target slice {target_value!r} has "
            f"{int(n_pos)} of {n_all} docs — need both classes non-empty"
        )
    w_pos, w_neg = n_all / (2.0 * n_pos), n_all / (2.0 * (n_all - n_pos))
    train = train.withColumn(
        "_w", F.when(F.col("_label") == 1.0, w_pos).otherwise(w_neg)
    )
    model = LogisticRegression(
        featuresCol="_features",
        labelCol="_label",
        weightCol="_w",
        regParam=reg_param,
        maxIter=max_iter,
    ).fit(train)
    scored = model.transform(train)
    # P(positive) is component 1 of the probability vector
    from pyspark.ml.functions import vector_to_array

    p = vector_to_array(F.col("probability")).getItem(1)
    # content-addressed uniform in (0, 1): the md5 60-bit hash's low
    # 52 bits, offset by 0.5 so u is never exactly 0 or 1
    u = (
        (F.pmod(md5_hash60(F.concat_ws("|", F.col("_id"), F.lit(seed))), F.lit(1 << 52))
         + F.lit(0.5))
        / F.lit(_U_DEN)
    )
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / pareto_alpha)) - F.lit(1.0)
    return scored.select(
        F.col("_id").alias(id_col),
        F.col("_grp").alias(group_col),
        p.alias("score"),
        (p > (F.lit(1.0) - pareto)).alias("keep"),
    )


def quality_classifier_stats(
    docs: DataFrame,
    target_value: str,
    group_col: str = "source",
    **kwargs,
) -> DataFrame:
    """Per-group rollup of the classifier filter: (group, n_docs,
    mean_score, n_kept) — the monitoring table a pipeline publishes
    after a filter pass (which domains the classifier likes, how
    hard the Pareto rule cuts each). Bounded output: one row per
    domain."""
    scores = quality_classifier_scores(
        docs, target_value, group_col=group_col, **kwargs
    )
    return (
        scores.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("score"), 4).alias("mean_score"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
        .orderBy(group_col)
    )
