"""Text-analysis (TF-IDF, quality stats, language-ID) and item-item
CF (A15) unit tests on hand-computable fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mining_map_reduce_spark.operators.recommend import (
    item_similarities,
    predict_ratings,
)
from data_mining_map_reduce_spark.operators.text_analysis import (
    doc_quality_stats,
    language_id,
    tfidf_top_terms,
)


def test_tfidf_rare_term_tops(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common common zebra"),
            (2, "common common other words"),
            (3, "common words words words"),
        ],
        "doc_id long, text string",
    )
    top = {
        r.doc_id: r.term
        for r in tfidf_top_terms(docs, k=1).collect()
    }
    # 'zebra' appears only in doc 1 => highest idf there; 'common'
    # has idf ln(3/3)=0 everywhere
    assert top[1] == "zebra"


def test_doc_quality_stats_hand_values(spark):
    docs = spark.createDataFrame(
        [(1, "The cat and the cat!")], "doc_id long, text string"
    )
    r = doc_quality_stats(docs).collect()[0]
    # tokens: the cat and the cat -> 5 tokens, 2 stopwords (the, and,
    # the => 3), distinct {the, cat, and} = 3
    assert r.n_tokens == 5
    assert r.stopword_ratio == pytest.approx(3 / 5)
    assert r.distinct_ratio == pytest.approx(3 / 5)
    assert r.avg_token_len == pytest.approx((3 + 3 + 3 + 3 + 3) / 5)


def test_language_id_known_texts(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "der Hund ist nicht in das Haus und die Katze"),
            (3, "le chat est dans la maison et les oiseaux"),
            (4, "xyzzy plugh qwerty"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred_lang for r in language_id(docs).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"


@pytest.fixture()
def tiny_ratings(spark):
    rows = [
        # items A(1) and B(2) perfectly correlated over u1-u3
        (1, 1, 5.0), (1, 2, 5.0),
        (2, 1, 4.0), (2, 2, 4.0),
        (3, 1, 1.0), (3, 2, 1.0),
        # item C(3) anti-correlated with A
        (1, 3, 1.0), (2, 3, 2.0), (3, 3, 5.0),
        # u4 rated only B
        (4, 2, 3.0),
    ]
    return spark.createDataFrame(rows, "u long, i long, rating double")


def test_item_similarities_hand_values(spark, tiny_ratings):
    sims = {(r.i1, r.i2): r.sim for r in item_similarities(tiny_ratings, min_co=3).collect()}
    assert sims[(1, 2)] == pytest.approx(1.0)
    assert sims[(1, 3)] < 0  # anti-correlated
    assert all(r_n >= 3 for r_n in
               [r.n_co for r in item_similarities(tiny_ratings, min_co=3).collect()])


def test_predict_from_top_neighbor(spark, tiny_ratings):
    sims = item_similarities(tiny_ratings, min_co=3)
    targets = spark.createDataFrame([(4, 1)], "u long, i long")
    got = predict_ratings(tiny_ratings, sims, targets, top_n=5).collect()
    # u4's only positive-sim neighbor of item 1 is item 2 (sim 1.0,
    # rating 3.0) => prediction exactly 3.0
    assert len(got) == 1
    assert got[0].pred == pytest.approx(3.0)


def test_predictions_track_actuals(spark):
    """On real data: predictions for already-rated (u,i) targets
    should land in the rating range and beat a null model grossly."""
    from data_mining_map_reduce_spark.queries import SPARK_QUERIES

    pred = SPARK_QUERIES["cf_predictions"](spark, "/root/testdata/sf0.001")
    rows = pred.collect()
    assert len(rows) > 0
    assert all(0 < r.pred <= 50 for r in rows)
