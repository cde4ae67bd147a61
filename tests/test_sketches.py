"""Fuzzy oracles for approximation operators (SURVEY.md §5):
exact recomputation + threshold, mirroring the reference's grading
(A3 PDF accuracy ≥ 0.8; A6 FM/Bloom FPR-FNR checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_mining_map_reduce_spark.sources.catalog import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    exact = events.agg(F.countDistinct("user_id")).collect()[0][0]
    approx = events.agg(F.approx_count_distinct("user_id", 0.02)).collect()[0][0]
    assert abs(approx - exact) / exact <= 0.05, (exact, approx)
