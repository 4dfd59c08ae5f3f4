"""BM25 + RRF gates: weights positive, rarer terms weigh more (the idf
property survives the rational un-logged transform), and fusion rewards
presence in both rank lists."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.bm25 import (
    bm25_query_scores,
    bm25_weights,
    rrf_fuse,
)
from write_optimized_vector_database_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def weights(spark, sf_dir):
    return bm25_weights(load_table(spark, sf_dir, "documents")).cache()


def test_weights_positive(weights):
    assert weights.filter(F.col("w") <= 0).count() == 0


def test_rarer_terms_weigh_more(spark, sf_dir, weights):
    """Mean weight of the rarest quartile of terms must exceed the mean
    of the most common quartile — idf at work."""
    toks_df = (
        weights.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    ranked = toks_df.orderBy("df").collect()
    rare = [r["term"] for r in ranked[: max(1, len(ranked) // 4)]]
    common = [r["term"] for r in ranked[-max(1, len(ranked) // 4):]]
    mean_w = lambda ts: weights.filter(F.col("term").isin(ts)).agg(  # noqa: E731
        F.avg("w")
    ).first()[0]
    assert mean_w(rare) > mean_w(common)


def test_rrf_rewards_double_presence(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(0, 10, 3), (0, 12, 1)], "query_id long, doc_id long, rank long"
    )
    fused = {r["doc_id"]: r["rrf"] for r in rrf_fuse(a, b).collect()}
    assert fused[10] == pytest.approx(1 / 61 + 1 / 63)
    assert fused[10] > fused[12] > 0
    assert fused[11] == pytest.approx(1 / 62)


def test_query_scores_hit_only_docs_with_terms(spark, sf_dir, weights):
    scores = bm25_query_scores(weights, 0, ["vector", "scan"])
    docs = load_table(spark, sf_dir, "documents")
    no_terms = docs.filter(
        ~F.lower(F.col("text")).rlike(r"\b(vector|scan)\b")
    ).select(F.col("doc_id"))
    assert scores.join(no_terms, "doc_id", "semi").count() == 0
