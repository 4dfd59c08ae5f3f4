"""PQ + two-phase recall gates (reference config.h:84-94, 92-93:
PQ m subspaces, rerank_factor=4, recall ≥ 0.95 — types.h:140)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks_kmeans,
    two_phase_topk,
)
from write_optimized_vector_database_spark.operators.ivf import recall_at_k
from write_optimized_vector_database_spark.operators.topk import exact_topk
from write_optimized_vector_database_spark.sources.tables import load_table

DIM, M, NBITS = 64, 16, 8  # measured: ADC-only 0.79, two-phase 1.00 at sf0.001


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@pytest.fixture(scope="module")
def exact(emb, queries):
    return exact_topk(emb, queries, k=10, metric="ip").cache()


@pytest.fixture(scope="module")
def codebooks(emb):
    return train_pq_codebooks_kmeans(emb, dim=DIM, m=M, nbits=NBITS, seed=42)


@pytest.fixture(scope="module")
def encoded(emb, codebooks):
    return pq_encode(emb, codebooks).select("vec_id", "codes").cache()


def test_encode_shape(encoded, emb):
    rows = encoded.take(5)
    assert all(len(r.codes) == M for r in rows)
    assert encoded.count() == emb.count()


def test_two_phase_recall_gate(emb, encoded, queries, codebooks, exact):
    """ADC + 4× exact rerank must restore recall@10 ≥ 0.95."""
    approx = two_phase_topk(
        emb, encoded, queries, codebooks, k=10, rerank_factor=4, metric="ip"
    )
    rec = recall_at_k(approx, exact, k=10)
    mean_recall = rec.agg(F.avg("recall")).collect()[0][0]
    assert mean_recall >= 0.95, f"two-phase mean recall@10 {mean_recall}"


def test_adc_alone_reasonable(encoded, queries, codebooks, exact):
    """Phase-1-only recall is lower than two-phase but far above random."""
    approx = pq_adc_topk(encoded, queries, codebooks, k=10, metric="ip")
    rec = recall_at_k(approx, exact, k=10)
    mean_recall = rec.agg(F.avg("recall")).collect()[0][0]
    assert mean_recall >= 0.5, f"ADC-only mean recall@10 {mean_recall}"


def test_release_query_broadcasts(encoded, queries, codebooks, exact):
    """ADVICE r07: each ADC call registers its LUT broadcast; a serving
    wrapper releases them eagerly after materialization, and a released
    registry must not break subsequent queries."""
    from write_optimized_vector_database_spark.operators.pq import (
        _QUERY_BROADCASTS,
        release_query_broadcasts,
    )

    release_query_broadcasts()  # drain anything earlier tests registered
    pq_adc_topk(encoded, queries, codebooks, k=10, metric="ip").count()
    assert len(_QUERY_BROADCASTS) >= 1
    assert release_query_broadcasts() >= 1
    assert not _QUERY_BROADCASTS
    # the path still serves after a release (fresh broadcast per call)
    n = pq_adc_topk(encoded, queries, codebooks, k=10, metric="ip").count()
    assert n > 0
    release_query_broadcasts()
