"""Maxsim late-interaction gates: with a single part the formulation
degenerates to plain inner-product top-k exactly; with multiple parts
results stay within the phase-1 candidate set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.maxsim import maxsim_topk
from write_optimized_vector_database_spark.operators.topk import exact_topk
from write_optimized_vector_database_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_single_part_degenerates_to_exact_ip(emb, queries):
    """P=1: Σ over one part of max over one part = the plain dot product,
    so ranks must match exact_topk exactly (scores too, bit-for-bit:
    same fold, same slice covering the whole vector)."""
    exact = exact_topk(emb, queries, k=10, metric="ip")
    ms = maxsim_topk(emb, queries, dim=64, n_parts=1, k=10, fetch_k=30)
    a = {(r["query_id"], r["vec_id"], r["rank"], r["score"]) for r in exact.collect()}
    b = {(r["query_id"], r["doc_id"], r["rank"], r["score"]) for r in ms.collect()}
    assert a == b


def test_results_within_phase1_candidates(emb, queries):
    fetch_k = 20
    cand = exact_topk(emb, queries, k=fetch_k, metric="ip")
    allowed = {(r["query_id"], r["vec_id"]) for r in cand.collect()}
    ms = maxsim_topk(emb, queries, dim=64, n_parts=4, k=10, fetch_k=fetch_k)
    assert all(
        (r["query_id"], r["doc_id"]) in allowed for r in ms.collect()
    )
