"""SQ8 scalar-quantization gates: code bounds, reconstruction error,
and two-phase recall vs the exact scan (the same ≥0.95 recall contract
the PQ path carries, reference types.h:140)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.ivf import recall_at_k
from write_optimized_vector_database_spark.operators.sq8 import (
    encode_sq8,
    sq8_reconstruct,
    sq8_two_phase_topk,
    train_sq8,
)
from write_optimized_vector_database_spark.operators.topk import exact_topk
from write_optimized_vector_database_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@pytest.fixture(scope="module")
def params(emb):
    return train_sq8(emb)


def test_train_shapes(emb, params):
    vmin, vmax = params
    dim = len(emb.select(F.size("embedding").alias("d")).first()["d"] * [0])
    assert len(vmin) == dim and len(vmax) == dim
    assert all(lo <= hi for lo, hi in zip(vmin, vmax))


def test_codes_bounded(emb, params):
    vmin, vmax = params
    codes = encode_sq8(emb, vmin, vmax)
    bad = codes.filter(
        F.exists("codes", lambda c: (c < 0) | (c > 255))
    ).count()
    assert bad == 0


def test_reconstruction_error_within_half_step(emb, params):
    """|x - x̂| ≤ scale/2 per dimension (+ float slack) — the defining
    property of round-to-nearest scalar quantization."""
    vmin, vmax = params
    step = max(
        (hi - lo) / 255.0 for lo, hi in zip(vmin, vmax) if hi > lo
    )
    codes = encode_sq8(emb, vmin, vmax)
    err = codes.select(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                sq8_reconstruct("codes", vmin, vmax),
                lambda x, r: F.abs(x.cast("double") - r),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err")
    ).agg(F.max("max_err").alias("m")).first()["m"]
    assert err <= step / 2 + 1e-9


def test_two_phase_recall(emb, queries):
    exact = exact_topk(emb, queries, k=10, metric="ip")
    approx = sq8_two_phase_topk(emb, queries, k=10, rerank_factor=4, metric="ip")
    r = recall_at_k(approx, exact, k=10).agg(F.avg("recall").alias("r")).first()["r"]
    assert r >= 0.95, f"SQ8 two-phase recall {r} < 0.95"
