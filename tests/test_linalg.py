"""Quantized power iteration (operators/linalg.py): determinism and
convergence on planted-signal data."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.linalg import (
    normalize_exact,
    power_iteration_loadings,
    quantized_matvec,
)

DIM = 16


def _planted(spark, n=400, strength=6.0, seed=7):
    """Rows = noise + a strong planted direction: λ1/λ2 is large, so a
    couple of power steps must align with the plant."""
    rng = np.random.RandomState(seed)
    direction = rng.randn(DIM)
    direction /= np.linalg.norm(direction)
    coef = rng.randn(n, 1) * strength
    x = rng.randn(n, DIM) + coef * direction[None, :]
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, f"vec_id long, embedding array<float>"),
        direction,
    )


def test_power_iteration_converges_on_planted_signal(spark):
    df, direction = _planted(spark)
    out = power_iteration_loadings(df, dim=DIM, sync_iters=2)
    v = np.array([r.loading for r in out.orderBy("d").collect()])
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-9
    cos = abs(float(v @ direction))
    assert cos > 0.99, f"planted direction not recovered: cos={cos}"


def test_quantized_matvec_is_partitioning_invariant(spark):
    """The determinism contract: the exact-integer matvec result must be
    identical whatever the partition layout — that is the property that
    makes the iterative loop hash-checkable."""
    df, _ = _planted(spark, n=100)
    vlit = F.array(*[F.lit(1.0) for _ in range(DIM)])
    a = {r.d: r.w for r in quantized_matvec(df.repartition(1), vlit).collect()}
    b = {r.d: r.w for r in quantized_matvec(df.repartition(13, "vec_id"), vlit).collect()}
    assert a == b


def test_normalize_exact_matches_ieee():
    ws = [3, -4, 12]
    v = normalize_exact(ws)
    norm = math.sqrt(9 + 16 + 144)
    assert v == [3.0 / norm, -4.0 / norm, 12.0 / norm]
    assert abs(sum(x * x for x in v) - 1.0) < 1e-12


def test_power_iteration_guards(spark):
    """Degenerate inputs fail loudly, not with KeyError/ZeroDivisionError
    (ADVICE r04): an empty frame has no dimension rows at the sync point."""
    import pytest as _pytest

    from write_optimized_vector_database_spark.operators.linalg import (
        normalize_exact,
        power_iteration_loadings,
    )

    empty = spark.createDataFrame([], "embedding array<double>")
    with _pytest.raises(ValueError, match="degenerated"):
        power_iteration_loadings(empty, dim=4).collect()
    with _pytest.raises(ValueError, match="degenerated"):
        normalize_exact([0, 0, 0])
