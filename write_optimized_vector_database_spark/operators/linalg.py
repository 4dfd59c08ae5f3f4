"""Iterative distributed linear algebra under the engine's determinism
discipline.

Spark's iterative-algorithm family (PageRank, ALS, PCA power iteration)
loops a distributed pass around a small driver-synchronized state. The
pattern here makes such loops HASH-CHECKABLE across engines: each
matvec quantizes its per-row contributions to integer micro-units
BEFORE the per-dimension sum, so every sync point is an exact integer
vector — partitioning and float summation order never reach the result.
Normalization divides the exact integers back to double once per
iteration (identical IEEE ops in Spark, Python and DuckDB).

Convergence is the textbook power-iteration rate (λ2/λ1 per step): on
near-isotropic data many steps would be needed, on data with a planted
dominant direction a couple of steps suffice — see
tests/test_linalg.py for the planted-signal gate.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000.0


def quantized_matvec(df: DataFrame, vlit: Column, vec_col: str = "embedding") -> DataFrame:
    """One distributed (X'X)v step: returns (d, w) with
    w_d = Σ_i floor(<x_i, v> · x_id · 1e6 + ½) as exact BIGINTs.

    The score fold runs JVM-side (same left-to-right double fold as the
    top-k scorer); the fan-out is posexplode with map-side partial
    aggregation, so the shuffle carries |dims| rows per partition."""
    from write_optimized_vector_database_spark.functions.distance import dot_product

    s = dot_product(vlit, vec_col)
    return (
        df.select(s.alias("s"), F.posexplode(vec_col).alias("d", "x"))
        .select(
            "d",
            F.floor(F.col("s") * F.col("x").cast("double") * SCALE + F.lit(0.5))
            .cast("long")
            .alias("q"),
        )
        .groupBy("d")
        .agg(F.sum("q").alias("w"))
    )


def normalize_exact(ws: list[int]) -> list[float]:
    """v = w / ‖w‖ from exact integers — float(int) and sqrt are the
    same IEEE round-to-nearest ops DuckDB applies to the same integers."""
    norm = math.sqrt(sum(wi * wi for wi in ws))
    if norm == 0.0:
        raise ValueError(
            "power iteration degenerated: all quantized weights are zero "
            "(empty input, all-zero vectors, or SCALE too coarse for the "
            "data's magnitude)"
        )
    return [float(wi) / norm for wi in ws]


def power_iteration_loadings(
    df: DataFrame, dim: int, vec_col: str = "embedding", sync_iters: int = 1
) -> DataFrame:
    """`sync_iters` driver-synchronized (X'X)v steps from v0 = 1⃗, then a
    final IN-PLAN step with exact-decimal normalization: returns
    (d INT, w_units BIGINT, loading DOUBLE). Driver state is O(dim) per
    sync — the dim-sized vector every iterative Spark algorithm syncs."""
    from pyspark.sql import Window

    v = [1.0] * dim
    for _ in range(sync_iters):
        vlit = F.array(*[F.lit(float(x)) for x in v])
        rows = {int(r.d): int(r.w) for r in quantized_matvec(df, vlit, vec_col).collect()}
        # rows.get: a dimension absent from every row (empty input, or
        # vectors shorter than `dim`) contributes zero weight instead of
        # a KeyError; the all-zero case is caught by normalize_exact
        v = normalize_exact([rows.get(d, 0) for d in range(dim)])
    w_final = quantized_matvec(df, F.array(*[F.lit(x) for x in v]), vec_col)
    d38 = "decimal(38,0)"
    norm_sq = F.sum((F.col("w").cast(d38) * F.col("w").cast(d38)).cast(d38)).over(
        Window.partitionBy()
    )
    return w_final.select(
        F.col("d").cast("int").alias("d"),
        F.col("w").alias("w_units"),
        (F.col("w").cast("double") / F.sqrt(norm_sq.cast("double"))).alias("loading"),
    ).orderBy("d")
