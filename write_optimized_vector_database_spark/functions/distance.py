"""Distance / similarity scalar functions over `array<float>` columns.

The reference declares three metrics — INNER_PRODUCT, L2, COSINE, with
cosine reduced to inner product by L2-normalizing at ingest
(/root/reference/include/woved/types.h:38-42,
/root/reference/configs/woved-default.yaml:14). Its SIMD kernels
(/root/reference/CMakeLists.txt:122-132, kernel sources 0-byte) are
replaced here by **JVM-side column expressions**: `zip_with` +
`aggregate` folds stay inside whole-stage codegen, so scoring never
leaves the JVM in the hot path. A NumPy pandas-UDF variant exists in
operators/topk.py for the batched matrix-multiply path where one query
set scores against many vectors at once.

All folds accumulate in DOUBLE, left-to-right over the array — the same
sequential order DuckDB's `list_inner_product` uses, which keeps results
bit-identical to the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Inner product <a, b>, accumulated in double, left-to-right."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def squared_l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(squared_l2_distance(a, b))


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l2_normalize(a: Column | str) -> Column:
    """L2-normalize an array<float> (cosine → inner-product reduction at
    ingest, reference types.h:40). Zero vectors pass through unchanged."""
    a = F.col(a) if isinstance(a, str) else a
    norm = l2_norm(a)
    return F.when(norm == 0.0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda x: x.cast("double") / norm)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = <a,b> / (|a| |b|); 0.0 when either side is zero."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)
