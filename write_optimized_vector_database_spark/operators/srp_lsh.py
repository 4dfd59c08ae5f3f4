"""SRP-LSH (signed random projection) — cosine-family ANN, method #2.

Complements IVF (operators/ivf.py): instead of centroid posting lists,
every vector gets an n-bit bucket id — bit b is the sign of its inner
product with hyperplane b. Cosine-similar vectors collide with
probability 1 - θ/π per bit. Queries probe their own bucket plus all
buckets at Hamming distance ≤ 1 (multi-probe), then rerank exactly.

Scale shape: bucketing is a single scan (the bucket id is just an int
column — partition or z-order by it); probing is an equi-join on an
exploded probe list (n_planes+1 rows per query), so candidate volume is
bucket-bounded, never O(n·q). The bucket column also feeds the
embedding near-dup join (pairs within a bucket).

Hyperplanes are data rows at a fixed stride (deterministic, no RNG), so
the whole pipeline — including bucket ids — is bit-reproducible and has
an exact DuckDB twin (queries_ext.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.functions.distance import dot_product
from write_optimized_vector_database_spark.operators.topk import score_column, topk_per_group


def planes_from_stride(
    vectors: DataFrame, stride: int, n_planes: int,
    vec_id_col: str = "vec_id", vec_col: str = "embedding",
) -> list[list[float]]:
    """First n_planes vectors at id-stride positions, as driver-side
    lists (planes are tiny: n_planes × dim doubles)."""
    rows = (
        vectors.filter(F.col(vec_id_col) % stride == 0)
        .orderBy(vec_id_col)
        .limit(n_planes)
        .select(vec_col)
        .collect()
    )
    return [[float(x) for x in r[0]] for r in rows]


def bucket_column(vec_col: str, planes: list[list[float]]) -> Column:
    """n-bit SRP bucket id: bit b set iff <v, plane_b> > 0. The inner
    product is the JVM fold (bit-identical to the oracle), and the bit
    sum is integer arithmetic — fully deterministic."""
    bits = [
        F.when(
            dot_product(F.col(vec_col), F.array(*[F.lit(x) for x in plane])) > 0,
            F.lit(1 << b),
        ).otherwise(F.lit(0))
        for b, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def probe_buckets(bucket: Column, n_planes: int) -> Column:
    """Array of bucket ids at Hamming distance ≤ 1 (own bucket + each
    single-bit flip) — the multi-probe set."""
    return F.array(
        bucket, *[bucket.bitwiseXOR(F.lit(1 << b)) for b in range(n_planes)]
    )


def srp_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    metric: str = "ip",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe SRP ANN: bucket the collection once, explode each
    query's probe set, equi-join on bucket, exact rerank, top-k."""
    n_planes = len(planes)
    bucketed = vectors.withColumn("__bucket", bucket_column(vec_col, planes))
    probes = queries.select(
        "query_id",
        "query_vec",
        F.explode(
            probe_buckets(bucket_column("query_vec", planes), n_planes)
        ).alias("__bucket"),
    )
    cand = bucketed.join(F.broadcast(probes), "__bucket").select(
        "query_id",
        F.col(vec_id_col).alias("vec_id"),
        score_column(metric, "query_vec", vec_col).alias("score"),
    )
    # a vector can appear via several probes of the same query — dedup
    cand = cand.dropDuplicates(["query_id", "vec_id"])
    return topk_per_group(
        cand, group_cols=["query_id"], score_col="score", id_col="vec_id", k=k
    ).select("query_id", "vec_id", "score", "rank")
