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


def _fold_dots_np(v, planes):
    """Per-plane inner products with EXACT left-to-right fold semantics:
    elementwise products then `np.cumsum` (a sequential prefix sum), so
    every double op matches the JVM `F.aggregate` fold — and therefore
    the DuckDB `list_inner_product` oracle — bit for bit, while running
    as vectorized C loops instead of per-row codegen expression trees.
    Returns (n, n_planes)."""
    import numpy as np

    p = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)
    out = np.empty((len(v), len(p)), dtype=np.float64)
    for b in range(len(p)):
        out[:, b] = np.cumsum(v * p[b][None, :], axis=1)[:, -1]
    return out


def srp_buckets_np(v, tables):
    """Bucket id per (row, table) for a (n, dim) float64 matrix — the
    driver/Arrow twin of `bucket_column`. Returns (n, n_tables) int32."""
    import numpy as np

    n_planes = len(tables[0])
    flat = [plane for planes in tables for plane in planes]
    dots = _fold_dots_np(v, flat)  # (n, n_tables·n_planes)
    bits = (dots > 0).astype(np.int64)
    weights = np.asarray([1 << b for b in range(n_planes)], dtype=np.int64)
    out = np.empty((len(v), len(tables)), dtype=np.int32)
    for t in range(len(tables)):
        out[:, t] = bits[:, t * n_planes : (t + 1) * n_planes] @ weights
    return out


def srp_index_np(
    vectors: DataFrame,
    tables: list[list[list[float]]],
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table, bucket) via ONE Arrow pass — the production
    bucketing path. All r·n_planes dot products per row happen as NumPy
    array ops per batch instead of r·n_planes JVM folds per row (the
    round-1 2× lever on vec_srp_multitable_topk); the cumsum fold
    discipline keeps bucket ids bit-identical to the `srp_index`
    fold/oracle variant, which stays as the cross-checkable twin."""
    import numpy as np
    from pyspark.sql import types as T

    from write_optimized_vector_database_spark.functions.nputil import arrow_matrix

    def fn(batches):
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            v = arrow_matrix(batch, vec_col)  # list buffer → (n, dim)
            buckets = srp_buckets_np(v, tables)  # (n, r)
            r = buckets.shape[1]
            ids = batch.column(batch.schema.get_field_index(vec_id_col))
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(pa.array(np.repeat(np.arange(n), r))),
                    pa.array(np.tile(np.arange(r, dtype=np.int32), n), pa.int32()),
                    pa.array(buckets.reshape(-1).astype(np.int32), pa.int32()),
                ],
                names=[vec_id_col, "table", "bucket"],
            )

    schema = T.StructType(
        [
            T.StructField(vec_id_col, vectors.schema[vec_id_col].dataType),
            T.StructField("table", T.IntegerType()),
            T.StructField("bucket", T.IntegerType()),
        ]
    )
    return vectors.select(vec_id_col, vec_col).mapInArrow(fn, schema=schema)


def multitable_planes_from_stride(
    vectors: DataFrame, stride: int, n_planes: int, n_tables: int,
    vec_id_col: str = "vec_id", vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """n_tables independent plane sets from one stride scan — table t
    gets planes [t·n_planes, (t+1)·n_planes)."""
    flat = planes_from_stride(
        vectors, stride, n_planes * n_tables, vec_id_col, vec_col
    )
    if len(flat) < n_planes * n_tables:
        raise ValueError(
            f"stride {stride} yields {len(flat)} planes < {n_planes}×{n_tables}"
        )
    return [flat[t * n_planes : (t + 1) * n_planes] for t in range(n_tables)]


def srp_index(
    vectors: DataFrame,
    tables: list[list[list[float]]],
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table, bucket) — one bucket per vector per table, from a
    single scan. The index rows are three ints: at 100 TB the index is
    ~r·16 bytes/vector, a side table you partition by (table, bucket);
    full vectors are only fetched for the final rerank, by id."""
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                bucket_column(vec_col, planes).alias("bucket"),
            )
            for t, planes in enumerate(tables)
        ]
    )
    return vectors.select(
        F.col(vec_id_col), F.explode(entries).alias("e")
    ).select(vec_id_col, "e.table", "e.bucket")


def srp_multitable_topk(
    vectors: DataFrame,
    queries: DataFrame,
    tables: list[list[list[float]]],
    k: int = 10,
    metric: str = "ip",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """Multi-table multi-probe SRP ANN: r independent plane tables; a
    query's candidates are the union over tables of its Hamming≤1 probe
    buckets. r tables drive miss probability down exponentially
    ((1-p^n)^r) where one table needs many probes for the same recall.

    Shuffle shape: the (table, bucket) equi-join is the only wide op
    before rerank; probes are broadcast (r·(n_planes+1) rows/query).

    `impl="arrow"` (production default) buckets the collection in one
    Arrow/NumPy pass and the ≤100 queries driver-side; `impl="fold"`
    uses the per-plane JVM folds. The cumsum fold discipline makes both
    produce bit-identical buckets — "fold" remains as the directly
    SQL-shaped twin and cross-check."""
    n_planes = len(tables[0])
    if impl == "arrow":
        import numpy as np
        from pyspark.sql import types as T

        idx = srp_index_np(vectors, tables, vec_id_col, vec_col)
        # queries are ≤100 by the batch contract (config.h:180) — a
        # bounded collect; probes are r·(n_planes+1) ints per query
        qrows = queries.select("query_id", "query_vec").collect()
        qv = np.asarray([np.asarray(r.query_vec, dtype=np.float64) for r in qrows])
        qb = srp_buckets_np(qv, tables)
        probe_rows = [
            (r.query_id, t, int(b) ^ flip)
            for qi, r in enumerate(qrows)
            for t in range(len(tables))
            for b in (qb[qi, t],)
            for flip in (0, *(1 << i for i in range(n_planes)))
        ]
        probes = queries.sparkSession.createDataFrame(
            probe_rows,
            T.StructType(
                [
                    T.StructField("query_id", queries.schema["query_id"].dataType),
                    T.StructField("table", T.IntegerType()),
                    T.StructField("bucket", T.IntegerType()),
                ]
            ),
        )
    else:
        idx = srp_index(vectors, tables, vec_id_col, vec_col)
        probe_entries = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    probe_buckets(
                        bucket_column("query_vec", planes), n_planes
                    ).alias("buckets"),
                )
                for t, planes in enumerate(tables)
            ]
        )
        probes = (
            queries.select("query_id", F.explode(probe_entries).alias("e"))
            .select("query_id", "e.table", F.explode("e.buckets").alias("bucket"))
        )
    cand_ids = (
        idx.join(F.broadcast(probes), ["table", "bucket"])
        .select("query_id", F.col(vec_id_col).alias("vec_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    full = vectors.select(
        F.col(vec_id_col).alias("vec_id"), F.col(vec_col).alias("__vec")
    )
    rescored = (
        cand_ids.join(full, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "vec_id",
            score_column(metric, "query_vec", "__vec").alias("score"),
        )
    )
    return topk_per_group(
        rescored, group_cols=["query_id"], score_col="score", id_col="vec_id", k=k
    ).select("query_id", "vec_id", "score", "rank")


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
