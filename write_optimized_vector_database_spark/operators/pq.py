"""Product quantization (PQ) — compressed scan + asymmetric distance.

Reference (/root/reference/src/cpp/core/config.h:84-94, types.h:136-137;
ivf-pq.cpp 0-byte): stable segments store m=96 × 8-bit codes per vector;
a query builds a lookup table (LUT) of per-subspace partial distances
and scans codes; a final exact rerank on `rerank_factor × top_k`
candidates restores recall (config.h:92-93, two-phase config.h:132).

Spark design:
- codebooks: per-subspace KMeans over a hash-sample; a tiny table
  (m × 2^nbits rows) broadcast to every task;
- encode: one vectorized mapInPandas pass — per Arrow batch a NumPy
  argmin per subspace produces an `array<smallint>` codes column; the
  codes table is ~m bytes/vector instead of 4·dim (the compression that
  lets a 100 TB collection's scan fit in page cache);
- ADC scan: queries → LUT (NumPy, driver-side, ≤100 queries × m × k_sub
  doubles) → mapInPandas gather-sum over the codes column;
- two-phase: ADC top-(rerank_factor·k) per query, join **back to the
  full-vector table by id** (sort-merge at scale; the candidate side is
  tiny so AQE turns it into a broadcast), exact re-score, final top-k.

A stride-sampled deterministic codebook variant makes the whole
pipeline SQL-expressible for the DuckDB oracle (queries_ext.py); the
KMeans path is recall-gated in tests/test_pq.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.functions.hashing import deterministic_sample
from write_optimized_vector_database_spark.operators.topk import score_column, topk_per_group


def subspace_dims(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    return dim // m


def train_pq_codebooks_kmeans(
    vectors: DataFrame,
    dim: int,
    m: int,
    nbits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """Per-subspace KMeans codebooks → (subspace, code, cvec).

    Trains on a deterministic hash-sample collected to the driver (PQ
    training needs O(2^nbits × 1k) rows per subspace — never the full
    table; reference trains codebooks offline the same way).
    """
    d_sub = subspace_dims(dim, m)
    k = 2**nbits
    train = vectors
    if sample_fraction is not None and sample_fraction < 1.0:
        train = train.filter(deterministic_sample(id_col, sample_fraction, salt="pq"))
    sample = np.asarray(
        [r[0] for r in train.select(vec_col).collect()], dtype=np.float64
    )
    rng = np.random.RandomState(seed)
    rows = []
    for s in range(m):
        sub = sample[:, s * d_sub : (s + 1) * d_sub]
        centers = _kmeans_np(sub, k, rng)
        rows.extend(
            (s, int(c), [float(x) for x in centers[c]]) for c in range(len(centers))
        )
    return vectors.sparkSession.createDataFrame(
        rows, "subspace int, code int, cvec array<double>"
    )


def _kmeans_np(x: np.ndarray, k: int, rng) -> np.ndarray:
    """Small in-driver Lloyd's k-means (codebooks are tiny; MLlib KMeans
    per subspace would spin m Spark jobs for kilobytes of data)."""
    k = min(k, len(x))
    centers = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(15):
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                centers[c] = x[mask].mean(0)
    return centers


def codebooks_from_stride(
    vectors: DataFrame,
    dim: int,
    m: int,
    stride: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic codebooks: every `stride`-th vector's subvectors.
    SQL-expressible twin for the oracle-checked PQ queries."""
    d_sub = subspace_dims(dim, m)
    subspaces = F.array(
        *[
            F.struct(
                F.lit(s).alias("subspace"),
                F.slice(F.col(vec_col), s * d_sub + 1, d_sub)
                .cast("array<double>")
                .alias("cvec"),
            )
            for s in range(m)
        ]
    )
    return (
        vectors.filter(F.col(id_col) % stride == 0)
        .select((F.col(id_col) / stride).cast("int").alias("code"), F.explode(subspaces).alias("e"))
        .select("e.subspace", "code", "e.cvec")
    )


def explode_subspaces(
    vectors: DataFrame,
    dim: int,
    m: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_id: str | None = None,
) -> DataFrame:
    """(id, subspace, sv) long form — each vector split into m subvectors."""
    d_sub = subspace_dims(dim, m)
    arr = F.array(
        *[
            F.struct(
                F.lit(s).alias("subspace"),
                F.slice(F.col(vec_col), s * d_sub + 1, d_sub)
                .cast("array<double>")
                .alias("sv"),
            )
            for s in range(m)
        ]
    )
    return vectors.select(
        F.col(id_col).alias(out_id or id_col), F.explode(arr).alias("e")
    ).select(out_id or id_col, "e.subspace", "e.sv")


def pq_encode_exact(
    vectors: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Long-form encode (id, subspace, code) via the JVM distance fold —
    bit-identical to the DuckDB oracle's list_distance ordering (ties on
    ascending code). The NumPy `pq_encode` is the production path."""
    from pyspark.sql import Window

    from write_optimized_vector_database_spark.functions.distance import l2_distance

    sub = explode_subspaces(vectors, dim, m, vec_col, id_col)
    joined = sub.join(F.broadcast(codebooks), "subspace").select(
        id_col,
        "subspace",
        "code",
        l2_distance("sv", "cvec").alias("__d"),
    )
    w = Window.partitionBy(id_col, "subspace").orderBy(
        F.col("__d").asc(), F.col("code").asc()
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "subspace", "code")
    )


def pq_two_phase_exact_fold(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int,
    k: int = 10,
    rerank_factor: int = 4,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Oracle-checkable two-phase PQ (inner-product ADC): every float op is
    a JVM fold or an explicitly-ordered sum, matching the DuckDB twin in
    queries_ext bit for bit. Candidate ADC scores sum the m subspace
    terms in subspace order via a pivot (deterministic — a groupBy sum
    over doubles would be partition-order dependent)."""
    from functools import reduce

    from pyspark.sql import Window

    from write_optimized_vector_database_spark.functions.distance import dot_product

    enc = pq_encode_exact(vectors, codebooks, dim, m, vec_col, vec_id_col)
    qsub = explode_subspaces(queries, dim, m, "query_vec", "query_id")
    lut = qsub.join(F.broadcast(codebooks), "subspace").select(
        "query_id", "subspace", "code", dot_product("sv", "cvec").alias("term")
    )
    terms = enc.join(F.broadcast(lut), ["subspace", "code"]).select(
        "query_id", F.col(vec_id_col).alias("vec_id"), "subspace", "term"
    )
    wide = (
        terms.groupBy("query_id", "vec_id")
        .pivot("subspace", list(range(m)))
        .agg(F.first("term"))
    )
    adc_score = reduce(lambda a, b: a + b, [F.col(str(s)) for s in range(m)])
    w = Window.partitionBy("query_id").orderBy(F.col("__adc").desc(), F.col("vec_id").asc())
    cand = (
        wide.withColumn("__adc", adc_score)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k * rerank_factor)
        .select("query_id", "vec_id")
    )
    full = vectors.select(F.col(vec_id_col).alias("vec_id"), F.col(vec_col).alias("__vec"))
    rescored = (
        cand.join(full, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select("query_id", "vec_id", dot_product("query_vec", "__vec").alias("score"))
    )
    return topk_per_group(
        rescored, group_cols=["query_id"], score_col="score", id_col="vec_id", k=k,
        prune_partitions=False,
    ).select("query_id", "vec_id", "score", "rank")


def _codebooks_np(codebooks: DataFrame) -> tuple[np.ndarray, int, int]:
    rows = codebooks.orderBy("subspace", "code").collect()
    m = max(r.subspace for r in rows) + 1
    k = max(r.code for r in rows) + 1
    d_sub = len(rows[0].cvec)
    cb = np.zeros((m, k, d_sub))
    for r in rows:
        cb[r.subspace, r.code] = r.cvec
    return cb, m, k


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add `codes: array<int>` (length m) — nearest codeword per subspace.
    One Arrow pass; per batch the work is m NumPy matrix multiplies."""
    cb, m, k = _codebooks_np(codebooks)
    d_sub = cb.shape[2]
    cb_sq = (cb * cb).sum(-1)  # (m, k)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )  # (n, dim)
            codes = np.empty((len(v), m), dtype=np.int32)
            for s in range(m):
                sub = v[:, s * d_sub : (s + 1) * d_sub]
                d = cb_sq[s][None, :] - 2.0 * (sub @ cb[s].T)
                codes[:, s] = d.argmin(1)
            pdf = pdf.assign(codes=list(codes))
            yield pdf

    from pyspark.sql import types as T

    # note: StructType.add mutates in place — never call it on df.schema
    out_schema = T.StructType(
        list(vectors.schema.fields)
        + [T.StructField("codes", T.ArrayType(T.IntegerType()))]
    )
    return vectors.mapInPandas(fn, schema=out_schema)


def pq_adc_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    metric: str = "ip",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k from codes only (asymmetric distance computation).

    The LUT — per (query, subspace, code) partial score — is built
    driver-side with NumPy and closed over an Arrow-batched scan of the
    codes column: `score = Σ_s LUT[q, s, codes[s]]`, a pure gather-sum
    that never touches full vectors.
    """
    cb, m, _ = _codebooks_np(codebooks)
    d_sub = cb.shape[2]
    qrows = queries.select("query_id", "query_vec").collect()
    qids = np.asarray([r.query_id for r in qrows])
    qv = np.asarray([np.asarray(r.query_vec, dtype=np.float64) for r in qrows])
    # LUT[q, s, c]
    if metric == "ip":
        lut = np.einsum("qsd,skd->qsk", qv.reshape(len(qv), m, d_sub), cb)
    elif metric == "l2":
        diff = qv.reshape(len(qv), m, 1, d_sub) - cb[None, :, :, :]
        lut = -np.sqrt(((diff**2).sum(-1)))  # negated: higher-better
    else:
        raise ValueError(f"ADC unsupported for metric {metric!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s_idx = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            # (q, n): sum over subspaces of LUT[q, s, codes[n, s]]
            scores = lut[:, s_idx, codes].sum(-1)  # lut[:, s, codes[:,s]] → (q, n, m)→sum
            n = len(pdf)
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n),
                    "vec_id": np.tile(pdf[vec_id_col].to_numpy(), len(qids)),
                    "score": scores.reshape(-1),
                }
            )
            yield out

    scored = encoded.select(F.col(vec_id_col), "codes").mapInPandas(
        fn, schema="query_id long, vec_id long, score double"
    )
    return topk_per_group(
        scored, group_cols=["query_id"], score_col="score", id_col="vec_id", k=k
    ).select("query_id", "vec_id", "score", "rank")


def two_phase_topk(
    vectors: DataFrame,
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    rerank_factor: int = 4,
    metric: str = "ip",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-phase search (reference two-phase-engine, config.h:132):
    phase 1 ADC candidates (rerank_factor × k, config.h:93), phase 2
    exact re-score on full vectors fetched by id, final top-k."""
    cand = pq_adc_topk(
        encoded, queries, codebooks, k=k * rerank_factor, metric=metric, vec_id_col=vec_id_col
    ).select("query_id", "vec_id")
    full = vectors.select(
        F.col(vec_id_col).alias("vec_id"), F.col(vec_col).alias("__vec")
    )
    rescored = (
        cand.join(full, "vec_id")
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
