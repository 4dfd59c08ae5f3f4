"""SQ8 scalar quantization — 8-bit per-dimension codes with asymmetric
distance (the FAISS ``ScalarQuantizer(QT_8bit)`` design, public knowledge).

The reference ships PQ as its compressed first-phase index
(/root/reference/src/cpp/core/config.h:131-136); SQ8 is the simpler
sibling on the same two-phase axis (compressed candidate scan → exact
rerank, config.h:92-93) and is fully deterministic: training is a
per-dimension min/max — order-independent — so unlike k-means there is
no RNG anywhere and the entire pipeline is hash-checkable against a
DuckDB oracle.

Spark shape, and why it holds at 100 TB:

- **Train** = one distributed min/max aggregation over (dim, value)
  pairs. `posexplode` fans each vector into dim rows, but the groupBy
  keys are the dim indices (≤ a few thousand), so map-side partial
  aggregation collapses each partition to ≤dim rows before the shuffle
  — the shuffle carries O(partitions × dim) rows, not O(rows × dim).
  The collected result is dim-sized (bounded, like IVF centroids).
- **Encode** = a JVM `zip_with` over literal per-dim arrays; stays in
  whole-stage codegen, no Python. Codes are `array<int>` (0..255) —
  4× smaller than float32 on the scan path even before parquet's
  byte-packing, and the scan projects ONLY (id, codes).
- **ADC scoring** = reconstruct-and-fold, left-to-right in double —
  bit-identical to DuckDB `list_inner_product` on the reconstructed
  list, same convention as functions/distance.py.
- **Two-phase** = ADC top-(k·rerank_factor) per query (map-side partial
  top-k, operators/topk.py) → join candidates back to the float vectors
  by id → exact rerank. The rerank join touches k·rerank·|queries| rows,
  never the collection.

Rounding uses floor(x + 0.5) — not round() — because Spark's
half-even/half-up choice differs from DuckDB's; floor(+0.5) is the same
double op in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.functions.distance import dot_product
from write_optimized_vector_database_spark.operators.topk import (
    score_column,
    topk_per_group,
)


def train_sq8(vectors: DataFrame, vec_col: str = "embedding") -> tuple[list[float], list[float]]:
    """Per-dimension (vmin, vmax) over the collection.

    Distributed min/max with map-side partials; the driver collects only
    dim rows (same bounded-collect contract as IVF centroids,
    operators/ivf.py). Deterministic: min/max are order-independent, so
    no sampling is needed for reproducibility and the full-table pass is
    a single cheap aggregation even at scale.
    """
    stats = (
        vectors.select(F.posexplode(vec_col).alias("dim", "val"))
        .groupBy("dim")
        .agg(
            F.min(F.col("val").cast("double")).alias("vmin"),
            F.max(F.col("val").cast("double")).alias("vmax"),
        )
        .orderBy("dim")
        .collect()
    )
    vmin = [r["vmin"] for r in stats]
    vmax = [r["vmax"] for r in stats]
    return vmin, vmax


def _lit_array(values: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def sq8_scales(vmin: list[float], vmax: list[float]) -> list[float]:
    """Per-dim step size; 0.0 marks a constant dimension (code pinned 0)."""
    return [0.0 if hi == lo else (hi - lo) / 255.0 for lo, hi in zip(vmin, vmax)]


def encode_sq8(
    vectors: DataFrame,
    vmin: list[float],
    vmax: list[float],
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """code_d = clamp(floor((x_d - vmin_d)/scale_d + 0.5), 0, 255).

    Pure JVM `zip_with` against literal param arrays — whole-stage
    codegen, no Python crossing. Output keeps all input columns plus
    `code_col` as array<int>.
    """
    scales = sq8_scales(vmin, vmax)
    shifted = F.zip_with(
        F.col(vec_col), _lit_array(vmin), lambda x, mn: x.cast("double") - mn
    )
    codes = F.zip_with(
        shifted,
        _lit_array(scales),
        lambda s, sc: F.when(sc == 0.0, F.lit(0)).otherwise(
            F.least(
                F.lit(255),
                F.greatest(F.lit(0), F.floor(s / sc + F.lit(0.5)).cast("int")),
            )
        ),
    )
    return vectors.withColumn(code_col, codes)


def sq8_reconstruct(
    code_col: Column | str, vmin: list[float], vmax: list[float]
) -> Column:
    """x̂_d = vmin_d + code_d · scale_d, as array<double>."""
    code = F.col(code_col) if isinstance(code_col, str) else code_col
    scales = sq8_scales(vmin, vmax)
    scaled = F.zip_with(code, _lit_array(scales), lambda c, sc: c.cast("double") * sc)
    return F.zip_with(scaled, _lit_array(vmin), lambda x, mn: x + mn)


def sq8_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    vmin: list[float],
    vmax: list[float],
    k: int = 10,
    vec_id_col: str = "vec_id",
    code_col: str = "codes",
    query_id_col: str = "query_id",
    query_col: str = "query_vec",
) -> DataFrame:
    """Phase-1 ADC top-k: queries broadcast against the codes-only scan;
    score = <query, reconstruct(codes)> folded left-to-right (matches
    DuckDB list_inner_product bit-for-bit)."""
    recon = sq8_reconstruct(code_col, vmin, vmax)
    scored = codes.join(F.broadcast(queries)).select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_id_col).alias("vec_id"),
        dot_product(F.col(query_col), recon).alias("adc_score"),
    )
    return topk_per_group(
        scored, group_cols=["query_id"], score_col="adc_score", id_col="vec_id", k=k
    )


def sq8_two_phase_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank_factor: int = 4,
    metric: str = "ip",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_col: str = "query_vec",
) -> DataFrame:
    """Train → encode → ADC candidates (k·rerank_factor) → exact rerank.

    The rerank joins the candidate ids (tiny: |queries|·k·rerank rows)
    back to the float vectors — the collection is scanned once for codes
    and probed by id for rerank, never fully re-scored.
    """
    vmin, vmax = train_sq8(vectors, vec_col)
    codes = encode_sq8(
        vectors.select(vec_id_col, vec_col), vmin, vmax, vec_col, "codes"
    ).select(vec_id_col, "codes")
    cands = sq8_adc_topk(
        codes,
        queries,
        vmin,
        vmax,
        k=k * rerank_factor,
        vec_id_col=vec_id_col,
        query_id_col=query_id_col,
        query_col=query_col,
    ).select("query_id", "vec_id")
    reranked = (
        cands.join(
            vectors.select(
                F.col(vec_id_col).alias("vec_id"), F.col(vec_col).alias("__vec")
            ),
            "vec_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(query_id_col).alias("query_id"),
                    F.col(query_col).alias("__qvec"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            "vec_id",
            score_column(metric, "__qvec", "__vec").alias("score"),
        )
    )
    return topk_per_group(
        reranked, group_cols=["query_id"], score_col="score", id_col="vec_id", k=k
    ).select("query_id", "vec_id", "score", "rank")
