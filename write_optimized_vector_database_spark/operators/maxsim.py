"""Late-interaction (maxsim) scoring — the ColBERT formulation
(Khattab & Zaharia, SIGIR 2020, public knowledge): documents and
queries are BAGS of vectors, and

    score(q, d) = Σ_{qp ∈ q} max_{dp ∈ d} ⟨qp, dp⟩

Serving shape (and why it scales): the quadratic part-x-part blowup
never runs against the collection — a single-vector phase-1 (exact,
IVF, IVFPQ, SQ8, ...) prunes to `fetch_k` candidates per query, and
maxsim reranks only those pairs: |queries|·fetch_k·P² part products,
all JVM-side folds.

Float discipline: inner products are left-to-right folds
(list_inner_product order), the inner max is exact (order-free), and
the outer Σ over query parts is a pivot summed in pinned part order —
the whole rerank hash-checks against DuckDB.

Multi-vector input: `explode_parts` derives P part-vectors by splitting
a dim-D vector into D/P slices — the deterministic stand-in for a real
per-token embedder (the Spark plumbing — long-form layout, joins,
pivot — is identical either way).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.functions.distance import dot_product
from write_optimized_vector_database_spark.operators.pq import explode_subspaces
from write_optimized_vector_database_spark.operators.topk import (
    exact_topk,
    topk_per_group,
)


def explode_parts(
    vectors: DataFrame, dim: int, parts: int,
    vec_col: str = "embedding", id_col: str = "vec_id", out_id: str | None = None,
) -> DataFrame:
    """(id, part, pv) long form — the multi-vector bag per id."""
    out = explode_subspaces(vectors, dim, parts, vec_col, id_col, out_id)
    return out.withColumnRenamed("subspace", "part").withColumnRenamed("sv", "pv")


def maxsim_rerank(
    cand_pairs: DataFrame,
    query_parts: DataFrame,
    doc_parts: DataFrame,
    n_parts: int,
    k: int = 10,
) -> DataFrame:
    """Rerank (query_id, doc_id) candidate pairs by maxsim.

    query_parts: (query_id, part, pv); doc_parts: (doc_id, part, pv).
    Inner max over doc parts per (query, doc, query-part), then the
    query-part sums pivot into pinned-order columns.
    """
    qp = query_parts.select(
        "query_id", F.col("part").alias("qpart"), F.col("pv").alias("qpv")
    )
    dp = doc_parts.select(
        "doc_id", F.col("part").alias("dpart"), F.col("pv").alias("dpv")
    )
    pairs = (
        cand_pairs.join(F.broadcast(qp), "query_id")
        .join(dp, "doc_id")
        .select(
            "query_id", "doc_id", "qpart",
            dot_product("qpv", "dpv").alias("ip"),
        )
    )
    per_qpart = pairs.groupBy("query_id", "doc_id", "qpart").agg(
        F.max("ip").alias("m")
    )
    wide = (
        per_qpart.groupBy("query_id", "doc_id")
        .pivot("qpart", list(range(n_parts)))
        .agg(F.first("m"))
    )
    score = reduce(lambda a, b: a + b, [F.col(str(p)) for p in range(n_parts)])
    scored = wide.select("query_id", "doc_id", score.alias("score"))
    return topk_per_group(
        scored, group_cols=["query_id"], score_col="score", id_col="doc_id", k=k,
        prune_partitions=False,
    ).select("query_id", "doc_id", "score", "rank")


def maxsim_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    n_parts: int = 4,
    k: int = 10,
    fetch_k: int = 50,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-phase late interaction: single-vector exact phase-1 prune →
    maxsim rerank of the candidate pairs only."""
    cand = exact_topk(
        vectors, queries, k=fetch_k, metric="ip",
        vec_id_col=vec_id_col, vec_col=vec_col,
    ).select("query_id", F.col("vec_id").alias("doc_id"))
    qparts = explode_parts(queries, dim, n_parts, "query_vec", "query_id")
    dparts = explode_parts(vectors, dim, n_parts, vec_col, vec_id_col, out_id="doc_id")
    return maxsim_rerank(cand, qparts, dparts, n_parts, k=k)
