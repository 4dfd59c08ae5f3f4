"""MMR (maximal marginal relevance) diversity rerank — Carbonell &
Goldstein 1998, the standard diversification pass vector stores bolt
onto top-k (public knowledge; the reference's rerank stage,
config.h:92-93, is the natural place it slots into).

Greedy selection: start from the most relevant candidate, then
repeatedly add argmax over remaining candidates of

    λ·relevance(q, c) − (1−λ)·max_{s ∈ selected} sim(c, s)

Scale shape: the ENTIRE greedy loop runs on the phase-1 candidate set —
`fetch_k` rows per query, bounded by the same max_candidates contract as
every rerank (≤ batch·fetch_k rows total, with batch ≤ 100) — so the
driver-side selection is a bounded collect, exactly like IVF probe sets
and PQ LUTs. The collection scan never participates; candidates come
from any phase-1 operator (exact, IVF, IVFPQ, SQ8, SRP).

Float discipline: relevance scores come from the exact_topk JVM fold,
and pairwise sims here accumulate left-to-right in double — both
bit-identical to DuckDB's list_inner_product — so the whole greedy
trajectory (argmax sequence included) is hash-checkable against a
recursive-CTE oracle. Ties break on ascending id at every step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.topk import exact_topk


def _dot(a: list[float], b: list[float]) -> float:
    """Left-to-right double fold — the DuckDB list_inner_product order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def mmr_select(
    cands: list[tuple[int, float, list[float]]], k: int, lam: float
) -> list[int]:
    """Greedy MMR over one query's candidates [(id, score, vec), ...].
    Deterministic: ties on the MMR objective break toward the smaller id.
    O(k · fetch_k) sims per query, all on in-memory candidates."""
    remaining = {c[0]: c for c in cands}
    if not remaining:
        return []
    first = max(remaining.values(), key=lambda c: (c[1], -c[0]))
    selected = [first]
    del remaining[first[0]]
    while len(selected) < k and remaining:
        best = None
        best_key = None
        for cid, score, vec in remaining.values():
            maxsim = max(_dot(vec, s[2]) for s in selected)
            mmr = lam * score - (1.0 - lam) * maxsim
            key = (mmr, -cid)
            if best_key is None or key > best_key:
                best_key, best = key, (cid, score, vec)
        selected.append(best)
        del remaining[best[0]]
    return [c[0] for c in selected]


def mmr_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fetch_k: int = 30,
    lam: float = 0.7,
    metric: str = "ip",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversified top-k: exact phase-1 relevance → bounded candidate
    collect → greedy MMR → (query_id, vec_id, rank).

    `fetch_k` plays the rerank_factor role; the collect is bounded by
    batch·fetch_k rows (reference batch cap 100, config.h:180).
    """
    from write_optimized_vector_database_spark.config import QueryLimits

    limits = QueryLimits()
    if fetch_k > limits.max_candidates:
        raise ValueError(f"fetch_k={fetch_k} exceeds max_candidates")
    cand = exact_topk(
        vectors, queries, k=fetch_k, metric=metric,
        vec_id_col=vec_id_col, vec_col=vec_col,
    )
    with_vecs = cand.join(
        vectors.select(
            F.col(vec_id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("__emb"),
        ),
        "vec_id",
    ).select("query_id", "vec_id", "score", "__emb")
    rows = with_vecs.collect()  # bounded: ≤ |queries| × fetch_k
    by_query: dict = {}
    for r in rows:
        by_query.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["score"], list(r["__emb"]))
        )
    out = []
    for qid, cands in by_query.items():
        for rank, vid in enumerate(mmr_select(cands, k, lam), start=1):
            out.append((qid, vid, rank))
    spark = vectors.sparkSession
    result = spark.createDataFrame(out, "query_id long, vec_id long, rank long")
    return result.orderBy("query_id", "rank")
