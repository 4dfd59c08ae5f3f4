"""MMR diversity-rerank gates: rank 1 must equal the plain top-1
(λ weighting never displaces the most relevant seed), the output must be
strictly more diverse than the plain top-k, and λ=1 must degenerate to
the plain top-k exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.mmr import _dot, mmr_topk
from write_optimized_vector_database_spark.operators.topk import exact_topk
from write_optimized_vector_database_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _mean_pairwise_sim(emb, picks: dict[int, list[int]]) -> float:
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(
            F.col("vec_id").isin([v for vs in picks.values() for v in vs])
        ).collect()
    }
    sims, n = 0.0, 0
    for vs in picks.values():
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                sims += _dot(vecs[vs[i]], vecs[vs[j]])
                n += 1
    return sims / n


def _collect_picks(df) -> dict[int, list[int]]:
    out: dict[int, list[int]] = {}
    for r in df.orderBy("query_id", "rank").collect():
        out.setdefault(r["query_id"], []).append(r["vec_id"])
    return out


def test_rank1_is_top1_and_lambda1_degenerates(emb, queries):
    plain = _collect_picks(exact_topk(emb, queries, k=10, metric="ip"))
    mmr1 = _collect_picks(mmr_topk(emb, queries, k=10, fetch_k=30, lam=1.0))
    assert mmr1 == plain  # λ=1 → relevance only → identical ranking
    mmr = _collect_picks(mmr_topk(emb, queries, k=10, fetch_k=30, lam=0.7))
    for q in plain:
        assert mmr[q][0] == plain[q][0]


def test_mmr_is_more_diverse_than_plain_topk(emb, queries):
    plain = _collect_picks(exact_topk(emb, queries, k=10, metric="ip"))
    mmr = _collect_picks(mmr_topk(emb, queries, k=10, fetch_k=30, lam=0.5))
    assert _mean_pairwise_sim(emb, mmr) < _mean_pairwise_sim(emb, plain)
