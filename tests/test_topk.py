"""Exact top-k vs a NumPy brute-force oracle (SURVEY §5.1)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.topk import exact_topk
from write_optimized_vector_database_spark.sources.tables import load_table


def _numpy_topk(vectors: np.ndarray, ids: np.ndarray, queries: np.ndarray, k: int, metric: str):
    if metric == "ip":
        scores = queries @ vectors.T
    elif metric == "cosine":
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        vn = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
        scores = qn @ vn.T
    elif metric == "l2":
        scores = -np.sqrt(
            ((queries[:, None, :] - vectors[None, :, :]) ** 2).sum(-1)
        )
    out = []
    for qi in range(len(queries)):
        # sort by (-score, id) for deterministic ties
        order = np.lexsort((ids, -scores[qi]))[:k]
        out.append([(int(ids[j]), float(scores[qi, j])) for j in order])
    return out


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, vecs


@pytest.mark.parametrize("metric", ["ip", "l2", "cosine"])
@pytest.mark.parametrize("prune", [True, False])
def test_exact_topk_matches_numpy(spark, sf_dir, emb_np, metric, prune):
    ids, vecs = emb_np
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    k = 10
    got = exact_topk(emb, queries, k=k, metric=metric, prune_partitions=prune).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.score))

    qmask = ids < 5
    expected = _numpy_topk(vecs, ids, vecs[qmask], k, metric)
    qids = ids[qmask]
    for qi, qid in enumerate(qids):
        got_ids = [vid for vid, _ in by_q[int(qid)]]
        exp_ids = [vid for vid, _ in expected[qi]]
        assert got_ids == exp_ids, f"query {qid} metric {metric}"
        for (gv, gs), (ev, es) in zip(by_q[int(qid)], expected[qi]):
            assert abs(gs - es) < 1e-9

    # self-match: rank 1 of each query is the query vector itself
    for qid in qids:
        assert by_q[int(qid)][0][0] == int(qid)


def test_topk_rank_is_dense_and_bounded(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = exact_topk(emb, queries, k=7, metric="ip")
    pdf = out.toPandas()
    assert set(pdf.groupby("query_id")["rank"].max()) == {7}
    assert set(pdf.groupby("query_id")["rank"].apply(lambda s: sorted(s) == list(range(1, 8)))) == {True}
