"""QueryRequest API parity (types.h:67-82): batch execution, caps,
filter wildcards, result shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.api import QueryRequest, run_batch, validate_batch
from write_optimized_vector_database_spark.collection import VectorCollection
from write_optimized_vector_database_spark.config import DEFAULT_CONFIG
from write_optimized_vector_database_spark.operators.changelog import synthetic_changelog


@pytest.fixture(scope="module")
def coll(spark, tmp_path_factory, sf_dir):
    c = VectorCollection(spark, str(tmp_path_factory.mktemp("api") / "c"), metric="ip")
    c.ingest(synthetic_changelog(spark, sf_dir))
    c.compact()
    return c


@pytest.fixture(scope="module")
def qvecs(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 3)
        .collect()
    )
    return {r.vec_id: list(r.embedding) for r in rows}


def test_batch_caps_enforced(qvecs):
    v = next(iter(qvecs.values()))
    with pytest.raises(ValueError, match="max_batch_queries"):
        validate_batch([QueryRequest(query=v)] * 101)
    with pytest.raises(ValueError, match="top_k"):
        validate_batch([QueryRequest(query=v, top_k=101)])
    with pytest.raises(ValueError, match="empty"):
        validate_batch([])


def test_batch_query_roundtrip(coll, qvecs):
    reqs = [QueryRequest(query=v, top_k=5, query_id=qid) for qid, v in qvecs.items()]
    out = run_batch(coll, reqs).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(qvecs)
    for qid, rows in by_q.items():
        assert len(rows) == 5
        best = min(rows, key=lambda r: r.rank)
        assert best.id == qid  # self-match at rank 1 (id present & visible)
        assert best.tags is not None  # QueryResult carries tags (types.h:81)


def test_batch_with_filters(coll, qvecs):
    reqs = [
        QueryRequest(query=v, top_k=5, tenant="t0", query_id=qid)
        for qid, v in qvecs.items()
    ]
    out = run_batch(coll, reqs).collect()
    assert all(r.id % 2 == 0 for r in out)  # tenant t0 = even ids


def test_indexed_batch_respects_filters(coll, qvecs):
    """use_index=True must intersect QueryRequest filters with the
    candidate set (reference probe-path intersection, msg-buf.h:236-255)
    — filtered requests previously fell through to unfiltered results."""
    coll.build_ivf_index(nlist=8)
    reqs = [
        QueryRequest(query=v, top_k=5, tenant="t0", query_id=qid)
        for qid, v in qvecs.items()
    ]
    out = run_batch(coll, reqs, use_index=True).collect()
    assert out, "indexed filtered batch returned nothing"
    assert all(r.id % 2 == 0 for r in out)  # tenant t0 = even ids


def test_indexed_batch_via_two_phase_stable_index(spark, tmp_path, sf_dir, qvecs):
    """A collection indexed ONLY via build_indexes() (the flagship stable
    PQ index, no plain-IVF index on disk) must serve use_index=True
    requests through topk_two_phase — filtered and unfiltered. Before
    r07 this errored (topk_ivf read the absent index_ivf) or dropped
    filters."""
    c = VectorCollection(spark, str(tmp_path / "c2p"), metric="ip")
    c.ingest(synthetic_changelog(spark, sf_dir))
    c.compact()
    c.build_indexes(nlist=8, m=8, nbits=8)
    reqs = [
        QueryRequest(query=v, top_k=5, tenant="t0", query_id=qid)
        for qid, v in qvecs.items()
    ]
    out = run_batch(c, reqs, use_index=True).collect()
    assert out, "indexed filtered batch returned nothing"
    assert all(r.id % 2 == 0 for r in out)  # tenant t0 = even ids
    # unfiltered goes through the same stable path
    reqs_u = [QueryRequest(query=v, top_k=5, query_id=qid) for qid, v in qvecs.items()]
    out_u = run_batch(c, reqs_u, use_index=True).collect()
    assert {r.query_id for r in out_u} == set(qvecs)


def test_mixed_filter_batch(coll, qvecs):
    v = list(qvecs.values())[0]
    reqs = [
        QueryRequest(query=v, top_k=3, tenant="t0", query_id=0),
        QueryRequest(query=v, top_k=3, tenant="t1", query_id=1),
    ]
    out = run_batch(coll, reqs).collect()
    g0 = [r for r in out if r.query_id == 0]
    g1 = [r for r in out if r.query_id == 1]
    assert all(r.id % 2 == 0 for r in g0) and len(g0) == 3
    assert all(r.id % 2 == 1 for r in g1) and len(g1) == 3


def test_run_upsert_caps_and_ingests(spark, tmp_path):
    from write_optimized_vector_database_spark.api import run_upsert
    from write_optimized_vector_database_spark.collection import VectorCollection

    ddl = (
        "op string, id long, tenant string, namespace string, "
        "vector array<float>, tags array<int>, epoch long"
    )
    rows = [("UPSERT", i, "t", "ns", [float(i), 1.0], [1], i) for i in range(5)]
    c = VectorCollection(spark, str(tmp_path / "u"), metric="ip")
    n = run_upsert(c, spark.createDataFrame(rows, ddl))
    assert n == 5 and c.current().count() == 5

    import pytest as _pytest

    from write_optimized_vector_database_spark.config import (
        DEFAULT_CONFIG,
        EngineConfig,
    )
    from dataclasses import replace

    tiny = replace(
        DEFAULT_CONFIG, limits=replace(DEFAULT_CONFIG.limits, max_upsert_batch=3)
    )
    with _pytest.raises(ValueError, match="max_upsert_batch"):
        run_upsert(c, spark.createDataFrame(rows, ddl), config=tiny)
    with _pytest.raises(ValueError, match="unknown op"):
        run_upsert(
            c,
            spark.createDataFrame(
                [("NOPE", 9, "t", "ns", [0.0, 0.0], [1], 9)], ddl
            ),
        )
