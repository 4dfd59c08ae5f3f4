"""Collection-level IVF index + vacuum (M3 centroid rebuild, S3 retention)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.collection import VectorCollection
from write_optimized_vector_database_spark.operators.changelog import synthetic_changelog
from write_optimized_vector_database_spark.operators.ivf import recall_at_k


@pytest.fixture()
def loaded(spark, tmp_path, sf_dir):
    coll = VectorCollection(spark, str(tmp_path / "c"), metric="ip")
    coll.ingest(synthetic_changelog(spark, sf_dir))
    coll.compact()
    return coll


def test_build_index_and_ann_topk(spark, loaded, sf_dir):
    loaded.build_ivf_index(nlist=8)
    # generation-versioned as of round 12: resolve via the manifest pointer
    idx_dir = loaded._ivf_index_path()
    assert os.path.isdir(idx_dir)
    # partition layout: one dir per centroid
    parts = [d for d in os.listdir(idx_dir) if d.startswith("centroid_id=")]
    assert len(parts) > 1

    queries = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id").isin(1, 2, 4))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    exact = loaded.topk(queries, k=5)
    approx = loaded.topk_ivf(queries, k=5, nprobe=8)  # nprobe=nlist → exact
    rec = recall_at_k(approx, exact, 5)
    assert rec.agg(F.min("recall")).collect()[0][0] == 1.0


def test_vacuum_removes_covered_files(spark, loaded):
    n_before = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(f"{loaded.path}/changelog")
    )
    assert n_before > 0
    removed = loaded.vacuum()
    assert removed == n_before  # snapshot covers the whole log
    # visible view unchanged after vacuum (served from snapshot)
    assert loaded.current().count() == 450

    # new writes after vacuum survive it
    b = spark.createDataFrame(
        [("INSERT", 9001, "t0", "ns0", [0.1] * 64, [1], 10_000_000)],
        "op string, id long, tenant string, namespace string, "
        "vector array<float>, tags array<int>, epoch long",
    )
    loaded.ingest(b)
    assert loaded.vacuum() == 0  # not covered yet
    assert loaded.current().count() == 451


def test_filtered_planner_picks_by_selectivity(spark, loaded, sf_dir):
    """Planner: a narrow tag filter → pre; a broad tenant filter → post.
    Both strategies must return only rows passing the filter, and
    post-with-over-fetch must match pre on a permissive filter."""
    loaded.build_ivf_index(nlist=8)
    queries = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id").isin(1, 2))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    # tenant t0 keeps ~half the rows → permissive → post
    strat_t, sel_t = loaded.plan_filtered_strategy(tenant="t0")
    assert strat_t == "post" and sel_t > 0.2
    # a single tag id is rare → selective → pre
    strat_g, sel_g = loaded.plan_filtered_strategy(tags_any=[7])
    assert strat_g == "pre" and sel_g < 0.2

    pre = loaded.topk_filtered(queries, k=5, nprobe=8, tenant="t0", strategy="pre")
    post = loaded.topk_filtered(queries, k=5, nprobe=8, tenant="t0", strategy="post")
    allowed = {
        r["id"]
        for r in loaded.current().filter(F.col("tenant") == "t0").select("id").collect()
    }
    for df in (pre, post):
        assert all(r["vec_id"] in allowed for r in df.collect())
    a = {(r["query_id"], r["vec_id"], r["rank"]) for r in pre.collect()}
    b = {(r["query_id"], r["vec_id"], r["rank"]) for r in post.collect()}
    assert a == b  # permissive filter + full probe → identical top-k

    auto = loaded.topk_filtered(queries, k=5, nprobe=8, tenant="t0", strategy="auto")
    assert {(r["query_id"], r["vec_id"], r["rank"]) for r in auto.collect()} == a


def test_planner_stats_path_zero_jobs_same_decisions(spark, loaded):
    """The planner must answer from manifest stats without launching any
    Spark job, and agree with measured mode on both decision and
    (approximately) selectivity."""
    stats = loaded._meta().get("stats")
    assert stats and stats["n"] == 450  # compact() ran analyze()
    assert "tenant" in stats and "tag" in stats

    sc = spark.sparkContext
    sc.setJobGroup("planner_stats", "stats-only planning")
    try:
        strat_t, sel_t = loaded.plan_filtered_strategy(tenant="t0")
        strat_g, sel_g = loaded.plan_filtered_strategy(tags_any=[7])
        strat_c, sel_c = loaded.plan_filtered_strategy(
            tenant="t0", tags_any=[7], sample_p=0.5
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(sc.statusTracker().getJobIdsForGroup("planner_stats")) == []

    m_t = loaded.plan_filtered_strategy(tenant="t0", use_stats=False)
    m_g = loaded.plan_filtered_strategy(tags_any=[7], use_stats=False)
    assert (strat_t, strat_g) == (m_t[0], m_g[0])
    assert abs(sel_t - m_t[1]) < 0.05
    assert abs(sel_g - m_g[1]) < 0.05
    # combined filter: independence estimate stays on the pre side
    assert strat_c == "pre" and sel_c < sel_g


def test_build_indexes_empty_collection_clear_error(spark, tmp_path):
    import pytest

    from write_optimized_vector_database_spark.collection import VectorCollection

    c = VectorCollection(spark, str(tmp_path / "empty"), metric="ip")
    c.ingest(spark.createDataFrame(
        [("INSERT", 1, "t0", "ns0", [1.0, 2.0], [0], 1),
         ("DELETE", 1, "t0", "ns0", None, None, 2)],
        "op string, id long, tenant string, namespace string, "
        "vector array<float>, tags array<int>, epoch long",
    ))
    with pytest.raises(ValueError, match="no visible vectors"):
        c.build_indexes(nlist=2)
    with pytest.raises(ValueError, match="no visible vectors"):
        c.build_indexes(nlist=2, target_recall=0.9)
