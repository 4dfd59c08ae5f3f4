"""Plan-quality gates: pushdown, pruning, broadcast, bounded shuffles.

These are the 100 TB-scale invariants (SURVEY §4): they hold regardless
of data size, so pinning them at sf0.001 pins them for the cluster."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.plans.explain import (
    count_exchanges,
    has_broadcast_join,
    pushed_filters,
    read_schemas,
)
from write_optimized_vector_database_spark.operators.topk import exact_topk
from write_optimized_vector_database_spark.sources.tables import load_table


@pytest.fixture(autouse=True)
def _clear_cache(spark):
    """Other test modules cache the fixture scans; a cache hit turns the
    scan into InMemoryTableScan and hides PushedFilters/ReadSchema."""
    spark.catalog.clearCache()
    yield


def test_point_lookup_filter_pushdown(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(7, 42)).select("vec_id", "label")
    pf = pushed_filters(q)
    assert any("vec_id" in p and p != "[]" for p in pf), f"no pushdown: {pf}"


def test_projection_prunes_columns(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("doc_id")
    rs = read_schemas(q)
    assert rs and all("text" not in s for s in rs), f"text not pruned: {rs}"


def test_exact_topk_broadcasts_queries(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = exact_topk(emb, queries, k=5, metric="ip")
    assert has_broadcast_join(out), "query side must broadcast, never shuffle vectors"


def test_exact_topk_shuffles_are_bounded(spark, sf_dir):
    """The scored scan must not shuffle; only the tiny partial-top-k
    output may. A growing Exchange count here = a 100 TB regression."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = exact_topk(emb, queries, k=5, metric="ip")
    # window rank needs one hash exchange of (query_id, vec_id, score);
    # queries-side broadcast must keep it to ≤2 total
    assert count_exchanges(out) <= 2, count_exchanges(out)


def test_ivf_index_scan_partition_pruned(spark, tmp_path, sf_dir):
    """The probed IVF scan must show PartitionFilters on centroid_id —
    guaranteed static pruning of un-probed posting lists."""
    from write_optimized_vector_database_spark.operators.ivf import (
        assign_centroids,
        centroids_from_stride,
        write_ivf_index,
    )
    from write_optimized_vector_database_spark.plans.explain import explain_str

    emb = load_table(spark, sf_dir, "embeddings")
    cents = centroids_from_stride(emb, stride=100)
    write_ivf_index(assign_centroids(emb, cents), str(tmp_path / "idx"))
    index = spark.read.parquet(str(tmp_path / "idx"))
    probed = index.filter(F.col("centroid_id").isin(0, 2))
    plan = explain_str(probed)
    assert "PartitionFilters" in plan and "centroid_id" in plan
    assert probed.select("centroid_id").distinct().count() <= 2


def test_tenant_filter_pushdown_on_collection(spark, tmp_path, sf_dir):
    """Collection snapshot scans must push tenant/namespace equality into
    Parquet (Q7 semantics at scan level)."""
    from write_optimized_vector_database_spark.collection import VectorCollection
    from write_optimized_vector_database_spark.operators.changelog import synthetic_changelog

    coll = VectorCollection(spark, str(tmp_path / "c"), metric="ip")
    coll.ingest(synthetic_changelog(spark, sf_dir))
    coll.compact()
    q = coll.current().filter(F.col("tenant") == "t0")
    pf = pushed_filters(q)
    assert any("tenant" in p for p in pf), f"tenant filter not pushed: {pf}"


def test_ivfpq_adc_scan_is_pruned_and_int_only(spark, tmp_path, sf_dir):
    """The IVFPQ phase-1 scan must (a) partition-prune to the probed
    posting lists and (b) read ONLY int columns (id, centroid_id, codes)
    — never the float vectors."""
    from write_optimized_vector_database_spark.operators.ivf import centroids_from_stride
    from write_optimized_vector_database_spark.operators.ivfpq import (
        ivfpq_adc_topk,
        ivfpq_encode,
        train_ivfpq_codebooks,
    )
    from write_optimized_vector_database_spark.plans.explain import explain_str

    emb = load_table(spark, sf_dir, "embeddings")
    cents = centroids_from_stride(emb, stride=100)
    cb = train_ivfpq_codebooks(emb, cents, dim=64, m=8)
    ivfpq_encode(emb, cents, cb).write.partitionBy("centroid_id").parquet(
        str(tmp_path / "idx")
    )
    index = spark.read.parquet(str(tmp_path / "idx"))
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivfpq_adc_topk(index, queries, cents, cb, k=5, nprobe=2)
    plan = explain_str(out)
    assert "PartitionFilters" in plan and "centroid_id" in plan
    scan_schemas = [l for l in plan.splitlines() if "ReadSchema" in l and "idx" not in l]
    assert not any("embedding" in s for s in scan_schemas), scan_schemas


def test_sq8_encode_stays_jvm_side(spark, sf_dir):
    """SQ8 encode must be pure JVM expressions — no Python/Arrow eval
    nodes in the plan (the codes column is zip_with over literals)."""
    from write_optimized_vector_database_spark.operators.sq8 import encode_sq8, train_sq8
    from write_optimized_vector_database_spark.plans.explain import explain_str

    emb = load_table(spark, sf_dir, "embeddings")
    vmin, vmax = train_sq8(emb)
    plan = explain_str(encode_sq8(emb, vmin, vmax), "simple")
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan, plan


def test_zorder_key_stays_in_codegen(spark, sf_dir):
    """The Morton interleave must be pure JVM expression work — no
    Python eval node anywhere in the plan (a UDF here would drag every
    row of a 100 TB layout job through Arrow)."""
    from write_optimized_vector_database_spark.operators.zorder import zorder_key

    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        zorder_key([F.col("user_id") % 256, F.col("event_id") % 256]).alias("z")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, "z-order must not cross into Python"


def test_contamination_probe_broadcasts_benchmark(spark, sf_dir):
    """Decontamination joins the corpus shingle stream against the
    (small) benchmark side — the benchmark MUST broadcast; shuffling
    the corpus shingles by hash would be the 100 TB mistake."""
    from write_optimized_vector_database_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_hashes(docs, n=5)
    bench = sh.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "sh"
    )
    corpus = sh.filter(F.col("doc_id") % 97 != 0)
    out = corpus.join(F.broadcast(bench), "sh")
    assert has_broadcast_join(out)


def test_salted_agg_is_two_stage(spark, sf_dir):
    """salted_agg must plan exactly two aggregate exchanges: the salted
    partial and the tiny final merge — no third shuffle sneaking in."""
    from write_optimized_vector_database_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        key_cols=["event_type"],
        aggs={"n": ("event_id", "count")},
        n_salts=8,
        salt_source="event_id",
    )
    assert count_exchanges(out) <= 2, "salted agg grew a third exchange"


def test_repetition_stats_is_shuffle_free_until_sort(spark, sf_dir):
    """The per-doc trigram stats are row-local array ops; the ONLY
    exchange allowed is the final presentation orderBy."""
    from write_optimized_vector_database_spark.queries import registry

    q = registry()["doc_repetition_stats"].fn(spark, sf_dir)
    assert count_exchanges(q) <= 1, "per-row statistic must not shuffle the corpus"


def test_binary_quant_phase1_is_jvm_integer_only(spark, sf_dir):
    """BQ phase 1 (pack + Hamming) must stay in whole-stage codegen —
    no Python/Arrow crossing anywhere in the plan, and the Hamming
    ranking must not read the float vectors (column pruning: phase-1
    scan reads only packed words + id)."""
    from write_optimized_vector_database_spark.queries import registry

    out = registry()["vec_binary_quant_two_phase"].fn(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, "BQ path must not cross into Python"
    assert "pythonUDF" not in plan


def test_chunker_is_shuffle_free_until_sort(spark, sf_dir):
    """doc_chunk_windows: projection + generator only — the single
    exchange allowed is the final presentation ORDER BY."""
    from write_optimized_vector_database_spark.plans.explain import count_exchanges
    from write_optimized_vector_database_spark.queries import registry

    out = registry()["doc_chunk_windows"].fn(spark, sf_dir)
    assert count_exchanges(out) <= 1, "chunk fan-out must not shuffle data"


def test_contamination_ngram_probe_broadcasts(spark, sf_dir):
    """The 4-gram probe set joins broadcast — the training corpus never
    shuffles on the gram string."""
    from write_optimized_vector_database_spark.plans.explain import has_broadcast_join
    from write_optimized_vector_database_spark.queries import registry

    out = registry()["doc_ngram_contamination_frac"].fn(spark, sf_dir)
    assert has_broadcast_join(out), "probe set must broadcast"
