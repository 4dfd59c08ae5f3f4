"""Connected-component dedup clustering (operators/dedup.dedup_clusters).

Pins the closure semantics pair queries can't express: transitive
chains collapse to one cluster labeled by the min member id.
"""

import pyspark.sql.functions as F

from write_optimized_vector_database_spark.operators.dedup import dedup_clusters


def _clusters(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    rows = dedup_clusters(df).collect()
    return {r["id"]: r["cluster_id"] for r in rows}


def test_chain_transitivity(spark):
    # 1-2, 2-3, 3-4: one component labeled 1, even though (1,4) was
    # never a pair.
    got = _clusters(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_two_components(spark):
    got = _clusters(spark, [(10, 20), (30, 40), (40, 50)])
    assert got == {10: 10, 20: 10, 30: 30, 40: 30, 50: 30}


def test_order_insensitive(spark):
    # min label wins regardless of pair orientation
    got = _clusters(spark, [(9, 2), (2, 7)])
    assert got == {2: 2, 7: 2, 9: 2}


def test_long_chain_converges(spark):
    # a path graph is the worst case for min-label diameter; 12 hops
    # still converges inside the default max_iter
    n = 12
    got = _clusters(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0}
    assert len(got) == n + 1
