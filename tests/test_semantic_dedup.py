"""SemDeDup scale path (operators/dedup.semantic_dedup): production twin
of the hash-checked registry query emb_semantic_dedup_keep_best —
k-means/provided centroids + Arrow assignment instead of the O(n²/stride)
bit-exact witness machinery. Soaked at ×10: exponent 0.59 vs the witness
path's 1.58 (docs/SCALE.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.dedup import semantic_dedup


def _clustered(spark, n=120, dim=8):
    # 4 well-separated direction clusters + a ×1.001 cosine-twin for
    # every 5th vector (planted semantic duplicates)
    rows = []
    for i in range(n):
        c = i % 4
        vec = [10.0 * (c == j % 4) + 0.01 * ((i * 7 + j) % 5) for j in range(dim)]
        rows.append((i, vec))
    base = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    twins = base.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    return base.unionByName(twins)


def test_semantic_dedup_keeps_one_per_cluster(spark):
    corpus = _clustered(spark)
    cents = spark.createDataFrame(
        [(c, [10.0 * (c == j % 4) for j in range(8)]) for c in range(4)],
        "centroid_id int, centroid array<double>",
    )
    out = semantic_dedup(corpus, cents, threshold=0.999).collect()
    assert len(out) > 0
    # exactly one keeper per cluster, every cluster has >= 2 members
    assert len({r.cluster_id for r in out}) == len(out)
    assert all(r.cluster_size >= 2 for r in out)
    # every planted twin pair is semantically deduped: original and its
    # ×1.001 twin share a component, so at most one of them is kept
    kept = {r.keep_id for r in out}
    originals_with_twin = {i for i in range(120) if i % 5 == 0}
    for i in sorted(originals_with_twin):
        assert not (i in kept and (i + 1_000_000) in kept)
    # keep rule: the keeper is a real member and its cosine-to-centroid
    # is a valid cosine
    assert all(-1.0001 <= r.keep_centroid_cosine <= 1.0001 for r in out)


def test_semantic_dedup_empty_when_no_dups(spark):
    # all-distinct directions (the secondary component grows with i, so
    # even same-primary-axis vectors stay > ~0.7% apart in angle): no
    # pair clears the threshold
    rows = [(i, [float(j == i % 8) + 0.02 * i * float(j == (i + 1) % 8)
                 for j in range(8)])
            for i in range(40)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0] * 8)], "centroid_id int, centroid array<double>"
    )
    assert semantic_dedup(corpus, cents, threshold=0.9999).count() == 0
