"""Salted aggregation / join correctness (equal to un-salted results)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + long tail
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(tail).cache()


def test_salted_agg_matches_plain(skewed):
    plain = {
        r.k: (r.s, r.n, r.mx)
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r.k: (r.s, r.n, r.mx)
        for r in salted_agg(
            skewed,
            ["k"],
            {"s": ("v", "sum"), "n": ("v", "count"), "mx": ("v", "max")},
            n_salts=16,
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][1] == salted[k][1] and plain[k][2] == salted[k][2]
        assert abs(plain[k][0] - salted[k][0]) < 1e-6


def test_salted_avg_decomposition(skewed):
    plain = {
        r.k: r.a for r in skewed.groupBy("k").agg(F.avg("v").alias("a")).collect()
    }
    salted = {
        r.k: r.a
        for r in salted_agg(skewed, ["k"], {"a": ("v", "avg")}, n_salts=16).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert abs(plain[k] - salted[k]) < 1e-9


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], "k string, label string"
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(skewed, dim, on="k", n_salts=8).groupBy("k", "label").count()
    p = {(r.k, r.label): r["count"] for r in plain.collect()}
    s = {(r.k, r.label): r["count"] for r in salted.collect()}
    assert p == s
