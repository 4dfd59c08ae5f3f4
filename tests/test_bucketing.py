"""Bucketed co-located join gate: same-key same-count bucketed tables
must equi-join with ZERO Exchange operators — the write-once,
shuffle-never layout contract that carries the big-join story at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.plans.explain import count_exchanges
from write_optimized_vector_database_spark.sources.tables import load_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", "o_orderkey", 8, sort_col="o_orderkey",
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_needs_no_exchange(spark, bucketed):
    orders_b, lineitem_b = bucketed
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = orders_b.join(lineitem_b, "o_orderkey").groupBy("o_orderstatus").count()
        # the groupBy may still exchange on its own key; gate the JOIN by
        # counting exchanges of the join subplan only
        join_only = orders_b.join(lineitem_b, "o_orderkey").select("o_orderkey")
        assert count_exchanges(join_only) == 0, "bucketed join still shuffles"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, bucketed, sf_dir):
    orders_b, lineitem_b = bucketed
    plain = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        .count()
    )
    assert orders_b.join(lineitem_b, "o_orderkey").count() == plain
