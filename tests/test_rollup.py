"""Range-join and hypertable-rollup gates: the bucketed range join must
plan as a hash join (never a nested loop), each point must match exactly
its containing intervals, and rollup merge-of-partials must equal the
direct aggregation bit-for-bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.rollup import (
    hourly_rollup,
    merge_rollup_branches,
    range_join_buckets,
    rollup_to_coarser,
)
from write_optimized_vector_database_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def ev(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


@pytest.fixture(scope="module")
def windows(ev):
    return ev.filter((F.col("event_type") == "error") & (F.col("value") > 90)).select(
        F.col("event_id").alias("incident_id"),
        (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )


def test_range_join_matches_naive_between(ev, windows):
    pts = ev.select("event_id", "ts")
    bucketed = range_join_buckets(pts, windows, bucket_seconds=3600)
    naive = pts.join(
        windows, (F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end"))
    )
    key = ["event_id", "incident_id"]
    assert bucketed.select(*key).exceptAll(naive.select(*key)).count() == 0
    assert naive.select(*key).exceptAll(bucketed.select(*key)).count() == 0


def test_range_join_is_hash_join_not_nested_loop(ev, windows):
    plan = range_join_buckets(
        ev.select("event_id", "ts"), windows, bucket_seconds=3600
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "HashJoin" in plan, plan


def test_rollup_merge_equals_direct(ev):
    keys = ["event_type"]
    hourly = hourly_rollup(ev, keys)
    daily_via_hourly = merge_rollup_branches(
        [rollup_to_coarser(hourly, "day", keys)], "day", keys
    )
    direct = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("bucket_ts"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )
    a = {tuple(r) for r in daily_via_hourly.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b
