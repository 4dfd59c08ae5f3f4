"""Interval range join + hypertable-style hierarchical rollup.

Two time-series operators the reference's event surface implies but no
built-in Spark operator provides directly:

**Range join** (point-in-interval): Spark compiles a raw
`ts BETWEEN start AND end` join predicate to BroadcastNestedLoopJoin —
O(|points|·|intervals|), dead at scale. `range_join_buckets` applies
the standard interval-bucketing reduction: quantize time into
fixed-width buckets, explode each interval over the buckets it spans
(≤ ceil(len/width)+1 rows), and equi-join on the bucket key with the
BETWEEN kept only as a residual filter. The join is then a plain
shuffle/broadcast hash join on an integer key — each point lands in
exactly one bucket, so no post-join dedup is needed. At 100 TB this is
one equi-shuffle (or a broadcast when intervals are small), never a
nested loop.

**Hypertable rollup** (continuous-aggregate hierarchy): maintain
coarser aggregates FROM finer ones — daily from hourly, hourly from
raw — and answer "daily totals including the current partial day" by
unioning (full-day daily rollup) + (hourly rollup of the closed hours
of the partial day) + (raw tail past the hour watermark). Because the
partial sums accumulate in exact DECIMAL, re-aggregating partials is
bit-identical to aggregating raw rows — the algebraic-merge property
that makes the split verifiable against a direct-aggregation oracle.
All branches are plain groupBy aggregations with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUM_DECIMAL = "decimal(28,6)"


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    bucket_seconds: int = 3600,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join each point row to every interval row containing its timestamp.

    Returns points ⋈ intervals with all columns from both sides. The
    bucket key is floor(epoch_seconds / bucket_seconds); intervals are
    exploded over their spanned buckets via `sequence()` (JVM-side).
    Pick `bucket_seconds` ≈ typical interval length so each interval
    explodes to ~2 rows.
    """
    bucket = lambda c: F.floor(F.unix_timestamp(c) / F.lit(bucket_seconds))  # noqa: E731
    ivb = intervals.withColumn(
        "__bucket", F.explode(F.sequence(bucket(F.col(start_col)), bucket(F.col(end_col))))
    )
    if broadcast_intervals:
        ivb = F.broadcast(ivb)
    pb = points.withColumn("__bucket", bucket(F.col(point_ts)))
    return (
        pb.join(ivb, "__bucket")
        .filter(
            (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__bucket")
    )


def _partial_agg(df: DataFrame, time_col: Column, keys: list[str], value_col: str = "value") -> DataFrame:
    """One rollup cell per (time bucket, keys): exact-decimal partial sums."""
    return df.groupBy(time_col.alias("bucket_ts"), *keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).cast(SUM_DECIMAL).alias("sum_value"),
    )


def hourly_rollup(events: DataFrame, keys: list[str], ts_col: str = "ts") -> DataFrame:
    """Raw → hourly cells (the finest hypertable level)."""
    return _partial_agg(events, F.date_trunc("hour", F.col(ts_col)), keys)


def rollup_to_coarser(rollup: DataFrame, unit: str, keys: list[str]) -> DataFrame:
    """Re-aggregate finer cells to a coarser grain (hourly → daily, …).
    Exact because partial sums are DECIMAL: merge(sum) == sum(raw)."""
    return (
        rollup.groupBy(F.date_trunc(unit, F.col("bucket_ts")).alias("bucket_ts"), *keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast(SUM_DECIMAL).alias("sum_value"),
        )
    )


def merge_rollup_branches(branches: list[DataFrame], unit: str, keys: list[str]) -> DataFrame:
    """Union pre-aggregated branches (each already cell-shaped) and
    re-aggregate to the target grain. The final cast to DOUBLE happens
    here — everything upstream stays exact DECIMAL."""
    union = branches[0]
    for b in branches[1:]:
        union = union.unionByName(b)
    return (
        union.groupBy(F.date_trunc(unit, F.col("bucket_ts")).alias("bucket_ts"), *keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast("double").alias("total_value"),
        )
    )
