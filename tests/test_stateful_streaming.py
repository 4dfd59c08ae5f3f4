"""applyInPandasWithState operators: running aggregates and the streaming
LatestByIdMap — state survives across micro-batches and matches the
batch-derived truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.streaming.stateful import (
    running_user_stats,
    streaming_latest_by_id,
)

EV_DDL = "user_id long, value double, batch int"
LOG_DDL = "op string, id long, epoch long"


def _drain(q):
    q.awaitTermination(180)


def test_running_user_stats_accumulates_across_batches(spark, tmp_path):
    """One continuous query; files arrive between drains → state carries
    across micro-batches (memory sink forbids checkpoint restart, so the
    cross-restart case is covered by the foreachBatch ingest tests)."""
    src = str(tmp_path / "src")
    rows1 = [(u, float(u * 10 + i), 0) for u in range(5) for i in range(3)]
    rows2 = [(u, 1.0, 1) for u in range(3)]

    spark.createDataFrame(rows1, EV_DDL).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(EV_DDL).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, EV_DDL).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    # newest emitted row per user = running totals across BOTH batches
    pdf = spark.sql("SELECT * FROM user_stats").toPandas()
    latest: dict = {}
    for _, r in pdf.iterrows():
        cur = latest.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:  # counts are monotone
            latest[r["user_id"]] = (r["n_events"], r["total_value"])
    for u in range(3):
        assert latest[u] == (4, sum(u * 10 + i for i in range(3)) + 1.0), u
    for u in (3, 4):
        assert latest[u][0] == 3  # untouched by batch 2


def test_streaming_latest_by_id_matches_batch_model(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    b1 = [("INSERT", i, i) for i in range(10)]
    b2 = [("UPSERT", i, 100 + i) for i in range(0, 10, 2)] + [
        ("DELETE", 1, 201), ("DELETE", 3, 203)
    ]
    spark.createDataFrame(b1, LOG_DDL).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, LOG_DDL).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(LOG_DDL).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_latest_by_id(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("latest_state")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)

    # final state per id (memory sink keeps every update; last wins)
    import pandas as pd

    pdf = spark.sql("SELECT * FROM latest_state").toPandas()
    final = {}
    for _, r in pdf.iterrows():
        cur = final.get(r["id"])
        if cur is None or r["epoch"] >= cur[0]:
            final[r["id"]] = (r["epoch"], r["op"], r["visible"])

    assert final[1] == (201, "DELETE", False)
    assert final[3] == (203, "DELETE", False)
    assert final[0] == (100, "UPSERT", True)
    assert final[5] == (5, "INSERT", True)
    assert len(final) == 10


def test_streaming_topk_merges_across_batches(spark, tmp_path):
    """Continuous top-k maintenance: vectors arriving in TWO separate
    micro-batches must converge to exactly the batch top-k over the
    union — the cross-batch merge is the whole point of the state."""
    import math

    from write_optimized_vector_database_spark.streaming.stateful import (
        streaming_topk,
    )

    VEC_DDL = "vec_id long, embedding array<float>"
    dim = 4
    rows = [(i, [float(math.sin(i * 7 + d)) for d in range(dim)]) for i in range(40)]
    src = str(tmp_path / "vecsrc")
    # batch 1 = even ids, batch 2 = odd ids — the global top-k mixes both
    spark.createDataFrame([r for r in rows if r[0] % 2 == 0], VEC_DDL).coalesce(
        1
    ).write.mode("append").parquet(src)

    q = spark.createDataFrame(rows[:2], VEC_DDL).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.lit(1).alias("__one"),
    )
    from write_optimized_vector_database_spark.functions.distance import dot_product

    stream = (
        spark.readStream.schema(VEC_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("__one", F.lit(1))
        .join(F.broadcast(q), "__one")
        .select("query_id", "vec_id", dot_product("query_vec", "embedding").alias("score"))
    )
    sq = (
        streaming_topk(stream, k=5)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("topk_stream")
        .start()
    )
    try:
        sq.processAllAvailable()
        spark.createDataFrame([r for r in rows if r[0] % 2 == 1], VEC_DDL).coalesce(
            1
        ).write.mode("append").parquet(src)
        sq.processAllAvailable()
    finally:
        sq.stop()

    got = (
        spark.sql(
            """
            SELECT query_id, vec_id, rank FROM (
              SELECT *, max(n_seen) OVER (PARTITION BY query_id) AS mx
              FROM topk_stream
            ) WHERE n_seen = mx
            """
        )
        .orderBy("query_id", "rank")
        .collect()
    )
    # batch truth over the full vector set
    from pyspark.sql import Window

    full = spark.createDataFrame(rows, VEC_DDL).withColumn("__one", F.lit(1)).join(
        F.broadcast(q), "__one"
    ).select("query_id", "vec_id", dot_product("query_vec", "embedding").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    want = (
        full.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id", "rank")
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # and every query's final frontier saw ALL 40 vectors
    n_seen = spark.sql("SELECT max(n_seen) AS m FROM topk_stream").first().m
    assert n_seen == 40
