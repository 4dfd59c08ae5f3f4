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
