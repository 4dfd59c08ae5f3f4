"""Streaming ingest: exactly-once changelog appends, watermarked windows,
and the restart test (SURVEY §5.4, port of the reference's
scripts/fault-inject.sh crash-recovery strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.compaction import visible
from write_optimized_vector_database_spark.streaming.ingest import (
    read_stream_changelog,
    start_changelog_ingest,
    windowed_event_counts,
)

CHANGELOG_DDL = (
    "op string, id long, tenant string, namespace string, "
    "vector array<float>, tags array<int>"
)


def _batch_rows(f, rows_per=20):
    rows = []
    for i in range(rows_per):
        id_ = (f * rows_per + i) % 25  # overlapping ids → upserts
        op = "DELETE" if (f == 2 and id_ % 5 == 0) else (
            "UPSERT" if id_ < f * rows_per else "INSERT"
        )
        rows.append((op, id_, f"t{id_ % 2}", "ns0", [float(f), float(i)], [id_ % 7]))
    return rows


def _run_stream(spark, src_dir, coll_dir, ckpt_dir, max_files=1):
    source = (
        spark.readStream.schema(CHANGELOG_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_dir)
    )
    q = start_changelog_ingest(source, coll_dir, ckpt_dir)
    q.awaitTermination(120)
    return q


def test_stream_ingest_end_to_end(spark, tmp_path):
    """Write a source file, drain the stream, repeat — micro-batch order
    (and therefore epoch order) follows arrival order, the reference's
    WAL semantics (epochs = arrival order, SURVEY §2.4 streaming row)."""
    src = str(tmp_path / "src")
    coll = str(tmp_path / "coll")
    ckpt = str(tmp_path / "ckpt")

    for f in range(3):
        spark.createDataFrame(_batch_rows(f), CHANGELOG_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _run_stream(spark, src, coll, ckpt)

    log = read_stream_changelog(spark, coll)
    # per-batch dedup keeps ≤1 row per (batch, id)
    assert log.groupBy("batch", "id").count().filter(F.col("count") > 1).count() == 0
    vis = visible(log)
    ids = {r.id for r in vis.select("id").collect()}
    # batch 2 covers ids 15..24 ∪ 0..9 and DELETEs its multiples of 5
    deleted = {0, 5, 15, 20}
    assert ids == set(range(25)) - deleted


def test_stream_restart_is_exactly_once(spark, tmp_path):
    """Crash-recovery semantics (port of the reference's fault-inject
    strategy): a replayed micro-batch must not double-append (idempotent
    batch dirs), and restarting from the checkpoint with no new data
    must be a no-op."""
    from write_optimized_vector_database_spark.streaming.ingest import changelog_batch_writer

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    coll = str(tmp_path / "coll")

    spark.createDataFrame(_batch_rows(0), CHANGELOG_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_stream(spark, src, coll, ckpt)
    log1 = read_stream_changelog(spark, coll)
    n1 = log1.count()
    state1 = {(r.id, r.epoch) for r in visible(log1).select("id", "epoch").collect()}

    # simulate a post-crash replay of batch 0: writer runs again on the
    # same data — the overwrite-into-batch-dir makes it a no-op
    replay = spark.createDataFrame(_batch_rows(0), CHANGELOG_DDL)
    changelog_batch_writer(coll)(replay, 0)
    log2 = read_stream_changelog(spark, coll)
    assert log2.count() == n1
    state2 = {(r.id, r.epoch) for r in visible(log2).select("id", "epoch").collect()}
    assert state2 == state1

    # restart from checkpoint with no new files → no new batches
    _run_stream(spark, src, coll, ckpt)
    assert read_stream_changelog(spark, coll).count() == n1

    # new arrivals after restart are processed exactly once
    spark.createDataFrame(_batch_rows(1), CHANGELOG_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_stream(spark, src, coll, ckpt)
    log3 = read_stream_changelog(spark, coll)
    assert log3.groupBy("batch", "id").count().filter(F.col("count") > 1).count() == 0
    # batch 1 upserted every id it contains (ids 20..24 inserted, 0..14 upserted)
    vis = visible(log3)
    assert vis.count() == 25


def test_streaming_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    """Stream the events fixture file-by-file; watermarked tumbling-window
    counts must equal the batch computation."""
    from write_optimized_vector_database_spark.sources.tables import load_table

    ev_batch = load_table(spark, sf_dir, "events")
    expected = {
        (r.window.start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_event_counts(ev_batch).collect()
    }

    # file-stream sources need a directory; stage the fixture file.
    # events_stream_source sniffs the file's actual ts physical type
    # (ns vs µs — it has varied across driver generations).
    import shutil

    from write_optimized_vector_database_spark.sources.tables import (
        events_stream_source,
    )

    src_dir = tmp_path / "events_src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "events.parquet")
    stream = events_stream_source(spark, str(src_dir))
    q = (
        windowed_event_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window.start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == expected


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode watermark semantics, witnessed end to end: a row
    arriving AFTER the watermark passed its window is dropped, an
    equally-old row arriving in the same batch as its window stays.

    Two micro-batches (maxFilesPerTrigger=1, file mtime order):
      batch 1: events at 10:00 and 20:00 → eviction watermark advances
               to 19:00; the 10:00 window closes and emits (total 1).
      batch 2: a fresh 19:30 event aggregates; the FILTER watermark
               (one batch behind eviction) reaches 19:00.
      batch 3: a late 10:30 event (window end 11:00 < filter watermark)
               must be DROPPED — otherwise it would resurrect the
               already-emitted 10:00 window.
    """
    import time as _time

    from pyspark.sql import functions as F

    base = "2024-03-01 {h}:{m}:00"

    def write_file(rows, name):
        df = spark.createDataFrame(rows, "ts timestamp, v long").coalesce(1)
        df.write.mode("overwrite").parquet(str(tmp_path / "late_src" / name))

    # file source streams a directory of files; stage two parquet FILES
    # with controlled order via distinct subdir staging + move
    import shutil
    from datetime import datetime

    def ts(h, m=0):
        return datetime(2024, 3, 1, h, m)

    src = tmp_path / "late_src"
    src.mkdir()

    def stage(rows, name):
        tmp = tmp_path / ("stage_" + name)
        spark.createDataFrame(rows, "ts timestamp, v long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        part = next(p for p in tmp.iterdir() if p.name.endswith(".parquet"))
        shutil.move(str(part), str(src / name))
        _time.sleep(1.1)  # distinct mtimes → deterministic file order

    # three batches: Spark's two-watermark model uses the PREVIOUS
    # batch's final watermark for late-record filtering (filtering lags
    # eviction by one batch), so the late row goes in batch 3 where the
    # filter watermark is already 19:00.
    stage([(ts(10), 1), (ts(20), 1)], "b1.parquet")
    stage([(ts(19, 30), 7)], "b2.parquet")
    stage([(ts(10, 30), 100)], "b3.parquet")

    stream = (
        spark.readStream.schema("ts timestamp, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("v").alias("total"))
    )
    name = "late_drop_sink"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    collected = spark.table(name).collect()
    rows = {r.w.start.hour: r.total for r in collected}
    assert len(collected) == len(rows), f"duplicate window emission: {collected}"
    # the 10:00 window emitted with total 1 — the late v=100 row was
    # dropped, not resurrected into a duplicate emission; append mode
    # may not have flushed the later windows yet.
    assert rows.get(10) == 1, rows
    assert 100 not in rows.values(), f"late row leaked into {rows}"
    # and the drop is visible in the stream metrics
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
         if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1, f"expected exactly the late row dropped, got {dropped}"
