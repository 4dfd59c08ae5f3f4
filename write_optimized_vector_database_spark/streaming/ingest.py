"""Structured Streaming ingest — the reference's write path re-expressed.

Reference (SURVEY §3.1): client batches → WAL (group commit 8 ms,
fences/epochs) → sharded message buffer with upsert dedup → Bε-tree
flush → delta segments; crash recovery replays the WAL tail
(/root/reference/src/cpp/core/config.h:34-52, schemas/wal-record.fbs).

Spark mapping — all of that is micro-batch machinery Spark already has:
- group commit ≙ trigger interval; fences/epochs ≙ batch ids;
- WAL durability + replay ≙ the streaming checkpoint;
- buffer dedup ≙ within-batch upsert_dedup before the append;
- backpressure ≙ maxFilesPerTrigger / maxOffsetsPerTrigger;
- crash recovery ≙ restart from checkpoint + idempotent batch sink.

Exactly-once: each micro-batch writes to its own `batch=<id>` directory
with overwrite — a replayed batch overwrites itself instead of
double-appending (the CRC-framed WAL + fsync dance of the reference,
wal-record.fbs + config.h:44-48, collapses into this idempotence).

Epoch assignment is deterministic: epoch = batch_id × 1e6 + rank of the
record *within its id group* (ordered by the arrival epoch column if
any) — replays regenerate identical epochs, keeping last-writer-wins
stable across crashes (types.h:21 monotone-epoch semantics). Epochs are
only ever compared per id, so cross-id uniqueness is not needed — which
is what lets the rank run per-id (a parallel window keyed like the
dedup shuffle) instead of as a single-partition global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.functions.hashing import id_hash
from write_optimized_vector_database_spark.operators.compaction import upsert_dedup

EPOCH_STRIDE = 1_000_000


def assign_stream_epochs(batch: DataFrame, batch_id: int) -> DataFrame:
    """Deterministic monotone epochs within a micro-batch.

    Partitioned by id: a global `Window.orderBy` would funnel every row
    of the micro-batch through one task, serializing the 50k ops/s write
    path. Last-writer-wins only compares epochs *within* an id, so a
    per-id rank (tiny groups, parallel shuffle on the same key the dedup
    window uses) is both sufficient and replay-deterministic.
    """
    order = (
        [F.col("epoch").asc()] if "epoch" in batch.columns else [F.lit(1).asc()]
    )
    w = Window.partitionBy("id").orderBy(*order)
    return batch.withColumn(
        "epoch", F.lit(batch_id * EPOCH_STRIDE) + F.row_number().over(w)
    )


def changelog_batch_writer(
    collection_path: str, dedup: bool = True, epoch_base: int = 0
):
    """foreachBatch sink: dedup → epoch-stamp → idempotent partition write.

    `epoch_base` shifts every stamped epoch — required when the stream
    JOINS a collection with prior history (batch ids restart at 0 per
    checkpoint, and epochs below the snapshot epoch would make the new
    rows invisible to current()). Pass a constant (e.g. the snapshot
    epoch rounded up to an EPOCH_STRIDE multiple) so replays stay
    deterministic."""

    def write(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        out = assign_stream_epochs(batch, batch_id).withColumn(
            "epoch", F.col("epoch") + F.lit(epoch_base)
        )
        if dedup:
            out = upsert_dedup(out)
        out = out.withColumn("id_hash", id_hash("id"))
        (
            out.write.mode("overwrite").parquet(
                f"{collection_path.rstrip('/')}/changelog/batch={batch_id}"
            )
        )

    return write


def start_changelog_ingest(
    source: DataFrame,
    collection_path: str,
    checkpoint_dir: str,
    trigger_seconds: float | None = None,
):
    """Start the ingest stream: source (readStream DF of changelog-shaped
    rows: op/id/tenant/namespace/vector/tags [+epoch hint]) → exactly-once
    changelog appends. Returns the StreamingQuery."""
    writer = (
        source.writeStream.foreachBatch(changelog_batch_writer(collection_path))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_maintained_ingest(
    source: DataFrame,
    collection,
    checkpoint_dir: str,
    refresh_every: int = 1,
    trigger_seconds: float | None = None,
    auto_resize_alpha: float | None = None,
    resize_async: bool = False,
):
    """Ingest stream with ONLINE INDEX MAINTENANCE: after every
    `refresh_every`-th micro-batch append, fold the new delta into the
    stable index via `collection.refresh_indexes()` — the streaming form
    of the reference's continuous delta→stable migration (stable index
    lags by at most `refresh_every` batches; queries stay correct
    regardless because topk_two_phase scans the residual delta exactly).

    Maintenance runs INSIDE foreachBatch, i.e. serialized with the
    appends — exactly the ordering the reference's flush pipeline has.
    A replayed batch re-runs refresh harmlessly: refresh is a no-op when
    nothing is newer than the index epoch.

    `auto_resize_alpha` (round 11): when set, each maintenance tick also
    acts on the growth odometer — `collection.auto_resize(alpha)`
    rebuilds at the √n-scaled nlist through the generation-swap path
    once rows-per-list exceed alpha× the built ratio (reference anchor:
    the 24 h centroid retrain beside live ingest, config.h:79-81).
    By default the rebuild runs inside foreachBatch and therefore
    blocks that trigger for its wall (strictly ordered, replay-trivial).

    `resize_async=True` (round 12, VERDICT r11 #1) routes maintenance
    through an engine-level `IndexMaintainer` instead: the resize runs
    on a background worker in the `maintenance` scheduler pool while
    triggers keep firing — folds are skipped (not queued) for the
    rebuild's duration, mid-rebuild appends land in the new
    generation's delta by the build's epoch bound, and readers swing
    over at the atomic swap. The maintainer is exposed on the returned
    query as `query.index_maintainer` (join it before teardown).
    Replay-safe either way: a re-run is a no-op once the odometer has
    reset.

    Epochs are stamped above the collection's existing high-water mark
    (next EPOCH_STRIDE multiple), captured ONCE at stream start — on a
    restart after more history accrued elsewhere, reuse the original
    stream's base for bit-stable replays."""
    hi = collection._snapshot_epoch()
    if collection._has_changelog_files():
        tail_hi = (
            collection.changelog().agg(F.max("epoch")).first()[0] or -1
        )
        hi = max(hi, tail_hi)
    epoch_base = ((max(hi, 0) // EPOCH_STRIDE) + 1) * EPOCH_STRIDE
    base = changelog_batch_writer(collection.path, epoch_base=epoch_base)

    maintainer = None
    if resize_async:
        from write_optimized_vector_database_spark.maintenance import (
            IndexMaintainer,
        )

        maintainer = IndexMaintainer(collection, alpha=auto_resize_alpha)

    def write(batch: DataFrame, batch_id: int) -> None:
        base(batch, batch_id)
        if batch_id % refresh_every == refresh_every - 1:
            if maintainer is not None:
                # fold + odometer-triggered background resize; never
                # blocks the trigger, never raises on no-index-yet
                maintainer.tick()
                return
            try:
                collection.refresh_indexes()
                if auto_resize_alpha is not None:
                    collection.auto_resize(alpha=auto_resize_alpha)
            except ValueError:
                # no stable index yet — maintenance starts after the
                # first build_indexes(); appends are never blocked on it
                pass

    writer = (
        source.writeStream.foreachBatch(write)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if maintainer is not None:
        query.index_maintainer = maintainer
    return query


def read_stream_changelog(spark: SparkSession, collection_path: str) -> DataFrame:
    """Read everything ingested so far (batch view over the stream sink)."""
    return spark.read.parquet(f"{collection_path.rstrip('/')}/changelog")


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming tumbling-window aggregation with a watermark for late
    data ([EXT] event windowing; works on both stream and batch DFs)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(F.col(ts_col), window), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )
