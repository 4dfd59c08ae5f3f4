"""Visibility & compaction — last-writer-wins over the changelog.

Reference semantics (/root/reference/src/cpp/storage/latest-by-id.h):
- `upsert` replaces an id's latest location/epoch (latest-by-id.h:110-157)
- `markDeleted` writes a tombstone (latest-by-id.h:159-168)
- `exists` = has-latest ∧ ¬tombstone (latest-by-id.h:192-200)

The Spark engine never *keeps* that map as mutable state — it derives it:
`row_number() OVER (PARTITION BY id ORDER BY epoch DESC) = 1`, then a
tombstone filter. Derivation scales (it is one shuffle on id, AQE-coalesced)
and is restart-free: recovery is re-running the view (SURVEY §3.3).

Compaction (reference delta→stable merge, config.h:54-61) = materializing
the visible view into a fresh snapshot when the tombstone ratio passes a
threshold; segment stats come from `groupBy(segment)` aggregation exactly
like the reference's SegmentDescriptor bookkeeping (types.h:94-106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_TOMBSTONE_RATIO = 0.2  # reference config.h:57


def latest_by_id(
    changelog: DataFrame, id_col: str = "id", epoch_col: str = "epoch"
) -> DataFrame:
    """Newest version of every id (tombstones still present).

    Ties on epoch break by op name descending, so an UPSERT wins over a
    same-epoch DELETE ('U' > 'D'). Epochs are strictly monotonic per id in
    the write path, so a tie only occurs on replay of an identical
    changelog — where this rule makes the outcome deterministic. The
    tests' dict model encodes the same upsert-wins rule.

    FENCE records (the WAL's epoch barriers, wal-record.fbs:6 — group
    commit boundaries, never data) are dropped up front: a fence must
    not shadow or resurrect the id-keyed state it may be interleaved
    with on replay.
    """
    w = Window.partitionBy(id_col).orderBy(
        F.col(epoch_col).desc(), F.col("op").desc()
    )
    return (
        changelog.filter(F.col("op") != "FENCE")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def visible(changelog: DataFrame, id_col: str = "id", epoch_col: str = "epoch") -> DataFrame:
    """The compacted, queryable view: latest version per id, minus
    tombstones (`exists` semantics, latest-by-id.h:192-200)."""
    return latest_by_id(changelog, id_col, epoch_col).filter(F.col("op") != "DELETE")


def upsert_dedup(batch: DataFrame, id_col: str = "id", epoch_col: str = "epoch") -> DataFrame:
    """Within-batch upsert dedup — keep only the newest message per id
    before it ever hits storage (reference message-buffer dedup,
    msg-buf.h:134-147; the write-amplification lever, types.h:144).

    Same window as latest_by_id but applied pre-append: at 100 TB this
    runs map-heavy inside a micro-batch whose id-space is small, so the
    shuffle is the micro-batch, never the table.
    """
    return latest_by_id(batch, id_col, epoch_col)


def segment_stats(
    changelog: DataFrame,
    segment_col: str,
    id_col: str = "id",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Per-segment descriptor stats: row count, id-hash/epoch zone maps and
    tombstone ratio (reference SegmentDescriptor, types.h:94-106) — the
    inputs to the compaction trigger (tombstone_ratio > 0.2, config.h:57)."""
    return changelog.groupBy(segment_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(F.xxhash64(F.col(id_col).cast("string"))).alias("min_id_hash"),
        F.max(F.xxhash64(F.col(id_col).cast("string"))).alias("max_id_hash"),
        F.min(epoch_col).alias("min_epoch"),
        F.max(epoch_col).alias("max_epoch"),
        F.avg((F.col("op") == "DELETE").cast("double")).alias("tombstone_ratio"),
    )


def needs_compaction(
    stats: DataFrame, threshold: float = DEFAULT_TOMBSTONE_RATIO
) -> DataFrame:
    """Segments whose tombstone ratio exceeds the merge threshold."""
    return stats.filter(F.col("tombstone_ratio") > threshold)


def visible_as_of(
    changelog: DataFrame, as_of_epoch: int, id_col: str = "id", epoch_col: str = "epoch"
) -> DataFrame:
    """MVCC time-travel: the visible view as of a past epoch — replay the
    changelog with everything newer masked out (the epoch-ordered
    last-writer-wins of latest-by-id.h applied at a historical cut).

    The epoch predicate is a plain conjunctive filter applied BEFORE the
    latest-by-id shuffle, so it pushes into the changelog's Parquet scan
    (epoch min/max footer stats skip whole files) and the shuffle only
    carries rows from the requested history prefix.
    """
    return visible(
        changelog.filter(F.col(epoch_col) <= F.lit(as_of_epoch)), id_col, epoch_col
    )
