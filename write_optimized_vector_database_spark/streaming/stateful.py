"""Custom stateful streaming operators via applyInPandasWithState.

The reference's ingest path keeps per-id mutable state (LatestByIdMap,
/root/reference/src/cpp/storage/latest-by-id.h) updated message by
message. The batch engine derives that state (operators/compaction.py);
this module is the *streaming* form for operators whose state must live
across micro-batches:

- `running_user_stats`: per-user running aggregate (count / sum / last
  seen) maintained in GroupState — the shape of any online feature
  aggregation at ingest time;
- `streaming_latest_by_id`: per-id latest (epoch, op) map — the literal
  LatestByIdMap as streaming state, emitting the current visible version
  per id on every update.

State is per-group (Spark partitions groups across executors), so a
1000-executor cluster shards state horizontally — the distributed
version of the reference's 16-shard in-memory map (msg-buf.h:63-74).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _running_user_stats_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_user_stats(events_stream):
    """Per-user running (count, sum) across all micro-batches seen so far.
    Output mode: update — each batch emits rows for touched users only."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _running_user_stats_fn,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _latest_by_id_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (id_,) = key
    if state.exists:
        epoch, op = state.get
    else:
        epoch, op = -1, ""
    for pdf in pdfs:
        for _, row in pdf.sort_values("epoch").iterrows():
            if row["epoch"] > epoch:
                epoch, op = int(row["epoch"]), str(row["op"])
    state.update((epoch, op))
    yield pd.DataFrame(
        {
            "id": [id_],
            "epoch": [epoch],
            "op": [op],
            "visible": [op != "DELETE"],
        }
    )


def streaming_latest_by_id(changelog_stream):
    """LatestByIdMap as streaming state (latest-by-id.h:110-200): emits
    each touched id's current latest version per micro-batch."""
    return changelog_stream.groupBy("id").applyInPandasWithState(
        _latest_by_id_fn,
        outputStructType="id long, epoch long, op string, visible boolean",
        stateStructType="epoch long, op string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _running_user_cents_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        v = pdf["value"].to_numpy(dtype="float64")
        # quantize to integer cents BEFORE summing: the running total is
        # exact int64 no matter how rows split across batches/partitions
        cents += int(np.floor(v * 100.0 + 0.5).astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_cents": [cents]}
    )


def running_user_cents(events_stream):
    """Per-user running (count, Σ value-in-cents) — the integer-exact
    variant of running_user_stats whose state survives any batch split
    bit-identically (float accumulation order never enters)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _running_user_cents_fn,
        outputStructType="user_id long, n_events long, total_cents long",
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _streaming_topk_fn_for(k: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (query_id,) = key
        if state.exists:
            scores, ids, n_seen = state.get
            scores, ids = list(scores), list(ids)
        else:
            scores, ids, n_seen = [], [], 0
        for pdf in pdfs:
            n_seen += len(pdf)
            scores.extend(float(s) for s in pdf["score"])
            ids.extend(int(v) for v in pdf["vec_id"])
        # merge-then-truncate: state never holds more than k entries
        # between batches; the scores were computed JVM-side before the
        # shuffle, so no float arithmetic happens here — only ordering,
        # which ties deterministically on (score desc, vec_id asc)
        order = sorted(range(len(scores)), key=lambda i: (-scores[i], ids[i]))[:k]
        scores = [scores[i] for i in order]
        ids = [ids[i] for i in order]
        state.update((scores, ids, n_seen))
        yield pd.DataFrame(
            {
                "query_id": [query_id] * len(ids),
                "vec_id": ids,
                "score": scores,
                "rank": list(range(1, len(ids) + 1)),
                "n_seen": [n_seen] * len(ids),
            }
        )

    return fn


def streaming_topk(scored_stream, k: int = 10):
    """Continuous top-k maintenance over a stream of scored candidates —
    the streaming form of the exact top-k operator (Q2/Q12): per query,
    GroupState holds the current k best (score, vec_id) pairs and each
    micro-batch merges its candidates in. State is O(k) per query
    regardless of stream length; emitted rows carry `n_seen` so the
    final frontier per query is the emission with the max n_seen.

    100 TB shape: the expensive part (scoring) runs JVM-side before the
    groupBy(query_id) shuffle, so each micro-batch moves only
    (query_id, vec_id, score) triples; state is |queries| x k rows
    sharded across executors like any keyed state."""
    return scored_stream.groupBy("query_id").applyInPandasWithState(
        _streaming_topk_fn_for(k),
        outputStructType=(
            "query_id long, vec_id long, score double, rank long, n_seen long"
        ),
        stateStructType="scores array<double>, ids array<long>, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
