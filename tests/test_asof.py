"""as-of join semantics (operators/asof.py): strict/non-strict, missing
prior, per-key isolation."""

from __future__ import annotations


from write_optimized_vector_database_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, 100, 1.0), (1, 20, 101, 2.0), (2, 15, 200, 9.0)],
        "k long, ts long, event_id long, v double",
    )
    right = spark.createDataFrame(
        [(1, 5, 900), (1, 10, 901), (1, 25, 902), (2, 16, 903), (3, 50, 904)],
        "k long, ts long, rid long",
    )
    return left, right


def test_strict_asof(spark):
    left, right = _frames(spark)
    out = {
        r.rid: (r.asof_event_id, r.asof_v)
        for r in asof_join(
            left, right, on="k", ts_col="ts", value_cols=["event_id", "v"], strict=True
        ).collect()
    }
    assert out[900] == (None, None)  # nothing before ts=5
    assert out[901] == (None, None)  # strict: ts=10 left not included at ts=10
    assert out[902] == (101, 2.0)  # newest of ts 10,20
    assert out[903] == (200, 9.0)  # per-key isolation
    assert out[904] == (None, None)  # key with no left rows


def test_non_strict_asof(spark):
    left, right = _frames(spark)
    out = {
        r.rid: r.asof_event_id
        for r in asof_join(
            left, right, on="k", ts_col="ts", value_cols=["event_id"], strict=False
        ).collect()
    }
    assert out[901] == 100  # ≤ includes the equal-ts left row


def test_equal_ts_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, 10, 7, 1.0), (1, 10, 9, 2.0), (1, 10, 8, 3.0)],
        "k long, ts long, event_id long, v double",
    )
    right = spark.createDataFrame([(1, 11, 1)], "k long, ts long, rid long")
    out = asof_join(
        left, right, on="k", ts_col="ts", value_cols=["event_id", "v"],
        strict=True, tiebreak="event_id",
    ).collect()[0]
    assert out.asof_event_id == 9  # highest tiebreak wins deterministically
    assert out.asof_v == 2.0
