"""Incremental index maintenance gates (collection.refresh_indexes):
the refreshed index must equal a full re-encode with the SAME
centroids/codebooks, untouched posting lists must not be rewritten,
and a vacuum past the index epoch must force a full rebuild."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.collection import VectorCollection


def _ops(ids, op="INSERT", epoch0=0, dim=8):
    return [
        (
            op,
            i,
            f"t{i % 2}",
            "ns0",
            None if op == "DELETE" else [float(i % 7), float(i % 5)] + [0.1 * i % 1.0] * (dim - 2),
            None if op == "DELETE" else [i % 4],
            epoch0 + i,
        )
        for i in ids
    ]


SCHEMA = (
    "op string, id long, tenant string, namespace string, "
    "vector array<float>, tags array<int>, epoch long"
)


@pytest.fixture()
def coll(spark, tmp_path):
    c = VectorCollection(spark, str(tmp_path / "coll"), metric="ip")
    c.ingest(spark.createDataFrame(_ops(range(200)), SCHEMA))
    c.compact()
    c.build_indexes(nlist=8, m=4, nbits=4)
    return c


def _index_rows(spark, path):
    df = spark.read.parquet(f"{path}/index_stable")
    return {
        (r.id, int(r.centroid_id), tuple(r.codes)) for r in df.collect()
    }


def test_refresh_equals_full_reencode(spark, coll):
    # delta: update 10 ids, insert 5 new, delete 5
    delta = (
        _ops(range(0, 10), op="UPSERT", epoch0=10_000)
        + _ops(range(200, 205), epoch0=10_000)
        + _ops(range(20, 25), op="DELETE", epoch0=10_000)
    )
    coll.ingest(spark.createDataFrame(delta, SCHEMA))
    stats = coll.refresh_indexes()
    assert stats["n_touched"] == 20
    assert stats["n_reencoded"] == 15  # 10 updates + 5 inserts; deletes drop out

    # ground truth: full re-encode of current() with the same artifacts
    from write_optimized_vector_database_spark.operators.ivfpq import ivfpq_encode

    cents = spark.read.parquet(f"{coll.path}/index_centroids_stable")
    cbs = spark.read.parquet(f"{coll.path}/index_codebooks")
    cur = coll.current().filter(F.col("vector").isNotNull())
    want = {
        (r.id, int(r.centroid_id), tuple(r.codes))
        for r in ivfpq_encode(cur, cents, cbs, vec_col="vector", id_col="id").collect()
    }
    assert _index_rows(spark, coll.path) == want

    # deleted ids are gone from the index
    got_ids = {t[0] for t in _index_rows(spark, coll.path)}
    assert not ({20, 21, 22, 23, 24} & got_ids)
    assert {200, 201, 202, 203, 204} <= got_ids


def test_refresh_rewrites_only_affected_lists(spark, coll):
    files_before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{coll.path}/index_stable/centroid_id=*/*.parquet")
    }
    # touch exactly one existing id
    coll.ingest(
        spark.createDataFrame(_ops([0], op="UPSERT", epoch0=50_000), SCHEMA)
    )
    stats = coll.refresh_indexes()
    assert stats["n_touched"] == 1
    nlist_total = len(glob.glob(f"{coll.path}/index_stable/centroid_id=*"))
    assert stats["n_lists_rewritten"] < nlist_total
    untouched_same = 0
    for f, mt in files_before.items():
        if os.path.exists(f) and os.path.getmtime(f) == mt:
            untouched_same += 1
    # at least one partition survived byte-identical (not a full rewrite)
    assert untouched_same > 0


def test_refresh_noop_when_no_delta(coll):
    assert coll.refresh_indexes() == {
        "n_touched": 0,
        "n_reencoded": 0,
        "n_lists_rewritten": 0,
    }


def test_refresh_refuses_after_vacuum_past_index(spark, coll):
    coll.ingest(
        spark.createDataFrame(_ops([1], op="UPSERT", epoch0=60_000), SCHEMA)
    )
    coll.compact()
    coll.vacuum()  # vacuum_epoch now > index_epoch
    with pytest.raises(ValueError, match="vacuumed"):
        coll.refresh_indexes()


def test_two_phase_search_after_refresh(spark, coll):
    delta = _ops(range(0, 10), op="UPSERT", epoch0=10_000) + _ops(
        range(200, 210), epoch0=10_000
    )
    coll.ingest(spark.createDataFrame(delta, SCHEMA))
    coll.refresh_indexes()
    q = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [0.5] * 8)], "query_id long, query_vec array<float>"
    )
    out = coll.topk_two_phase(q, k=5, nprobe=8, rerank_factor=4)
    rows = out.collect()
    assert len(rows) == 10  # 2 queries × k
    # post-refresh the delta generation is empty: results come purely
    # from the refreshed stable index + rerank, and every returned id
    # must be currently visible
    vis = {r.id for r in coll.current().select("id").collect()}
    assert {r.vec_id for r in rows} <= vis


def test_streaming_ingest_with_online_maintenance(spark, coll, tmp_path):
    """Stream two delta files through start_maintained_ingest: after the
    drain, the stable index must equal a full re-encode of current()
    with the same artifacts — the index was maintained online, batch by
    batch, without a rebuild."""
    from write_optimized_vector_database_spark.operators.ivfpq import ivfpq_encode
    from write_optimized_vector_database_spark.streaming.ingest import (
        start_maintained_ingest,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    stream_schema = (
        "op string, id long, tenant string, namespace string, "
        "vector array<float>, tags array<int>, epoch long"
    )
    for i, delta in enumerate(
        [
            _ops(range(300, 320), epoch0=0),
            _ops(range(0, 10), op="DELETE", epoch0=0),
        ]
    ):
        spark.createDataFrame(delta, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = start_maintained_ingest(
            spark.readStream.schema(stream_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            coll,
            ckpt,
        )
        q.awaitTermination(120)

    # index epoch advanced past every streamed epoch → delta is empty
    assert coll._index_epoch() == coll.changelog().agg(F.max("epoch")).first()[0]
    cents = spark.read.parquet(f"{coll.path}/index_centroids_stable")
    cbs = spark.read.parquet(f"{coll.path}/index_codebooks")
    cur = coll.current().filter(F.col("vector").isNotNull())
    want = {
        (r.id, int(r.centroid_id), tuple(r.codes))
        for r in ivfpq_encode(cur, cents, cbs, vec_col="vector", id_col="id").collect()
    }
    assert _index_rows(spark, coll.path) == want
    got_ids = {t[0] for t in _index_rows(spark, coll.path)}
    assert {300, 310, 319} <= got_ids
    assert not (set(range(10)) & got_ids)


def test_refresh_property_random_op_sequences(spark, tmp_path):
    """Property gate: for random op sequences split at random points
    into (initial build, incremental delta), refresh_indexes must land
    the index in EXACTLY the state a full re-encode with the same
    artifacts produces — insert/upsert/delete in any interleaving."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from write_optimized_vector_database_spark.operators.ivfpq import ivfpq_encode

    op_strategy = st.lists(
        st.tuples(
            st.sampled_from(["INSERT", "UPSERT", "DELETE"]),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=5,
        max_size=25,
    )

    counter = {"n": 0}

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ops=op_strategy, split=st.integers(min_value=1, max_value=24))
    def check(ops, split):
        split = min(split, len(ops) - 1) or 1
        counter["n"] += 1
        path = str(tmp_path / f"prop_{counter['n']}")
        c = VectorCollection(spark, path, metric="ip")

        def rows(seq, epoch0):
            return [
                (
                    op,
                    i,
                    f"t{i % 2}",
                    "ns0",
                    None if op == "DELETE" else [float(i % 7), float(i % 5)] + [0.25] * 6,
                    None if op == "DELETE" else [i % 4],
                    epoch0 + k,
                )
                for k, (op, i) in enumerate(seq)
            ]

        # seed rows so the trainer always has vectors even if the random
        # prefix is delete-heavy
        seed = [("INSERT", 100 + j) for j in range(8)]
        c.ingest(spark.createDataFrame(rows(seed + ops[:split], 0), SCHEMA))
        c.compact()
        c.build_indexes(nlist=4, m=4, nbits=4)
        c.ingest(spark.createDataFrame(rows(ops[split:], 10_000), SCHEMA))
        c.refresh_indexes()

        cents = spark.read.parquet(f"{path}/index_centroids_stable")
        cbs = spark.read.parquet(f"{path}/index_codebooks")
        cur = c.current().filter(F.col("vector").isNotNull())
        want = {
            (r.id, int(r.centroid_id), tuple(r.codes))
            for r in ivfpq_encode(
                cur, cents, cbs, vec_col="vector", id_col="id"
            ).collect()
        }
        assert _index_rows(spark, path) == want

    check()


def test_delete_where_bulk_tombstones(spark, coll):
    """Bulk predicate delete: tombstones flow through the changelog, the
    visible view shrinks immediately, and refresh_indexes folds the
    removals into the stable index without a rebuild."""
    before = coll.current().count()
    n = coll.delete_where("tenant = 't1'")
    assert n > 0
    after = coll.current()
    assert after.count() == before - n
    assert after.filter(F.col("tenant") == "t1").count() == 0
    # the stable index still holds them until maintenance folds it in
    coll.refresh_indexes()
    live = {t[0] for t in _index_rows(spark, coll.path)}
    t1_ids = {i for i in range(200) if i % 2 == 1}
    assert not (live & t1_ids)
    # delete is idempotent at the semantic level: nothing left to match
    assert coll.delete_where(F.col("tenant") == "t1") == 0


def test_growth_odometer_flips_needs_rebuild(spark, coll):
    """VERDICT r09 #1: folds maintain freshness but never re-size — the
    rows-per-list odometer must notice sustained growth (rows/nlist
    exceeding alpha x the built ratio) and flip needs_rebuild(), and
    auto_resize() must rebuild at the sqrt-scaled nlist and reset it."""
    d0 = coll.describe_index()
    assert d0["index_rows_built"] == 200
    assert d0["index_rows"] == 200
    assert d0["needs_rebuild"] is False
    assert d0["rows_per_list"] == 25.0  # 200 rows / nlist=8

    # grow the corpus 5x through fold cycles: each refresh advances the
    # odometer by the fold's net entry delta
    for gen in range(4):
        base = 1_000 * (gen + 1)
        coll.ingest(
            spark.createDataFrame(
                _ops(range(base, base + 200), epoch0=100_000 * (gen + 1)),
                SCHEMA,
            )
        )
        res = coll.refresh_indexes()
        assert res["n_reencoded"] == 200
    d1 = coll.describe_index()
    assert d1["index_rows"] == 1_000
    assert d1["index_rows_built"] == 200
    assert d1["needs_rebuild"] is True  # 5x > alpha=4
    assert coll.needs_rebuild(alpha=6.0) is False  # ratio-parameterized
    # sqrt scaling: nlist 8 * sqrt(5) -> 18
    assert d1["recommended_nlist"] == 18
    # refresh_indexes surfaced the flag for recommend-only deployments
    assert res["needs_rebuild"] is True

    # auto_resize rebuilds at the recommended geometry and resets the
    # odometer; rows-per-list returns to ~the built ratio
    out = coll.auto_resize()
    assert out is not None
    assert out["needs_rebuild"] is False
    assert out["index_rows_built"] == out["index_rows"] == 1_000
    assert coll._meta()["index_nlist"] == 18
    # sqrt scaling splits the 5x growth between per-list size and probe
    # count: rows-per-list lands at ~sqrt(5) x the built ratio (55.6),
    # not the 125 a fixed nlist would have reached
    assert out["rows_per_list"] == round(1_000 / 18, 2)
    # a second call is a no-op (nothing outgrown)
    assert coll.auto_resize() is None

    # and the rebuilt index still serves correctly: probe every list of
    # the NEW geometry with a covering budget → exactly the filtered
    # oracle (fresh stats so the survivor estimate covers all of t0)
    coll.analyze()
    queries = spark.createDataFrame(
        [(0, [1.0, 1.0] + [0.5] * 6)], "query_id long, query_vec array<float>"
    )
    got = coll.topk_two_phase(queries, k=5, nprobe=18, rerank_factor=90,
                              tenant="t0")
    exact = coll.topk(queries, k=5, tenant="t0")
    assert {(r["query_id"], r["vec_id"]) for r in got.collect()} == {
        (r["query_id"], r["vec_id"]) for r in exact.collect()
    }


def test_odometer_counts_net_delta_not_gross(spark, coll):
    """Upserts and deletes must not inflate the odometer: re-encoding an
    EXISTING id replaces its entry (net 0), a delete removes one."""
    coll.ingest(
        spark.createDataFrame(
            _ops(range(0, 50), op="UPSERT", epoch0=10_000), SCHEMA
        )
    )
    coll.refresh_indexes()
    assert coll.describe_index()["index_rows"] == 200  # replaced, not added
    coll.ingest(
        spark.createDataFrame(
            _ops(range(0, 30), op="DELETE", epoch0=20_000), SCHEMA
        )
    )
    coll.refresh_indexes()
    assert coll.describe_index()["index_rows"] == 170
    assert coll.describe_index()["needs_rebuild"] is False
