"""Auto-escalating build_indexes(target_recall=...) — VERDICT r05 #2:
the build walks the m/spill/OPQ ladder until its own sampled recall
probe clears the target at the reference serving knobs, and records
the measured ladder + chosen configuration in the manifest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.collection import VectorCollection


def _ops(ids, dim=16):
    # well-clustered vectors (4 tight clusters) so the FIRST rung
    # already clears the target and the early-stop path is exercised
    rows = []
    for i in ids:
        c = i % 4
        vec = [float(c == j // 4) + 0.001 * (i % 7) for j in range(dim)]
        rows.append(("INSERT", i, "t0", "ns0", vec, [0], i))
    return rows


SCHEMA = (
    "op string, id long, tenant string, namespace string, "
    "vector array<float>, tags array<int>, epoch long"
)


@pytest.fixture()
def coll(spark, tmp_path):
    c = VectorCollection(spark, str(tmp_path / "coll"), metric="ip")
    c.ingest(spark.createDataFrame(_ops(range(240)), SCHEMA))
    c.compact()
    return c


def test_autotune_meets_target_and_records_ladder(spark, coll):
    chosen = coll.build_indexes(nlist=4, target_recall=0.9)
    assert chosen["recall"] >= 0.9
    assert chosen["target_met"] is True
    tune = coll._meta()["auto_tune"]
    assert tune["target_met"] is True
    assert tune["chosen"] == {k: v for k, v in chosen.items() if k != "target_met"}
    assert tune["nprobe"] == 12 and tune["rerank_factor"] == 4
    assert 1 <= len(tune["ladder"]) <= 3
    # ladder entries carry the full knob set + measured recall + per-rung
    # wall times (bench governance, VERDICT r06 #2)
    for rung in tune["ladder"]:
        assert {"m", "spill", "use_opq", "recall", "build_s", "probe_s"} == set(rung)
        assert rung["build_s"] > 0 and rung["probe_s"] > 0
    # clustered fixture: the cheap first rung should suffice (early stop)
    assert len(tune["ladder"]) == 1
    assert tune["ladder"][0]["use_opq"] is False


def test_autotune_index_is_servable(spark, coll):
    coll.build_indexes(nlist=4, target_recall=0.9)
    q = (
        coll.current()
        .orderBy("id")
        .limit(3)
        .select(F.col("id").alias("query_id"), F.col("vector").alias("query_vec"))
    )
    out = coll.topk_two_phase(q, k=5).collect()
    assert len(out) == 15
    # self-query: the vector itself must rank first under IP here
    top = {r.query_id: r.vec_id for r in out if r.rank == 1}
    for qid, vid in top.items():
        assert vid % 4 == qid % 4  # same cluster


def test_autotune_m_divides_dim(spark, tmp_path):
    # dim=10: dim//8=1, dim//4=2 — both divide; ladder must not pick a
    # non-divisor m
    c = VectorCollection(spark, str(tmp_path / "c10"), metric="ip")
    rows = [
        ("INSERT", i, "t0", "ns0", [float((i + j) % 5) for j in range(10)], [0], i)
        for i in range(60)
    ]
    c.ingest(spark.createDataFrame(rows, SCHEMA))
    c.compact()
    chosen = c.build_indexes(nlist=2, target_recall=0.5)
    assert 10 % chosen["m"] == 0


def test_escalation_gap_jump_policy():
    # pure rung-advance policy (no Spark): the gap-jump that keeps a
    # wide miss from rebuilding intermediate rungs it cannot pass
    from write_optimized_vector_database_spark.collection import _escalation_next

    # the jump threshold is the LARGEST measured single-rung gain
    # (+0.15, rung 0 → rung 1 on the SCALE.md ladder) — a 0.10 miss is
    # closable by the next rung and must NOT skip it (ADVICE r06)
    assert _escalation_next(0, 3, shortfall=0.05) == 1
    assert _escalation_next(0, 3, shortfall=0.10) == 1
    assert _escalation_next(0, 3, shortfall=0.15) == 1
    # wide miss at the bottom of a 3-rung ladder: jump to the top
    assert _escalation_next(0, 3, shortfall=0.20) == 2
    # wide miss one below the top: plain step (nothing to skip)
    assert _escalation_next(1, 3, shortfall=0.20) == 2
    # wide miss AT the top rung: walks off the ladder (loop terminates)
    assert _escalation_next(2, 3, shortfall=0.20) == 3
    # 2-rung ladder: never anything to skip
    assert _escalation_next(0, 2, shortfall=0.30) == 1


def test_autotune_exhausted_ladder_records_miss(spark, coll):
    # unreachable target: the ladder runs out below it. The strongest
    # rung still serves, but the miss must be recorded (target_met=False)
    # and the certification left stale so describe_index()/serving never
    # present a missed target as certified (ADVICE r06 medium).
    chosen = coll.build_indexes(nlist=4, target_recall=1.01)
    assert chosen["target_met"] is False
    meta = coll._meta()
    assert meta["auto_tune"]["target_met"] is False
    assert meta["calibrated_stale"] is True
    d = coll.describe_index()
    assert d["certified"] is False and d["certified_recall"] is None
    assert d["serving_nprobe"] == 8  # plain default, not the missed knob
    # the measured ladder is still recorded for observability
    assert len(meta["auto_tune"]["ladder"]) >= 1


def test_knob_explicit_rebuild_stales_certification(spark, coll):
    coll.build_indexes(nlist=4, target_recall=0.9)
    assert coll._default_nprobe() == 12  # certified serving knob
    # a knob-explicit rebuild overwrites the certified index: the recall
    # promise no longer describes what is on disk, so serving must fall
    # back to the plain default instead of the stale certified knob
    coll.build_indexes(nlist=4, m=2)
    assert coll._meta()["calibrated_stale"] is True
    assert coll._default_nprobe() == 8
    # re-running the auto build re-certifies
    coll.build_indexes(nlist=4, target_recall=0.9)
    assert coll._meta()["calibrated_stale"] is False
    assert coll._default_nprobe() == 12


def test_describe_index_observability(spark, coll):
    coll.build_indexes(nlist=4, target_recall=0.9)
    d = coll.describe_index()
    assert d["certified"] is True and d["serving_nprobe"] == 12
    assert d["certified_recall"] >= 0.9 and d["certified_family"] == "ivfpq"
    assert d["auto_tune"]["chosen"]["recall"] == d["certified_recall"]
    assert d["index_build_id"] >= 1 and d["centroids_path"].startswith("index_centroids_stable")
    coll.build_indexes(nlist=4, m=2)
    d2 = coll.describe_index()
    assert d2["certified"] is False and d2["certified_recall"] is None
    assert d2["serving_nprobe"] == 8  # fallback, not the stale knob
    assert d2["index_build_id"] == d["index_build_id"] + 1


def test_default_nprobe_family_guard(spark, coll):
    # ADVICE r07: an nprobe certified for one index family (e.g. plain
    # IVF via build_ivf_index's calibration) must not serve a read path
    # of a DIFFERENT family — two-phase asks for family="ivfpq" and gets
    # the plain default on mismatch instead of a foreign certified knob.
    coll._meta_update(
        calibrated_nprobe=24, calibrated_family="ivf", calibrated_stale=False
    )
    assert coll._default_nprobe() == 24  # unguarded: stored knob
    assert coll._default_nprobe(family="ivf") == 24  # matching family
    assert coll._default_nprobe(family="ivfpq") == 8  # mismatch -> fallback
    # and symmetrically for a two-phase certification serving plain IVF
    coll._meta_update(calibrated_family="ivfpq")
    assert coll._default_nprobe(family="ivfpq") == 24
    assert coll._default_nprobe(family="ivf") == 8
