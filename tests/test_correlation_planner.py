"""Correlation-aware filtered-search planner (VERDICT r08 #1).

Round 8 measured the failure this defends: POST-filtering recall
collapses to 0.5 when a PERMISSIVE filter correlates with the index
geometry (tenant ≡ cluster parity — odd queries' allowed neighbors
live in posting lists the unfiltered shortlist never reaches, and no
over-fetch factor fixes absence), while PRE stays exact on the same
corpus. Marginal selectivity cannot see this; the build-time
per-filter-value centroid histograms can, for one L1 distance per
constrained value — ZERO Spark jobs at plan time.

The corpus here is the miniature of the round-8 adversarial soak
variant: 8 well-separated clusters (id % 8), a parity component that
pulls odd clusters together (so an odd query's unfiltered shortlist
fills with t1 rows from OTHER odd clusters before any even cluster is
reached), tenant ≡ cluster parity (the correlated filter, sel = 0.5),
and a hash-assigned namespace (the independent control, also sel ≈
0.5). Reference filter surface: msg-buf.h:236-255, types.h:67-75.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.collection import VectorCollection

_N = 800
_NLIST = 8
_DIM = 9  # dims 0..7 = cluster one-hots, dim 8 = parity axis


def _vec(i: int) -> list[float]:
    c = i % 8
    parity = 1.0 if c % 2 else -1.0
    b = (i % 101) * 0.05 + i * 1e-5  # injective ranking signal along u
    u = 1.0 / math.sqrt(8.0)
    v = [b * u] * 8 + [parity * 6.0]
    v[c] += 10.0
    return [float(x) for x in v]


@pytest.fixture(scope="module")
def coll(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("corrplan") / "c"
    schema = (
        "op string, id long, tenant string, namespace string, "
        "vector array<float>, tags array<int>, epoch long"
    )
    rows = [
        (
            "INSERT",
            i,
            f"t{(i % 8) % 2}",  # tenant ≡ cluster parity: CORRELATED
            f"ns{(i * 2654435761) % 97 % 2}",  # hash parity: INDEPENDENT
            _vec(i),
            [i % 5],
            i,
        )
        for i in range(_N)
    ]
    c = VectorCollection(spark, str(path), metric="ip")
    c.ingest(spark.createDataFrame(rows, schema))
    c.compact()
    c.build_indexes(nlist=_NLIST, m=3, nbits=8)
    return c


@pytest.fixture(scope="module")
def queries(spark, coll):
    qrows = (
        coll.current()
        .filter(F.col("id") < 8)  # one member query per cluster
        .select(F.col("id").alias("query_id"), F.col("vector").alias("query_vec"))
        .collect()
    )
    return spark.createDataFrame(qrows, "query_id long, query_vec array<float>")


def _key_set(df):
    return {(r["query_id"], r["vec_id"], r["rank"]) for r in df.collect()}


def test_corr_stats_collected_and_bounded(coll):
    corr = coll._meta()["corr_stats"]
    assert set(corr["tenant"]) == {"t0", "t1"}
    assert set(corr["namespace"]) == {"ns0", "ns1"}
    assert set(corr["tag"]) == {"0", "1", "2", "3", "4"}
    # global histogram covers every posting list; per-value histograms
    # nest inside it (every indexed row is counted globally)
    assert len(corr["global"]) == _NLIST
    assert sum(corr["global"].values()) == _N
    for h in corr["tenant"].values():
        assert set(h) <= set(corr["global"])


def test_divergence_separates_correlated_from_independent(coll):
    # tenant ≡ cluster parity: t0 mass sits on half the centroids →
    # L1 ≈ 1.0 (2 × total variation 0.5), far above the noise floor
    l1_t, noise_t = coll._correlation_divergence(tenant="t0")
    assert l1_t > 0.8 and l1_t > noise_t
    # hash-assigned namespace: independent of geometry → L1 at the
    # sampling-noise floor, NOT flagged
    l1_ns, noise_ns = coll._correlation_divergence(namespace="ns0")
    assert l1_ns < max(0.25, noise_ns)
    # unknown / unconstrained values can't answer
    assert coll._correlation_divergence() is None
    assert coll._correlation_divergence(tenant="t999") is None


def test_planner_forces_pre_on_correlated_filter(coll):
    # both filters are permissive (sel ≈ 0.5 ≥ 0.2) — selectivity alone
    # says POST for both; only the correlation guard separates them
    strat_t, sel_t = coll.plan_filtered_strategy(tenant="t0")
    assert strat_t == "pre" and 0.4 < sel_t < 0.6
    strat_ns, sel_ns = coll.plan_filtered_strategy(namespace="ns0")
    assert strat_ns == "post" and 0.4 < sel_ns < 0.6
    # counterfactual: with the guard disabled the correlated filter
    # would have taken the recall cliff
    assert coll.plan_filtered_strategy(tenant="t0", corr_threshold=99.0)[0] == "post"


def test_auto_route_restores_recall_e2e(spark, coll, queries):
    # the defended failure, end to end: forced POST fills odd queries'
    # shortlists with t1 rows from other odd clusters (parity axis) and
    # returns the WRONG rows; the auto route (planner → PRE semi-join)
    # matches the exact filtered oracle with no user hint
    exact = coll.topk(queries, k=5, tenant="t0")
    auto = coll.topk_two_phase(queries, k=5, rerank_factor=8, tenant="t0")
    assert _key_set(auto) == _key_set(exact)
    post = coll.topk_two_phase(
        queries, k=5, rerank_factor=8, tenant="t0", filter_strategy="post"
    )
    assert _key_set(post) != _key_set(exact)
    # the misses are exactly the odd (cross-parity) queries: their
    # allowed neighbors live outside the unfiltered shortlist
    exact_odd = {t for t in _key_set(exact) if t[0] % 2 == 1}
    post_odd = {t for t in _key_set(post) if t[0] % 2 == 1}
    assert len(post_odd & exact_odd) < len(exact_odd) / 2


def test_plain_ivf_collection_gets_guard(spark, tmp_path):
    # a collection that only ever built the plain-IVF index (Q3 path,
    # topk_filtered) deserves the same correlation defense; its
    # histograms are labeled 'ivf' and the STABLE probe-support prune
    # must refuse them (centroid ids are a per-index space)
    schema = (
        "op string, id long, tenant string, namespace string, "
        "vector array<float>, tags array<int>, epoch long"
    )
    rows = [
        ("INSERT", i, f"t{(i % 8) % 2}", "ns0", _vec(i), [i % 5], i)
        for i in range(400)
    ]
    c = VectorCollection(spark, str(tmp_path / "c"), metric="ip")
    c.ingest(spark.createDataFrame(rows, schema))
    c.compact()
    c.build_ivf_index(nlist=8)
    corr = c._meta()["corr_stats"]
    assert corr["index"] == "ivf"
    strat, sel = c.plan_filtered_strategy(tenant="t0")
    assert strat == "pre" and 0.4 < sel < 0.6  # guard fires on IVF stats
    assert c._corr_probe_support(tenant="t0") is None  # wrong space
    # the IVF-space support IS usable by the plain-IVF read path: the
    # parity tenant occupies half the lists, probe ranking skips the rest
    support = c._corr_probe_support(tenant="t0", index_label="ivf")
    assert support is not None and len(support) < 8  # strictly pruned
    # e2e through topk_ivf: pruned probing still returns only allowed
    # rows and matches the exact filtered oracle at a covering nprobe
    queries = spark.createDataFrame(
        [(i, _vec(i)) for i in (0, 1)], "query_id long, query_vec array<float>"
    )
    exact = c.topk(queries, k=5, tenant="t0")
    got = c.topk_ivf(queries, k=5, nprobe=8, tenant="t0")
    assert _key_set(got) == _key_set(exact)


def test_refresh_maintains_histograms_and_reanalyze(spark, tmp_path):
    # VERDICT r09 #5: refresh folds used to disarm the probe-support
    # prune (corr_stats_fresh=False), so a deployment folding on a
    # serving cadence never had it on. The fold now maintains the
    # histograms ADD-ONLY from its own output — the prune stays ARMED
    # across folds, and soundness holds: a folded row of an existing
    # value landing in a list the build never saw for that value must
    # extend the value's support (a support miss there would skip a
    # REAL stable row — the delta branch no longer covers it once the
    # epoch advances past the fold).
    schema = (
        "op string, id long, tenant string, namespace string, "
        "vector array<float>, tags array<int>, epoch long"
    )
    rows = [
        ("INSERT", i, f"t{(i % 8) % 2}", "ns0", _vec(i), [i % 5], i)
        for i in range(200)
    ]
    c = VectorCollection(spark, str(tmp_path / "c"), metric="ip")
    c.ingest(spark.createDataFrame(rows, schema))
    c.compact()
    c.build_indexes(nlist=_NLIST, m=3, nbits=8)
    assert c.describe_index()["corr_stats_fresh"] is True
    support_before = c._corr_probe_support(tenant="t0")
    assert support_before is not None

    # fold t0 rows whose vectors live in ODD clusters — lists the build
    # saw only t1 in (tenant ≡ parity at build) — plus a brand-new
    # tenant value outside the build-time histogram
    more = [
        ("INSERT", 10_000 + i, "t0", "ns0", _vec(2 * i + 1), [i % 5],
         10_000 + i)
        for i in range(40)
    ] + [
        ("INSERT", 20_000 + i, "t9", "ns0", _vec(i), [i % 5], 20_000 + i)
        for i in range(10)
    ]
    c.ingest(spark.createDataFrame(more, schema))
    res = c.refresh_indexes()
    assert res["n_reencoded"] >= 50
    # the prune stays armed and t0's support now covers the odd lists
    assert c.describe_index()["corr_stats_fresh"] is True
    support_after = c._corr_probe_support(tenant="t0")
    assert support_after is not None
    assert set(support_before) < set(support_after)  # strictly extended
    # the new value is NOT admitted (manifest stays heavy-hitter
    # bounded); its filter simply gets no pruning — the safe default
    assert "t9" not in c._meta()["corr_stats"]["tenant"]
    assert c._corr_probe_support(tenant="t9") is None

    # e2e soundness: the folded odd-cluster t0 rows are STABLE rows now
    # (epoch advanced past them — no delta branch rescues a prune miss);
    # the pruned PRE path must still match the exact filtered oracle,
    # including for queries whose neighbors are exactly those rows
    queries = spark.createDataFrame(
        [(int(r.id), list(r.vector)) for r in
         c.current().filter(F.col("id").isin([10_001, 10_003])).collect()],
        "query_id long, query_vec array<float>",
    )
    exact = c.topk(queries, k=5, tenant="t0")
    got = c.topk_two_phase(
        queries, k=5, rerank_factor=90, tenant="t0", filter_strategy="pre",
        escalate_nprobe=True,
    )
    assert _key_set(got) == _key_set(exact)

    # analyze_correlation still re-tightens on its own cadence and
    # admits the new heavy hitter
    corr = c.analyze_correlation()
    assert c.describe_index()["corr_stats_fresh"] is True
    assert "t9" in corr["tenant"]
    assert c._corr_probe_support(tenant="t9") is not None


def test_ingest_disarms_ivf_prune(spark, tmp_path):
    # ADVICE r09 (medium): topk_ivf has NO delta branch — an upsert that
    # moves a row's tenant leaves the OLD vector indexed in a list
    # outside the NEW value's support, and a still-armed prune would
    # skip a row the unpruned path returns. Any ingest after
    # build_ivf_index must disarm the 'ivf'-labeled histograms.
    schema = (
        "op string, id long, tenant string, namespace string, "
        "vector array<float>, tags array<int>, epoch long"
    )
    rows = [
        ("INSERT", i, f"t{(i % 8) % 2}", "ns0", _vec(i), [i % 5], i)
        for i in range(400)
    ]
    c = VectorCollection(spark, str(tmp_path / "c"), metric="ip")
    c.ingest(spark.createDataFrame(rows, schema))
    c.compact()
    c.build_ivf_index(nlist=8)
    assert c._corr_probe_support(tenant="t0", index_label="ivf") is not None

    # upsert: row 1 (odd cluster, indexed under t1's lists) moves to t0
    vec1 = list(c.current().filter(F.col("id") == 1).first()["vector"])
    c.ingest(spark.createDataFrame(
        [("INSERT", 1, "t0", "ns0", vec1, [1], 50_000)], schema))
    assert c.describe_index()["corr_stats_fresh"] is False
    assert c._corr_probe_support(tenant="t0", index_label="ivf") is None

    # pruned and unpruned paths now agree BY CONSTRUCTION (no pruning);
    # the moved row is current-allowed and indexed, so it must appear
    queries = spark.createDataFrame(
        [(1, vec1)], "query_id long, query_vec array<float>"
    )
    got = c.topk_ivf(queries, k=3, nprobe=8, tenant="t0")
    assert 1 in {r["vec_id"] for r in got.collect()}

    # analyze_correlation re-arms against the IVF index consistently
    # with current() values (label preserved, ADVICE r09 low #5)
    corr = c.analyze_correlation()
    assert corr["index"] == "ivf"
    assert c.describe_index()["corr_stats_fresh"] is True
    sup = c._corr_probe_support(tenant="t0", index_label="ivf")
    assert sup is not None
    got2 = c.topk_ivf(queries, k=3, nprobe=8, tenant="t0")
    assert 1 in {r["vec_id"] for r in got2.collect()}


def test_analyze_correlation_resolves_index_without_stats(spark, tmp_path):
    # ADVICE r09 low #5: on a collection whose corr_stats were never
    # collected (legacy manifest), analyze_correlation must resolve the
    # index that actually exists instead of assuming index_stable —
    # an IVF-only collection used to raise AnalysisException.
    schema = (
        "op string, id long, tenant string, namespace string, "
        "vector array<float>, tags array<int>, epoch long"
    )
    rows = [
        ("INSERT", i, f"t{i % 2}", "ns0", _vec(i), [i % 5], i)
        for i in range(100)
    ]
    c = VectorCollection(spark, str(tmp_path / "c"), metric="ip")
    c.ingest(spark.createDataFrame(rows, schema))
    c.compact()
    # nothing built yet → nothing to analyze, no raise
    assert c.analyze_correlation() is None
    c.build_ivf_index(nlist=4)
    # simulate a legacy manifest: strip the stats the build collected
    c._meta_update(corr_stats=None, corr_stats_fresh=False)
    corr = c.analyze_correlation()
    assert corr is not None and corr["index"] == "ivf"
