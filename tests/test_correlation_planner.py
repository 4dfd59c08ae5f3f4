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


def test_refresh_staleness_and_reanalyze(spark, tmp_path):
    # the probe-support prune must stop trusting the histograms after a
    # refresh fold (folded rows may add values to lists the build never
    # saw — a support miss then skips REAL rows), and analyze_correlation
    # re-arms it against the refreshed index
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
    c.build_indexes(nlist=4, m=3, nbits=8)
    assert c.describe_index()["corr_stats_fresh"] is True
    assert c._corr_probe_support(tenant="t0") is not None

    more = [
        ("INSERT", 10_000 + i, "t9", "ns0", _vec(i), [i % 5], 10_000 + i)
        for i in range(40)
    ]
    c.ingest(spark.createDataFrame(more, schema))
    c.refresh_indexes()
    assert c.describe_index()["corr_stats_fresh"] is False
    assert c._corr_probe_support(tenant="t0") is None  # prune disarmed

    corr = c.analyze_correlation()
    assert c.describe_index()["corr_stats_fresh"] is True
    assert "t9" in corr["tenant"]  # folded rows are in the recomputed stats
    assert c._corr_probe_support(tenant="t0") is not None
