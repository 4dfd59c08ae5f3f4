"""Hypothesis property tests over the pure-Python/numpy primitives —
the pieces whose edge cases a fixture can't enumerate: the stdlib PNG
codec (arbitrary pixel content/sizes), the driver-side k-means
(degenerate distributions: identical points, tiny n, k > n), and the
portable hash/sampling primitives (bounds, determinism).

No SparkSession: these run in milliseconds and fuzz the seams the
oracle queries exercise only at fixed shapes.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from write_optimized_vector_database_spark.operators.multimodal import (
    decode_png,
    encode_png,
)
from write_optimized_vector_database_spark.operators.pq import (
    _kmeans_np,
    _kmeans_pp_init,
)


@st.composite
def rgb_images(draw):
    w = draw(st.integers(min_value=1, max_value=17))
    h = draw(st.integers(min_value=1, max_value=13))
    px = draw(
        st.lists(
            st.lists(
                st.tuples(*[st.integers(0, 255)] * 3), min_size=w, max_size=w
            ),
            min_size=h,
            max_size=h,
        )
    )
    return px


@settings(max_examples=40, deadline=None)
@given(rgb_images())
def test_png_roundtrip_any_content(px):
    w0, h0 = len(px[0]), len(px)
    w, h, ch, raw = decode_png(encode_png(px))
    assert (w, h, ch) == (w0, h0, 3)
    flat = bytes(c for row in px for p in row for c in p)
    assert raw == flat


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=6),
    st.booleans(),
    st.booleans(),
)
def test_kmeans_never_crashes_and_bounds_centers(n, k, d, identical, pp):
    """Degenerate inputs (all-identical points, k > n, d = 1) must not
    crash — including the k-means++ D²-seeding path whose
    searchsorted-off-the-end edge is clamped — and every returned
    center must lie inside the data's bounding box."""
    rng = np.random.RandomState(7)
    if identical:
        x = np.ones((n, d), dtype=np.float32) * 3.25
    else:
        x = rng.randn(n, d).astype(np.float32)
    cents = _kmeans_np(x, k, rng, max_iter=4, init_pp=pp)
    assert cents.shape == (min(k, n), d)
    lo, hi = x.min(0) - 1e-4, x.max(0) + 1e-4
    assert (cents >= lo).all() and (cents <= hi).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=2, max_value=64), st.integers(min_value=2, max_value=8))
def test_kmeans_pp_seeding_stays_in_sample(n, k):
    """++ seeding with a pathological mass distribution (one far
    outlier dominating D²) returns rows OF THE SAMPLE, never NaN or
    out-of-range indices (the clamped-searchsorted contract)."""
    rng = np.random.RandomState(11)
    x = np.zeros((n, 3), dtype=np.float32)
    x[-1] = 1e6  # all D² mass on one point → cumsum edge is live
    cents = _kmeans_pp_init(x, min(k, n), rng)
    assert np.isfinite(cents).all()
    rows = {tuple(r) for r in x.tolist()}
    assert all(tuple(c) in rows for c in cents.tolist())


@settings(max_examples=50, deadline=None)
@given(st.text(min_size=0, max_size=40))
def test_portable_hash_py_twin_bounds(s):
    """The Python twin of portable_hash (md5 first 8 hex chars) is
    non-negative, < 2^32, and deterministic — the contract every
    hash-sampling oracle relies on."""
    import hashlib

    h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
    assert 0 <= h < 2**32
    h2 = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
    assert h == h2


def test_candidate_budget_clamps_adversarial_requests():
    """k x rerank must never exceed max_candidates across branches —
    the config.h:129 guard against a rerank-join blowup."""
    from write_optimized_vector_database_spark.config import (
        QueryLimits,
        candidate_budget,
    )

    limits = QueryLimits()
    assert candidate_budget(10, 4) == 40
    assert candidate_budget(100, 1000) == limits.max_candidates
    assert candidate_budget(100, 1000, n_branches=2) == limits.max_candidates // 2
    assert candidate_budget(1, 1) == 1
    assert candidate_budget(0, 0) == 1  # degenerate request still scans something


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1, max_value=4),
)
def test_candidate_budget_invariants(k, rf, branches):
    from write_optimized_vector_database_spark.config import (
        QueryLimits,
        candidate_budget,
    )

    limits = QueryLimits()
    b = candidate_budget(k, rf, n_branches=branches)
    assert 1 <= b <= limits.max_candidates // branches or b == 1
    assert b <= max(1, k * rf)
