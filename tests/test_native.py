"""Native (C++) host components: build, parity vs the scipy oracle, speed.

The grid-hash greedy radius NMS (openglue_tpu/native/nms.cpp) must reproduce
the scipy KD-tree implementation exactly (reference
models/features/opencv/base.py:161-182 semantics) — same keep mask, not just
the same count — whenever responses are distinct (ties are visit-order-
dependent in both implementations).
"""

import numpy as np
import pytest

from openglue_tpu import native
from openglue_tpu.features.opencv_features import nms_keypoints, nms_keypoints_scipy

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def _distinct_responses(rng, n):
    # distinct responses => deterministic greedy order => exact mask parity
    return rng.permutation(n).astype(np.float32) / n


@pytest.mark.parametrize("n,extent,radius", [
    (1, 100.0, 4.5),
    (10, 10.0, 3.0),
    (500, 300.0, 4.5),
    (5000, 960.0, 4.5),
    (5000, 50.0, 9.0),      # heavy suppression: dense cluster
    (2000, 6000.0, 0.8),    # sparse: almost nothing suppressed
])
def test_mask_parity_vs_scipy(n, extent, radius):
    rng = np.random.default_rng(n)
    kpts = (rng.random((n, 2)) * extent).astype(np.float32)
    resp = _distinct_responses(rng, n)
    keep_native = native.nms_keypoints_native(kpts, resp, radius)
    keep_scipy = nms_keypoints_scipy(kpts, resp, radius)
    np.testing.assert_array_equal(keep_native, keep_scipy)


def test_huge_extent_tiny_radius_is_bounded():
    # A tiny radius over a huge coordinate extent used to allocate
    # O((extent/radius)^2) grid cells (gigabytes, int32 overflow). The cell
    # size is now clamped to extent/4096, so this runs in bounded memory and
    # still matches the scipy oracle exactly.
    rng = np.random.default_rng(11)
    kpts = (rng.random((2000, 2)) * 1e7).astype(np.float32)
    resp = _distinct_responses(rng, 2000)
    keep_native = native.nms_keypoints_native(kpts, resp, 0.5)
    assert keep_native is not None
    np.testing.assert_array_equal(keep_native, nms_keypoints_scipy(kpts, resp, 0.5))
    # non-finite coordinates: native reports unavailable, dispatch falls back
    bad = kpts.copy()
    bad[0, 0] = np.nan
    assert native.nms_keypoints_native(bad, resp, 0.5) is None


def test_tie_handling_matches_scipy():
    # quantized responses (ORB/FAST-style) tie constantly; the native kernel
    # and the scipy fallback must break ties identically (stable, by index)
    # so cached features are host-toolchain-independent.
    rng = np.random.default_rng(13)
    kpts = (rng.random((3000, 2)) * 500.0).astype(np.float32)
    resp = rng.integers(0, 8, size=3000).astype(np.float32)  # heavy ties
    keep_native = native.nms_keypoints_native(kpts, resp, 4.5)
    keep_scipy = nms_keypoints_scipy(kpts, resp, 4.5)
    np.testing.assert_array_equal(keep_native, keep_scipy)


def test_duplicate_coordinates():
    # coincident keypoints: exactly one survivor per site (the max response)
    rng = np.random.default_rng(0)
    sites = (rng.random((20, 2)) * 1000.0).astype(np.float32)
    kpts = np.repeat(sites, 5, axis=0)
    resp = _distinct_responses(rng, len(kpts))
    keep = native.nms_keypoints_native(kpts, resp, 1.0)
    assert keep.sum() == 20
    for s in range(20):
        grp = slice(5 * s, 5 * s + 5)
        assert keep[grp].sum() == 1
        assert resp[grp][keep[grp]][0] == resp[grp].max()


def test_edge_cases():
    empty = native.nms_keypoints_native(
        np.zeros((0, 2), np.float32), np.zeros((0,), np.float32), 4.5
    )
    assert empty.shape == (0,)
    one = native.nms_keypoints_native(
        np.array([[3.0, 7.0]], np.float32), np.array([0.5], np.float32), 4.5
    )
    assert one.tolist() == [True]
    # radius 0: distinct coordinates all survive, but coincident duplicates
    # are suppressed (scipy query_ball_point(r=0) semantics)
    rng = np.random.default_rng(1)
    kpts = (rng.random((64, 2)) * 10).astype(np.float32)
    resp = _distinct_responses(rng, 64)
    keep = native.nms_keypoints_native(kpts, resp, 0.0)
    assert keep.all()
    dup_kpts = np.concatenate([kpts, kpts[:8]], axis=0)
    dup_resp = _distinct_responses(rng, 72)
    keep_dup = native.nms_keypoints_native(dup_kpts, dup_resp, 0.0)
    assert keep_dup.sum() == 64
    np.testing.assert_array_equal(
        keep_dup, nms_keypoints_scipy(dup_kpts, dup_resp, 0.0)
    )


def test_dispatch_uses_native():
    # the public nms_keypoints must produce the oracle mask too (it routes
    # through the native kernel when available)
    rng = np.random.default_rng(7)
    kpts = (rng.random((800, 2)) * 500.0).astype(np.float32)
    resp = _distinct_responses(rng, 800)
    np.testing.assert_array_equal(
        nms_keypoints(kpts, resp, 4.5), nms_keypoints_scipy(kpts, resp, 4.5)
    )


def test_native_is_faster_at_dense_counts():
    import time

    rng = np.random.default_rng(3)
    n = 20_000  # dense-detection scale (thresholds disabled in the cacher)
    kpts = (rng.random((n, 2)) * np.array([960.0, 720.0])).astype(np.float32)
    resp = _distinct_responses(rng, n)

    native.nms_keypoints_native(kpts, resp, 4.5)  # warm (build already done)
    t0 = time.perf_counter()
    native.nms_keypoints_native(kpts, resp, 4.5)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    nms_keypoints_scipy(kpts, resp, 4.5)
    t_scipy = time.perf_counter() - t0
    # conservative bound (measured ~40x); guards against silently shipping a
    # native path slower than the fallback
    assert t_native < t_scipy / 3, f"native {t_native:.4f}s vs scipy {t_scipy:.4f}s"
