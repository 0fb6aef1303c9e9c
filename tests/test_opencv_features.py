"""Host-side OpenCV extractor tests (cached-extraction path)."""

import numpy as np
import pytest

from openglue_tpu.features.opencv_features import (
    lafs_from_opencv_keypoints,
    nms_keypoints,
    normalize_descriptors,
    sift_create,
)
from openglue_tpu.features.registry import get_feature_extractor, is_device_extractor


def checkerboard_image(h=240, w=320, cell=16):
    ys, xs = np.mgrid[0:h, 0:w]
    img = (((ys // cell) + (xs // cell)) % 2 * 255).astype(np.uint8)
    rng = np.random.default_rng(0)
    return np.clip(img + rng.normal(0, 10, img.shape), 0, 255).astype(np.uint8)


def test_rootsift_normalization():
    d = np.abs(np.random.default_rng(0).normal(size=(10, 128))).astype(np.float32)
    root = normalize_descriptors(d, root_norm=True)
    np.testing.assert_allclose(np.sum(root**2, axis=1), 1.0, atol=1e-5)  # sqrt of L1-normed
    l2 = normalize_descriptors(d, root_norm=False)
    np.testing.assert_allclose(np.linalg.norm(l2, axis=1), 1.0, atol=1e-5)


def test_nms_greedy_radius():
    kpts = np.array([[0, 0], [1, 0], [10, 10], [10.5, 10]], np.float32)
    resp = np.array([0.9, 0.5, 0.3, 0.8], np.float32)
    keep = nms_keypoints(kpts, resp, radius=2.0)
    assert keep.tolist() == [True, False, False, True]


def test_laf_conversion_scale_and_rotation():
    import cv2

    kp = cv2.KeyPoint(10.0, 20.0, 2.0, 90.0, 0.5)
    lafs, resp = lafs_from_opencv_keypoints([kp], mr_size=6.0)
    assert lafs.shape == (1, 2, 3)
    np.testing.assert_allclose(lafs[0, :, 2], [10.0, 20.0])
    A = lafs[0, :2, :2]
    np.testing.assert_allclose(np.sqrt(abs(np.linalg.det(A))), 12.0, rtol=1e-5)
    # rotation by -90 deg: cos ~ 0, sin ~ -1 => A = [[0, -12], [12, 0]]
    np.testing.assert_allclose(A, [[0, -12], [12, 0]], atol=1e-3)
    assert resp[0] == pytest.approx(0.5)


def test_sift_extractor_padded_output():
    sift = sift_create(max_keypoints=64)
    img = checkerboard_image()
    lafs, scores, desc, mask = sift.detect_and_compute(img)
    assert lafs.shape == (64, 2, 3) and desc.shape == (64, 128) and mask.shape == (64,)
    n = mask.sum()
    assert n > 10
    # RootSIFT: unit L2 after sqrt(L1)
    np.testing.assert_allclose(np.linalg.norm(desc[mask], axis=1), 1.0, atol=1e-4)
    assert (scores[~mask] == 0).all()
    # keypoints spaced by NMS diameter 9 -> no two closer than 4.5
    pts = lafs[mask][:, :, 2]
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() >= 4.5


def test_registry():
    assert is_device_extractor("SuperPointNet")
    assert not is_device_extractor("OPENCV_SIFT")
    ctor = get_feature_extractor("OPENCV_SIFT")
    assert ctor is not None
    with pytest.raises(ValueError, match="Unknown feature extractor"):
        get_feature_extractor("nope")
