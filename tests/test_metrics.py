"""Metric tests with synthetic two-view geometry: perfect matches must score
precision ~1 and pose error ~0; corrupted matches must degrade both."""

import numpy as np
import jax.numpy as jnp
import pytest

from openglue_tpu.geometry.epipolar import essential_from_Rt, symmetrical_epipolar_distance
from openglue_tpu.metrics import CameraPoseAUC, EpipolarDistanceMetric


def synthetic_two_view(n=200, seed=0):
    """3D points projected into two cameras with a known relative pose."""
    rng = np.random.default_rng(seed)
    pts3d = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 8, n)], axis=1
    )
    angle = 0.15
    R = np.array(
        [
            [np.cos(angle), 0, np.sin(angle)],
            [0, 1, 0],
            [-np.sin(angle), 0, np.cos(angle)],
        ]
    )
    T = np.array([0.5, 0.1, 0.02])
    K = np.array([[800.0, 0, 480], [0, 800.0, 360], [0, 0, 1]])

    def project(P):
        uv = (K @ P.T).T
        return uv[:, :2] / uv[:, 2:3]

    kpts0 = project(pts3d)
    kpts1 = project((R @ pts3d.T).T + T)
    return kpts0, kpts1, K, R, T


def test_symmetric_epipolar_distance_zero_for_true_matches():
    kpts0, kpts1, K, R, T = synthetic_two_view()
    pts0 = (kpts0 - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
    pts1 = (kpts1 - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
    E = essential_from_Rt(jnp.asarray(R)[None], jnp.asarray(T)[None])
    d = symmetrical_epipolar_distance(
        jnp.asarray(pts0)[None], jnp.asarray(pts1)[None], E
    )
    assert float(jnp.max(d)) < 1e-9


def test_epipolar_metric_perfect_and_corrupted():
    kpts0, kpts1, K, R, T = synthetic_two_view()
    n = kpts0.shape[0]
    matches0 = np.arange(n)

    metric = EpipolarDistanceMetric(threshold=5e-4)
    metric.update(
        kpts0[None], kpts1[None], matches0[None], K[None], K[None], R[None], T[None]
    )
    res = metric.compute()
    assert res["Precision@0.0005"] > 0.99
    assert res["Matching Score@0.0005"] > 0.99

    # shuffle half the matches -> wrong epipolar geometry for those
    bad = matches0.copy()
    bad[: n // 2] = np.roll(bad[: n // 2], 7)
    metric2 = EpipolarDistanceMetric(threshold=5e-4)
    metric2.update(
        kpts0[None], kpts1[None], bad[None], K[None], K[None], R[None], T[None]
    )
    res2 = metric2.compute()
    assert res2["Precision@0.0005"] < res["Precision@0.0005"] - 0.2


def test_pose_auc_recovers_gt_pose():
    kpts0, kpts1, K, R, T = synthetic_two_view(n=300)
    matches0 = np.arange(300)
    auc = CameraPoseAUC()
    auc.update(
        kpts0[None], kpts1[None], matches0[None], K[None], K[None], R[None], T[None]
    )
    res = auc.compute()
    assert auc.pose_errors[0] < 1.0  # degrees
    assert res["AUC@5deg"] > 0.7
    assert res["AUC@20deg"] >= res["AUC@10deg"] >= res["AUC@5deg"]


def test_pose_auc_degrades_with_noise():
    kpts0, kpts1, K, R, T = synthetic_two_view(n=300)
    rng = np.random.default_rng(1)
    kpts1_noisy = kpts1 + rng.normal(0, 30.0, kpts1.shape)
    matches0 = np.arange(300)
    auc = CameraPoseAUC()
    auc.update(
        kpts0[None], kpts1_noisy[None], matches0[None], K[None], K[None], R[None], T[None]
    )
    assert auc.pose_errors[0] > 2.0


def test_pose_auc_too_few_matches_is_inf():
    """<5 matches appends inf, matching reference utils/metrics.py:121."""
    kpts0, kpts1, K, R, T = synthetic_two_view(n=10)
    matches0 = np.full(10, -1)
    matches0[:3] = np.arange(3)
    auc = CameraPoseAUC()
    auc.update(
        kpts0[None], kpts1[None], matches0[None], K[None], K[None], R[None], T[None]
    )
    assert auc.pose_errors == [float("inf")]
    # inf entries count toward recall's denominator but never to the area
    assert auc.compute()["AUC@20deg"] == 0.0


def _rot_y(angle):
    return np.array(
        [
            [np.cos(angle), 0, np.sin(angle)],
            [0, 1, 0],
            [-np.sin(angle), 0, np.cos(angle)],
        ]
    )


def test_pose_error_selects_by_cheirality_not_oracle_min():
    """Multi-solution E stack: the chunk consistent with the matches (most
    cheiral points) must be scored — not the chunk that happens to minimize
    the GT error (reference utils/metrics.py:104-117 chooses by
    best_solution_n_points BEFORE scoring)."""
    from openglue_tpu.metrics import pose_error_from_essential

    kpts0, kpts1, K, R1, T1 = synthetic_two_view(n=100)
    pts0n = (kpts0 - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
    pts1n = (kpts1 - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])

    # GT pose handed to the metric is 150 deg away from the pose that actually
    # produced the correspondences (large enough that triangulating the true
    # matches under the wrong E puts ~half the points behind a camera).
    R2 = R1 @ _rot_y(np.deg2rad(150.0))
    T2 = T1
    E_consistent = np.asarray(essential_from_Rt(jnp.asarray(R1)[None], jnp.asarray(T1)[None]))[0]
    E_zero_error = np.asarray(essential_from_Rt(jnp.asarray(R2)[None], jnp.asarray(T2)[None]))[0]

    # Put the zero-GT-error (but match-inconsistent) chunk FIRST: oracle-min
    # selection would return ~0 here; cheirality selection must return ~150.
    E_stack = np.concatenate([E_zero_error, E_consistent], axis=0)
    err = pose_error_from_essential(E_stack, None, pts0n, pts1n, R2, T2)
    assert 140.0 < err <= 180.0, err

    # Sanity: with the consistent pose as GT, the same stack scores ~0.
    err0 = pose_error_from_essential(E_stack, None, pts0n, pts1n, R1, T1)
    assert err0 < 1.0, err0


def test_homography_precision_metric():
    from openglue_tpu.metrics import HomographyPrecisionMetric

    rng = np.random.default_rng(0)
    kpts0 = rng.uniform(0, 300, (1, 50, 2)).astype(np.float32)
    H = np.array([[1, 0, 7.0], [0, 1, -4.0], [0, 0, 1]], np.float32)
    kpts1 = kpts0 + [7.0, -4.0]
    matches = np.arange(50)[None]

    m = HomographyPrecisionMetric(threshold_px=2.0)
    m.update(kpts0, kpts1, matches, H[None])
    res = m.compute()
    assert res["H-Precision@2.0px"] == 1.0

    bad = np.roll(matches, 5, axis=1)
    m2 = HomographyPrecisionMetric(threshold_px=2.0)
    m2.update(kpts0, kpts1, bad, H[None])
    assert m2.compute()["H-Precision@2.0px"] < 0.2

    # unmatched (-1) ignored
    half = matches.copy()
    half[0, ::2] = -1
    m3 = HomographyPrecisionMetric(threshold_px=2.0)
    m3.update(kpts0, kpts1, half, H[None])
    r = m3.compute()
    assert r["H-Precision@2.0px"] == 1.0
    assert abs(r["H-Matching Score@2.0px"] - 0.5) < 0.01


def test_pose_auc_not_inflated_by_failures():
    """Recall carried to the threshold must be the recall of the last error
    BELOW it, not total recall (review finding: [1, 100] deg @5 => 0.45)."""
    auc = CameraPoseAUC()
    auc.pose_errors = [1.0, 100.0]
    assert abs(auc.compute()["AUC@5deg"] - 0.45) < 1e-9
    auc.pose_errors = [50.0]
    assert auc.compute()["AUC@5deg"] == 0.0
