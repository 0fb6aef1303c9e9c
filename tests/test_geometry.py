import numpy as np
import jax.numpy as jnp
import pytest

from openglue_tpu.core.types import Transformation
from openglue_tpu.geometry import transforms as T

from tests.torch_ref import import_reference, reference_available


def _random_pose(rng):
    # random small rotation + translation
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = 0.3
    K_mat = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R = np.eye(3) + np.sin(angle) * K_mat + (1 - np.cos(angle)) * K_mat @ K_mat
    t = rng.normal(size=3) * 0.1
    return R.astype(np.float32), t.astype(np.float32)


def test_perspective_transform_matches_reference():
    if not reference_available():
        pytest.skip("reference unavailable")
    import_reference()
    import torch
    from utils.misc import perspective_transform as torch_pt

    rng = np.random.default_rng(0)
    kpts = (rng.random((2, 20, 2)) * 500).astype(np.float32)
    H = (np.eye(3)[None] + rng.normal(size=(2, 3, 3)) * 0.01).astype(np.float32)

    ours, mask = T.perspective_transform(jnp.asarray(kpts), jnp.asarray(H))
    theirs, _ = torch_pt(torch.from_numpy(kpts), torch.from_numpy(H))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-4)
    assert np.asarray(mask).all()


def test_reproject_3d_matches_reference_dense_depth():
    if not reference_available():
        pytest.skip("reference unavailable")
    import_reference()
    import torch
    from utils.misc import reproject_3d as torch_r3d

    rng = np.random.default_rng(1)
    B, N, Himg, Wimg = 2, 30, 60, 80
    kpts = np.stack(
        [rng.random((B, N)) * (Wimg - 1), rng.random((B, N)) * (Himg - 1)], axis=-1
    ).astype(np.float32)
    K = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]], dtype=np.float32)
    K = np.broadcast_to(K, (B, 3, 3)).copy()
    R, Tt = zip(*[_random_pose(rng) for _ in range(B)])
    R = np.stack(R)
    Tt = np.stack(Tt)
    depth = (rng.random((B, Himg, Wimg)) * 5 + 1).astype(np.float32)
    depth[0, :10] = 0.0  # some invalid depth

    ours, valid = T.reproject_3d(
        jnp.asarray(kpts), jnp.asarray(K), jnp.asarray(K), jnp.asarray(Tt), jnp.asarray(R), jnp.asarray(depth)
    )
    theirs, their_valid = torch_r3d(
        torch.from_numpy(kpts), torch.from_numpy(K), torch.from_numpy(K),
        torch.from_numpy(Tt), torch.from_numpy(R), torch.from_numpy(depth),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(valid), their_valid.numpy())


def test_reproject_roundtrip_homography():
    """Warping forward then with the inverse recovers the keypoints."""
    rng = np.random.default_rng(2)
    kpts = (rng.random((1, 25, 2)) * 300).astype(np.float32)
    H = (np.eye(3) + rng.normal(size=(3, 3)) * 0.02).astype(np.float32)[None]
    tf = Transformation(kind="perspective", H=jnp.asarray(H))
    warped, _ = T.reproject_keypoints(jnp.asarray(kpts), tf)
    back, _ = T.reproject_keypoints(warped, tf.inverse())
    np.testing.assert_allclose(np.asarray(back), kpts, rtol=1e-3, atol=1e-2)


def test_inverse_3d_transformation_roundtrip():
    rng = np.random.default_rng(3)
    R, Tt = _random_pose(rng)
    points = rng.normal(size=(10, 3)).astype(np.float32) + [0, 0, 5]
    fwd = points @ R.T + Tt
    tf = Transformation(
        kind="3d_reprojection",
        K0=None, K1=None,
        R=jnp.asarray(R[None]), T=jnp.asarray(Tt[None]),
        depth0=None, depth1=None,
    )
    inv = tf.inverse()
    back = fwd @ np.asarray(inv.R)[0].T + np.asarray(inv.T)[0]
    np.testing.assert_allclose(back, points, rtol=1e-4, atol=1e-4)


def test_pairwise_cosine_dist_matches_reference():
    if not reference_available():
        pytest.skip("reference unavailable")
    import_reference()
    import torch
    from utils.misc import pairwise_cosine_dist as torch_pcd

    rng = np.random.default_rng(4)
    x1 = rng.normal(size=(2, 10, 16)).astype(np.float32)
    x2 = rng.normal(size=(2, 14, 16)).astype(np.float32)
    ours = T.pairwise_cosine_dist(jnp.asarray(x1), jnp.asarray(x2))
    theirs = torch_pcd(torch.from_numpy(x1), torch.from_numpy(x2))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=1e-5)


def test_normalize_with_intrinsics_matches_reference():
    if not reference_available():
        pytest.skip("reference unavailable")
    import_reference()
    import torch
    from utils.misc import normalize_with_intrinsics as torch_nwi

    rng = np.random.default_rng(5)
    kpts = (rng.random((20, 2)) * 500).astype(np.float32)
    K = np.array([[120.0, 0, 250], [0, 130.0, 240], [0, 0, 1]], dtype=np.float32)
    ours = T.normalize_with_intrinsics(jnp.asarray(kpts), jnp.asarray(K))
    theirs = torch_nwi(torch.from_numpy(kpts), torch.from_numpy(K))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-6)
