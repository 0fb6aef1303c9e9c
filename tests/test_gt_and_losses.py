import numpy as np
import jax.numpy as jnp
import pytest

from openglue_tpu.core.types import Transformation
from openglue_tpu.geometry.gt_matches import IGNORE_INDEX, UNMATCHED_INDEX, generate_gt_matches
from openglue_tpu.losses import criterion, matching_nll_loss

from tests.torch_ref import import_reference, reference_available


def _identity_transform(batch=1):
    H = np.broadcast_to(np.eye(3, dtype=np.float32), (batch, 3, 3)).copy()
    return Transformation(kind="perspective", H=jnp.asarray(H))


def test_gt_matches_identity_homography():
    """kpts1 = kpts0 under identity homography -> perfect diagonal matches."""
    rng = np.random.default_rng(0)
    kpts = (rng.random((1, 10, 2)) * 100).astype(np.float32)
    out = generate_gt_matches(
        jnp.asarray(kpts), jnp.asarray(kpts), _identity_transform(),
        positive_threshold=2.0, negative_threshold=7.0,
    )
    np.testing.assert_array_equal(np.asarray(out["gt_matches0"])[0], np.arange(10))
    np.testing.assert_array_equal(np.asarray(out["gt_matches1"])[0], np.arange(10))


def test_gt_matches_threshold_bands():
    """Shift kpts1 to land in the MATCHED / IGNORE / UNMATCHED bands."""
    kpts0 = np.array([[[10.0, 10.0], [50.0, 50.0], [90.0, 10.0]]], dtype=np.float32)
    # offsets: 1px (<=2 matched), 4px (2<d<=7 ignore), 20px (>7 unmatched)
    kpts1 = kpts0 + np.array([[[1.0, 0.0], [4.0, 0.0], [20.0, 0.0]]], dtype=np.float32)
    out = generate_gt_matches(
        jnp.asarray(kpts0), jnp.asarray(kpts1), _identity_transform(),
        positive_threshold=2.0, negative_threshold=7.0,
    )
    got = np.asarray(out["gt_matches0"])[0]
    assert got[0] == 0
    assert got[1] == IGNORE_INDEX
    assert got[2] == UNMATCHED_INDEX


def test_gt_matches_parity_mode_matches_reference():
    """parity_mode reproduces the reference's ACTUAL behavior (the chained
    advanced-indexing threshold lines are silent no-ops in torch,
    gt_matches_generation.py:57-64)."""
    if not reference_available():
        pytest.skip("reference unavailable")
    import_reference()
    import torch
    from models.gt_matches_generation import generate_gt_matches as torch_gt

    rng = np.random.default_rng(1)
    B, N, M = 2, 40, 40
    kpts0 = (rng.random((B, N, 2)) * 200).astype(np.float32)
    kpts1 = (rng.random((B, M, 2)) * 200).astype(np.float32)
    H = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()

    data = {
        "transformation": {"type": ["perspective"], "H": torch.from_numpy(H)},
    }
    feats0 = {"keypoints": torch.from_numpy(kpts0), "local_descriptors": torch.zeros(B, N, 4), "side_info": torch.zeros(B, N, 1)}
    feats1 = {"keypoints": torch.from_numpy(kpts1), "local_descriptors": torch.zeros(B, M, 4), "side_info": torch.zeros(B, M, 1)}
    _, y_true = torch_gt(data, feats0, feats1, positive_threshold=2.0, negative_threshold=7.0)

    ours = generate_gt_matches(
        jnp.asarray(kpts0), jnp.asarray(kpts1),
        Transformation(kind="perspective", H=jnp.asarray(H)),
        positive_threshold=2.0, negative_threshold=7.0, parity_mode=True,
    )
    np.testing.assert_array_equal(np.asarray(ours["gt_matches0"]), y_true["gt_matches0"].numpy())
    np.testing.assert_array_equal(np.asarray(ours["gt_matches1"]), y_true["gt_matches1"].numpy())


def test_gt_matches_padded_are_ignored():
    rng = np.random.default_rng(2)
    kpts = (rng.random((1, 8, 2)) * 100 + 10).astype(np.float32)
    padded = np.pad(kpts, ((0, 0), (0, 4), (0, 0)))
    mask = np.zeros((1, 12), dtype=bool)
    mask[:, :8] = True
    out = generate_gt_matches(
        jnp.asarray(padded), jnp.asarray(padded), _identity_transform(),
        positive_threshold=2.0, negative_threshold=7.0,
        mask0=jnp.asarray(mask), mask1=jnp.asarray(mask),
    )
    got = np.asarray(out["gt_matches0"])[0]
    np.testing.assert_array_equal(got[:8], np.arange(8))
    assert (got[8:] == IGNORE_INDEX).all()


def test_nll_loss_matches_reference():
    if not reference_available():
        pytest.skip("reference unavailable")
    import_reference()
    import torch
    from utils.losses import criterion as torch_criterion

    rng = np.random.default_rng(3)
    B, N, M = 3, 12, 15
    scores = np.log(rng.dirichlet(np.ones((N + 1) * (M + 1)), size=B)).reshape(B, N + 1, M + 1).astype(np.float32)
    gt0 = rng.integers(-2, M, size=(B, N)).astype(np.int64)
    gt1 = rng.integers(-2, N, size=(B, M)).astype(np.int64)
    gdesc = rng.normal(size=(B, 16, N)).astype(np.float32)
    gdesc1 = rng.normal(size=(B, 16, M)).astype(np.float32)

    theirs = torch_criterion(
        {"gt_matches0": torch.from_numpy(gt0), "gt_matches1": torch.from_numpy(gt1)},
        {
            "scores": torch.from_numpy(scores),
            "context_descriptors0": torch.from_numpy(gdesc),
            "context_descriptors1": torch.from_numpy(gdesc1),
        },
        margin=None,
    )
    ours = matching_nll_loss(jnp.asarray(gt0), jnp.asarray(gt1), jnp.asarray(scores))
    np.testing.assert_allclose(float(ours), float(theirs["loss"]), rtol=1e-5)


def test_metric_loss_matches_reference():
    if not reference_available():
        pytest.skip("reference unavailable")
    import_reference()
    import torch
    from utils.losses import criterion as torch_criterion

    rng = np.random.default_rng(4)
    B, N, M, D = 2, 10, 12, 16
    scores = np.log(rng.dirichlet(np.ones((N + 1) * (M + 1)), size=B)).reshape(B, N + 1, M + 1).astype(np.float32)
    # make a consistent assignment: i -> i for first half, unmatched after
    gt0 = np.full((B, N), -1, dtype=np.int64)
    gt0[:, :5] = np.arange(5)
    gt1 = np.full((B, M), -1, dtype=np.int64)
    gt1[:, :5] = np.arange(5)
    gdesc0 = rng.normal(size=(B, D, N)).astype(np.float32)
    gdesc1 = rng.normal(size=(B, D, M)).astype(np.float32)

    theirs = torch_criterion(
        {"gt_matches0": torch.from_numpy(gt0), "gt_matches1": torch.from_numpy(gt1)},
        {
            "scores": torch.from_numpy(scores),
            "context_descriptors0": torch.from_numpy(gdesc0),
            "context_descriptors1": torch.from_numpy(gdesc1),
        },
        margin=0.5,
    )
    ours = criterion(
        {"gt_matches0": jnp.asarray(gt0), "gt_matches1": jnp.asarray(gt1)},
        {
            "scores": jnp.asarray(scores),
            # ours are channels-last
            "context_descriptors0": jnp.asarray(gdesc0.transpose(0, 2, 1)),
            "context_descriptors1": jnp.asarray(gdesc1.transpose(0, 2, 1)),
        },
        margin=0.5,
    )
    np.testing.assert_allclose(float(ours["loss"]), float(theirs["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(ours["metric_loss"]), float(theirs["metric_loss"]), rtol=1e-4, atol=1e-5)


def test_loss_gradients_and_padding_invariance():
    """Padded keypoints (IGNORE) must not change the loss."""
    import jax

    rng = np.random.default_rng(5)
    B, N, M = 2, 8, 9
    scores = np.log(rng.dirichlet(np.ones((N + 1) * (M + 1)), size=B)).reshape(B, N + 1, M + 1).astype(np.float32)
    gt0 = rng.integers(-2, M, size=(B, N)).astype(np.int32)
    gt1 = rng.integers(-2, N, size=(B, M)).astype(np.int32)

    base = float(matching_nll_loss(jnp.asarray(gt0), jnp.asarray(gt1), jnp.asarray(scores)))

    # pad with IGNORE rows/cols: loss must be identical
    pad = 4
    scores_p = np.full((B, N + pad + 1, M + pad + 1), -20.0, dtype=np.float32)
    scores_p[:, :N, :M] = scores[:, :N, :M]
    scores_p[:, :N, -1] = scores[:, :N, -1]
    scores_p[:, -1, :M] = scores[:, -1, :M]
    scores_p[:, -1, -1] = scores[:, -1, -1]
    gt0_p = np.pad(gt0, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX)
    gt1_p = np.pad(gt1, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX)
    padded = float(matching_nll_loss(jnp.asarray(gt0_p), jnp.asarray(gt1_p), jnp.asarray(scores_p)))
    np.testing.assert_allclose(padded, base, rtol=1e-6)

    g = jax.grad(lambda s: matching_nll_loss(jnp.asarray(gt0), jnp.asarray(gt1), s))(jnp.asarray(scores))
    assert np.isfinite(np.asarray(g)).all()
