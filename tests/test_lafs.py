import numpy as np
import jax.numpy as jnp
import pytest

from openglue_tpu.features import lafs as L
from openglue_tpu.features.lafs import get_laf_to_sideinfo_converter
from openglue_tpu.features.prepare import prepare_features_output

from tests.torch_ref import import_reference, reference_available


def _random_lafs(rng, b=2, n=12):
    angles = rng.uniform(0, 2 * np.pi, size=(b, n))
    scales = rng.uniform(0.5, 4.0, size=(b, n))
    cos, sin = np.cos(angles), np.sin(angles)
    A = np.stack([
        np.stack([cos, -sin], -1),
        np.stack([sin, cos], -1),
    ], -2) * scales[..., None, None]
    centers = rng.uniform(0, 300, size=(b, n, 2, 1))
    return np.concatenate([A, centers], axis=-1).astype(np.float32)


def test_laf_center_and_scale():
    rng = np.random.default_rng(0)
    lafs = _random_lafs(rng)
    centers = np.asarray(L.laf_center(jnp.asarray(lafs)))
    np.testing.assert_allclose(centers, lafs[..., :, 2])
    # scale of a rotation-scale LAF is the scale factor
    A = lafs[..., :2, :2]
    det = np.abs(A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0])
    np.testing.assert_allclose(
        np.asarray(L.laf_scale(jnp.asarray(lafs)))[..., 0], np.sqrt(det), rtol=1e-4
    )


def test_orientation_recovers_angle():
    rng = np.random.default_rng(1)
    b, n = 1, 8
    angles = rng.uniform(0, 2 * np.pi, size=(b, n))
    scales = rng.uniform(0.5, 2.0, size=(b, n))
    cos, sin = np.cos(angles), np.sin(angles)
    A = np.stack([
        np.stack([cos, -sin], -1),
        np.stack([sin, cos], -1),
    ], -2) * scales[..., None, None]
    lafs = np.concatenate([A, np.zeros((b, n, 2, 1))], axis=-1).astype(np.float32)
    # reference formula: flip(first_row)/scale = [-sin, cos]
    out = np.asarray(L.laf_sincos_orientation(jnp.asarray(lafs)))
    np.testing.assert_allclose(out[..., 0], -sin, atol=1e-4)
    np.testing.assert_allclose(out[..., 1], cos, atol=1e-4)


def test_converter_dims():
    for name, dim in [("none", 0), ("rotation", 2), ("scale", 1), ("scale_rotation", 3), ("affine", 5)]:
        conv = get_laf_to_sideinfo_converter(name)
        assert conv.side_info_dim == dim
        rng = np.random.default_rng(2)
        lafs = jnp.asarray(_random_lafs(rng))
        assert conv(lafs).shape == (2, 12, dim)
    with pytest.raises(NameError):
        get_laf_to_sideinfo_converter("bogus")


@pytest.mark.skipif(not reference_available(), reason="reference needs kornia for laf_converter")
def test_affine_geom_formula():
    """Reference LAF2AffineGeom: flatten(A)/scale — verify against the formula
    directly (the torch module needs kornia which is unavailable)."""
    rng = np.random.default_rng(3)
    lafs = _random_lafs(rng)
    out = np.asarray(L.laf_affine_geom(jnp.asarray(lafs)))
    A = lafs[..., :2, :2]
    det = np.abs(A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0])
    scale = np.sqrt(det)[..., None]
    np.testing.assert_allclose(out, A.reshape(2, 12, 4) / scale, rtol=1e-4)


def test_prepare_features_output():
    rng = np.random.default_rng(4)
    lafs = jnp.asarray(_random_lafs(rng))
    responses = jnp.asarray(rng.random((2, 12)).astype(np.float32))
    desc = jnp.asarray(rng.normal(size=(2, 12, 32)).astype(np.float32))
    conv = get_laf_to_sideinfo_converter("scale_rotation")
    ks = prepare_features_output(lafs, responses, desc, conv, jnp.asarray([640, 480]))
    assert ks.keypoints.shape == (2, 12, 2)
    assert ks.side_info.shape == (2, 12, 4)  # 1 response + 3 scale_rotation
    assert ks.descriptors.shape == (2, 12, 32)
    assert ks.mask.shape == (2, 12) and bool(ks.mask.all())
    np.testing.assert_allclose(np.asarray(ks.side_info[..., 0]), np.asarray(responses))
    # log_response variant
    ks_log = prepare_features_output(
        lafs, responses, desc, conv, jnp.asarray([640, 480]), log_response=True
    )
    np.testing.assert_allclose(
        np.asarray(ks_log.side_info[..., 0]), np.log(np.asarray(responses) + 0.1), rtol=1e-5
    )
