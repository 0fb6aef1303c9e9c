"""AffNet/OriNet tests (torch-oracle parity for the trunk + converter) and the
composed GFTTAffNetHardNet extractor."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from openglue_tpu.features.affnet import (
    AffNet,
    OriNet,
    affnet_params_from_torch,
    estimate_laf_orientations,
    estimate_laf_shapes,
)
from openglue_tpu.features.gftt_hardnet import GFTTAffNetHardNet, GFTTAffNetHardNetConfig
from openglue_tpu.features.registry import get_feature_extractor, is_device_extractor


def build_torch_regressor(out_dim, seed=0):
    """Torch oracle with the kornia AffNetFast/OriNet Sequential layout."""
    torch.manual_seed(seed)
    layers = []
    chans = [(1, 16, 1), (16, 16, 1), (16, 32, 2), (32, 32, 1), (32, 64, 2), (64, 64, 1)]
    for ci, co, s in chans:
        layers += [
            torch.nn.Conv2d(ci, co, 3, stride=s, padding=1, bias=False),
            torch.nn.BatchNorm2d(co, affine=False),
            torch.nn.ReLU(),
        ]
    layers += [
        torch.nn.Dropout(0.25),
        torch.nn.Conv2d(64, out_dim, 8, bias=True),
        torch.nn.Tanh(),
        torch.nn.AdaptiveAvgPool2d(1),
    ]
    model = torch.nn.Sequential(*layers).eval()
    with torch.no_grad():
        for m in model:
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 2.0)
    return model


def test_affnet_trunk_parity_with_torch():
    torch_model = build_torch_regressor(3)
    sd = {f"features.{i}.{k}": v for i, m in enumerate(torch_model)
          for k, v in m.state_dict().items()}
    variables = affnet_params_from_torch(sd)

    rng = np.random.default_rng(0)
    patches = rng.normal(size=(4, 32, 32, 1)).astype(np.float32)
    L = AffNet().apply(variables, jnp.asarray(patches))

    with torch.no_grad():
        xy = torch_model(torch.from_numpy(patches.transpose(0, 3, 1, 2))).reshape(4, 3).numpy()
    a11, a21, a22 = 1 + xy[:, 0], xy[:, 1], 1 + xy[:, 2]
    norm = np.sqrt(np.abs(a11 * a22) + 1e-10)
    expected = np.stack(
        [np.stack([a11, np.zeros(4)], -1), np.stack([a21, a22], -1)], -2
    ) / norm[:, None, None]
    np.testing.assert_allclose(np.asarray(L), expected, atol=2e-5)
    # det 1
    dets = np.abs(np.linalg.det(np.asarray(L)))
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)


def test_orinet_angle_range():
    model = OriNet()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    patches = jnp.asarray(
        np.random.default_rng(0).normal(size=(6, 32, 32, 1)).astype(np.float32)
    )
    ang = model.apply(variables, patches)
    a = np.asarray(ang)
    assert a.shape == (6,) and (np.abs(a) <= np.pi).all()


def test_estimate_laf_helpers_preserve_centers():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64)).astype(np.float32))
    lafs = jnp.asarray(np.asarray([[[[8.0, 0, 30], [0, 8.0, 20]]]], np.float32))
    affnet = AffNet()
    av = affnet.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    out = estimate_laf_shapes(affnet, av, img, lafs)
    np.testing.assert_allclose(np.asarray(out[..., 2]), [[[30, 20]]])
    # scale preserved up to the det-1 shape: |det| unchanged
    np.testing.assert_allclose(
        abs(np.linalg.det(np.asarray(out[0, 0, :2, :2]))), 64.0, rtol=1e-4
    )

    orinet = OriNet()
    ov = orinet.init(jax.random.key(1), jnp.zeros((1, 32, 32, 1)))
    ang = estimate_laf_orientations(orinet, ov, img, lafs)
    assert ang.shape == (1, 1)


def test_gftt_affnet_hardnet_end_to_end():
    cfg = GFTTAffNetHardNetConfig(max_keypoints=32)
    model = GFTTAffNetHardNet(cfg)
    rng = np.random.default_rng(0)
    img = np.zeros((96, 96), np.float32)
    img[20:60, 30:70] = 1.0
    img += rng.normal(0, 0.02, img.shape)
    images = jnp.asarray(np.stack([img, img]).astype(np.float32))
    variables = model.init(jax.random.key(0), images)
    feats = jax.jit(lambda v, im: model.apply(v, im))(variables, images)
    assert feats.descriptors.shape == (2, 32, 128)
    assert feats.lafs.shape == (2, 32, 2, 3)
    m = np.asarray(feats.mask)
    assert m[0].sum() >= 4
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats.descriptors[0][m[0]]), axis=-1), 1.0, atol=1e-4
    )
    # same images -> same outputs
    np.testing.assert_allclose(
        np.asarray(feats.descriptors[0]), np.asarray(feats.descriptors[1]), atol=1e-5
    )


def test_registry_device_extractors():
    assert is_device_extractor("SIFT")
    assert is_device_extractor("GFTTAffNetHardNet")
    model = get_feature_extractor("GFTTAffNetHardNet")(max_keypoints=16)
    sift = get_feature_extractor("SIFT")(max_keypoints=16, nms_diameter=9)
    assert sift.init(None, None) == {}
