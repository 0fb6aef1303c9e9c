"""SuperPoint extractor tests: backbone parity vs a torch oracle built from
the reference's architecture spec (models/features/superpoint/model.py:35-78),
grid-sample parity for descriptor sampling (utils.py:13-31), NMS semantics,
static-shape keypoint selection, torch weight import."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from openglue_tpu.compat.torch_weights import superpoint_params_from_torch
from openglue_tpu.features.superpoint import (
    SuperPoint,
    SuperPointBackbone,
    SuperPointConfig,
    depth_to_space_scores,
    nms2d,
    sample_descriptors,
    select_keypoints,
)


def build_torch_superpoint(descriptor_dim=256, seed=0):
    """Torch oracle with the reference layer spec and key names."""
    torch.manual_seed(seed)
    conv = lambda ci, co, k: torch.nn.Conv2d(ci, co, k, padding=k // 2)
    layers = {}
    channels = [(1, 64, 64, 64), (64, 64, 64, 64), (64, 128, 128, 128), (128, 128, 128, 128)]
    for i, ch in enumerate(channels):
        layers[f"conv{i + 1}a"] = conv(ch[0], ch[1], 3)
        layers[f"conv{i + 1}b"] = conv(ch[2], ch[3], 3)
    layers["convPa"] = conv(128, 256, 3)
    layers["convPb"] = conv(256, 65, 1)
    layers["convDa"] = conv(128, 256, 3)
    layers["convDb"] = conv(256, descriptor_dim, 1)

    def forward(image):  # [B, 1, H, W]
        x = image
        for i in range(4):
            x = F.relu(layers[f"conv{i + 1}a"](x))
            x = F.relu(layers[f"conv{i + 1}b"](x))
            if i != 3:
                x = F.max_pool2d(x, 2, 2)
        d = layers["convDb"](F.relu(layers["convDa"](x)))
        d = d / d.norm(p=2, dim=1, keepdim=True)
        s = layers["convPb"](F.relu(layers["convPa"](x)))
        s = F.softmax(s, 1)[:, :-1]
        return d, s

    state_dict = {}
    for name, module in layers.items():
        state_dict[f"{name}.weight"] = module.weight
        state_dict[f"{name}.bias"] = module.bias
    return forward, state_dict


class TestBackboneParity:
    def test_matches_torch_oracle(self):
        torch_forward, sd = build_torch_superpoint()
        variables = superpoint_params_from_torch(sd)

        model = SuperPointBackbone()
        image = np.random.default_rng(0).uniform(0, 1, (2, 64, 80, 1)).astype(np.float32)
        # naming must line up: apply the converted weights directly
        desc, scores = model.apply(
            {"params": variables["params"]["backbone"]}, jnp.asarray(image)
        )
        with torch.no_grad():
            td, ts = torch_forward(torch.from_numpy(image.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(desc), td.numpy().transpose(0, 2, 3, 1), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(scores), ts.numpy().transpose(0, 2, 3, 1), atol=2e-5
        )


class TestPipelinePieces:
    def test_depth_to_space_matches_torch_reshape(self):
        x = np.random.default_rng(1).uniform(size=(2, 3, 4, 64)).astype(np.float32)
        ours = depth_to_space_scores(jnp.asarray(x))
        t = torch.from_numpy(x)  # [B, Hc, Wc, 64]
        b, h, w, _ = x.shape
        ref = t.reshape(b, h, w, 8, 8).permute(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy())

    def test_nms_keeps_only_window_maxima(self):
        rng = np.random.default_rng(2)
        scores = rng.uniform(0, 1, (1, 40, 40)).astype(np.float32)
        out = np.asarray(nms2d(jnp.asarray(scores), kernel_size=5))
        nonzero = np.argwhere(out[0] > 0)
        for y, x in nonzero:
            y0, y1 = max(0, y - 2), min(40, y + 3)
            x0, x1 = max(0, x - 2), min(40, x + 3)
            assert scores[0, y, x] == scores[0, y0:y1, x0:x1].max()

    def test_select_keypoints_static_shape_and_border(self):
        scores = np.zeros((1, 32, 32), np.float32)
        scores[0, 2, 2] = 0.9  # inside border=4? no: y=2 < 4 -> removed
        scores[0, 10, 10] = 0.8
        scores[0, 20, 15] = 0.7
        kpts, s, valid = select_keypoints(jnp.asarray(scores), max_keypoints=5, border=4)
        assert kpts.shape == (1, 5, 2) and valid.shape == (1, 5)
        got = {tuple(map(int, kpts[0, i])) for i in range(5) if bool(valid[0, i])}
        assert got == {(10, 10), (15, 20)}  # (x, y); border kpt dropped

    def test_sample_descriptors_matches_torch_grid_sample(self):
        rng = np.random.default_rng(3)
        desc_map = rng.normal(size=(1, 8, 10, 32)).astype(np.float32)
        kpts = rng.uniform(8, 56, (1, 20, 2)).astype(np.float32)  # away from borders

        ours = sample_descriptors(jnp.asarray(desc_map), jnp.asarray(kpts), cell=8)

        # reference utils.py:13-31 with torch grid_sample
        coarse = torch.from_numpy(desc_map.transpose(0, 3, 1, 2))  # [1, D, Hc, Wc]
        D, H, W = 32, 64, 80
        pts = torch.from_numpy(kpts[0]).clone()
        pts = pts - 8 / 2 + 0.5
        pts /= torch.tensor([(W - 8 / 2 - 0.5), (H - 8 / 2 - 0.5)])
        pts = pts.view(1, 1, -1, 2) * 2 - 1
        ref = F.grid_sample(coarse, pts, align_corners=False).view(1, D, -1)
        ref = F.normalize(ref, p=2, dim=1).numpy()[0].T  # [N, D]
        np.testing.assert_allclose(np.asarray(ours)[0], ref, atol=1e-5)


class TestFullExtractor:
    def test_forward_shapes_and_masking(self):
        cfg = SuperPointConfig(max_keypoints=100, descriptor_dim=64)
        model = SuperPoint(cfg)
        image = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (2, 64, 80, 1)).astype(np.float32)
        )
        variables = model.init(jax.random.key(0), image)
        feats = jax.jit(lambda v, im: model.apply(v, im))(variables, image)
        assert feats.lafs.shape == (2, 100, 2, 3)
        assert feats.responses.shape == (2, 100)
        assert feats.descriptors.shape == (2, 100, 64)
        assert feats.mask.shape == (2, 100)
        # descriptors unit-norm
        norms = np.linalg.norm(np.asarray(feats.descriptors), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        # keypoints within borders
        kpts = np.asarray(feats.lafs[..., 2])
        m = np.asarray(feats.mask)
        assert (kpts[m][:, 0] >= 4).all() and (kpts[m][:, 0] < 76).all()
        assert (kpts[m][:, 1] >= 4).all() and (kpts[m][:, 1] < 60).all()

    def test_bn_variant_has_batch_stats(self):
        cfg = SuperPointConfig(max_keypoints=50, descriptor_dim=64, bn=True)
        model = SuperPoint(cfg)
        image = jnp.zeros((1, 32, 32, 1))
        variables = model.init(jax.random.key(0), image)
        assert "batch_stats" in variables
        model.apply(variables, image)  # eval mode runs with running stats
