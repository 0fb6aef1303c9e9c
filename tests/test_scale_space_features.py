"""Tests for the JAX scale-space detector, SIFT descriptor, patch extraction
and HardNet (torch-oracle parity for HardNet; property tests for the rest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from openglue_tpu.features.hardnet import HardNet, describe_lafs, hardnet_params_from_torch
from openglue_tpu.features.patches import extract_laf_patches, normalize_patches
from openglue_tpu.features.scale_space import (
    detect_keypoints,
    dominant_gradient_orientation,
    gaussian_blur,
    gftt_response,
    rotate_lafs,
)
from openglue_tpu.features.sift import SIFTFeature, sift_describe_patches


def blob_image(centers, sigmas, size=(128, 160)):
    h, w = size
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for (cx, cy), s in zip(centers, sigmas):
        img += np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * s * s))
    return img


class TestPatches:
    def test_identity_laf_extracts_centered_window(self):
        # linear ramp image: patch values = a + b*x form
        h, w = 64, 64
        img = (np.mgrid[0:h, 0:w][1]).astype(np.float32)  # value = x
        lafs = np.zeros((1, 1, 2, 3), np.float32)
        scale = 8.0
        lafs[0, 0] = [[scale, 0, 32], [0, scale, 20]]
        patches = extract_laf_patches(jnp.asarray(img[None]), jnp.asarray(lafs), 16)
        p = np.asarray(patches[0, 0])
        # columns span x in [32-scale, 32+scale]; linear in column index
        np.testing.assert_allclose(p[:, 0], p[0, 0], atol=1e-4)
        assert abs((p[0, -1] - p[0, 0]) - 2 * scale * (15 / 16)) < 0.1
        np.testing.assert_allclose(np.mean(p), 32.0, atol=0.2)

    def test_normalize_patches(self):
        p = jnp.asarray(np.random.default_rng(0).normal(5, 3, (2, 4, 8, 8)).astype(np.float32))
        out = normalize_patches(p)
        np.testing.assert_allclose(np.asarray(out.mean(axis=(-2, -1))), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.std(axis=(-2, -1))), 1.0, atol=1e-4)


class TestDetector:
    def test_dog_finds_blob_centers(self):
        centers = [(40, 40), (100, 60), (70, 100)]
        img = blob_image(centers, [3.0, 5.0, 4.0])
        lafs, scores, valid = jax.jit(
            lambda im: detect_keypoints(im, 32, response="dog", double_image=False)
        )(jnp.asarray(img[None]))
        kpts = np.asarray(lafs[0, :, :, 2])[np.asarray(valid[0])]
        for c in centers:
            d = np.linalg.norm(kpts - np.asarray(c), axis=1).min()
            assert d < 3.0, f"blob at {c} missed (nearest {d:.1f}px)"

    def test_gftt_finds_corners(self):
        img = np.zeros((96, 96), np.float32)
        img[30:70, 25:75] = 1.0
        img = np.asarray(gaussian_blur(jnp.asarray(img[None]), 1.5))[0]
        lafs, scores, valid = detect_keypoints(
            jnp.asarray(img[None]), 16, response="gftt", double_image=False
        )
        kpts = np.asarray(lafs[0, :, :, 2])[np.asarray(valid[0])]
        corners = [(25, 30), (74, 30), (25, 69), (74, 69)]
        for c in corners:
            d = np.linalg.norm(kpts - np.asarray(c), axis=1).min()
            assert d < 4.0, f"corner {c} missed (nearest {d:.1f}px)"

    def test_static_shapes_and_padding(self):
        img = jnp.zeros((2, 64, 64))
        lafs, scores, valid = detect_keypoints(img, 50, double_image=False)
        assert lafs.shape == (2, 50, 2, 3) and scores.shape == (2, 50)
        assert not bool(valid.any())  # blank image -> nothing valid


class TestOrientation:
    def test_gradient_direction_recovered(self):
        h = w = 64
        for angle_deg in (0.0, 45.0, 120.0, -90.0):
            a = np.deg2rad(angle_deg)
            ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
            img = np.cos(a) * xs + np.sin(a) * ys  # gradient = (cos a, sin a)
            lafs = np.asarray([[[[10.0, 0, 32], [0, 10.0, 32]]]], np.float32)
            est = float(
                dominant_gradient_orientation(jnp.asarray(img[None]), jnp.asarray(lafs))[0, 0]
            )
            diff = np.angle(np.exp(1j * (est - a)))
            assert abs(diff) < 0.25, f"{angle_deg}: est {np.rad2deg(est):.1f}"

    def test_rotate_lafs_composition(self):
        lafs = jnp.asarray(np.asarray([[[[2.0, 0, 5], [0, 2.0, 7]]]], np.float32))
        out = rotate_lafs(lafs, jnp.asarray([[np.pi / 2]]))
        A = np.asarray(out[0, 0, :2, :2])
        np.testing.assert_allclose(A, [[0, -2], [2, 0]], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[0, 0, :, 2]), [5, 7])


class TestSIFTDescriptor:
    def test_norms(self):
        p = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (6, 41, 41)).astype(np.float32))
        d_root = sift_describe_patches(p, rootsift=True)
        d_l2 = sift_describe_patches(p, rootsift=False)
        assert d_root.shape == (6, 128)
        np.testing.assert_allclose(np.sum(np.asarray(d_root) ** 2, -1), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d_l2), axis=-1), 1.0, atol=1e-4)

    def test_discriminative(self):
        # oriented gratings: orientation histograms differ strongly
        ys, xs = np.mgrid[0:41, 0:41].astype(np.float32)
        a = np.sin(xs * 0.8).astype(np.float32)          # vertical edges
        b = np.sin((xs + ys) * 0.6).astype(np.float32)   # diagonal edges
        da, db = np.asarray(sift_describe_patches(jnp.stack([jnp.asarray(a), jnp.asarray(b)])))
        da2 = np.asarray(sift_describe_patches(jnp.asarray(a)[None]))[0]
        assert np.dot(da, da2) > 0.999
        assert np.dot(da, db) < 0.85


class TestSIFTFeatureEndToEnd:
    def test_same_image_descriptors_match(self):
        img = blob_image([(40, 40), (90, 60), (60, 100), (110, 110)], [3, 4, 5, 3.5])
        extractor = SIFTFeature(max_keypoints=64, double_image=False)
        feats = jax.jit(extractor)(jnp.asarray(np.stack([img, img])))
        assert feats.descriptors.shape == (2, 64, 128)
        m = np.asarray(feats.mask)
        assert m[0].sum() > 4
        # identical images -> identical features
        np.testing.assert_allclose(
            np.asarray(feats.descriptors[0]), np.asarray(feats.descriptors[1]), atol=1e-5
        )


class TestHardNet:
    def build_torch_hardnet(self, seed=0):
        torch.manual_seed(seed)
        layers = []
        chans = [(1, 32, 1), (32, 32, 1), (32, 64, 2), (64, 64, 1), (64, 128, 2), (128, 128, 1)]
        for ci, co, s in chans:
            layers += [
                torch.nn.Conv2d(ci, co, 3, stride=s, padding=1, bias=False),
                torch.nn.BatchNorm2d(co, affine=False),
                torch.nn.ReLU(),
            ]
        layers += [
            torch.nn.Dropout(0.3),
            torch.nn.Conv2d(128, 128, 8, bias=False),
            torch.nn.BatchNorm2d(128, affine=False),
        ]
        model = torch.nn.Sequential(*layers).eval()
        # randomize running stats so the BN conversion is actually tested
        with torch.no_grad():
            for m in model:
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.5, 0.5)
                    m.running_var.uniform_(0.5, 2.0)
        return model

    def test_parity_with_torch(self):
        torch_model = self.build_torch_hardnet()
        sd = {f"features.{i}.{k}": v for i, m in enumerate(torch_model)
              for k, v in m.state_dict().items()}
        variables = hardnet_params_from_torch(sd)

        rng = np.random.default_rng(0)
        patches = rng.normal(size=(5, 32, 32, 1)).astype(np.float32)
        ours = HardNet().apply(variables, jnp.asarray(patches))

        with torch.no_grad():
            t_in = torch.from_numpy(patches.transpose(0, 3, 1, 2))
            t_out = torch_model(t_in).reshape(5, -1)
            t_out = t_out / t_out.norm(dim=-1, keepdim=True)
        np.testing.assert_allclose(np.asarray(ours), t_out.numpy(), atol=2e-5)

    def test_describe_lafs_shapes(self):
        model = HardNet()
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
        img = jnp.asarray(blob_image([(30, 30)], [4.0], (64, 64))[None])
        lafs = jnp.asarray(np.asarray([[[[8.0, 0, 30], [0, 8.0, 30]],
                                        [[8.0, 0, 40], [0, 8.0, 20]]]], np.float32))
        desc = describe_lafs(model, variables, img, lafs)
        assert desc.shape == (1, 2, 128)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(desc), axis=-1), 1.0, atol=1e-5)


def test_detector_tiny_image_returns_invalid():
    img = jnp.zeros((1, 16, 16))
    lafs, scores, valid = detect_keypoints(img, 10, double_image=False)
    assert lafs.shape == (1, 10, 2, 3)
    assert not bool(valid.any())


def test_subpixel_refinement_improves_blob_localization():
    """Blob centered OFF the pixel grid: the refined keypoint must land
    closer to the true center than the integer-grid argmax."""
    h, w = 96, 96
    cx, cy = 47.4, 50.7  # off-grid center
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * 4.0**2))
    lafs, scores, valid = detect_keypoints(
        jnp.asarray(img[None]), 8, response="dog", double_image=False
    )
    kpts = np.asarray(lafs[0, :, :, 2])[np.asarray(valid[0])]
    d = np.linalg.norm(kpts - [cx, cy], axis=1)
    best = kpts[np.argmin(d)]
    # sub-pixel: must beat the >= 0.4 px integer-grid error on at least one axis
    assert abs(best[0] - cx) < 0.35 and abs(best[1] - cy) < 0.35, best
