"""SIFT patch descriptor + composed DoG-SIFT extractor in pure JAX
(reference models/features/sift.py:16-49, built there from kornia
ScaleSpaceDetector + SIFTDescriptor).

Descriptor (Lowe 2004 / kornia SIFTDescriptor semantics): gradients on a
41x41 LAF patch, 4x4 spatial x 8 orientation bins with bilinear soft
assignment, Gaussian spatial window, L2 -> clip 0.2 -> L2, optional RootSIFT
(L1 -> sqrt, Arandjelović 2012). All shape-static and vmapped.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from openglue_tpu.core.types import Features
from openglue_tpu.features.patches import extract_laf_patches
from openglue_tpu.features.scale_space import (
    detect_keypoints,
    dominant_gradient_orientation,
    rotate_lafs,
)


def sift_describe_patches(
    patches: jnp.ndarray,
    num_spatial_bins: int = 4,
    num_ang_bins: int = 8,
    clip: float = 0.2,
    rootsift: bool = True,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """patches [..., P, P] -> descriptors [..., num_spatial_bins² * num_ang_bins]."""
    p = patches.shape[-1]
    gy, gx = jnp.gradient(patches, axis=(-2, -1))
    mag = jnp.sqrt(gx * gx + gy * gy + eps)
    ori = jnp.arctan2(gy, gx)  # [-pi, pi)

    # Gaussian window over the patch
    lin = jnp.arange(p, dtype=jnp.float32) - (p - 1) / 2
    g = jnp.exp(-0.5 * (lin / (0.5 * p / 1.6)) ** 2)
    weight = mag * (g[:, None] * g[None, :])

    # spatial soft-assignment: pixel position in bin coordinates
    bin_coord = (jnp.arange(p, dtype=jnp.float32) + 0.5) / p * num_spatial_bins - 0.5
    b0 = jnp.floor(bin_coord)
    frac = bin_coord - b0

    def spatial_weights(axis_idx):
        """[P, num_spatial_bins] bilinear weights along one axis."""
        idx = jnp.arange(num_spatial_bins)[None, :]
        w_lo = jnp.where(b0[:, None] == idx, 1.0 - frac[:, None], 0.0)
        w_hi = jnp.where(b0[:, None] + 1 == idx, frac[:, None], 0.0)
        return w_lo + w_hi  # [P, S]

    wy = spatial_weights(0)  # [P, S]
    wx = spatial_weights(1)

    # orientation soft-assignment into num_ang_bins circular bins
    o = (ori + jnp.pi) / (2 * jnp.pi) * num_ang_bins
    o0 = jnp.floor(o)
    ofrac = o - o0
    o0 = o0.astype(jnp.int32) % num_ang_bins
    o1 = (o0 + 1) % num_ang_bins
    ang0 = jax.nn.one_hot(o0, num_ang_bins, dtype=weight.dtype) * (1.0 - ofrac[..., None])
    ang1 = jax.nn.one_hot(o1, num_ang_bins, dtype=weight.dtype) * ofrac[..., None]
    ang = (ang0 + ang1) * weight[..., None]  # [..., P, P, A]

    # histogram: sum_y sum_x wy[y,i] wx[x,j] ang[..., y, x, a]
    hist = jnp.einsum("...yxa,yi,xj->...ija", ang, wy, wx)
    desc = hist.reshape(*hist.shape[:-3], num_spatial_bins * num_spatial_bins * num_ang_bins)

    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), eps)
    desc = jnp.minimum(desc, clip)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), eps)
    if rootsift:
        l1 = jnp.sum(jnp.abs(desc), axis=-1, keepdims=True)
        desc = jnp.sqrt(desc / jnp.maximum(l1, eps))
    return desc


@dataclasses.dataclass(frozen=True)
class SIFTConfig:
    max_keypoints: int = 1024
    descriptor_dim: int = 128  # 4*4*8, fixed by the descriptor layout
    patch_size: int = 41
    num_levels: int = 3
    init_sigma: float = 1.6
    double_image: bool = True
    upright: bool = False
    rootsift: bool = True
    response_threshold: float = 0.0
    mr_size: float = 6.0
    nms_diameter: int = 9


class SIFTFeature:
    """DoG detector + orientation + (Root)SIFT descriptor, fully on device.

    Callable: image [B, H, W] float in [0, 1] -> core Features pytree with
    static [B, K] shapes. Mirrors the reference's kornia SIFT composition
    (sift.py:31-49) with fixed-k selection instead of ragged output.
    """

    def __init__(self, **kwargs):
        self.config = SIFTConfig(**kwargs)

    # flax-compatible surface so the registry/cacher treat parameter-free
    # extractors uniformly with SuperPoint/GFTTAffNetHardNet
    def init(self, _rng, image) -> dict:
        return {}

    def apply(self, _variables, image: jnp.ndarray, train: bool = False) -> Features:
        if image.ndim == 4:
            image = image[..., 0]
        return self(image)

    def __call__(self, image: jnp.ndarray) -> Features:
        cfg = self.config
        lafs, scores, valid = detect_keypoints(
            image,
            cfg.max_keypoints,
            response="dog",
            num_levels=cfg.num_levels,
            init_sigma=cfg.init_sigma,
            double_image=cfg.double_image,
            response_threshold=cfg.response_threshold,
            mr_size=cfg.mr_size,
            nms_diameter=cfg.nms_diameter,
        )
        if not cfg.upright:
            angles = dominant_gradient_orientation(image, lafs)
            lafs = rotate_lafs(lafs, angles)
        patches = extract_laf_patches(image, lafs, cfg.patch_size)
        desc = sift_describe_patches(patches, rootsift=cfg.rootsift)
        return Features(lafs=lafs, responses=scores, descriptors=desc, mask=valid)
