"""GFTT-AffNet-HardNet device extractor (reference
models/features/hardnet.py:16-38: kornia ScaleSpaceDetector(CornerGFTT) +
LAFOrienter(19) + LAFAffNetShapeEstimator + HardNet).

One flax module so the AffNet + HardNet parameters live in a single variable
tree (importable from kornia torch checkpoints via
compat-style converters in features.affnet / features.hardnet); the detector
and orientation stages are parameter-free JAX ops from features.scale_space.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from openglue_tpu.core.types import Features
from openglue_tpu.features.affnet import AffNet
from openglue_tpu.features.hardnet import HardNet
from openglue_tpu.features.patches import extract_laf_patches, normalize_patches
from openglue_tpu.features.scale_space import (
    detect_keypoints,
    dominant_gradient_orientation,
    rotate_lafs,
)


@dataclasses.dataclass(frozen=True)
class GFTTAffNetHardNetConfig:
    max_keypoints: int = 1024
    descriptor_dim: int = 128
    patch_size: int = 32
    num_levels: int = 3
    init_sigma: float = 1.6
    upright: bool = False
    use_affnet: bool = True
    response_threshold: float = 0.0
    mr_size: float = 6.0
    nms_diameter: int = 9
    dtype: object = None


class GFTTAffNetHardNet(nn.Module):
    """image [B, H, W, 1] or [B, H, W] -> Features with HardNet descriptors."""

    config: GFTTAffNetHardNetConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> Features:
        cfg = self.config
        if image.ndim == 4:
            image = image[..., 0]

        lafs, scores, valid = detect_keypoints(
            image,
            cfg.max_keypoints,
            response="gftt",
            num_levels=cfg.num_levels,
            init_sigma=cfg.init_sigma,
            double_image=False,
            response_threshold=cfg.response_threshold,
            mr_size=cfg.mr_size,
            nms_diameter=cfg.nms_diameter,
        )

        if cfg.use_affnet:
            affnet = AffNet(dtype=cfg.dtype, name="affnet")
            b, n = lafs.shape[:2]
            patches = normalize_patches(
                extract_laf_patches(image, lafs, cfg.patch_size)
            )
            L = affnet(patches.reshape(b * n, cfg.patch_size, cfg.patch_size, 1), train)
            L = L.reshape(b, n, 2, 2)
            A = jnp.einsum("bnij,bnjk->bnik", lafs[..., :2, :2], L)
            lafs = jnp.concatenate([A, lafs[..., 2:]], axis=-1)

        if not cfg.upright:
            angles = dominant_gradient_orientation(image, lafs, patch_size=19)
            lafs = rotate_lafs(lafs, angles)

        hardnet = HardNet(descriptor_dim=cfg.descriptor_dim, dtype=cfg.dtype, name="hardnet")
        b, n = lafs.shape[:2]
        patches = normalize_patches(extract_laf_patches(image, lafs, cfg.patch_size))
        desc = hardnet(patches.reshape(b * n, cfg.patch_size, cfg.patch_size, 1), train)
        desc = desc.reshape(b, n, -1)

        return Features(lafs=lafs, responses=scores, descriptors=desc, mask=valid)
