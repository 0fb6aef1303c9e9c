"""DoG(OpenCV)-AffNet-HardNet hybrid extractor (reference
models/features/opencv/dog_affnet_harnet.py:19-81): keypoints detected on the
host with OpenCV's DoG (dense SIFT detector, thresholds disabled), then
affine shape (AffNet) + orientation (OriNet) + description (HardNet) on
device. Cached-extraction only, like the reference (README.md:140).

The host detector emits padded fixed-size LAFs + masks, so the device stage
is one jitted call regardless of detection count.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from openglue_tpu.features.opencv_features import OpenCVFeatures


class DoGAffNetHardNet:
    """Host detect + device describe. Not a flax module: AffNet/OriNet/HardNet
    variables are held explicitly (load converted kornia weights via
    ``load_weights``)."""

    def __init__(
        self,
        max_keypoints: int = 2048,
        nms_diameter: float = 9.0,
        patch_size: int = 32,
        upright: bool = False,
        use_affnet: bool = True,
        seed: int = 0,
    ):
        import cv2
        import jax
        import jax.numpy as jnp

        from openglue_tpu.features.affnet import AffNet, OriNet
        from openglue_tpu.features.hardnet import HardNet

        self.patch_size = patch_size
        self.upright = upright
        self.use_affnet = use_affnet
        self.detector = OpenCVFeatures(
            cv2.SIFT_create(contrastThreshold=-10000, edgeThreshold=-10000),
            max_keypoints=max_keypoints,
            nms_diameter=nms_diameter,
            laf_scale_mr_size=6.0,
            pad_to_max=True,
        )

        self.affnet = AffNet()
        self.orinet = OriNet()
        self.hardnet = HardNet()
        dummy = jnp.zeros((1, patch_size, patch_size, 1))
        self.affnet_vars = self.affnet.init(jax.random.key(seed), dummy)
        self.orinet_vars = self.orinet.init(jax.random.key(seed + 1), dummy)
        self.hardnet_vars = self.hardnet.init(jax.random.key(seed + 2), dummy)

        self._describe = jax.jit(self._describe_impl)

    def load_weights(
        self,
        affnet: Optional[Mapping[str, Any]] = None,
        orinet: Optional[Mapping[str, Any]] = None,
        hardnet: Optional[Mapping[str, Any]] = None,
    ) -> None:
        """Install converted torch weights (features.affnet/hardnet converters)."""
        if affnet is not None:
            self.affnet_vars = affnet
        if orinet is not None:
            self.orinet_vars = orinet
        if hardnet is not None:
            self.hardnet_vars = hardnet

    def _describe_impl(self, affnet_vars, orinet_vars, hardnet_vars, image, lafs):
        import jax.numpy as jnp

        from openglue_tpu.features.affnet import (
            estimate_laf_orientations,
            estimate_laf_shapes,
        )
        from openglue_tpu.features.hardnet import describe_lafs
        from openglue_tpu.features.scale_space import rotate_lafs

        if self.use_affnet:
            lafs = estimate_laf_shapes(
                self.affnet, affnet_vars, image, lafs, self.patch_size
            )
        if not self.upright:
            angles = estimate_laf_orientations(
                self.orinet, orinet_vars, image, lafs, self.patch_size
            )
            lafs = rotate_lafs(lafs, angles)
        desc = describe_lafs(self.hardnet, hardnet_vars, image, lafs, self.patch_size)
        return lafs, desc

    def detect_and_compute(self, image: np.ndarray):
        """uint8 grayscale [H, W] -> (lafs [K, 2, 3], scores [K], desc [K, 128],
        mask [K]) — the host-extractor contract used by the cacher."""
        import jax.numpy as jnp

        lafs, scores, _sift_desc, mask = self.detector.detect_and_compute(image)
        img = jnp.asarray(image.astype(np.float32) / 255.0)[None]
        lafs_j, desc = self._describe(
            self.affnet_vars, self.orinet_vars, self.hardnet_vars,
            img, jnp.asarray(lafs[None]),
        )
        return (
            np.asarray(lafs_j[0]),
            scores,
            np.asarray(desc[0]),
            mask,
        )


def dog_affnet_hardnet_create(**kwargs) -> DoGAffNetHardNet:
    return DoGAffNetHardNet(**kwargs)
