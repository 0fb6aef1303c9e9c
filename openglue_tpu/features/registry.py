"""Feature-extractor registry (reference models/features/__init__.py:8-24).

Two kinds of extractors:
  * device extractors (JAX modules; SuperPoint) usable online in the jitted
    training step and in the cacher;
  * host extractors (OpenCV; SIFT) usable only by the offline cacher
    (reference README.md:140 marks the OpenCV family cached-only).

``get_feature_extractor(name)`` returns the constructor. Unknown names raise
ValueError (the reference's unknown-name path silently returns None —
models/features/__init__.py:33 builds but never raises; fixed here).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

DEVICE_EXTRACTORS: Dict[str, Callable[..., Any]] = {}
HOST_EXTRACTORS: Dict[str, Callable[..., Any]] = {}


def _register():
    from openglue_tpu.features.gftt_hardnet import (
        GFTTAffNetHardNet,
        GFTTAffNetHardNetConfig,
    )
    from openglue_tpu.features.opencv_features import sift_create
    from openglue_tpu.features.sift import SIFTFeature
    from openglue_tpu.features.superpoint import SuperPoint, SuperPointConfig

    def superpoint(**params):
        return SuperPoint(SuperPointConfig(**params))

    def superpoint_bn(**params):
        return SuperPoint(SuperPointConfig(bn=True, **params))

    def gftt_affnet_hardnet(**params):
        return GFTTAffNetHardNet(GFTTAffNetHardNetConfig(**params))

    DEVICE_EXTRACTORS.update(
        {
            "SuperPointNet": superpoint,
            "SuperPointNetBn": superpoint_bn,
            "SIFT": SIFTFeature,  # JAX DoG + (Root)SIFT (kornia SIFT in reference)
            "GFTTAffNetHardNet": gftt_affnet_hardnet,
        }
    )
    from openglue_tpu.features.dog_affnet_hardnet import dog_affnet_hardnet_create

    HOST_EXTRACTORS.update(
        {
            "OPENCV_SIFT": sift_create,
            "OPENCVDoGAffNetHardNet": dog_affnet_hardnet_create,
        }
    )


_register()


def get_feature_extractor(name: str) -> Callable[..., Any]:
    if name in DEVICE_EXTRACTORS:
        return DEVICE_EXTRACTORS[name]
    if name in HOST_EXTRACTORS:
        return HOST_EXTRACTORS[name]
    raise ValueError(
        f"Unknown feature extractor {name!r}; device: {sorted(DEVICE_EXTRACTORS)}, "
        f"host (cached-extraction only): {sorted(HOST_EXTRACTORS)}"
    )


def is_device_extractor(name: str) -> bool:
    return name in DEVICE_EXTRACTORS
