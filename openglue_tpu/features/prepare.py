"""Convert raw extractor output into the SuperGlue input format
(reference models/features/utils.py:54-65)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from openglue_tpu.core.types import Features, KeypointSet
from openglue_tpu.features.lafs import LAFConverter, laf_center


def prepare_features_output(
    lafs: jnp.ndarray,
    responses: jnp.ndarray,
    descriptors: jnp.ndarray,
    laf_converter: LAFConverter,
    image_size: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    log_response: bool = False,
) -> KeypointSet:
    """keypoints = LAF centers; side_info = concat[response, converter(lafs)]
    with optional log(r + 0.1) transform (reference features/utils.py:54-65)."""
    kpts = laf_center(lafs)
    resp = responses[..., None]
    if log_response:
        resp = jnp.log(resp + 0.1)
    side_info = jnp.concatenate([resp, laf_converter(lafs)], axis=-1)
    if mask is None:
        mask = jnp.ones(kpts.shape[:2], dtype=bool)
    image_size = jnp.asarray(image_size)
    if image_size.ndim == 1:
        image_size = jnp.broadcast_to(image_size, (kpts.shape[0], 2))
    return KeypointSet(
        keypoints=kpts,
        descriptors=descriptors,
        side_info=side_info,
        mask=mask,
        image_size=image_size,
    )


def features_to_keypoint_set(
    features: Features,
    laf_converter: LAFConverter,
    image_size: jnp.ndarray,
    log_response: bool = False,
) -> KeypointSet:
    return prepare_features_output(
        features.lafs,
        features.responses,
        features.descriptors,
        laf_converter,
        image_size,
        mask=features.mask,
        log_response=log_response,
    )
