"""Core pytree types.

TPU shape discipline: every keypoint set is a fixed-size padded array plus a
validity mask. The reference achieves rectangularity by ragged min-stacking
online (reference models/features/utils.py:26-51) and zero-padding to a fixed
1024 in the cached collate (reference data/megadepth_datamodule.py:104-168);
here padding + masks are the single universal representation so that every
jitted computation has static shapes.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class KeypointSet:
    """A padded batch of keypoint sets for one image side.

    Attributes:
      keypoints: [B, N, 2] (x, y) pixel coordinates.
      descriptors: [B, N, D] local descriptors.
      side_info: [B, N, S] geometric side information (response + LAF-derived).
      mask: [B, N] bool; True for real keypoints, False for padding.
      image_size: [B, 2] (width, height) per element.
    """

    keypoints: jnp.ndarray
    descriptors: jnp.ndarray
    side_info: jnp.ndarray
    mask: jnp.ndarray
    image_size: jnp.ndarray

    @property
    def num_keypoints(self) -> int:
        return self.keypoints.shape[1]


@struct.dataclass
class Features:
    """Raw extractor output before side-info preparation.

    lafs: [B, N, 2, 3] local affine frames (last column = keypoint xy).
    responses: [B, N] detector responses.
    descriptors: [B, N, D].
    mask: [B, N] validity.
    """

    lafs: jnp.ndarray
    responses: jnp.ndarray
    descriptors: jnp.ndarray
    mask: jnp.ndarray


@struct.dataclass
class Transformation:
    """Ground-truth geometric relation between the two images of a pair.

    Either a homography (kind='perspective', H set) or a 3D reprojection
    (kind='3d_reprojection', K0/K1/R/T/depth0/depth1 set). ``kind`` is a
    static (non-pytree) field so jitted code can branch on it at trace time —
    mirrors reference utils/misc.py:21-33 dispatching on transformation['type'].

    depth may be a dense map [B, H, W] or per-keypoint [B, N]
    (the cached-collate format, reference megadepth_datamodule.py:137-141).
    """

    kind: str = struct.field(pytree_node=False)
    H: Optional[jnp.ndarray] = None
    K0: Optional[jnp.ndarray] = None
    K1: Optional[jnp.ndarray] = None
    R: Optional[jnp.ndarray] = None
    T: Optional[jnp.ndarray] = None
    depth0: Optional[jnp.ndarray] = None
    depth1: Optional[jnp.ndarray] = None

    def inverse(self) -> "Transformation":
        if self.kind == "perspective":
            return Transformation(kind="perspective", H=jnp.linalg.inv(self.H))
        if self.kind == "3d_reprojection":
            R_t = jnp.swapaxes(self.R, -1, -2)
            return Transformation(
                kind="3d_reprojection",
                K0=self.K1,
                K1=self.K0,
                R=R_t,
                T=-jnp.einsum("...ij,...j->...i", R_t, self.T),
                depth0=self.depth1,
                depth1=self.depth0,
            )
        raise ValueError(f"Unknown transformation kind {self.kind!r}")


@struct.dataclass
class PairBatch:
    """A batch of image pairs ready for matching/training."""

    side0: KeypointSet
    side1: KeypointSet
    transformation: Optional[Transformation] = None
