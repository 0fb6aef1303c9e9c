"""Local Affine Frame (LAF) utilities and side-info converters.

LAFs are [B, N, 2, 3] arrays: the left 2x2 block is the affine shape A, the
last column the keypoint center. Converters extract geometric side information
fed to the positional encoder (reference models/laf_converter.py:22-128); the
kornia LAF helpers the reference leans on (get_laf_scale) are reimplemented
here in pure jnp.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _xp(arr):
    """Array namespace of ``arr`` — numpy stays numpy so HOST callers (the
    collate path, data/collate.py) never round-trip through the device: a
    per-batch device fetch over the axon tunnel costs ~40 ms and any dropped
    RPC hangs the data loader forever (round-4 trainer-proof hang). In-jit
    callers pass traced jnp arrays and keep jnp."""
    return np if isinstance(arr, np.ndarray) else jnp


def laf_center(lafs: jnp.ndarray) -> jnp.ndarray:
    """Keypoint xy from LAFs: [B, N, 2, 3] -> [B, N, 2]."""
    return lafs[..., :, 2]


def laf_scale(lafs: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Scale = sqrt(|det A|) (kornia get_laf_scale semantics):
    [B, N, 2, 3] -> [B, N, 1]."""
    xp = _xp(lafs)
    A = lafs[..., :2, :2]
    det = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    return xp.sqrt(xp.abs(det) + eps)[..., None]


def laf_from_keypoints(
    keypoints: jnp.ndarray, scale: float = 1.0
) -> jnp.ndarray:
    """Build identity-shape LAFs from keypoints [B, N, 2] (reference
    superpoint/model.py:120-127 sets A = I)."""
    b, n, _ = keypoints.shape
    eye = jnp.eye(2, dtype=keypoints.dtype) * scale
    eye = jnp.broadcast_to(eye, (b, n, 2, 2))
    return jnp.concatenate([eye, keypoints[..., None]], axis=-1)


def laf_log_scale(lafs: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 1] log scale (reference laf_converter.py:22-36)."""
    return _xp(lafs).log(laf_scale(lafs))


def laf_sincos_orientation(lafs: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 2] flipped first row / scale (reference laf_converter.py:39-54:
    flip(lafs[..., 0, :2]) / scale)."""
    scale = laf_scale(lafs)
    first_row = lafs[..., 0, :2]
    return first_row[..., ::-1] / scale


def laf_affine_geom(lafs: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 4] flattened A / scale (reference laf_converter.py:57-72)."""
    scale = laf_scale(lafs)
    A = lafs[..., :2, :2]
    return A.reshape(*A.shape[:-2], 4) / scale


class LAFConverter:
    """Concatenate selected LAF->side-info conversions
    (reference laf_converter.py:75-105)."""

    def __init__(self, functions: Optional[Sequence[Tuple[Callable, int]]] = None):
        self.functions = functions

    def __call__(self, lafs: jnp.ndarray) -> jnp.ndarray:
        xp = _xp(lafs)
        if not self.functions:
            b, n = lafs.shape[:2]
            return xp.zeros((b, n, 0), dtype=lafs.dtype)
        return xp.concatenate([fn(lafs) for fn, _ in self.functions], axis=-1)

    @property
    def side_info_dim(self) -> int:
        if not self.functions:
            return 0
        return sum(dim for _, dim in self.functions)


_METHODS = {
    "none": (),
    "rotation": ((laf_sincos_orientation, 2),),
    "scale": ((laf_log_scale, 1),),
    "scale_rotation": ((laf_log_scale, 1), (laf_sincos_orientation, 2)),
    "affine": ((laf_log_scale, 1), (laf_affine_geom, 4)),
}


def get_laf_to_sideinfo_converter(method_name: str = "none") -> LAFConverter:
    """Registry (reference laf_converter.py:108-128)."""
    key = method_name.lower()
    if key not in _METHODS:
        raise NameError(f"Unexpected name for the method: {method_name}")
    return LAFConverter(_METHODS[key] or None)
