"""Geometric transforms for keypoint reprojection (reference utils/misc.py).

Pure JAX, batched, static-shape. Transformations are described by the
``Transformation`` pytree (openglue_tpu.core.types) whose ``kind`` is static so
jit traces exactly one branch.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from openglue_tpu.core.types import Transformation

# Coordinate math must be exact f32: the GT thresholds are 2px/7px on ~1000px
# coordinates, and jax's DEFAULT matmul precision is bf16-class on TPU (and on
# CPU in jax>=0.9) — a single bf16 rounding of a 600px coordinate is ~2px.
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def normalize_with_intrinsics(kpts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> calibrated coordinates (reference utils/misc.py:5-7).

    kpts: [N, 2] or [B, N, 2]; K: [3, 3] or [B, 3, 3].
    """
    if K.ndim == 2:
        principal = K[:2, 2]
        focal = jnp.stack([K[0, 0], K[1, 1]])
        return (kpts - principal) / focal
    principal = K[:, None, :2, 2]
    focal = jnp.stack([K[:, 0, 0], K[:, 1, 1]], axis=-1)[:, None, :]
    return (kpts - principal) / focal


def perspective_transform(
    kpts: jnp.ndarray, H: jnp.ndarray, eps: float = 1e-8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp [B, N, 2] keypoints by [B, 3, 3] homographies
    (reference utils/misc.py:62-70). Returns (warped [B,N,2], valid [B,N])."""
    ones = jnp.ones((*kpts.shape[:-1], 1), dtype=kpts.dtype)
    kpts_h = jnp.concatenate([kpts, ones], axis=-1)
    warped = _einsum("bnk,bjk->bnj", kpts_h, H)
    out = warped[..., :2] / (warped[..., 2:3] + eps)
    mask = jnp.ones(kpts.shape[:-1], dtype=bool)
    return out, mask


def gather_depth_at_keypoints(depth: jnp.ndarray, kpts: jnp.ndarray) -> jnp.ndarray:
    """Sample a dense depth map [B, H, W] at integer keypoint pixels [B, N, 2]
    (x, y), clamped to bounds (reference utils/misc.py:90-96 gathers at the
    truncated integer pixel; out-of-bounds kpts are the caller's concern there
    — here they clamp, and padded kpts at (0,0) read a real pixel whose value
    is irrelevant because the validity mask already excludes them)."""
    b, h, w = depth.shape
    idx = kpts.astype(jnp.int32)
    x = jnp.clip(idx[..., 0], 0, w - 1)
    y = jnp.clip(idx[..., 1], 0, h - 1)
    batch = jnp.arange(b)[:, None]
    return depth[batch, y, x]


def reproject_3d(
    kpts: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    T: jnp.ndarray,
    R: jnp.ndarray,
    depth0: jnp.ndarray,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reproject [B, N, 2] keypoints from camera 0 into camera 1 via depth +
    relative pose (reference utils/misc.py:73-103).

    depth0 is either per-keypoint [B, N] (cached-collate format) or a dense
    map [B, H, W]. Returns (projected [B, N, 2], depth-valid [B, N])."""
    ones = jnp.ones((*kpts.shape[:-1], 1), dtype=kpts.dtype)
    kpts_h = jnp.concatenate([kpts, ones], axis=-1)

    if depth0.ndim == 2:
        depth = depth0
    else:
        depth = gather_depth_at_keypoints(depth0, kpts)
    valid = ~jnp.isclose(depth, 0.0)

    rays = _einsum("bnk,bjk->bnj", kpts_h, jnp.linalg.inv(K0))
    points = rays * depth[..., None]
    points = _einsum("bnk,bjk->bnj", points, R) + T[:, None, :]
    projected = _einsum("bnk,bjk->bnj", points, K1)
    projected = projected[..., :2] / (projected[..., 2:3] + eps)
    return projected, valid


def reproject_keypoints(
    kpts: jnp.ndarray, transformation: Transformation
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch on the (static) transformation kind (reference utils/misc.py:21-33)."""
    if transformation.kind == "perspective":
        return perspective_transform(kpts, transformation.H)
    if transformation.kind == "3d_reprojection":
        return reproject_3d(
            kpts,
            transformation.K0,
            transformation.K1,
            transformation.T,
            transformation.R,
            transformation.depth0,
        )
    raise ValueError(f"Unknown transformation kind {transformation.kind!r}")


def pairwise_cosine_dist(x1: jnp.ndarray, x2: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Half cosine distance in [0, 1]: (1 - cos)/2 (reference utils/misc.py:106-113,
    which computes the same value as 0.25·cdist(normalized)²).

    x1: [B, N, D]; x2: [B, M, D] -> [B, N, M]."""
    x1 = x1 / jnp.maximum(jnp.linalg.norm(x1, axis=-1, keepdims=True), eps)
    x2 = x2 / jnp.maximum(jnp.linalg.norm(x2, axis=-1, keepdims=True), eps)
    cos = jnp.einsum("bnd,bmd->bnm", x1, x2)
    return 0.5 * (1.0 - cos)


def cdist(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Euclidean distance [B, N, D] x [B, M, D] -> [B, N, M].

    Computed from direct differences, not the ||a||²+||b||²-2ab expansion: the
    expansion catastrophically cancels for near-coincident points (the exact
    regime the 2px GT threshold cares about) and routes through a
    low-precision matmul by default. For the D=2 coordinate case the direct
    form is also cheap ([B,N,M,2] fuses into the reduction under XLA)."""
    diff = x1[..., :, None, :] - x2[..., None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


def cdist_sq(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """SQUARED pairwise Euclidean distance [B, N, D] x [B, M, D] -> [B, N, M].

    Same direct-difference form as cdist (no ||a||²+||b||²-2ab cancellation)
    but without the full-matrix sqrt pass — callers that only rank distances
    (argmin/min) take the sqrt of the reduced [B, N] values instead."""
    diff = x1[..., :, None, :] - x2[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)
