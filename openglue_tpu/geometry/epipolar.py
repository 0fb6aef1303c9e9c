"""Epipolar geometry in pure JAX (device side).

Essential matrix from GT relative pose and the symmetrical epipolar distance
(the reference delegates to kornia.geometry.epipolar, utils/metrics.py:36-43;
formulae reproduced here from first principles so the eval path needs no
host transfer until the RANSAC stage).

Convention (matches the reference data: x1_cam = R @ x0_cam + T):
E = [T]_x @ R, epipolar constraint x1ᵀ E x0 = 0 in K-normalized coords.
"""

from __future__ import annotations

import jax.numpy as jnp


def cross_product_matrix(t: jnp.ndarray) -> jnp.ndarray:
    """[B, 3] -> [B, 3, 3] skew-symmetric matrices."""
    zeros = jnp.zeros_like(t[..., 0])
    rows = [
        jnp.stack([zeros, -t[..., 2], t[..., 1]], axis=-1),
        jnp.stack([t[..., 2], zeros, -t[..., 0]], axis=-1),
        jnp.stack([-t[..., 1], t[..., 0], zeros], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def essential_from_Rt(R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """E = [T]_x R for x1 = R x0 + T. R: [B, 3, 3]; T: [B, 3]."""
    return cross_product_matrix(T) @ R


def symmetrical_epipolar_distance(
    pts0: jnp.ndarray, pts1: jnp.ndarray, E: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Symmetric epipolar distance of point pairs under E (kornia-compatible:
    squared residual times the sum of inverse line-norm² of both epipolar
    lines). pts0/pts1: [B, N, 2] K-normalized; E: [B, 3, 3] -> [B, N]."""
    ones = jnp.ones((*pts0.shape[:-1], 1), pts0.dtype)
    x0 = jnp.concatenate([pts0, ones], axis=-1)  # [B, N, 3]
    x1 = jnp.concatenate([pts1, ones], axis=-1)

    Ex0 = jnp.einsum("bij,bnj->bni", E, x0)  # epipolar lines in image1
    Etx1 = jnp.einsum("bji,bnj->bni", E, x1)  # epipolar lines in image0
    num = jnp.sum(x1 * Ex0, axis=-1) ** 2  # (x1ᵀ E x0)²
    inv0 = 1.0 / (Ex0[..., 0] ** 2 + Ex0[..., 1] ** 2 + eps)
    inv1 = 1.0 / (Etx1[..., 0] ** 2 + Etx1[..., 1] ** 2 + eps)
    return num * (inv0 + inv1)
