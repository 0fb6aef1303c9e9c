"""LAF-centered patch extraction in pure JAX (replaces kornia
extract_patches_from_pyramid used by the reference's patch descriptors,
models/features/utils.py:15-23).

A LAF [[a11 a12 x], [a21 a22 y]] maps the unit circle to the keypoint's
ellipse; a patch is sampled on a PS x PS grid over the LAF's affine frame:
p(u, v) = A @ (u, v)^T + center, with (u, v) on [-1, 1]^2 (kornia convention:
the grid spans the full affine frame). Bilinear sampling with edge clamping;
vmapped over batch and keypoints, shape-static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample_image(image: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """image: [H, W]; coords: [..., 2] (x, y) pixel coords -> [...] values.
    Out-of-bounds taps clamp to the border.

    Taps go through ONE flat 1-D take per corner (row-major linearized
    indices) instead of 2-D advanced indexing: same values, and the 1-D
    gather measures 16% faster on TPU (294 vs 349 ms at 27M taps, round-5
    probe). Gathers are the op class TPUs are weakest at (~11 ns/tap
    regardless of layout; a 2x2-window lax.gather variant crashed the TPU
    worker and is not used)."""
    h, w = image.shape
    flat = image.reshape(-1)
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        xc = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yc = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        return jnp.take(flat, yc * w + xc)

    return (
        tap(x0, y0) * (1 - wx) * (1 - wy)
        + tap(x0 + 1, y0) * wx * (1 - wy)
        + tap(x0, y0 + 1) * (1 - wx) * wy
        + tap(x0 + 1, y0 + 1) * wx * wy
    )


def extract_laf_patches(
    image: jnp.ndarray, lafs: jnp.ndarray, patch_size: int = 32
) -> jnp.ndarray:
    """image: [B, H, W]; lafs: [B, N, 2, 3] -> patches [B, N, PS, PS]."""
    ps = patch_size
    # grid over [-1, 1]^2 at pixel centers of the PS x PS patch
    lin = (jnp.arange(ps) + 0.5) / ps * 2.0 - 1.0
    gu, gv = jnp.meshgrid(lin, lin)  # gv rows = v (y), gu cols = u (x)
    grid = jnp.stack([gu, gv], axis=-1).reshape(-1, 2)  # [PS*PS, 2]

    def one_patch(img, laf):
        A = laf[:2, :2]
        center = laf[:, 2]
        coords = grid @ A.T + center  # [PS*PS, 2] (x, y)
        return bilinear_sample_image(img, coords).reshape(ps, ps)

    per_image = jax.vmap(one_patch, in_axes=(None, 0))
    return jax.vmap(per_image)(image, lafs)


def normalize_patches(patches: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Per-patch instance normalization (HardNet input norm): zero mean, unit
    std over the spatial dims."""
    mean = jnp.mean(patches, axis=(-2, -1), keepdims=True)
    std = jnp.std(patches, axis=(-2, -1), keepdims=True)
    return (patches - mean) / (std + eps)
