"""Multi-scale keypoint detection in pure JAX (TPU-native replacement for
kornia's ScaleSpaceDetector used by the reference's SIFT / GFTTAffNetHardNet
extractors, models/features/sift.py:16-49 and hardnet.py:16-38).

Shape-static design: the octave count is fixed from the (static) image shape,
3D local maxima come from reduce_window max-pooling over (scale, y, x), and
selection is ONE fixed-k top_k over all octaves with validity masks — no
data-dependent shapes anywhere, so the whole detector jits and shards.

Responses: ``dog`` (blob, scale-space response like kornia BlobDoG) and
``gftt`` (Shi-Tomasi min-eigenvalue corner response like kornia CornerGFTT).
Orientation: dominant gradient-histogram orientation on LAF patches
(LAFOrienter(19) semantics). Sub-pixel refinement: per-axis 1D quadratic fit
around each maximum (the reference uses kornia ConvQuadInterp3d's full 3D
Hessian solve; the separable fit matches it to first order and stays branch-
free on the VPU).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from openglue_tpu.features.patches import extract_laf_patches


def gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(image: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur; image [B, H, W]."""
    radius = max(1, int(math.ceil(3.0 * sigma)))
    k = gaussian_kernel1d(sigma, radius)
    x = image[:, None]  # [B, 1, H, W]
    x = jax.lax.conv_general_dilated(
        x, k[None, None, :, None], (1, 1), [(radius, radius), (0, 0)]
    )
    x = jax.lax.conv_general_dilated(
        x, k[None, None, None, :], (1, 1), [(0, 0), (radius, radius)]
    )
    return x[:, 0]


def downsample2(image: jnp.ndarray) -> jnp.ndarray:
    return image[:, ::2, ::2]


def dog_response(gaussians: jnp.ndarray) -> jnp.ndarray:
    """[L, B, H, W] Gaussian stack -> [L-1, B, H, W] difference-of-Gaussians."""
    return gaussians[1:] - gaussians[:-1]


def gftt_response(image: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """Shi-Tomasi min-eigenvalue of the structure tensor; image [B, H, W]."""
    dy, dx = jnp.gradient(image, axis=(1, 2))
    jxx = gaussian_blur(dx * dx, sigma)
    jyy = gaussian_blur(dy * dy, sigma)
    jxy = gaussian_blur(dx * dy, sigma)
    tr = jxx + jyy
    det = jxx * jyy - jxy * jxy
    disc = jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
    return 0.5 * tr - disc


def _local_max_3d(resp: jnp.ndarray, spatial: int = 3) -> jnp.ndarray:
    """resp [B, L, H, W]; True where a voxel is the max of its
    (3-scale x spatial x spatial) neighborhood."""
    pooled = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max,
        (1, 3, spatial, spatial), (1, 1, 1, 1), "SAME",
    )
    return resp == pooled


def detect_keypoints(
    image: jnp.ndarray,
    max_keypoints: int,
    response: str = "dog",
    num_levels: int = 3,
    init_sigma: float = 1.6,
    min_size: int = 32,
    double_image: bool = False,
    response_threshold: float = 0.0,
    mr_size: float = 6.0,
    nms_diameter: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """image [B, H, W] in [0, 1] -> (lafs [B, K, 2, 3], responses [B, K],
    valid [B, K]). LAF scale = mr_size * sigma (kornia mr_size convention,
    reference sift.py:46 / hardnet.py:36)."""
    batch, h0, w0 = image.shape
    if double_image:
        image = jax.image.resize(image, (batch, h0 * 2, w0 * 2), "linear")
        base_scale = 0.5
    else:
        base_scale = 1.0

    k = 2.0 ** (1.0 / num_levels)
    image = gaussian_blur(image, init_sigma)

    per_octave_kpts = max(max_keypoints // 2, 1)
    all_scores, all_xy, all_sigma = [], [], []

    octave = image
    octave_scale = base_scale
    num_octaves = 0
    h, w = octave.shape[1:]
    while min(h, w) >= min_size and num_octaves < 8:
        # Gaussian ladder within the octave
        gaussians = [octave]
        sigmas = [init_sigma]
        for lvl in range(1, num_levels + 3):
            sigma_prev = init_sigma * k ** (lvl - 1)
            sigma_inc = sigma_prev * math.sqrt(k * k - 1.0)
            gaussians.append(gaussian_blur(gaussians[-1], sigma_inc))
            sigmas.append(init_sigma * k**lvl)
        stack = jnp.stack(gaussians)  # [L+3, B, h, w]

        if response == "dog":
            resp = dog_response(stack)  # [L+2, B, h, w]
            resp_sigmas = sigmas[1:]
            # minima are also good (reference sift.py:44): use |DoG|
            resp = jnp.abs(resp)
        elif response == "gftt":
            resp = jnp.stack([gftt_response(g) for g in gaussians[1:-1]])
            resp_sigmas = sigmas[1:-1]
        else:
            raise ValueError(f"unknown response {response!r}")

        resp = jnp.swapaxes(resp, 0, 1)  # [B, L', h, w]
        is_max = _local_max_3d(resp, spatial=max(3, int(nms_diameter) | 1))
        masked = jnp.where(is_max & (resp > response_threshold), resp, 0.0)

        # fixed-k top-k within the octave
        flat = masked.reshape(batch, -1)
        kk = min(per_octave_kpts, flat.shape[1])
        top_scores, top_idx = jax.lax.top_k(flat, kk)
        L = resp.shape[1]
        lvl = top_idx // (h * w)
        rem = top_idx % (h * w)
        ys_i = rem // w
        xs_i = rem % w
        sig = jnp.take(jnp.asarray(resp_sigmas, jnp.float32), lvl)

        # sub-pixel refinement (the reference uses kornia ConvQuadInterp3d):
        # 1D quadratic fit per spatial axis around each maximum,
        # offset = -0.5 (r+ - r-) / (r+ + r- - 2 r0), clamped to +-0.5
        batch_idx = jnp.arange(batch)[:, None]

        def resp_at(dy, dx):
            yc = jnp.clip(ys_i + dy, 0, h - 1)
            xc = jnp.clip(xs_i + dx, 0, w - 1)
            return resp[batch_idx, lvl, yc, xc]

        r0 = resp_at(0, 0)

        def offset(r_minus, r_plus):
            denom = r_plus + r_minus - 2.0 * r0
            off = -0.5 * (r_plus - r_minus) / jnp.where(
                jnp.abs(denom) > 1e-10, denom, 1.0
            )
            return jnp.clip(jnp.where(jnp.abs(denom) > 1e-10, off, 0.0), -0.5, 0.5)

        dx = offset(resp_at(0, -1), resp_at(0, 1))
        dy = offset(resp_at(-1, 0), resp_at(1, 0))
        # at borders the clipped neighbor duplicates the center, forcing the
        # offset to +-0.5 OUTWARD (off the image) — keep the grid position
        dx = jnp.where((xs_i > 0) & (xs_i < w - 1), dx, 0.0)
        dy = jnp.where((ys_i > 0) & (ys_i < h - 1), dy, 0.0)
        xs = xs_i.astype(jnp.float32) + dx
        ys = ys_i.astype(jnp.float32) + dy

        # back to input-resolution coordinates
        all_xy.append(jnp.stack([xs, ys], -1) * octave_scale)
        all_sigma.append(sig * octave_scale)
        all_scores.append(top_scores)

        octave = downsample2(gaussians[num_levels])  # next octave base
        octave_scale *= 2.0
        num_octaves += 1
        h, w = octave.shape[1:]

    if not all_scores:
        # image smaller than min_size: no octaves — return all-invalid padded
        # outputs instead of crashing on an empty concatenate
        zeros_xy = jnp.zeros((batch, max_keypoints, 2), jnp.float32)
        lafs = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (batch, max_keypoints, 2, 2)),
                zeros_xy[..., None],
            ],
            axis=-1,
        )
        return (
            lafs,
            jnp.zeros((batch, max_keypoints), jnp.float32),
            jnp.zeros((batch, max_keypoints), bool),
        )

    scores = jnp.concatenate(all_scores, axis=1)
    xy = jnp.concatenate(all_xy, axis=1)
    sigma = jnp.concatenate(all_sigma, axis=1)

    kk = min(max_keypoints, scores.shape[1])
    top_scores, top_idx = jax.lax.top_k(scores, kk)
    xy = jnp.take_along_axis(xy, top_idx[..., None], axis=1)
    sigma = jnp.take_along_axis(sigma, top_idx, axis=1)
    valid = top_scores > 0.0

    if kk < max_keypoints:
        pad = max_keypoints - kk
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)))
        xy = jnp.pad(xy, ((0, 0), (0, pad), (0, 0)))
        sigma = jnp.pad(sigma, ((0, 0), (0, pad)), constant_values=1.0)
        valid = jnp.pad(valid, ((0, 0), (0, pad)))

    scale = mr_size * sigma
    eye = jnp.eye(2, dtype=xy.dtype)
    A = eye[None, None] * scale[..., None, None]
    lafs = jnp.concatenate([A, xy[..., None]], axis=-1)
    return lafs, top_scores, valid


def dominant_gradient_orientation(
    image: jnp.ndarray, lafs: jnp.ndarray, patch_size: int = 19, num_bins: int = 36
) -> jnp.ndarray:
    """Dominant gradient orientation per LAF (kornia LAFOrienter semantics):
    magnitude-weighted, Gaussian-windowed orientation histogram over a
    patch_size patch sampled on the LAF frame; returns angles [B, N] (rad)."""
    patches = extract_laf_patches(image, lafs, patch_size)  # [B, N, P, P]
    gy, gx = jnp.gradient(patches, axis=(2, 3))
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    ori = jnp.arctan2(gy, gx)  # [-pi, pi]

    # Gaussian spatial window
    lin = jnp.arange(patch_size, dtype=jnp.float32) - (patch_size - 1) / 2
    g = jnp.exp(-0.5 * (lin / (patch_size / 4.0)) ** 2)
    window = g[:, None] * g[None, :]
    weight = mag * window

    bins = jnp.floor((ori + jnp.pi) / (2 * jnp.pi) * num_bins).astype(jnp.int32)
    bins = jnp.clip(bins, 0, num_bins - 1)
    one_hot = jax.nn.one_hot(bins, num_bins, dtype=weight.dtype)
    hist = jnp.einsum("bnpq,bnpqk->bnk", weight, one_hot)
    # smooth circularly
    hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    peak = jnp.argmax(hist, axis=-1)
    return (peak.astype(jnp.float32) + 0.5) / num_bins * 2 * jnp.pi - jnp.pi


def rotate_lafs(lafs: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Compose an in-plane rotation into each LAF's affine part."""
    c, s = jnp.cos(angles), jnp.sin(angles)
    rot = jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2
    )  # [B, N, 2, 2]
    A = jnp.einsum("bnij,bnjk->bnik", lafs[..., :2, :2], rot)
    return jnp.concatenate([A, lafs[..., 2:]], axis=-1)
