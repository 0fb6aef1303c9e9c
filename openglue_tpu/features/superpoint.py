"""SuperPoint detector/descriptor in JAX/flax
(reference models/features/superpoint/model.py:16-199, utils.py:1-39).

TPU-first redesign of the extraction pipeline:
  * NHWC layout end to end (XLA's native conv layout on TPU).
  * NMS is a reduce_window max-pool compare (kornia nms2d semantics: non-maxima
    zeroed) — no data-dependent shapes.
  * keypoint selection is ONE fixed-k lax.top_k over the masked score map per
    image (replaces nonzero + per-image top-k + ragged min_stack,
    reference model.py:91-108); validity mask = score > threshold, so the
    batch keeps static [B, K] shapes with padding handled downstream.
  * descriptor sampling is an explicit bilinear gather with the reference's
    grid_sample(align_corners=False) coordinate mapping (utils.py:13-31).

``SuperPointBackbone`` is the plain variant (magicleap superpoint_v1 weights);
``bn=True`` adds BatchNorm2d after every conv (SuperPointNetBn,
model.py:132-199, for third-party KITTI/COCO checkpoints).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openglue_tpu.core.types import Features

_LAYER_CHANNELS = ((1, 64, 64, 64), (64, 64, 64, 64), (64, 128, 128, 128), (128, 128, 128, 128))


class SuperPointBackbone(nn.Module):
    """VGG-ish encoder + detector/descriptor heads (model.py:35-78).

    Input: [B, H, W, 1] grayscale in [0, 1]; H, W divisible by 8.
    Returns (descriptors [B, Hc, Wc, D] L2-normalized, scores [B, Hc, Wc, 64]).
    """

    descriptor_dim: int = 256
    bn: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        conv = lambda ch, k, name: nn.Conv(
            ch, (k, k), padding="SAME" if k == 3 else "VALID", dtype=self.dtype, name=name
        )

        def maybe_bn(x, name):
            if not self.bn:
                return x
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=name,
            )(x)

        x = image
        for i, channels in enumerate(_LAYER_CHANNELS):
            x = nn.relu(maybe_bn(conv(channels[1], 3, f"conv{i + 1}a")(x), f"bn{i + 1}a"))
            x = nn.relu(maybe_bn(conv(channels[3], 3, f"conv{i + 1}b")(x), f"bn{i + 1}b"))
            if i != 3:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        # Descriptor head (model.py:70-73)
        d = nn.relu(maybe_bn(conv(256, 3, "convDa")(x), "bnDa"))
        d = maybe_bn(conv(self.descriptor_dim, 1, "convDb")(d), "bnDb")
        d = d / jnp.linalg.norm(d.astype(jnp.float32), axis=-1, keepdims=True)

        # Detector head (model.py:76-88): 65 channels, softmax, drop dustbin
        s = nn.relu(maybe_bn(conv(256, 3, "convPa")(x), "bnPa"))
        s = maybe_bn(conv(65, 1, "convPb")(s), "bnPb")
        s = jax.nn.softmax(s.astype(jnp.float32), axis=-1)[..., :-1]
        return d.astype(jnp.float32), s


def depth_to_space_scores(scores: jnp.ndarray) -> jnp.ndarray:
    """[B, Hc, Wc, 64] cell scores -> [B, Hc*8, Wc*8] heatmap (model.py:85-88)."""
    b, hc, wc, _ = scores.shape
    s = scores.reshape(b, hc, wc, 8, 8)
    s = s.transpose(0, 1, 3, 2, 4)
    return s.reshape(b, hc * 8, wc * 8)


def nms2d(scores: jnp.ndarray, kernel_size: int = 9) -> jnp.ndarray:
    """Zero non-maxima within a kernel_size window (kornia nms2d semantics
    used at model.py:93). scores: [B, H, W]."""
    pooled = jax.lax.reduce_window(
        scores,
        -jnp.inf,
        jax.lax.max,
        (1, kernel_size, kernel_size),
        (1, 1, 1),
        "SAME",
    )
    return jnp.where(scores == pooled, scores, 0.0)


def remove_borders_mask(h: int, w: int, border: int) -> jnp.ndarray:
    """[H, W] bool mask that is False within ``border`` px of any edge
    (reference utils.py:4-10 drops those keypoints)."""
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    my = (ys >= border) & (ys < h - border)
    mx = (xs >= border) & (xs < w - border)
    return my[:, None] & mx[None, :]


def select_keypoints(
    scores: jnp.ndarray,
    max_keypoints: int,
    threshold: float = 0.0,
    border: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked fixed-k selection: NMS'd [B, H, W] scores -> keypoints [B, K, 2]
    (x, y), scores [B, K], valid [B, K]."""
    b, h, w = scores.shape
    masked = jnp.where(remove_borders_mask(h, w, border)[None], scores, 0.0)
    flat = masked.reshape(b, h * w)
    top_scores, top_idx = jax.lax.top_k(flat, max_keypoints)
    ys = (top_idx // w).astype(jnp.float32)
    xs = (top_idx % w).astype(jnp.float32)
    kpts = jnp.stack([xs, ys], axis=-1)
    valid = top_scores > threshold
    return kpts, top_scores, valid


def sample_descriptors(
    desc_map: jnp.ndarray, kpts: jnp.ndarray, cell: int = 8
) -> jnp.ndarray:
    """Bilinear descriptor sampling at keypoint pixels (utils.py:13-31).

    desc_map: [B, Hc, Wc, D]; kpts: [B, K, 2] (x, y) in full-res pixels.
    Uses the reference's exact normalization then the standard
    align_corners=False pixel mapping; out-of-range taps clamp (grid_sample
    zero-padding differs only for border keypoints already removed)."""
    b, hc, wc, d = desc_map.shape
    H, W = hc * cell, wc * cell
    pts = kpts - cell / 2 + 0.5
    pts = pts / jnp.asarray([W - cell / 2 - 0.5, H - cell / 2 - 0.5], kpts.dtype)
    pts = pts * 2.0 - 1.0  # normalized [-1, 1]

    # align_corners=False: norm -> pixel centers of the coarse grid
    gx = ((pts[..., 0] + 1.0) * wc - 1.0) / 2.0
    gy = ((pts[..., 1] + 1.0) * hc - 1.0) / 2.0

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def tap(xi, yi):
        xc = jnp.clip(xi.astype(jnp.int32), 0, wc - 1)
        yc = jnp.clip(yi.astype(jnp.int32), 0, hc - 1)
        batch_idx = jnp.arange(b)[:, None]
        return desc_map[batch_idx, yc, xc]  # [B, K, D]

    out = (
        tap(x0, y0) * ((1 - wx) * (1 - wy))[..., None]
        + tap(x0 + 1, y0) * (wx * (1 - wy))[..., None]
        + tap(x0, y0 + 1) * ((1 - wx) * wy)[..., None]
        + tap(x0 + 1, y0 + 1) * (wx * wy)[..., None]
    )
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    return out / jnp.maximum(norm, 1e-12)


def keypoints_to_lafs(kpts: jnp.ndarray) -> jnp.ndarray:
    """[B, K, 2] -> [B, K, 2, 3] identity-2x2 LAFs (model.py:120-127)."""
    b, k, _ = kpts.shape
    eye = jnp.broadcast_to(jnp.eye(2, dtype=kpts.dtype), (b, k, 2, 2))
    return jnp.concatenate([eye, kpts[..., None]], axis=-1)


@dataclasses.dataclass(frozen=True)
class SuperPointConfig:
    max_keypoints: int = 1024
    descriptor_dim: int = 256
    nms_kernel: int = 9
    remove_borders_size: int = 4
    keypoint_threshold: float = 0.0
    bn: bool = False
    dtype: object = None


class SuperPoint(nn.Module):
    """Full extractor: image [B, H, W, 1] -> Features (static [B, K] shapes)."""

    config: SuperPointConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> Features:
        cfg = self.config
        backbone = SuperPointBackbone(
            descriptor_dim=cfg.descriptor_dim, bn=cfg.bn, dtype=cfg.dtype, name="backbone"
        )
        desc_map, cell_scores = backbone(image, train=train)
        heatmap = depth_to_space_scores(cell_scores)
        heatmap = nms2d(heatmap, cfg.nms_kernel)
        kpts, scores, valid = select_keypoints(
            heatmap, cfg.max_keypoints, cfg.keypoint_threshold, cfg.remove_borders_size
        )
        descriptors = sample_descriptors(desc_map, kpts)
        return Features(
            lafs=keypoints_to_lafs(kpts),
            responses=scores,
            descriptors=descriptors,
            mask=valid,
        )
