"""Matching losses (reference utils/losses.py).

NLL on the log-assignment matrix with per-image mean weighting, plus the
optional metric-learning losses (hardest-negative triplet for matched pairs,
margin hinge for unmatched keypoints).

Reference weighting semantics (losses.py:16-51): within each batch element the
per-keypoint terms are averaged (via 1/count weights), the per-image sums are
added as ``matched + 0.5*(unmatched0 + unmatched1)`` and divided by the batch
size. Batch elements with zero keypoints in a category contribute zero. All
reproduced here with masked reductions over static shapes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from openglue_tpu.geometry.transforms import pairwise_cosine_dist

_BIG = 1e9


def _per_image_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked per-batch-element mean, zero where the mask is empty.
    values/mask: [B, N] -> [B]."""
    mask_f = mask.astype(values.dtype)
    count = jnp.sum(mask_f, axis=1)
    total = jnp.sum(values * mask_f, axis=1)
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def matching_nll_loss(
    gt_matches0: jnp.ndarray,
    gt_matches1: jnp.ndarray,
    scores: jnp.ndarray,
) -> jnp.ndarray:
    """Negative log-likelihood of the GT assignment (reference losses.py:16-51).

    gt_matches0: [B, N]; gt_matches1: [B, M]; scores: [B, N+1, M+1] log-assignment.
    """
    batch, n_aug, m_aug = scores.shape
    n, m = n_aug - 1, m_aug - 1

    matched0 = gt_matches0 >= 0
    # -log P[i, gt_j] for matched keypoints
    gt_cols = jnp.clip(gt_matches0, 0, m - 1)
    matched_ll = jnp.take_along_axis(scores[:, :n, :m], gt_cols[:, :, None], axis=2)[..., 0]
    matched_loss = _per_image_mean(-matched_ll, matched0)

    # -log P[i, dustbin] for unmatched keypoints of image0
    unmatched0 = gt_matches0 == -1
    unmatched0_loss = _per_image_mean(-scores[:, :n, m], unmatched0)

    # -log P[dustbin, j] for unmatched keypoints of image1
    unmatched1 = gt_matches1 == -1
    unmatched1_loss = _per_image_mean(-scores[:, n, :m], unmatched1)

    total = matched_loss + 0.5 * (unmatched0_loss + unmatched1_loss)
    return jnp.sum(total) / batch


def metric_learning_loss(
    gt_matches0: jnp.ndarray,
    gt_matches1: jnp.ndarray,
    gdesc0: jnp.ndarray,
    gdesc1: jnp.ndarray,
    margin: float,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Triplet + margin losses on context-descriptor cosine distances
    (reference losses.py:56-93). gdesc: [B, N, D] channels-last."""
    batch, n = gt_matches0.shape
    m = gt_matches1.shape[1]
    dist = pairwise_cosine_dist(gdesc0, gdesc1)  # [B, N, M]

    if mask0 is None:
        mask0 = jnp.ones((batch, n), dtype=bool)
    if mask1 is None:
        mask1 = jnp.ones((batch, m), dtype=bool)
    pair_valid = mask0[:, :, None] & mask1[:, None, :]

    matched0 = gt_matches0 >= 0
    gt_cols = jnp.clip(gt_matches0, 0, m - 1)

    # --- triplet on matched pairs, hardest-negative mining -------------------
    # positives set to +inf in the detached distance matrix (losses.py:63-66)
    pos_mask = matched0[:, :, None] & (
        gt_cols[:, :, None] == jnp.arange(m)[None, None, :]
    )
    dist_det = jax.lax.stop_gradient(dist)
    dist_det = jnp.where(pos_mask | ~pair_valid, _BIG, dist_det)

    nn_col = jnp.argmin(dist_det, axis=2)  # [B, N] hardest kpt1 per kpt0
    nn_row = jnp.argmin(dist_det, axis=1)  # [B, M] hardest kpt0 per kpt1

    dist_ap = jnp.take_along_axis(dist, gt_cols[:, :, None], axis=2)[..., 0]  # [B, N]
    dist_an0 = jnp.take_along_axis(dist, nn_col[:, :, None], axis=2)[..., 0]  # [B, N]
    # dist[b, nn_row[b, gt_j], gt_j] for each matched i
    i_neg = jnp.take_along_axis(nn_row, gt_cols, axis=1)  # [B, N]
    dist_an1 = dist[jnp.arange(batch)[:, None], i_neg, gt_cols]  # [B, N]

    loss0 = jnp.maximum(dist_ap - dist_an0 + margin, 0.0)
    loss1 = jnp.maximum(dist_ap - dist_an1 + margin, 0.0)
    triplet = _per_image_mean(loss0 + loss1, matched0)

    # --- margin hinge for unmatched keypoints (losses.py:78-93) --------------
    dist_for_min = jnp.where(pair_valid, dist, _BIG)
    unmatched0 = gt_matches0 == -1
    min_dist_0to1 = jnp.min(dist_for_min, axis=2)  # [B, N]
    margin0 = _per_image_mean(jnp.maximum(margin - min_dist_0to1, 0.0), unmatched0)

    unmatched1 = gt_matches1 == -1
    min_dist_1to0 = jnp.min(dist_for_min, axis=1)  # [B, M]
    margin1 = _per_image_mean(jnp.maximum(margin - min_dist_1to0, 0.0), unmatched1)

    return jnp.sum(triplet + margin0 + margin1) / batch


def criterion(
    y_true: Dict[str, jnp.ndarray],
    y_pred: Dict[str, jnp.ndarray],
    margin: Optional[float] = None,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Combined loss dict matching the reference criterion (losses.py:7-53)."""
    nll = matching_nll_loss(y_true["gt_matches0"], y_true["gt_matches1"], y_pred["scores"])
    if margin is None:
        metric = jnp.zeros((), dtype=nll.dtype)
    else:
        metric = metric_learning_loss(
            y_true["gt_matches0"],
            y_true["gt_matches1"],
            y_pred["context_descriptors0"],
            y_pred["context_descriptors1"],
            margin,
            mask0=mask0,
            mask1=mask1,
        )
    return {"loss": nll, "metric_loss": metric}
