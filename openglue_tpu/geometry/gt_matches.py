"""Ground-truth match generation from geometry
(reference models/gt_matches_generation.py:17-91).

Keypoints from each image are reprojected into the other; mutual nearest
neighbors under reprojection error become candidate matches; distance
thresholds classify MATCHED / UNMATCHED(-1) / IGNORE(-2).

The reference's threshold-reclassification lines use chained advanced indexing
(``t[mask][mask2] = v``, gt_matches_generation.py:57-64,77-78) which is a
silent no-op in PyTorch — its *actual* behavior is: mutual NN => MATCHED at
any distance, non-mutual => UNMATCHED, invalid depth => IGNORE. We implement
the documented intent by default (thresholds active, reference comments
:66-70) and expose ``parity_mode=True`` reproducing the actual behavior.

Fully static shapes: padded keypoints (mask=False) are always IGNORE and are
excluded from nearest-neighbor searches.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from openglue_tpu.core.types import Transformation
from openglue_tpu.geometry.transforms import cdist_sq, reproject_keypoints

UNMATCHED_INDEX = -1
IGNORE_INDEX = -2

# Masked-target sentinel for the SQUARED-distance matrices: +inf dominates
# any real squared reprojection error (1e9 would not — a depth-valid but
# extreme reprojection beyond ~31.6k px could out-argmin a padded column).
# inf flows safely through min/argmin/sqrt/threshold-compares (no gradients
# pass through this integer-label path).
_BIG = float("inf")


def generate_gt_matches(
    kpts0: jnp.ndarray,
    kpts1: jnp.ndarray,
    transformation: Transformation,
    positive_threshold: float,
    negative_threshold: Optional[float] = None,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    parity_mode: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Compute ground-truth correspondence labels.

    kpts0: [B, N, 2]; kpts1: [B, M, 2]; masks: [B, N]/[B, M] validity.
    Returns dict with gt_matches0 [B, N], gt_matches1 [B, M] (int32: target
    index, UNMATCHED_INDEX or IGNORE_INDEX).
    """
    if negative_threshold is None:
        negative_threshold = positive_threshold

    batch, n = kpts0.shape[:2]
    m = kpts1.shape[1]
    if mask0 is None:
        mask0 = jnp.ones((batch, n), dtype=bool)
    if mask1 is None:
        mask1 = jnp.ones((batch, m), dtype=bool)

    transformation_inv = transformation.inverse()
    kpts0_t, depth_valid0 = reproject_keypoints(kpts0, transformation)
    kpts1_t, depth_valid1 = reproject_keypoints(kpts1, transformation_inv)

    # SQUARED distances for the [B, N, M] matrices: sqrt is monotone, so the
    # argmin/min structure is unchanged, and the per-matrix sqrt pass (the
    # only transcendental over N*M elements here) moves to the [B, N]-sized
    # row minima below — the thresholds and symmetric distances see exact
    # Euclidean values. (The train step regenerates GT every step, so this
    # path is measured hot: bench/profile_train.py gt_only.)
    err01 = cdist_sq(kpts0_t, kpts1)  # [B, N, M]
    err10 = cdist_sq(kpts1_t, kpts0)  # [B, M, N]

    # Exclude padded targets from the nearest-neighbor search.
    err01 = jnp.where(mask1[:, None, :], err01, _BIG)
    err10 = jnp.where(mask0[:, None, :], err10, _BIG)

    min_dist0 = jnp.sqrt(jnp.min(err01, axis=2))
    nn0 = jnp.argmin(err01, axis=2)  # [B, N] best kpt1 for each kpt0
    min_dist1 = jnp.sqrt(jnp.min(err10, axis=2))
    nn1 = jnp.argmin(err10, axis=2)  # [B, M] best kpt0 for each kpt1

    arange0 = jnp.arange(n)[None, :]
    arange1 = jnp.arange(m)[None, :]
    mutual0 = arange0 == jnp.take_along_axis(nn1, nn0, axis=1)
    mutual1 = arange1 == jnp.take_along_axis(nn0, nn1, axis=1)

    # Symmetric distance for mutual pairs: 0.5*(d0[i] + d1[nn0[i]])
    sym_dist0 = 0.5 * (min_dist0 + jnp.take_along_axis(min_dist1, nn0, axis=1))
    sym_dist1 = 0.5 * (min_dist1 + jnp.take_along_axis(min_dist0, nn1, axis=1))

    if parity_mode:
        # Reference actual behavior: thresholds have no effect.
        labels0 = jnp.where(mutual0, nn0, UNMATCHED_INDEX)
        labels1 = jnp.where(mutual1, nn1, UNMATCHED_INDEX)
    else:
        # Documented intent (reference gt_matches_generation.py:66-70):
        #   mutual & sym <= pos           => MATCHED
        #   mutual & pos < sym <= neg     => IGNORE
        #   mutual & sym > neg            => UNMATCHED
        #   non-mutual & min <= neg       => IGNORE
        #   non-mutual & min > neg        => UNMATCHED
        labels0 = jnp.where(
            mutual0,
            jnp.where(
                sym_dist0 <= positive_threshold,
                nn0,
                jnp.where(sym_dist0 <= negative_threshold, IGNORE_INDEX, UNMATCHED_INDEX),
            ),
            jnp.where(min_dist0 <= negative_threshold, IGNORE_INDEX, UNMATCHED_INDEX),
        )
        labels1 = jnp.where(
            mutual1,
            jnp.where(
                sym_dist1 <= positive_threshold,
                nn1,
                jnp.where(sym_dist1 <= negative_threshold, IGNORE_INDEX, UNMATCHED_INDEX),
            ),
            jnp.where(min_dist1 <= negative_threshold, IGNORE_INDEX, UNMATCHED_INDEX),
        )

    # Keypoints with unknown depth are IGNOREd (reference :73-74; this is the
    # mechanism that also kills zero-padded virtual keypoints in the cached
    # collate, megadepth_datamodule.py:137-141).
    labels0 = jnp.where(depth_valid0, labels0, IGNORE_INDEX)
    labels1 = jnp.where(depth_valid1, labels1, IGNORE_INDEX)

    # A MATCHED keypoint whose nearest neighbor has invalid depth is IGNOREd
    # (reference :77-78 intent; no-op there, active here outside parity mode).
    if not parity_mode:
        nn_valid0 = jnp.take_along_axis(depth_valid1, nn0, axis=1)
        nn_valid1 = jnp.take_along_axis(depth_valid0, nn1, axis=1)
        labels0 = jnp.where((labels0 >= 0) & ~nn_valid0, IGNORE_INDEX, labels0)
        labels1 = jnp.where((labels1 >= 0) & ~nn_valid1, IGNORE_INDEX, labels1)

    # Padded keypoints never participate in the loss.
    labels0 = jnp.where(mask0, labels0, IGNORE_INDEX)
    labels1 = jnp.where(mask1, labels1, IGNORE_INDEX)

    return {
        "gt_matches0": labels0.astype(jnp.int32),
        "gt_matches1": labels1.astype(jnp.int32),
    }
