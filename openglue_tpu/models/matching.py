"""Match decoding from the log-assignment matrix.

Replicates the mutual-nearest-neighbor + threshold decode of the reference
(models/matching_module.py:149-187 and inference.py:177-209) with static
shapes: matches are returned as fixed-size index arrays with -1 for invalid,
never as ragged gathers.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def decode_matches(
    scores: jnp.ndarray,
    match_threshold: float = 0.2,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Decode matches from log-assignment scores [B, N+1, M+1].

    Returns:
      matches0: [B, N] index into image1 keypoints or -1.
      matches1: [B, M] index into image0 keypoints or -1.
      matching_scores0: [B, N] confidence (exp of log-assignment) or 0.
      matching_scores1: [B, M].
    """
    indices0, indices1, max0 = assignment_stats(scores, mask0=mask0, mask1=mask1)
    return decode_matches_from_stats(
        indices0, indices1, max0,
        match_threshold=match_threshold, mask0=mask0, mask1=mask1,
    )


def assignment_stats(
    scores: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
):
    """The three reductions of the log-assignment matrix that the decode
    consumes: row argmax, column argmax, row max (the confidence source).

    Computing these at the point where log_P is PRODUCED (SuperGlueConfig
    .decode_stats) lets XLA fuse them into the final Sinkhorn pass; in an
    inference jit where the full scores matrix is otherwise unused, the
    [B, N+1, M+1] materialization is then dead-code-eliminated — the decode
    never touches HBM at matrix size.
    """
    inner = scores[:, :-1, :-1]
    if mask1 is not None:
        inner = jnp.where(mask1[:, None, :], inner, -jnp.inf)
    if mask0 is not None:
        inner = jnp.where(mask0[:, :, None], inner, -jnp.inf)
    indices0 = jnp.argmax(inner, axis=2)  # [B, N]
    indices1 = jnp.argmax(inner, axis=1)  # [B, M]
    max0 = jnp.max(inner, axis=2)
    return indices0, indices1, max0


def decode_matches_from_stats(
    indices0: jnp.ndarray,
    indices1: jnp.ndarray,
    max0: jnp.ndarray,
    match_threshold: float = 0.2,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Mutual-NN + threshold decode from assignment_stats outputs — identical
    results to decode_matches, but its inputs are [B, N]-sized."""
    batch, n = indices0.shape
    m = indices1.shape[1]

    arange0 = jnp.arange(n)[None, :]
    arange1 = jnp.arange(m)[None, :]
    mutual0 = arange0 == jnp.take_along_axis(indices1, indices0, axis=1)
    mutual1 = arange1 == jnp.take_along_axis(indices0, indices1, axis=1)

    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, indices1, axis=1), 0.0)

    valid0 = mutual0 & (mscores0 > match_threshold)
    valid1 = mutual1 & jnp.take_along_axis(valid0, indices1, axis=1)
    if mask0 is not None:
        valid0 = valid0 & mask0
        mscores0 = jnp.where(mask0, mscores0, 0.0)
    if mask1 is not None:
        valid1 = valid1 & mask1
        mscores1 = jnp.where(mask1, mscores1, 0.0)

    matches0 = jnp.where(valid0, indices0, -1)
    matches1 = jnp.where(valid1, indices1, -1)
    return {
        "matches0": matches0,
        "matches1": matches1,
        "matching_scores0": mscores0,
        "matching_scores1": mscores1,
    }

def decode_from_output(
    out: Dict[str, jnp.ndarray],
    match_threshold: float = 0.2,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Decode from a SuperGlue output dict, preferring the fused stats
    (present when SuperGlueConfig.decode_stats) over the full matrix."""
    if "decode_indices0" in out:
        return decode_matches_from_stats(
            out["decode_indices0"], out["decode_indices1"], out["decode_max0"],
            match_threshold=match_threshold, mask0=mask0, mask1=mask1,
        )
    return decode_matches(
        out["scores"], match_threshold=match_threshold, mask0=mask0, mask1=mask1
    )
