"""Log-domain Sinkhorn optimal transport with dustbin augmentation.

Numerics match reference models/superglue/optimal_transport.py:4-28 and
models/superglue/superglue.py:88-111 exactly when no masks are given:

  * scores ``S [B, m, n]`` are augmented with a learned dustbin row/column,
  * row marginals ``log_a = -log(n+m)`` (dustbin row gets ``+log n``),
    column marginals ``log_b = -log(n+m)`` (dustbin col gets ``+log m``),
  * ``num_iters`` alternating row/col logsumexp normalizations on ``M = S/reg``,
  * the result is rescaled by ``+log(n+m)``.

TPU-first extensions over the reference:
  * optional validity masks for padded keypoints — masked entries are excluded
    from every logsumexp and per-element valid counts drive the marginals (the
    reference lets zero-padded keypoints leak into the transport plan in its
    cached mode; pass masks=None for bit-parity with that behavior);
  * the iteration is a ``lax.scan`` so XLA unrolls/pipelines it on-chip;
  * everything is shape-static and differentiable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def log_sinkhorn(
    log_a: jnp.ndarray,
    log_b: jnp.ndarray,
    M: jnp.ndarray,
    num_iters: int = 20,
    reg: float = 1.0,
) -> jnp.ndarray:
    """Sinkhorn scaling in log domain (reference optimal_transport.py:4-28).

    log_a: [B, R] row log-marginals; log_b: [B, C] column log-marginals;
    M: [B, R, C] score matrix. Returns the log transport plan [B, R, C].
    """
    M = M / reg

    def body(carry, _):
        u, v = carry
        u = log_a - jax.nn.logsumexp(M + v[:, None, :], axis=2)
        v = log_b - jax.nn.logsumexp(M + u[:, :, None], axis=1)
        return (u, v), None

    init = (jnp.zeros_like(log_a), jnp.zeros_like(log_b))
    (u, v), _ = jax.lax.scan(body, init, None, length=num_iters)
    return M + u[:, :, None] + v[:, None, :]


def augment_scores(
    scores: jnp.ndarray, dustbin_score: jnp.ndarray
) -> jnp.ndarray:
    """Append dustbin row and column filled with the learned dustbin score
    (reference superglue.py:91-95). scores: [B, m, n] -> [B, m+1, n+1]."""
    batch, m, n = scores.shape
    dustbin = jnp.broadcast_to(dustbin_score, ())
    row = jnp.full((batch, 1, n), dustbin, dtype=scores.dtype)
    col = jnp.full((batch, m + 1, 1), dustbin, dtype=scores.dtype)
    return jnp.concatenate([jnp.concatenate([scores, row], axis=1), col], axis=2)


def build_masked_otp_inputs(
    scores: jnp.ndarray,
    dustbin_score: jnp.ndarray,
    reg: float,
    mask0: jnp.ndarray,
    mask1: jnp.ndarray,
):
    """Masked marginals/matrix in SPLIT form (inner rows + dustbin row), the
    single source of truth shared by the XLA path here and the row-sharded
    ring path (parallel.ring.log_optimal_transport_ring).

    Returns (S_inner [B, m, n+1], S_dust [B, 1, n+1], log_a_inner [B, m],
    log_a_dust [B], log_b [B, n+1], norm [B]); matrices are already /reg with
    masked entries at -1e9.
    """
    batch, m, n = scores.shape
    count0 = jnp.sum(mask0, axis=1).astype(scores.dtype)
    count1 = jnp.sum(mask1, axis=1).astype(scores.dtype)
    total = jnp.maximum(count0 + count1, 1.0)
    norm = -jnp.log(total)  # [B]

    valid_col = jnp.concatenate([mask1, jnp.ones((batch, 1), dtype=bool)], axis=1)
    S_inner = jnp.concatenate(
        [scores / reg, jnp.broadcast_to(dustbin_score / reg, (batch, m, 1))], axis=2
    )
    pair_valid = mask0[:, :, None] & valid_col[:, None, :]
    S_inner = jnp.where(pair_valid, S_inner, _NEG_INF)
    S_dust = jnp.where(
        valid_col[:, None, :],
        jnp.broadcast_to(dustbin_score / reg, (batch, 1, n + 1)),
        _NEG_INF,
    )

    log_a_inner = jnp.where(mask0, norm[:, None], _NEG_INF)
    log_a_dust = norm + jnp.log(jnp.maximum(count1, 1.0))
    log_b = jnp.where(valid_col, norm[:, None], _NEG_INF)
    log_b = log_b.at[:, -1].set(norm + jnp.log(jnp.maximum(count0, 1.0)))
    return S_inner, S_dust, log_a_inner, log_a_dust, log_b, norm


def log_optimal_transport(
    scores: jnp.ndarray,
    dustbin_score: jnp.ndarray,
    num_iters: int = 20,
    reg: float = 1.0,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dustbin-augmented entropic OT over a padded score matrix.

    scores: [B, m, n] matching scores (image0 keypoints x image1 keypoints).
    mask0: [B, m] validity of rows; mask1: [B, n] validity of columns.
    Returns log-assignment [B, m+1, n+1] (reference superglue.py:88-111).
    """
    batch, m, n = scores.shape
    S_aug = augment_scores(scores, dustbin_score)

    if mask0 is None and mask1 is None:
        norm = -jnp.log(jnp.asarray(n + m, dtype=scores.dtype))
        log_a = jnp.full((m + 1,), norm, dtype=scores.dtype)
        log_a = log_a.at[-1].add(jnp.log(jnp.asarray(n, dtype=scores.dtype)))
        log_b = jnp.full((n + 1,), norm, dtype=scores.dtype)
        log_b = log_b.at[-1].add(jnp.log(jnp.asarray(m, dtype=scores.dtype)))
        log_a = jnp.broadcast_to(log_a, (batch, m + 1))
        log_b = jnp.broadcast_to(log_b, (batch, n + 1))
        log_P = log_sinkhorn(log_a, log_b, S_aug, num_iters=num_iters, reg=reg)
        return log_P - norm

    if mask0 is None:
        mask0 = jnp.ones((batch, m), dtype=bool)
    if mask1 is None:
        mask1 = jnp.ones((batch, n), dtype=bool)

    S_inner, S_dust, log_a_inner, log_a_dust, log_b, norm = build_masked_otp_inputs(
        scores, dustbin_score, reg, mask0, mask1
    )
    S_aug = jnp.concatenate([S_inner, S_dust], axis=1)
    log_a = jnp.concatenate([log_a_inner, log_a_dust[:, None]], axis=1)

    # reg already applied by build_masked_otp_inputs
    log_P = log_sinkhorn(log_a, log_b, S_aug, num_iters=num_iters, reg=1.0)
    return log_P - norm[:, None, None]
