"""Attention mechanisms over padded keypoint sets.

Four variants matching the reference study (reference
models/superglue/attention.py:8-118): softmax, linear (ELU+1 feature map),
FAVOR+ with ReLU kernel, FAVOR+ softmax-kernel estimator.

TPU-first design notes:
  * Layout is ``[B, H, N, Dh]`` (sequence-major per head). The reference uses
    conv1d-style ``[B, H, Dh, N]``; channels-last keeps the contraction axes
    adjacent for the MXU and lets XLA fuse the masking elementwise ops.
  * Every variant takes an optional ``kv_mask [B, M]`` so padded keypoints are
    excluded exactly (the reference has no masking — padded kpts leak into
    attention in its cached mode; pass ``kv_mask=None`` for bit-parity).
  * FAVOR projection matrices are per-head ``[K, Dh]``. The reference sizes
    them ``[2D, D]`` with the *full* embed dim and therefore crashes for
    num_heads > 1 (reference attention.py:16 + attention_gnn.py:13-16 pass the
    full dim); we implement the algorithm as published instead.

All functions return ``out [B, H, N, Dh]``. ``softmax_attention`` additionally
returns the attention matrix (the reference returns it too; linear variants
return None).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def _mask_logits(logits: jnp.ndarray, kv_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if kv_mask is None:
        return logits
    return jnp.where(kv_mask[:, None, None, :], logits, _NEG_INF)


def softmax_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard scaled dot-product attention (reference attention.py:8-19).

    query: [B, H, N, Dh]; key/value: [B, H, M, Dh]; kv_mask: [B, M] or None.
    """
    head_dim = query.shape[-1]
    logits = jnp.einsum("bhnd,bhmd->bhnm", query, key) * head_dim**-0.5
    logits = _mask_logits(logits, kv_mask)
    attention = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attention, value)
    return out, attention


def softmax_attention_with_lse(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Softmax attention that also returns the per-row logsumexp of the
    (scaled, masked) logits — the merge statistic for composing block
    attention across a ring schedule (parallel.ring). Returns
    (out [B, H, N, Dh], lse [B, H, N])."""
    head_dim = query.shape[-1]
    logits = jnp.einsum("bhnd,bhmd->bhnm", query, key) * head_dim**-0.5
    logits = _mask_logits(logits, kv_mask)
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - m[..., None])
    denom = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", p / denom[..., None], value)
    return out, m + jnp.log(denom)


def linear_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, None]:
    """Linear attention with already-positive feature maps (reference attention.py:29-40).

    O(N·Dq·Dh) instead of O(N·M). query/key must be elementwise positive
    feature-mapped beforehand. Masked keys are zeroed so they contribute
    neither to the KV aggregate nor to the normalizer.
    """
    if kv_mask is not None:
        key = key * kv_mask[:, None, :, None]
    kv = jnp.einsum("bhmk,bhmd->bhkd", key, value)  # [B,H,Dk,Dh]
    key_sum = jnp.sum(key, axis=2)  # [B,H,Dk]
    out = jnp.einsum("bhnk,bhkd->bhnd", query, kv)
    normalizer = jnp.einsum("bhnk,bhk->bhn", query, key_sum)
    out = out / normalizer[..., None]
    return out, None


def linear_attention_elu(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, None]:
    """ELU(x)+1 feature-map linear attention (reference attention.py:22-26)."""
    query = jax.nn.elu(query) + 1.0 + eps
    key = jax.nn.elu(key) + 1.0 + eps
    return linear_attention(query, key, value, kv_mask)


def sample_orthogonal_random_matrix(
    rng: jax.Array, num_rows: int, num_cols: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Orthogonal random features: blockwise QR of Gaussian blocks, rows scaled
    by the norms of the original Gaussian rows (reference attention.py:60-80).

    Returns [num_rows, num_cols]; rows are orthogonal within each
    num_cols-block and have chi-distributed norms.
    """
    num_blocks = math.ceil(num_rows / num_cols)
    unstructured = jax.random.normal(rng, (num_blocks, num_cols, num_cols), dtype=jnp.float32)
    norms = jnp.linalg.norm(unstructured, axis=-1).reshape(-1, 1)
    q, _ = jnp.linalg.qr(unstructured)
    q = jnp.swapaxes(q, -1, -2).reshape(-1, num_cols)
    return (q[:num_rows] * norms[:num_rows]).astype(dtype)


def favor_features_relu(
    x: jnp.ndarray, projection: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Generalized FAVOR feature map with ReLU kernel (reference attention.py:86-96).

    x: [B, H, N, Dh]; projection: [K, Dh] (shared across heads) or [H, K, Dh].
    Returns positive features [B, H, N, K] for use with ``linear_attention``.
    """
    head_dim = x.shape[-1]
    x = x * head_dim**-0.25
    if projection.ndim == 2:
        proj = jnp.einsum("bhnd,kd->bhnk", x, projection)
    else:
        proj = jnp.einsum("bhnd,hkd->bhnk", x, projection)
    return jax.nn.relu(proj) + eps


def favor_features_softmax(
    x: jnp.ndarray,
    projection: jnp.ndarray,
    is_query: bool,
    kv_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Positive softmax-kernel estimator features (Performer; reference
    attention.py:99-118). Max-stabilized: queries subtract a per-position max,
    keys a global max (over keypoints and features).

    x: [B, H, N, Dh]; projection: [K, Dh] or [H, K, Dh]. Returns [B, H, N, K].
    """
    head_dim = x.shape[-1]
    data_normalizer = head_dim**-0.25
    num_features = projection.shape[-2]
    ratio = num_features**-0.5

    if projection.ndim == 2:
        proj = jnp.einsum("bhnd,kd->bhnk", x * data_normalizer, projection)
    else:
        proj = jnp.einsum("bhnd,hkd->bhnk", x * data_normalizer, projection)

    # ||x||^2 / 2 with the same normalization
    diag = 0.5 * jnp.sum(x**2, axis=-1, keepdims=True) * data_normalizer**2  # [B,H,N,1]

    if is_query:
        stab = jnp.max(proj, axis=-1, keepdims=True)
    else:
        if kv_mask is not None:
            proj_for_max = jnp.where(kv_mask[:, None, :, None], proj, _NEG_INF)
        else:
            proj_for_max = proj
        stab = jnp.max(proj_for_max, axis=(-1, -2), keepdims=True)
    return ratio * (jnp.exp(proj - diag - stab) + eps)
