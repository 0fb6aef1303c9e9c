"""Fused masked softmax attention as a Pallas TPU kernel.

The SDDMM-style score computation, masking, softmax and SpMM-style aggregation
for one query block run in VMEM without materializing the [B, H, N, M]
attention matrix in HBM (the reference materializes it,
models/superglue/attention.py:8-19; it is the #1 hot loop, SURVEY.md §3).

Layout [B, H, N, Dh] with head_dim <= 128: K and V for a whole (batch, head)
fit comfortably in VMEM at the reference scales (N <= 2048, Dh = 64), so the
kernel processes one query block against the full key set per grid step — no
online-softmax rescaling needed, one exact softmax per row.

Backward: jax.custom_vjp with the standard XLA einsum backward (recompute
probabilities); forward-path fusion is where the HBM win is.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openglue_tpu.ops import attention as attn_ref

_NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float):
    """Grid step = (batch*head, query block). Block shapes:
    q: [1, BQ, Dh]; k/v: [1, M, Dh]; mask: [1, 1, M] float (1 valid / 0 pad)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [BQ, M]
    logits = jnp.where(mask_ref[0] > 0.5, logits, _NEG_INF)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p = p / denom
    out_ref[0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _forward(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    block_q: int,
    interpret: Optional[bool],
) -> jnp.ndarray:
    batch, heads, n, dh = query.shape
    m = key.shape[2]
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    n_pad = _round_up(n, block_q)
    m_pad = _round_up(m, 128)

    bh = batch * heads
    q = query.reshape(bh, n, dh)
    k = key.reshape(bh, m, dh)
    v = value.reshape(bh, m, dh)
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        k = jnp.pad(k, ((0, 0), (0, m_pad - m), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, m_pad - m), (0, 0)))

    if kv_mask is None:
        mask = jnp.ones((batch, m), jnp.float32)
    else:
        mask = kv_mask.astype(jnp.float32)
    mask = jnp.pad(mask, ((0, 0), (0, m_pad - m)))
    # broadcast over heads -> [bh, 1, m_pad]
    mask = jnp.broadcast_to(mask[:, None, None, :], (batch, heads, 1, m_pad))
    mask = mask.reshape(bh, 1, m_pad)

    kernel = functools.partial(_attention_kernel, scale=dh**-0.5)
    out = pl.pallas_call(
        kernel,
        grid=(bh, n_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, dh), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, dh), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dh), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, dh), query.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad * m_pad * dh,
            bytes_accessed=(q.size + k.size + v.size + bh * n_pad * dh) * q.dtype.itemsize,
            transcendentals=bh * n_pad * m_pad,
        ),
    )(q, k, v, mask)
    return out[:, :n].reshape(batch, heads, n, dh)


def masked_softmax_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    block_q: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Drop-in for ops.attention.softmax_attention (out only, no attn matrix).

    query: [B, H, N, Dh]; key/value: [B, H, M, Dh]; kv_mask: [B, M] or None.
    """

    @jax.custom_vjp
    def f(q, k, v):
        return _forward(q, k, v, kv_mask, block_q, interpret)

    def f_fwd(q, k, v):
        return f(q, k, v), (q, k, v)

    def f_bwd(residuals, g):
        q, k, v = residuals
        _, vjp = jax.vjp(
            lambda q_, k_, v_: attn_ref.softmax_attention(q_, k_, v_, kv_mask)[0],
            q,
            k,
            v,
        )
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    return f(query, key, value)
