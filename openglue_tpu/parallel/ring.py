"""Keypoint-axis context parallelism: ring attention and row-sharded Sinkhorn
(SURVEY.md §2.6 — the reference has NO sequence partitioning; it scales the
keypoint axis algorithmically with linear attention. Here the keypoint set is
sharded over a mesh axis and collectives ride ICI).

Primitives (all used inside jax.shard_map over the ``model`` axis):

* ``ring_softmax_attention`` — queries stay local; K/V/mask blocks rotate
  around the ring via lax.ppermute with online-softmax accumulation, so the
  full [N, M] score matrix never exists on one chip. Works for self-attention
  (K/V = same image's shards) and for the bipartite cross-attention
  (K/V = other image's shards) — "edge partitioning" of the cross graph is
  exactly: rows of the score matrix local, column blocks streamed.

* ``sharded_log_sinkhorn`` — score-matrix rows sharded; the row update is
  local, the column update reduces partial logsumexps across shards with one
  pmax + one psum per iteration. The dustbin row is replicated and folded
  into the column reduction once.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def ring_softmax_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    axis_name: str,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Masked softmax attention with K/V sharded over ``axis_name``.

    q: [B, H, n_loc, Dh] (queries of this shard); k/v: [B, H, m_loc, Dh]
    (this shard's K/V block); kv_mask: [B, m_loc] or None. Returns
    [B, H, n_loc, Dh] — exactly softmax over the FULL key set.

    ``use_pallas=True`` computes each ring block with the fused Pallas
    attention kernel (ops.pallas.attention_kernel, the LSE-emitting variant)
    and merges blocks by online-logsumexp reweighting in XLA — SURVEY §5's
    "sharded form at kernel speed". The ppermute schedule is identical.
    """
    axis_size = jax.lax.axis_size(axis_name)
    scale = q.shape[-1] ** -0.5
    batch, heads, n_loc, _ = q.shape

    if kv_mask is None:
        # derive from k so the value is typed device-varying under shard_map
        kv_mask = jnp.isfinite(k[:, 0, :, 0])

    perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]

    if use_pallas:
        from openglue_tpu.ops.pallas.attention_kernel import (
            masked_softmax_attention_with_lse,
        )

        acc = jnp.zeros_like(q)
        lse_run = jnp.full_like(q[..., 0], -jnp.inf)
        k_blk, v_blk, mask_blk = k, v, kv_mask
        # axis_size is static — unroll so the final block skips the rotation
        for step in range(axis_size):
            out_blk, lse_blk = masked_softmax_attention_with_lse(
                q, k_blk, v_blk, mask_blk
            )
            lse_new = jnp.logaddexp(lse_run, lse_blk)
            w_old = jnp.exp(lse_run - lse_new)
            w_new = jnp.exp(lse_blk - lse_new)
            acc = acc * w_old[..., None] + out_blk.astype(acc.dtype) * w_new[..., None]
            lse_run = lse_new
            if step + 1 < axis_size:
                k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
                v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
                mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
        # fully-masked rows everywhere carry only the -1e9 pseudo-mass
        return jnp.where(lse_run[..., None] < -1e8, 0.0, acc)

    def block_logits(k_blk, mask_blk):
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k_blk) * scale
        return jnp.where(mask_blk[:, None, None, :], logits, _NEG_INF)

    # online softmax accumulators (derived from q => device-varying types,
    # required for the shard_map + fori_loop carry)
    acc = jnp.zeros_like(q)
    m_run = jnp.full_like(q[..., 0], _NEG_INF)
    denom = jnp.zeros_like(q[..., 0])

    def accumulate(k_blk, v_blk, mask_blk, acc, m_run, denom):
        logits = block_logits(k_blk, mask_blk)  # [B,H,n_loc,m_loc]
        m_blk = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m_run, m_blk)
        corr = jnp.exp(m_run - m_new)
        p = jnp.exp(logits - m_new[..., None])
        denom = denom * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum("bhnm,bhmd->bhnd", p, v_blk)
        return acc, m_new, denom

    # axis_size is static — unroll so the final block skips the (discarded)
    # K/V/mask rotation
    k_blk, v_blk, mask_blk = k, v, kv_mask
    for step in range(axis_size):
        acc, m_run, denom = accumulate(k_blk, v_blk, mask_blk, acc, m_run, denom)
        if step + 1 < axis_size:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
    # fully-masked rows (no valid key anywhere) -> zero output
    safe = jnp.maximum(denom, 1e-30)
    return acc / safe[..., None]


def _lse(x, axis):
    m = jnp.max(x, axis=axis, keepdims=True)
    out = m + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))
    return jnp.squeeze(out, axis)


def sharded_log_sinkhorn(
    S_inner: jnp.ndarray,
    S_dust_row: jnp.ndarray,
    log_a_inner: jnp.ndarray,
    log_a_dust: jnp.ndarray,
    log_b: jnp.ndarray,
    axis_name: str,
    num_iters: int = 20,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Log-domain Sinkhorn with ROWS sharded over ``axis_name``.

    S_inner: [B, n_loc, C] this shard's rows (C = M + 1 incl. dustbin col,
    already /reg and mask-filled); S_dust_row: [B, 1, C] replicated dustbin
    row; log_a_inner: [B, n_loc]; log_a_dust: [B]; log_b: [B, C] replicated.

    Returns (log_P_inner [B, n_loc, C] sharded rows, log_P_dust [B, 1, C]
    replicated). Column update: one pmax + one psum per iteration.
    """

    def body(_, carry):
        u_inner, u_dust, v = carry
        # row update — fully local
        u_inner = log_a_inner - _lse(S_inner + v[:, None, :], axis=2)
        u_dust = log_a_dust - _lse(S_dust_row[:, 0, :] + v, axis=1)
        # column update — partial LSE over local rows, reduced across shards.
        # The max is only a logsumexp stabilizer (the LSE value and gradient
        # are independent of the shift), so stop_gradient keeps the train
        # step differentiable: lax.pmax has no VJP rule, and without the wrap
        # the ring-path backward would fail to trace.
        part = S_inner + u_inner[:, :, None]  # [B, n_loc, C]
        local_max = jnp.max(part, axis=1)  # [B, C]
        global_max = jax.lax.stop_gradient(
            jnp.maximum(
                jax.lax.pmax(jax.lax.stop_gradient(local_max), axis_name),
                S_dust_row[:, 0, :] + u_dust[:, None],
            )
        )
        local_sum = jnp.sum(jnp.exp(part - global_max[:, None, :]), axis=1)
        total = jax.lax.psum(local_sum, axis_name)
        total = total + jnp.exp(S_dust_row[:, 0, :] + u_dust[:, None] - global_max)
        col_lse = global_max + jnp.log(total)
        v = log_b - col_lse
        return u_inner, u_dust, v

    batch, n_loc, C = S_inner.shape
    init = (
        jnp.zeros_like(S_inner[..., 0]),  # derived => device-varying type
        jnp.zeros_like(log_a_dust),
        jnp.zeros_like(log_b),
    )
    u_inner, u_dust, v = jax.lax.fori_loop(0, num_iters, body, init)
    log_P_inner = S_inner + u_inner[:, :, None] + v[:, None, :]
    log_P_dust = S_dust_row + u_dust[:, None, None] + v[:, None, :]
    return log_P_inner, log_P_dust


def log_optimal_transport_ring(
    scores: jnp.ndarray,
    dustbin_score: jnp.ndarray,
    axis_name: str,
    num_iters: int = 20,
    reg: float = 1.0,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Drop-in for ops.sinkhorn.log_optimal_transport with the score-matrix
    ROWS sharded over ``axis_name`` via shard_map (keypoint-axis context
    parallelism). scores [B, m, n] must be sharded on axis 1; masks follow.
    Returns the [B, m+1, n+1] log-assignment with rows sharded the same way
    (the dustbin row replicated).

    Marginal construction mirrors ops.sinkhorn.log_optimal_transport exactly
    (including the masked form); the iteration is sharded_log_sinkhorn.
    """
    from jax.sharding import PartitionSpec as P

    from openglue_tpu.ops.sinkhorn import build_masked_otp_inputs

    batch, m, n = scores.shape
    if mask0 is None:
        mask0 = jnp.ones((batch, m), dtype=bool)
    if mask1 is None:
        mask1 = jnp.ones((batch, n), dtype=bool)

    S_inner, S_dust, log_a_inner, log_a_dust, log_b, norm = build_masked_otp_inputs(
        scores, dustbin_score, reg, mask0, mask1
    )

    fn = jax.shard_map(
        partial(sharded_log_sinkhorn, axis_name=axis_name, num_iters=num_iters),
        in_specs=(P(None, axis_name, None), P(None, None, None),
                  P(None, axis_name), P(None), P(None, None)),
        out_specs=(P(None, axis_name, None), P(None, None, None)),
        axis_names={axis_name},
    )
    log_P_inner, log_P_dust = fn(S_inner, S_dust, log_a_inner, log_a_dust, log_b)
    log_P = jnp.concatenate([log_P_inner, log_P_dust], axis=1)
    return log_P - norm[:, None, None]
