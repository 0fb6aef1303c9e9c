"""Fused masked softmax attention as a Pallas TPU kernel.

The SDDMM-style score computation, masking, softmax and SpMM-style aggregation
for one query block run in VMEM without materializing the [B, H, N, M]
attention matrix in HBM (the reference materializes it,
models/superglue/attention.py:8-19; it is the #1 hot loop, SURVEY.md §3).

Layout [B, H, N, Dh] with head_dim <= 128: K and V for a whole (batch, head)
fit comfortably in VMEM at the reference scales (N <= 2048, Dh = 64), so the
kernel processes one query block against the full key set per grid step — no
online-softmax rescaling needed, one exact softmax per row.

Backward: fused Pallas backward kernel (recompute probabilities in VMEM, emit
dq/dk/dv in one pass per (batch, head)) for graphs whose [N, M] score block
fits VMEM twice; larger shapes fall back to the XLA einsum backward inside the
same custom_vjp.
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
    ) * scale + (1.0 - mask_ref[0]) * _NEG_INF  # [BQ, M]; additive mask
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    # normalize AFTER aggregation: the divide touches [BQ, Dh], not [BQ, M]
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    out_ref[0] = (o / denom).astype(out_ref.dtype)


def _attention_kernel_lse(
    q_ref, k_ref, v_ref, mask_ref, out_ref, lse_ref, *, scale: float, block_q: int
):
    """Like _attention_kernel but also emits the per-row logsumexp of the
    masked scaled logits — the merge statistic for composing block attention
    across a ring schedule (parallel.ring). The lse block spans the FULL
    padded query row ([1, 1, Np], revisited across query blocks; each step
    stores its [1, BQ] slice): a per-block (1, BQ) output block would violate
    Mosaic's (8, 128)-divisibility rule on real TPU lowering."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + (1.0 - mask_ref[0]) * _NEG_INF  # [BQ, M]; additive mask
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    out_ref[0] = (o / denom).astype(out_ref.dtype)
    i = pl.program_id(1)
    lse_ref[0, :, pl.ds(i * block_q, block_q)] = jnp.transpose(
        m + jnp.log(denom)
    )  # [1, BQ]


def _forward_lse(query, key, value, kv_mask, block_q, interpret):
    """(out [B,H,N,Dh], lse [B,H,N]) via the LSE-emitting kernel."""
    batch, heads, n, dh = query.shape
    m = key.shape[2]
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    block_q = min(block_q, _round_up(n, 128))
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
    mask = jnp.broadcast_to(mask[:, None, None, :], (batch, heads, 1, m_pad))
    mask = mask.reshape(bh, 1, m_pad)

    kernel = functools.partial(
        _attention_kernel_lse, scale=dh**-0.5, block_q=block_q
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, n_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, dh), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, dh), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dh), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        # propagate the inputs' varying-mesh-axes so the kernel composes
        # inside shard_map (the ring schedule)
        out_shape=(
            jax.ShapeDtypeStruct(
                (bh, n_pad, dh), query.dtype, vma=getattr(jax.typeof(q), "vma", None)
            ),
            jax.ShapeDtypeStruct(
                (bh, 1, n_pad), jnp.float32, vma=getattr(jax.typeof(q), "vma", None)
            ),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad * m_pad * dh,
            bytes_accessed=(q.size + k.size + v.size + bh * n_pad * dh) * q.dtype.itemsize,
            transcendentals=bh * n_pad * m_pad,
        ),
    )(q, k, v, mask)
    return (
        out[:, :n].reshape(batch, heads, n, dh),
        lse[:, 0, :n].reshape(batch, heads, n),
    )


def masked_softmax_attention_with_lse(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    block_q: int = 512,
    interpret: Optional[bool] = None,
):
    """(out, lse) kernel for ring-schedule block attention. Differentiable:
    backward replays ops.attention.softmax_attention_with_lse in XLA.

    The mask travels as a PRIMAL argument (float, zero cotangent) rather
    than a closure: a closed-over traced mask escapes jax.checkpoint's trace
    when the caller is rematerialized (UnexpectedTracerError)."""
    maskf = None if kv_mask is None else kv_mask.astype(jnp.float32)

    @jax.custom_vjp
    def f(q, k, v, m):
        return _forward_lse(q, k, v, m, block_q, interpret)

    def f_fwd(q, k, v, m):
        return f(q, k, v, m), (q, k, v, m)

    def f_bwd(residuals, g):
        q, k, v, m = residuals
        _, vjp = jax.vjp(
            lambda q_, k_, v_: attn_ref.softmax_attention_with_lse(
                q_, k_, v_, None if m is None else m > 0.5
            ),
            q, k, v,
        )
        dm = None if m is None else jnp.zeros_like(m)
        return (*vjp(g), dm)

    f.defvjp(f_fwd, f_bwd)
    return f(query, key, value, maskf)


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

    # adapt the query block: big blocks amortize K/V reuse (512 measures ~15%
    # faster than 256 at N=1024) but never exceed the padded query length
    block_q = min(block_q, _round_up(n, 128))
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


def _attention_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref, dq_ref, dk_ref, dv_ref, *, scale: float):
    """Grid step = one (batch*head). Full q/k/v/g for the head in VMEM;
    recompute P = softmax(mask(qk')) then
      dv = P' g;  dp = g v';  ds = P * (dp - rowsum(dp * P));
      dq = ds k * scale;  dk = ds' q * scale.
    Shapes: q/g [1, N, Dh]; k/v [1, M, Dh]; mask [1, 1, M]."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [N, M]
    logits = jnp.where(mask_ref[0] > 0.5, logits, _NEG_INF)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)  # [N, M]

    # matmul operands in the input dtype (bf16 in the model): f32 operands
    # run the MXU at a fraction of bf16 rate; accumulation stays f32 via
    # preferred_element_type (same contract as the forward kernel's
    # p.astype(v.dtype) aggregate).
    pc = p.astype(v.dtype)
    dv = jax.lax.dot_general(
        pc, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, Dh]
    dp = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, M]
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))  # [N, M] f32
    dsc = ds.astype(q.dtype)
    dq = jnp.dot(dsc, k, preferred_element_type=jnp.float32) * scale  # [N, Dh]
    dk = jax.lax.dot_general(
        dsc, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [M, Dh]
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_fits_vmem(n: int, m: int, dh: int) -> bool:
    n_pad, m_pad = _round_up(n, 8), _round_up(m, 128)
    dh_pad = _round_up(dh, 128)
    # two [N, M] f32 intermediates (p and dp) + six [*, Dh] tensors
    return (2 * n_pad * m_pad + 6 * max(n_pad, m_pad) * dh_pad) * 4 < 13 * 1024 * 1024


def _backward(query, key, value, kv_mask, g, interpret):
    batch, heads, n, dh = query.shape
    m = key.shape[2]
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    bh = batch * heads
    q = query.reshape(bh, n, dh)
    k = key.reshape(bh, m, dh)
    v = value.reshape(bh, m, dh)
    gg = g.reshape(bh, n, dh)
    if kv_mask is None:
        mask = jnp.ones((batch, m), jnp.float32)
    else:
        mask = kv_mask.astype(jnp.float32)
    mask = jnp.broadcast_to(mask[:, None, None, :], (batch, heads, 1, m)).reshape(bh, 1, m)

    kernel = functools.partial(_attention_bwd_kernel, scale=dh**-0.5)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, n, dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n, dh), query.dtype),
            jax.ShapeDtypeStruct((bh, m, dh), key.dtype),
            jax.ShapeDtypeStruct((bh, m, dh), value.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n * m * dh,
            bytes_accessed=5 * bh * n * dh * 4,
            transcendentals=bh * n * m,
        ),
    )(q, k, v, mask, gg)
    return (
        dq.reshape(batch, heads, n, dh),
        dk.reshape(batch, heads, m, dh),
        dv.reshape(batch, heads, m, dh),
    )


def masked_softmax_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    block_q: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Drop-in for ops.attention.softmax_attention (out only, no attn matrix).

    query: [B, H, N, Dh]; key/value: [B, H, M, Dh]; kv_mask: [B, M] or None.
    The mask is a primal argument with a zero cotangent (NOT a closure) so
    the kernel composes with jax.checkpoint — see
    masked_softmax_attention_with_lse.
    """
    maskf = None if kv_mask is None else kv_mask.astype(jnp.float32)

    @jax.custom_vjp
    def f(q, k, v, mk):
        return _forward(q, k, v, mk, block_q, interpret)

    def f_fwd(q, k, v, mk):
        return f(q, k, v, mk), (q, k, v, mk)

    def f_bwd(residuals, g):
        q, k, v, mk = residuals
        dm = None if mk is None else jnp.zeros_like(mk)
        n, m, dh = q.shape[2], k.shape[2], q.shape[3]
        if _bwd_fits_vmem(n, m, dh):
            return (*_backward(q, k, v, mk, g, interpret), dm)
        _, vjp = jax.vjp(
            lambda q_, k_, v_: attn_ref.softmax_attention(
                q_, k_, v_, None if mk is None else mk > 0.5
            )[0],
            q,
            k,
            v,
        )
        return (*vjp(g), dm)

    f.defvjp(f_fwd, f_bwd)
    return f(query, key, value, maskf)
