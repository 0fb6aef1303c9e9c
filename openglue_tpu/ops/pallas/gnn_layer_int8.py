"""int8-quantized fused attentional-propagation layer (serving path).

The v5e MXU runs int8 at twice the bf16 rate (~394 TOPS vs ~197 TFLOP/s), and
the dense projections + FFN are ~55% of the per-layer FLOPs (reference hot
loop #1, models/superglue/attention_gnn.py:36-56 — there the layer is six
separate torch Conv1d/matmul calls in fp32). This kernel is the eval-mode
fused layer (ops/pallas/gnn_layer_kernel.py) with every dense matmul running
on the int8 MXU path:

  * weights: symmetric per-output-channel int8 (quantized once from the f32
    params, absmax/127 scales);
  * activations: symmetric per-row (per-keypoint) dynamic int8 — the row
    absmax is a cheap VPU reduce, and the dequant is an exact outer-product
    scale (row_scale x col_scale) folded into the f32 accumulator epilogue;
  * attention itself (score softmax aggregate) stays in bf16/f32: probability
    quantization would feed compounding error into the Sinkhorn scores, and
    its dh=64 contractions only reach half the MXU lanes anyway, so the int8
    win there is smaller.

Quantization error is ~0.5-1% per matmul (documented by the parity test
tolerance in tests/test_pallas_kernels.py); the end-to-end guard is the
decode-agreement test: matches produced by the int8 path must agree with the
bf16 path on >=99% of keypoints.

Backward: not defined — this is a serving path. Training differentiability is
guarded by the caller (AttentionalPropagation only dispatches here in eval
mode); taking gradients through it raises from the custom_vjp-less primitive.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openglue_tpu.ops.pallas.gnn_layer_kernel import PropagationWeights, _round_up

_NEG_INF = -1e9
_EPS = 1e-12


class QuantPropagationWeights(NamedTuple):
    """Per-output-channel symmetric int8 weights + f32 scales/biases.

    Kernels are [in, out] int8; ``s*`` are [1, out] f32 (absmax/127);
    biases [1, out] f32. ``a1``/``c1`` are the folded eval-mode BatchNorm
    affine (same as PropagationWeights).
    """

    wq: jnp.ndarray
    sq: jnp.ndarray
    bq: jnp.ndarray
    wk: jnp.ndarray
    sk: jnp.ndarray
    bk: jnp.ndarray
    wv: jnp.ndarray
    sv: jnp.ndarray
    bv: jnp.ndarray
    wo: jnp.ndarray
    so: jnp.ndarray
    bo: jnp.ndarray
    w1: jnp.ndarray
    s1: jnp.ndarray
    b1: jnp.ndarray
    a1: jnp.ndarray
    c1: jnp.ndarray
    w2: jnp.ndarray
    s2: jnp.ndarray
    b2: jnp.ndarray


def _quantize_kernel_per_channel(w: jnp.ndarray):
    """[in, out] f32 -> (int8 [in, out], f32 scale [1, out])."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0 + _EPS
    wi8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wi8, scale


def quantize_propagation_weights(w: PropagationWeights) -> QuantPropagationWeights:
    """Quantize folded eval-mode layer weights to per-channel int8."""
    wq, sq = _quantize_kernel_per_channel(w.wq)
    wk, sk = _quantize_kernel_per_channel(w.wk)
    wv, sv = _quantize_kernel_per_channel(w.wv)
    wo, so = _quantize_kernel_per_channel(w.wo)
    w1, s1 = _quantize_kernel_per_channel(w.w1)
    w2, s2 = _quantize_kernel_per_channel(w.w2)
    f32 = lambda x: x.astype(jnp.float32)
    return QuantPropagationWeights(
        wq, sq, f32(w.bq), wk, sk, f32(w.bk), wv, sv, f32(w.bv),
        wo, so, f32(w.bo), w1, s1, f32(w.b1), f32(w.a1), f32(w.c1),
        w2, s2, f32(w.b2),
    )


def _quant_rows(x: jnp.ndarray):
    """f32 [R, C] -> (int8 [R, C], f32 row scales [R, 1])."""
    sx = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0 + _EPS
    xi8 = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    return xi8, sx


def _quant_rows_ceiling(x: jnp.ndarray):
    """PERF-CEILING PROBE variant (env OPENGLUE_INT8_CEILING, read at trace
    time): constant scale, no absmax reduce / round / clip — numerically
    WRONG, only used to measure how much of the int8 path's time the
    activation-quantization VPU passes cost. If even this ceiling does not
    beat bf16 by the int8 path's keep-threshold, the layer is
    attention-bound and the quantized path cannot pay (BASELINE.md round-3
    int8 disposition)."""
    sx = jnp.full((x.shape[0], 1), 0.05, jnp.float32)
    return x.astype(jnp.int8), sx


def _qdot(xi8, sx, w_i8, sw, bias):
    """int8 x int8 -> int32 MXU dot, exact outer-product dequant + bias."""
    acc = jax.lax.dot_general(
        xi8, w_i8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (sx * sw) + bias


def _layer_kernel_int8(
    x_q_ref, x_kv_ref, mask_ref, act_scales_ref,
    wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref, wv_ref, sv_ref, bv_ref,
    wo_ref, so_ref, bo_ref, w1_ref, s1_ref, b1_ref, a1_ref, c1_ref,
    w2_ref, s2_ref, b2_ref,
    out_ref,
    k_scratch, v_scratch,
    *, num_heads: int, use_offset: bool, scale: float, attn_dtype,
    static_scales: bool = False,
):
    """Same structure as gnn_layer_kernel._layer_kernel (softmax attention):
    grid (batch, query blocks); K/V projected once per batch element into
    VMEM scratch at the first block. All six dense matmuls run int8.

    ``static_scales``: per-tensor activation scales calibrated OFFLINE
    (act_scales_ref row order: kv, xq, attn, cat, h1) replace the per-row
    absmax quantization — the absmax reduce disappears and the round/clip
    fuses into the producing epilogue. The dynamic per-row path pays ~0.8
    ms/batch in these VPU passes at the serving headline (BASELINE.md
    round-3 int8 disposition: ceiling probe 1,455 vs dynamic 1,353 pairs/s)."""
    import os

    if static_scales:
        def _quant_rows(x, site):
            s = act_scales_ref[site, 0]
            xi8 = jnp.clip(jnp.round(x * (1.0 / s)), -127, 127).astype(jnp.int8)
            return xi8, s
    elif os.environ.get("OPENGLUE_INT8_CEILING"):
        # Loud and unmissable: a leftover exported var from a ceiling-probe
        # shell would otherwise silently corrupt every dynamic int8 inference
        # traced in this environment (the env var is read at TRACE time, so
        # jit caches built under it stay wrong even after it is unset).
        import warnings

        warnings.warn(
            "OPENGLUE_INT8_CEILING is set: the int8 GNN layer is being traced "
            "with the NUMERICALLY WRONG constant-scale perf-ceiling probe. "
            "Results are garbage; unset the variable (and discard any jit "
            "caches traced under it) for real inference.",
            stacklevel=2,
        )
        _quant_rows = lambda x, site: _quant_rows_ceiling(x)
    else:
        _quant_rows = lambda x, site: globals()["_quant_rows"](x)
    i = pl.program_id(1)
    dim = wq_ref.shape[0]
    dh = dim // num_heads
    mask_add = (1.0 - mask_ref[0]) * _NEG_INF  # [1, M]

    @pl.when(i == 0)
    def _project_kv():
        kv = x_kv_ref[0].astype(jnp.float32)
        kv_i8, s_kv = _quant_rows(kv, 0)
        k_scratch[...] = _qdot(kv_i8, s_kv, wk_ref[...], sk_ref[...], bk_ref[...]).astype(
            k_scratch.dtype
        )
        v_scratch[...] = _qdot(kv_i8, s_kv, wv_ref[...], sv_ref[...], bv_ref[...]).astype(
            v_scratch.dtype
        )

    xq = x_q_ref[0].astype(jnp.float32)  # [BQ, D]
    xq_i8, s_xq = _quant_rows(xq, 1)
    q = _qdot(xq_i8, s_xq, wq_ref[...], sq_ref[...], bq_ref[...]).astype(attn_dtype)

    head_outs = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q[:, sl]
        kh = k_scratch[:, sl]
        logits = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + mask_add  # [BQ, M]
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(attn_dtype), v_scratch[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, dh]
        head_outs.append(o / denom)
    attn = jnp.concatenate(head_outs, axis=1)  # [BQ, D] f32

    attn_i8, s_attn = _quant_rows(attn, 2)
    msg = _qdot(attn_i8, s_attn, wo_ref[...], so_ref[...], bo_ref[...])
    if use_offset:
        cat = jnp.concatenate([xq - msg, msg], axis=1)
    else:
        cat = jnp.concatenate([xq, msg], axis=1)  # [BQ, 2D] f32
    cat_i8, s_cat = _quant_rows(cat, 3)
    h1 = jax.nn.relu(_qdot(cat_i8, s_cat, w1_ref[...], s1_ref[...], b1_ref[...]))
    h1 = h1 * a1_ref[...] + c1_ref[...]  # folded eval BN, f32
    h1_i8, s_h1 = _quant_rows(h1, 4)
    upd = _qdot(h1_i8, s_h1, w2_ref[...], s2_ref[...], b2_ref[...])  # [BQ, D]
    out_ref[0] = (x_q_ref[0].astype(jnp.float32) + upd).astype(out_ref.dtype)


def _weights_in_call_order(w: QuantPropagationWeights):
    return tuple(w)


def fused_attention_propagation_int8(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    weights: QuantPropagationWeights,
    num_heads: int,
    use_offset: bool = False,
    block_q: Optional[int] = None,
    interpret: Optional[bool] = None,
    attn_dtype: jnp.dtype = jnp.bfloat16,
    act_scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One eval-mode layer, fused, dense matmuls on the int8 MXU path.
    x_q [B, N, D], x_kv [B, M, D], kv_mask [B, M] bool or None -> [B, N, D].
    Softmax attention only (the linear variant's O(N) aggregates are already
    MXU-cheap; its bottleneck is the feature map, not the dense chain).

    ``act_scales``: optional [5] f32 per-tensor activation scales
    (kv, xq, attn, cat, h1 — from calibrate: reference_activation_absmax/127)
    switching the kernel to static-scale PTQ quantization (no in-kernel
    absmax reductions)."""
    batch, n, dim = x_q.shape
    m = x_kv.shape[1]
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    static_scales = act_scales is not None
    if static_scales:
        scales_pad = jnp.zeros((8, 128), jnp.float32)
        scales_pad = scales_pad.at[:5, 0].set(act_scales.astype(jnp.float32))
    else:
        scales_pad = jnp.zeros((8, 128), jnp.float32)

    if block_q is None:
        # same adaptive policy as the bf16 layer kernel (gnn_layer_kernel)
        block_q = 1024 if batch <= 16 else 512
    if m > 1024:
        block_q = min(block_q, 512)
    if static_scales:
        # the static-scale variant's liveness is ~1% past the 16M scoped VMEM
        # limit at block_q=1024 (measured Mosaic stack OOM by 152K at
        # B=16 N=1024); one notch down fits with headroom
        block_q = min(block_q, 512)
    block_q = min(block_q, _round_up(n, 128))
    n_pad = _round_up(n, block_q)
    m_pad = _round_up(m, 128)

    if n_pad != n:
        x_q = jnp.pad(x_q, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        x_kv = jnp.pad(x_kv, ((0, 0), (0, m_pad - m), (0, 0)))
    if kv_mask is None:
        mask = jnp.ones((batch, m), jnp.float32)
    else:
        mask = kv_mask.astype(jnp.float32)
    mask = jnp.pad(mask, ((0, 0), (0, m_pad - m)))[:, None, :]  # [B, 1, M]

    const = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, i, _s=len(arr.shape): (0,) * _s, memory_space=pltpu.VMEM
    )
    weight_specs = [const(arr) for arr in _weights_in_call_order(weights)]

    kernel = functools.partial(
        _layer_kernel_int8,
        num_heads=num_heads,
        use_offset=use_offset,
        scale=(dim // num_heads) ** -0.5,
        attn_dtype=attn_dtype,
        static_scales=static_scales,
    )
    scratch = [
        pltpu.VMEM((m_pad, dim), attn_dtype),
        pltpu.VMEM((m_pad, dim), attn_dtype),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(batch, n_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            const(scales_pad),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, n_pad, dim), x_q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=batch * (20 * n_pad * dim * dim + 4 * n_pad * m_pad * dim),
            bytes_accessed=(x_q.size + x_kv.size + x_q.size) * x_q.dtype.itemsize,
            transcendentals=batch * n_pad * m_pad,
        ),
    )(x_q, x_kv, mask, scales_pad, *_weights_in_call_order(weights))
    return out[:, :n]


def xla_reference_layer_int8(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    w: QuantPropagationWeights,
    num_heads: int,
    use_offset: bool = False,
    attn_dtype: jnp.dtype = jnp.bfloat16,
    act_scales: Optional[jnp.ndarray] = None,
    collect_absmax: bool = False,
):
    """Identical quantized math in plain XLA — the kernel's parity oracle and
    the int8 fallback off-TPU.

    ``act_scales`` [5] f32 (kv, xq, attn, cat, h1): static per-tensor
    quantization, mirroring the kernel's static_scales mode.
    ``collect_absmax``: also return the [5] per-site input absmaxes — the
    calibration pass for the static mode (reference_activation_absmax)."""
    batch, n, dim = x_q.shape
    m = x_kv.shape[1]
    dh = dim // num_heads
    absmaxes = [None] * 5

    def quant_rows(x, site):
        x = x.astype(jnp.float32)
        if collect_absmax:
            absmaxes[site] = jnp.max(jnp.abs(x))
        if act_scales is not None:
            sx = act_scales[site]
        else:
            sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0 + _EPS
        return jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8), sx

    def qdense(x, site, wi8, sw, bias):
        xi8, sx = quant_rows(x, site)
        acc = jax.lax.dot_general(
            xi8, wi8, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * (sx * sw[None]) + bias[None]

    q = qdense(x_q, 1, w.wq, w.sq, w.bq).astype(attn_dtype)
    k = qdense(x_kv, 0, w.wk, w.sk, w.bk).astype(attn_dtype)
    v = qdense(x_kv, 0, w.wv, w.sv, w.bv).astype(attn_dtype)

    def split(x):
        return x.reshape(batch, -1, num_heads, dh).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhnd,bhmd->bhnm", split(q), split(k)).astype(jnp.float32) * dh**-0.5
    if kv_mask is not None:
        logits = logits + (1.0 - kv_mask.astype(jnp.float32))[:, None, None, :] * _NEG_INF
    mx = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - mx)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(attn_dtype), split(v)).astype(jnp.float32)
    o = o / denom
    attn = o.transpose(0, 2, 1, 3).reshape(batch, n, dim)

    msg = qdense(attn, 2, w.wo, w.so, w.bo)
    xq = x_q.astype(jnp.float32)
    cat = jnp.concatenate([xq - msg if use_offset else xq, msg], axis=-1)
    h1 = jax.nn.relu(qdense(cat, 3, w.w1, w.s1, w.b1))
    h1 = h1 * w.a1[None] + w.c1[None]
    upd = qdense(h1, 4, w.w2, w.s2, w.b2)
    out = (xq + upd).astype(x_q.dtype)
    if collect_absmax:
        return out, jnp.stack(absmaxes)
    return out


def reference_activation_absmax(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    w: QuantPropagationWeights,
    num_heads: int,
    use_offset: bool = False,
) -> jnp.ndarray:
    """Calibration pass for static-scale PTQ: run the dynamically-quantized
    reference forward and return the [5] per-site activation absmaxes
    (kv, xq, attn, cat, h1). Static scales = absmax * headroom / 127."""
    _, absmax = xla_reference_layer_int8(
        x_q, x_kv, kv_mask, w, num_heads, use_offset, collect_absmax=True
    )
    return absmax
