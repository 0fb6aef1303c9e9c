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
    k_scratch, v_scratch, attn_scale_scratch,
    *, num_heads: int, use_offset: bool, scale: float, attn_dtype,
    static_scales: bool = False, quant_attention: bool = False,
):
    """Same structure as gnn_layer_kernel._layer_kernel (softmax attention):
    grid (batch, query blocks); K/V projected once per batch element into
    VMEM scratch at the first block. All six dense matmuls run int8.

    ``static_scales``: per-tensor activation scales calibrated OFFLINE
    (act_scales_ref row order: kv, xq, attn, cat, h1[, k_attn, v_attn,
    q_attn]) replace the per-row absmax quantization — the absmax reduce
    disappears and the round/clip fuses into the producing epilogue. The
    dynamic per-row path pays ~0.8 ms/batch in these VPU passes at the
    serving headline (BASELINE.md round-3 int8 disposition: ceiling probe
    1,455 vs dynamic 1,353 pairs/s).

    ``quant_attention``: ALSO run the two attention contractions on the int8
    MXU — the dh=64-narrow qk^T and P.V dots are 62% of the per-layer FLOPs
    at eval scale N=2048 and run at half MXU width in bf16; int8 doubles
    their rate at the same width. q/k/v are quantized PER-TENSOR (scalar
    scales, so the dequant folds into the existing logits fma: logits =
    acc * (s_q*s_k*scale) + mask_add — no extra [BQ, M] VPU pass), and the
    softmax probabilities p in [0, 1] quantize with the CONSTANT scale 127
    (p = exp(x - rowmax) <= 1 exactly, so round(p*127) needs no absmax and
    no clip). k/v live in VMEM scratch as int8, halving the scratch
    footprint. Dynamic mode computes the three scalar absmaxes in-kernel
    (cheap [rows, D] reduces, NOT [BQ, M]); static mode reads calibrated
    sites 5/6/7.

    Scale granularity in DYNAMIC mode differs from the XLA oracle: here q is
    quantized per query block and k/v per batch element (the absmaxes are
    taken over what is resident in VMEM), while xla_reference_layer_int8
    uses one global per-tensor absmax — different quantization grids, so
    kernel and off-TPU fallback agree only to the parity test's norm
    tolerance, not bitwise. Static mode shares one calibrated grid and is
    exact between the two.

    Probability-quantization caveat: p below 1/254 rounds to int8 zero while
    denom keeps the unquantized sum, so DIFFUSE attention rows (near-uniform
    p ~ 1/M, typical of untrained weights or early calibration batches at
    M=2048) lose most of their mass and the head output shrinks toward zero
    rather than just rounding. The >=97% decode-agreement guard exercises
    peaked TRAINED attention only — gate *_attn serving on a decode-agreement
    check against the actual served checkpoint, not just the synthetic test
    (BASELINE.md round-4 int8_attn disposition)."""
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
        kf = _qdot(kv_i8, s_kv, wk_ref[...], sk_ref[...], bk_ref[...])
        vf = _qdot(kv_i8, s_kv, wv_ref[...], sv_ref[...], bv_ref[...])
        if quant_attention:
            # per-tensor int8 k/v: scalar scales make the logits/output
            # dequants fold into the fmas the bf16 path already pays
            if static_scales:
                s_ka = act_scales_ref[5, 0]
                s_va = act_scales_ref[6, 0]
            else:
                s_ka = jnp.max(jnp.abs(kf)) / 127.0 + _EPS
                s_va = jnp.max(jnp.abs(vf)) / 127.0 + _EPS
                attn_scale_scratch[0] = s_ka
                attn_scale_scratch[1] = s_va
            k_scratch[...] = jnp.clip(
                jnp.round(kf * (1.0 / s_ka)), -127, 127
            ).astype(jnp.int8)
            v_scratch[...] = jnp.clip(
                jnp.round(vf * (1.0 / s_va)), -127, 127
            ).astype(jnp.int8)
        else:
            k_scratch[...] = kf.astype(k_scratch.dtype)
            v_scratch[...] = vf.astype(v_scratch.dtype)

    xq = x_q_ref[0].astype(jnp.float32)  # [BQ, D]
    xq_i8, s_xq = _quant_rows(xq, 1)
    qf = _qdot(xq_i8, s_xq, wq_ref[...], sq_ref[...], bq_ref[...])

    head_outs = []
    if quant_attention:
        if static_scales:
            s_ka = act_scales_ref[5, 0]
            s_va = act_scales_ref[6, 0]
            s_qa = act_scales_ref[7, 0]
        else:
            s_ka = attn_scale_scratch[0]
            s_va = attn_scale_scratch[1]
            s_qa = jnp.max(jnp.abs(qf)) / 127.0 + _EPS  # [BQ, D] reduce
        q_i8 = jnp.clip(jnp.round(qf * (1.0 / s_qa)), -127, 127).astype(jnp.int8)
        logit_scale = s_qa * s_ka * scale
        out_scale = s_va * (1.0 / 127.0)
        for h in range(num_heads):
            sl = slice(h * dh, (h + 1) * dh)
            acc = jax.lax.dot_general(
                q_i8[:, sl], k_scratch[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [BQ, M] int32
            logits = acc.astype(jnp.float32) * logit_scale + mask_add
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            # p in [0, 1] exactly (max-subtracted exp): constant scale 127,
            # no absmax, no clip — round replaces the bf16 cast of the
            # unquantized path
            p_i8 = jnp.round(p * 127.0).astype(jnp.int8)
            o_acc = jax.lax.dot_general(
                p_i8, v_scratch[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [BQ, dh] int32
            head_outs.append(o_acc.astype(jnp.float32) * out_scale / denom)
    else:
        q = qf.astype(attn_dtype)
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
    quant_attention: bool = False,
) -> jnp.ndarray:
    """One eval-mode layer, fused, dense matmuls on the int8 MXU path.
    x_q [B, N, D], x_kv [B, M, D], kv_mask [B, M] bool or None -> [B, N, D].
    Softmax attention only (the linear variant's O(N) aggregates are already
    MXU-cheap; its bottleneck is the feature map, not the dense chain).

    ``act_scales``: optional f32 per-tensor activation scales — [5]
    (kv, xq, attn, cat, h1) or [8] (+ k_attn, v_attn, q_attn when
    ``quant_attention``), from calibrate: reference_activation_absmax/127 —
    switching the kernel to static-scale PTQ quantization (no in-kernel
    absmax reductions).

    ``quant_attention``: run the qk^T and P.V attention contractions on the
    int8 MXU too (per-tensor q/k/v scales, constant-scale probabilities) —
    the narrow dh=64 dots dominate at eval scale N=2048 and double their
    MXU rate at int8 (kernel docstring)."""
    batch, n, dim = x_q.shape
    m = x_kv.shape[1]
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    static_scales = act_scales is not None
    if static_scales and quant_attention and act_scales.shape[0] < 8:
        # A 5-site calibration vector (calibrated under int8_static, then the
        # config flipped to *_attn) would zero-pad sites 5-7; the caller's
        # +1e-12 turns those into ~1e-12 scales, collapsing attention to
        # uniform and zeroing the attention message — silently wrong outputs.
        raise ValueError(
            "quant_attention=True needs 8 calibrated activation sites "
            f"(kv, xq, attn, cat, h1, k_attn, v_attn, q_attn); got "
            f"act_scales.shape={tuple(act_scales.shape)}. Re-calibrate with "
            "quantize='int8_static_attn' (the 5-site int8_static calibration "
            "does not cover the attention operands)."
        )
    scales_pad = jnp.zeros((8, 128), jnp.float32)
    if static_scales:
        k = act_scales.shape[0]
        scales_pad = scales_pad.at[:k, 0].set(act_scales.astype(jnp.float32))

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
    if quant_attention:
        # the int32 qk accumulator lives NEXT TO the f32 logits/probabilities
        # (the bf16 path's dot writes f32 directly) — at M=2048 block 512 the
        # stack lands 1.95M past the 16M scoped-VMEM limit (measured Mosaic
        # OOM); 256 fits. At M<=1024 the static variant's 512 budget was
        # measured tight already, so the dynamic *_attn path (which adds the
        # [block_q, M] int32 accumulator on top) is clamped to 512 as well
        # rather than risking an untested block_q=1024 liveness profile.
        block_q = min(block_q, 256 if m > 1024 else 512)
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
        quant_attention=quant_attention,
    )
    kv_scratch_dtype = jnp.int8 if quant_attention else attn_dtype
    scratch = [
        pltpu.VMEM((m_pad, dim), kv_scratch_dtype),
        pltpu.VMEM((m_pad, dim), kv_scratch_dtype),
        pltpu.SMEM((2,), jnp.float32),  # dynamic per-tensor k/v attn scales
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
    quant_attention: bool = False,
):
    """The kernel's parity oracle and the int8 fallback off-TPU. STATIC mode
    is identical quantized math to the kernel; DYNAMIC ``quant_attention``
    mode is NOT bit-identical — this oracle quantizes q/k/v with one global
    per-tensor absmax while the kernel takes q's absmax per query block and
    k/v's per batch element (different quantization grids; the parity test's
    norm tolerance covers the gap). Do not mistake the dynamic oracle for
    bit-exact off-TPU serving.

    ``act_scales`` [5] or [8] f32 (kv, xq, attn, cat, h1[, k_attn, v_attn,
    q_attn]): static per-tensor quantization, mirroring the kernel's
    static_scales mode.
    ``collect_absmax``: also return the per-site input absmaxes — the
    calibration pass for the static mode (reference_activation_absmax).
    ``quant_attention``: also quantize the attention contractions (per-tensor
    q/k/v, constant-scale probabilities), mirroring the kernel flag."""
    batch, n, dim = x_q.shape
    m = x_kv.shape[1]
    dh = dim // num_heads
    if quant_attention and act_scales is not None and act_scales.shape[0] < 8:
        raise ValueError(
            "quant_attention=True needs 8 calibrated activation sites; got "
            f"act_scales.shape={tuple(act_scales.shape)} — re-calibrate with "
            "quantize='int8_static_attn' (JAX clamps out-of-range indices, so "
            "sites 5-7 would silently read site 4's scale)."
        )
    absmaxes = [None] * (8 if quant_attention else 5)

    def quant_rows(x, site):
        x = x.astype(jnp.float32)
        if collect_absmax:
            absmaxes[site] = jnp.max(jnp.abs(x))
        if act_scales is not None:
            sx = act_scales[site]
        else:
            sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0 + _EPS
        return jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8), sx

    def quant_tensor(x, site):
        """Per-tensor symmetric int8 (the attention-operand scheme)."""
        x = x.astype(jnp.float32)
        if collect_absmax:
            absmaxes[site] = jnp.max(jnp.abs(x))
        if act_scales is not None:
            sx = act_scales[site]
        else:
            sx = jnp.max(jnp.abs(x)) / 127.0 + _EPS
        return jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8), sx

    def qdense(x, site, wi8, sw, bias):
        xi8, sx = quant_rows(x, site)
        acc = jax.lax.dot_general(
            xi8, wi8, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * (sx * sw[None]) + bias[None]

    qf = qdense(x_q, 1, w.wq, w.sq, w.bq)
    kf = qdense(x_kv, 0, w.wk, w.sk, w.bk)
    vf = qdense(x_kv, 0, w.wv, w.sv, w.bv)

    def split(x):
        return x.reshape(batch, -1, num_heads, dh).transpose(0, 2, 1, 3)

    maskf = None if kv_mask is None else kv_mask.astype(jnp.float32)
    if quant_attention:
        k_i8, s_ka = quant_tensor(kf, 5)
        v_i8, s_va = quant_tensor(vf, 6)
        q_i8, s_qa = quant_tensor(qf, 7)
        acc = jnp.einsum(
            "bhnd,bhmd->bhnm", split(q_i8), split(k_i8),
            preferred_element_type=jnp.int32,
        )
        logits = acc.astype(jnp.float32) * (s_qa * s_ka * dh**-0.5)
        if maskf is not None:
            logits = logits + (1.0 - maskf)[:, None, None, :] * _NEG_INF
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p_i8 = jnp.round(p * 127.0).astype(jnp.int8)
        o = jnp.einsum(
            "bhnm,bhmd->bhnd", p_i8, split(v_i8),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (s_va / 127.0)
        o = o / denom
    else:
        q, k, v = qf.astype(attn_dtype), kf.astype(attn_dtype), vf.astype(attn_dtype)
        logits = jnp.einsum("bhnd,bhmd->bhnm", split(q), split(k)).astype(jnp.float32) * dh**-0.5
        if maskf is not None:
            logits = logits + (1.0 - maskf)[:, None, None, :] * _NEG_INF
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
    quant_attention: bool = False,
) -> jnp.ndarray:
    """Calibration pass for static-scale PTQ: run the dynamically-quantized
    reference forward and return the [5] per-site activation absmaxes
    (kv, xq, attn, cat, h1) — [8] with ``quant_attention`` (+ k_attn,
    v_attn, q_attn). Static scales = absmax * headroom / 127."""
    _, absmax = xla_reference_layer_int8(
        x_q, x_kv, kv_mask, w, num_heads, use_offset, collect_absmax=True,
        quant_attention=quant_attention,
    )
    return absmax
