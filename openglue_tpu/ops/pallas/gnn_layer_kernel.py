"""Fully-fused attentional-propagation layer as one Pallas TPU kernel.

One GNN layer (reference models/superglue/attention_gnn.py:36-56) is
``desc_q + FFN(concat[desc_q, MHA(desc_q, desc_kv)])``. The unfused path runs
it as ~8 separate XLA ops (q/k/v projections, attention, out projection,
FFN dense -> BN -> dense) with an HBM round-trip between each — measured at
~20% MFU single-chip. This kernel keeps one query block resident in VMEM and
runs the whole layer on it:

  grid = (batch, query blocks); at the first query block of each batch
  element the K/V projections of the full key set are computed once into VMEM
  scratch and reused by the remaining blocks (grid iterates the query-block
  axis innermost, so scratch carries over).

Eval-mode only: BatchNorm inside the FFN uses running statistics, which fold
into a per-channel affine (a = scale/sqrt(var+eps), c = bias - mean*a) — a
pure elementwise op that fuses. Training-mode BN needs batch statistics
across the whole [B, N] set (a cross-grid reduction), so the training path
keeps the composed XLA/Pallas-attention form.

Backward (rarely needed in eval, but defined for safety): custom_vjp that
replays the identical XLA composition and differentiates it.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


class PropagationWeights(NamedTuple):
    """Flattened weights of one AttentionalPropagation layer.

    Dense kernels are flax layout [in, out]; biases are [1, out] (2-D so they
    sit in VMEM without relayout). ``a1``/``c1`` are the folded eval-mode
    BatchNorm affine of the FFN hidden layer.
    """

    wq: jnp.ndarray
    bq: jnp.ndarray
    wk: jnp.ndarray
    bk: jnp.ndarray
    wv: jnp.ndarray
    bv: jnp.ndarray
    wo: jnp.ndarray
    bo: jnp.ndarray
    w1: jnp.ndarray
    b1: jnp.ndarray
    a1: jnp.ndarray
    c1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray


def fold_propagation_weights(
    params: dict,
    batch_stats: dict,
    compute_dtype: jnp.dtype,
    bn_epsilon: float = 1e-5,
) -> PropagationWeights:
    """Build PropagationWeights from an AttentionalPropagation param subtree
    ({'mha': {'q_proj', 'k_proj', 'v_proj', 'out_proj'}, 'ffn': {'dense_0',
    'bn_0', 'dense_1'}}) + its batch_stats, folding the eval BatchNorm."""
    mha, ffn = params["mha"], params["ffn"]

    def dense(p):
        return (
            p["kernel"].astype(compute_dtype),
            p["bias"].astype(jnp.float32).reshape(1, -1),
        )

    wq, bq = dense(mha["q_proj"])
    wk, bk = dense(mha["k_proj"])
    wv, bv = dense(mha["v_proj"])
    wo, bo = dense(mha["out_proj"])
    w1, b1 = dense(ffn["dense_0"])
    w2, b2 = dense(ffn["dense_1"])
    bn = ffn["bn_0"]
    stats = batch_stats["ffn"]["bn_0"]
    a1 = bn["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        stats["var"].astype(jnp.float32) + bn_epsilon
    )
    c1 = bn["bias"].astype(jnp.float32) - stats["mean"].astype(jnp.float32) * a1
    return PropagationWeights(
        wq, bq, wk, bk, wv, bv, wo, bo, w1, b1, a1.reshape(1, -1), c1.reshape(1, -1), w2, b2
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


_ELU_EPS = 1e-6  # ops.attention.linear_attention_elu
_FAVOR_EPS = 1e-8  # ops.attention.favor_features_*
_FEATURE_KINDS = ("linear", "favor_relu", "favor_softmax")


def _elu1p(x):
    """elu(x) + 1 without expm1 (unimplemented in Mosaic TPU lowering)."""
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _layer_kernel(
    x_q_ref, x_kv_ref, mask_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    w1_ref, b1_ref, a1_ref, c1_ref, w2_ref, b2_ref, proj_ref,
    out_ref,
    k_scratch, v_scratch,
    *, num_heads: int, use_offset: bool, scale: float, compute_dtype,
    attention_kind: str, num_features: int,
):
    """Block shapes: x_q [1, BQ, D]; x_kv [1, M, D]; mask [1, 1, M] float;
    proj [F, dh] (FAVOR random projection; 1x1 placeholder otherwise);
    out [1, BQ, D].

    Scratch (persists across query blocks; filled at the first block):
      * softmax: k/v projections [M, D] in compute dtype;
      * feature-map family (linear ELU+1 with F=dh, FAVOR-relu / FAVOR-softmax
        with F=num_features; all O(N)): the per-head KV aggregates stacked as
        [H*F, dh] plus the feature-sum normalizer row [1, H*F] — the key set
        is consumed entirely at the first block.

    Inputs/outputs stay in the descriptor dtype (f32 in the model: the
    residual chain promotes); matmul operands run in ``compute_dtype`` with
    f32 MXU accumulation, mirroring flax Dense(dtype=...)."""
    i = pl.program_id(1)
    dim = wq_ref.shape[0]
    dh = dim // num_heads
    F = num_features
    # additive mask: one add on the logits instead of a select
    mask_add = (1.0 - mask_ref[0]) * _NEG_INF  # [1, M]: 0 valid / -1e9 pad
    data_norm = dh**-0.25  # FAVOR input normalizer (ops.attention)
    ratio = F**-0.5  # FAVOR-softmax estimator scale

    def _favor_proj(xh):
        # (x * dh^-0.25) @ proj^T -> [rows, F] f32
        return jax.lax.dot_general(
            (xh * data_norm).astype(compute_dtype), proj_ref[...].astype(compute_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _features(xh, is_query):
        """Per-head feature map [rows, dh] -> [rows, F] f32 (f32 input).
        Mirrors ops.attention: linear_attention_elu / favor_features_relu /
        favor_features_softmax (query: per-row max of the projection; key:
        global max of the projection over valid keypoints x features)."""
        if attention_kind == "linear":
            return _elu1p(xh) + _ELU_EPS
        ph = _favor_proj(xh)
        if attention_kind == "favor_relu":
            return jax.nn.relu(ph) + _FAVOR_EPS
        diag = 0.5 * jnp.sum(jnp.square(xh * data_norm), axis=1, keepdims=True)
        if is_query:
            stab = jnp.max(ph, axis=1, keepdims=True)
        else:
            stab = jnp.max(ph + jnp.transpose(mask_add), keepdims=True)
        return ratio * (jnp.exp(ph - diag - stab) + _FAVOR_EPS)

    if attention_kind == "softmax":

        @pl.when(i == 0)
        def _project_kv():
            kv = x_kv_ref[0].astype(compute_dtype)
            k_scratch[...] = (_dot(kv, wk_ref[...]) + bk_ref[...]).astype(k_scratch.dtype)
            v_scratch[...] = (_dot(kv, wv_ref[...]) + bv_ref[...]).astype(v_scratch.dtype)

    else:  # feature-map family

        @pl.when(i == 0)
        def _aggregate_kv():
            kv = x_kv_ref[0].astype(compute_dtype)
            k = _dot(kv, wk_ref[...]) + bk_ref[...]  # f32 [M, D]
            v = (_dot(kv, wv_ref[...]) + bv_ref[...]).astype(compute_dtype)
            # zero masked key rows; float transpose (Mosaic cannot transpose
            # an i1 vector) and multiply instead of where
            mask_col = jnp.transpose(mask_ref[0])  # [M, 1]
            for h in range(num_heads):
                sl = slice(h * dh, (h + 1) * dh)
                kf = _features(k[:, sl], is_query=False) * mask_col  # [M, F]
                fsl = slice(h * F, (h + 1) * F)
                k_scratch[fsl, :] = jax.lax.dot_general(
                    kf.astype(compute_dtype), v[:, sl],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [F, dh]
                v_scratch[0, fsl] = jnp.sum(kf, axis=0)

    xq = x_q_ref[0].astype(compute_dtype)  # [BQ, D]
    q = (_dot(xq, wq_ref[...]) + bq_ref[...]).astype(compute_dtype)  # [BQ, D]

    head_outs = []
    if attention_kind == "softmax":
        import os

        # OPENGLUE_BF16_SOFTMAX (trace-time): run the exp epilogue on bf16
        # operands — the exp output feeds the P.V dot in bf16 ANYWAY (same
        # rounding as today); the only numeric change is denom summed from
        # bf16 p (<=0.4% relative on a positive sum, f32 accumulate). The
        # candidate win is packed-lane VPU exp + one fewer [BQ, M] cast
        # pass (VERDICT round-4 #4: the f32 VPU softmax epilogue is ~half
        # the attention time at N=2048).
        bf16_softmax = bool(os.environ.get("OPENGLUE_BF16_SOFTMAX"))
        for h in range(num_heads):
            sl = slice(h * dh, (h + 1) * dh)
            qh = q[:, sl]
            kh = k_scratch[:, sl]
            logits = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + mask_add  # [BQ, M]
            m = jnp.max(logits, axis=1, keepdims=True)
            if bf16_softmax:
                p = jnp.exp((logits - m).astype(jnp.bfloat16))
                denom = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
                o = _dot(p.astype(compute_dtype), v_scratch[:, sl])
            else:
                p = jnp.exp(logits - m)
                denom = jnp.sum(p, axis=1, keepdims=True)
                # normalize AFTER the aggregation: divides [BQ, dh], not [BQ, M]
                o = _dot(p.astype(compute_dtype), v_scratch[:, sl])  # [BQ, dh] f32
            head_outs.append(o / denom)
    else:
        q32 = q.astype(jnp.float32)
        for h in range(num_heads):
            sl = slice(h * dh, (h + 1) * dh)
            fsl = slice(h * F, (h + 1) * F)
            qf = _features(q32[:, sl], is_query=True)  # [BQ, F]
            o = _dot(qf.astype(compute_dtype), k_scratch[fsl, :])  # [BQ, dh] f32
            norm = jnp.sum(
                qf * v_scratch[0, fsl][None, :], axis=1, keepdims=True
            )
            head_outs.append(o / norm)
    attn = jnp.concatenate(head_outs, axis=1).astype(compute_dtype)  # [BQ, D]

    msg = (_dot(attn, wo_ref[...]) + bo_ref[...]).astype(compute_dtype)
    if use_offset:
        cat = jnp.concatenate([xq - msg, msg], axis=1)
    else:
        cat = jnp.concatenate([xq, msg], axis=1)  # [BQ, 2D]
    h1 = jax.nn.relu(_dot(cat, w1_ref[...]) + b1_ref[...])  # f32 [BQ, 2D]
    h1 = (h1 * a1_ref[...] + c1_ref[...]).astype(compute_dtype)  # folded eval BN
    upd = _dot(h1, w2_ref[...]) + b2_ref[...]  # f32 [BQ, D]
    out_ref[0] = (x_q_ref[0].astype(jnp.float32) + upd).astype(out_ref.dtype)


def _forward_pallas(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    w: PropagationWeights,
    num_heads: int,
    use_offset: bool,
    block_q: int,
    interpret: Optional[bool],
    attention_kind: str,
    projection: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    batch, n, dim = x_q.shape
    m = x_kv.shape[1]
    dh = dim // num_heads
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    if attention_kind in ("favor_relu", "favor_softmax"):
        if projection is None:
            raise ValueError(f"{attention_kind} needs the FAVOR projection matrix")
        proj = projection.astype(jnp.float32)
        num_features = proj.shape[0]
    else:
        proj = jnp.zeros((8, dh), jnp.float32)  # unused placeholder
        num_features = dh

    if block_q is None:
        # 1024 measures +2.7% end-to-end at the headline B=16 (1,315 vs
        # 1,281 pairs/s interleaved) but exceeds the 16 MB scoped-VMEM limit
        # at B=32 (OOM by 664 KB, bench/layer_block_sweep.py) — Mosaic's
        # allocator scopes more aggressively on longer grids. B=1 ALSO OOMs
        # at N=1024 block 1024 (by 927 KB — measured in the round-5 B=1
        # latency run; the single-element grid changes the surrounding
        # fusion/liveness). Adaptive: large blocks only at small multi-pair
        # batch.
        block_q = 1024 if 2 <= batch <= 16 else 512
    # large-key-set clamp: the per-step [BQ, M] f32 score block must fit
    # VMEM next to the K/V scratch. 512 measures +2% over 256 at N=2048 B=4
    # (strict interleaved A/B: 12.56/12.62 vs 12.85 ms/batch); 1024 OOMs.
    if m > 1024 and attention_kind == "softmax":
        # B=1's single-element grid scopes even tighter (N=2048 block 512
        # OOMs by 167 KB — round-5 B=1 latency run); B=1 is latency-bound,
        # not block-size-bound, so take 256 there
        block_q = min(block_q, 256 if batch == 1 else 512)
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

    const = lambda *shape: pl.BlockSpec(shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    weight_specs = [
        spec
        for kern, bias in (
            (w.wq, w.bq), (w.wk, w.bk), (w.wv, w.bv), (w.wo, w.bo),
            (w.w1, w.b1), (w.a1, w.c1), (w.w2, w.b2),
        )
        for spec in (const(*kern.shape), const(*bias.shape))
    ]
    # fold the (a1, c1) pair ordering back to the kernel signature order
    # (w1,b1,a1,c1,w2,b2) — the generator above yields exactly that order.

    compute_dtype = w.wq.dtype
    kernel = functools.partial(
        _layer_kernel,
        num_heads=num_heads,
        use_offset=use_offset,
        scale=(dim // num_heads) ** -0.5,
        compute_dtype=compute_dtype,
        attention_kind=attention_kind,
        num_features=num_features,
    )
    if attention_kind == "softmax":
        scratch = [
            pltpu.VMEM((m_pad, dim), compute_dtype),
            pltpu.VMEM((m_pad, dim), compute_dtype),
        ]
    else:  # feature family: per-head KV aggregates + feature-sum normalizer
        scratch = [
            pltpu.VMEM((num_heads * num_features, dh), jnp.float32),
            pltpu.VMEM((1, num_heads * num_features), jnp.float32),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(batch, n_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            *weight_specs,
            const(*proj.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, n_pad, dim), x_q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # qkvo projections + FFN (20*N*D^2) + attention (4*N*M*D) per batch
            flops=batch * (20 * n_pad * dim * dim + 4 * n_pad * m_pad * dim),
            bytes_accessed=(x_q.size + x_kv.size + x_q.size) * x_q.dtype.itemsize,
            transcendentals=batch * n_pad * m_pad,
        ),
    )(x_q, x_kv, mask, *_weights_in_call_order(w), proj)
    return out[:, :n]


def _weights_in_call_order(w: PropagationWeights):
    return (
        w.wq, w.bq, w.wk, w.bk, w.wv, w.bv, w.wo, w.bo,
        w.w1, w.b1, w.a1, w.c1, w.w2, w.b2,
    )


def xla_reference_layer(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    w: PropagationWeights,
    num_heads: int,
    use_offset: bool,
    attention_kind: str = "softmax",
    projection: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Same math as the kernel in plain XLA ops — parity oracle and the
    backward replay for the custom_vjp."""
    dim = x_q.shape[-1]
    dh = dim // num_heads
    dtype = w.wq.dtype  # compute dtype; in/out stay in x_q.dtype

    def dense(x, kern, bias):
        return (
            jax.lax.dot_general(
                x.astype(dtype), kern,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias[None]
        ).astype(dtype)

    q = dense(x_q, w.wq, w.bq)
    k = dense(x_kv, w.wk, w.bk)
    v = dense(x_kv, w.wv, w.bv)

    def split(x):  # [B, L, D] -> [B, H, L, dh]
        b, l, _ = x.shape
        return x.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)

    b, n = x_q.shape[0], x_q.shape[1]
    if attention_kind == "softmax":
        logits = jnp.einsum("bhnd,bhmd->bhnm", split(q), split(k)).astype(jnp.float32) * dh**-0.5
        if kv_mask is not None:
            logits = jnp.where(kv_mask[:, None, None, :], logits, _NEG_INF)
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", p.astype(dtype), split(v))
    elif attention_kind == "linear":  # ELU+1 (ops.attention.linear_attention_elu)
        qf = jax.nn.elu(q.astype(jnp.float32)) + 1.0 + _ELU_EPS
        kf = jax.nn.elu(k.astype(jnp.float32)) + 1.0 + _ELU_EPS
        if kv_mask is not None:
            kf = jnp.where(kv_mask[:, :, None], kf, 0.0)
        qfh, kfh = split(qf.astype(dtype)), split(kf.astype(dtype))
        kv = jnp.einsum("bhmk,bhmd->bhkd", kfh, split(v)).astype(jnp.float32)
        out = jnp.einsum("bhnk,bhkd->bhnd", qfh, kv)
        norm = jnp.einsum("bhnk,bhk->bhn", split(qf), jnp.sum(split(kf), axis=2))
        out = out / norm[..., None]
    else:  # favor_relu / favor_softmax — same math as ops.attention
        from openglue_tpu.ops import attention as attn_ops

        proj32 = projection.astype(jnp.float32)
        qh, kh = split(q).astype(jnp.float32), split(k).astype(jnp.float32)
        if attention_kind == "favor_relu":
            q_feat = attn_ops.favor_features_relu(qh, proj32)
            k_feat = attn_ops.favor_features_relu(kh, proj32)
        else:
            q_feat = attn_ops.favor_features_softmax(qh, proj32, is_query=True)
            k_feat = attn_ops.favor_features_softmax(
                kh, proj32, is_query=False, kv_mask=kv_mask
            )
        out, _ = attn_ops.linear_attention(
            q_feat.astype(dtype), k_feat.astype(dtype), split(v), kv_mask
        )
    attn = out.transpose(0, 2, 1, 3).reshape(b, n, dim).astype(dtype)

    msg = dense(attn, w.wo, w.bo)
    xq_c = x_q.astype(dtype)
    cat = jnp.concatenate([xq_c - msg if use_offset else xq_c, msg], axis=-1)
    h1 = jax.nn.relu(
        jax.lax.dot_general(
            cat, w.w1,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + w.b1[None]
    )
    h1 = (h1 * w.a1[None] + w.c1[None]).astype(dtype)
    upd = (
        jax.lax.dot_general(
            h1, w.w2,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + w.b2[None]
    )
    return (x_q.astype(jnp.float32) + upd).astype(x_q.dtype)


class MessageWeights(NamedTuple):
    """The attention half of a propagation layer: q/k/v/out projections.
    Kernels are flax layout [in, out]; biases [1, out]. Kept in the PARAM
    dtype (f32) — the kernels cast operands to the compute dtype internally
    so weight cotangents come back in full precision."""

    wq: jnp.ndarray
    bq: jnp.ndarray
    wk: jnp.ndarray
    bk: jnp.ndarray
    wv: jnp.ndarray
    bv: jnp.ndarray
    wo: jnp.ndarray
    bo: jnp.ndarray


def extract_message_weights(mha_params: dict) -> MessageWeights:
    """MessageWeights from an MHA param subtree ({'q_proj', 'k_proj',
    'v_proj', 'out_proj'}), in the original param dtype."""

    def dense(p):
        return p["kernel"], p["bias"].astype(jnp.float32).reshape(1, -1)

    wq, bq = dense(mha_params["q_proj"])
    wk, bk = dense(mha_params["k_proj"])
    wv, bv = dense(mha_params["v_proj"])
    wo, bo = dense(mha_params["out_proj"])
    return MessageWeights(wq, bq, wk, bk, wv, bv, wo, bo)


def _attention_half_body(
    x_q_ref, x_kv_ref, mask_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    k_scratch, v_scratch, lse_ref,
    *, num_heads: int, scale: float, compute_dtype,
):
    """Shared attention-half body of the train-path kernels: K/V projection
    into scratch at the first query block, q projection + per-head masked
    softmax attention + out projection for the current block. Returns
    (xq compute-dtype, attn [BQ, D] compute-dtype, msg [BQ, D] f32); writes
    the per-row log-sum-exp into ``lse_ref`` when given (custom_vjp fwd)."""
    i = pl.program_id(1)
    dim = wq_ref.shape[0]
    dh = dim // num_heads
    mask_add = (1.0 - mask_ref[0]) * _NEG_INF  # [1, M]

    @pl.when(i == 0)
    def _project_kv():
        kv = x_kv_ref[0].astype(compute_dtype)
        k_scratch[...] = (
            _dot(kv, wk_ref[...].astype(compute_dtype)) + bk_ref[...]
        ).astype(k_scratch.dtype)
        v_scratch[...] = (
            _dot(kv, wv_ref[...].astype(compute_dtype)) + bv_ref[...]
        ).astype(v_scratch.dtype)

    xq = x_q_ref[0].astype(compute_dtype)
    q = (_dot(xq, wq_ref[...].astype(compute_dtype)) + bq_ref[...]).astype(
        compute_dtype
    )

    head_outs = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        logits = jax.lax.dot_general(
            q[:, sl], k_scratch[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + mask_add  # [BQ, M]
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        o = _dot(p.astype(compute_dtype), v_scratch[:, sl])  # [BQ, dh] f32
        head_outs.append(o / denom)
        if lse_ref is not None:
            lse_ref[0, h] = (m + jnp.log(denom))[:, 0]
    attn = jnp.concatenate(head_outs, axis=1).astype(compute_dtype)
    msg = _dot(attn, wo_ref[...].astype(compute_dtype)) + bo_ref[...]
    return xq, attn, msg


def _message_kernel(
    x_q_ref, x_kv_ref, mask_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    out_ref, *rest,
    num_heads: int, scale: float, compute_dtype, save_stats: bool = False,
):
    """Attention-half forward: q/k/v projections + masked softmax attention +
    out projection, one query block per grid step (the first two thirds of
    _layer_kernel — the training path keeps the FFN/BatchNorm half in XLA
    because train-mode BN needs cross-grid batch statistics).

    ``save_stats`` (the custom_vjp forward): also emit the pre-out-projection
    attention output and the per-row log-sum-exp so the backward kernel skips
    the P·V recompute and the softmax max/sum reductions."""
    if save_stats:
        attn_ref, lse_ref, k_scratch, v_scratch = rest
    else:
        lse_ref = None
        k_scratch, v_scratch = rest
    _, attn, msg = _attention_half_body(
        x_q_ref, x_kv_ref, mask_ref,
        wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
        k_scratch, v_scratch, lse_ref,
        num_heads=num_heads, scale=scale, compute_dtype=compute_dtype,
    )
    if save_stats:
        attn_ref[0] = attn.astype(attn_ref.dtype)
    out_ref[0] = msg.astype(out_ref.dtype)


def _train_half_kernel(
    x_q_ref, x_kv_ref, mask_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    w1_ref, b1_ref,
    z_ref, *rest,
    num_heads: int, scale: float, compute_dtype, use_offset: bool,
    save_stats: bool = False,
):
    """Train-path layer half: attention message + the FFN's first dense+ReLU
    fused in one kernel. Emits ``z = relu(concat[x_q, msg] @ w1 + b1)`` — the
    pre-BatchNorm hidden — so the XLA continuation is just the masked batch
    statistics, the per-channel affine, and the final dense (reference FFN
    order Dense -> ReLU -> BN -> Dense, models/utils.py:48-58). The concat
    never materializes in HBM and dense_0 reads its operands from VMEM.

    ``save_stats``: also emit msg (to rebuild the concat in the backward),
    the pre-out-projection attention output and per-row LSE (consumed by
    _message_bwd_kernel)."""
    if save_stats:
        attn_ref, lse_ref, k_scratch, v_scratch = rest
    else:
        lse_ref = None
        k_scratch, v_scratch = rest
    xq, attn, msg = _attention_half_body(
        x_q_ref, x_kv_ref, mask_ref,
        wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
        k_scratch, v_scratch, lse_ref,
        num_heads=num_heads, scale=scale, compute_dtype=compute_dtype,
    )
    msg_c = msg.astype(compute_dtype)
    if save_stats:
        attn_ref[0] = attn.astype(attn_ref.dtype)
    if use_offset:
        cat = jnp.concatenate([xq - msg_c, msg_c], axis=1)
    else:
        cat = jnp.concatenate([xq, msg_c], axis=1)  # [BQ, 2D]
    z = jax.nn.relu(_dot(cat, w1_ref[...].astype(compute_dtype)) + b1_ref[...])
    z_ref[0] = z.astype(z_ref.dtype)


def _message_bwd_kernel(
    x_q_ref, x_kv_ref, mask_ref, g_ref, attn_ref, lse_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    dxq_ref, dxkv_ref,
    dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref, dwo_ref, dbo_ref,
    k_scratch, v_scratch, dk_acc, dv_acc,
    *, num_heads: int, scale: float, compute_dtype, n_blocks: int,
):
    """Fused backward of the attention half. Per (batch, query block):
    recompute q/k/v in VMEM and rebuild the softmax probabilities from the
    saved log-sum-exp (nothing [N, M] ever touches HBM; the forward-saved
    ``attn`` output skips the P V recompute, the saved ``lse`` skips the
    max/sum reductions — one exp is the only transcendental), then
        dattn = g wo';   dwo += attn' g
        per head: dv += P' dattn;  dP = dattn v';  dS = P(dP - rowsum(dP P));
                  dq = dS k scale; dk += dS' q scale
        dx_q = dq wq';   dwq += x_q' dq
    dk/dv accumulate across query blocks in VMEM scratch; the key-side
    products (dx_kv = dk wk' + dv wv', dwk = x_kv' dk, ...) run once at the
    last block of each batch element. Weight grads accumulate across the
    whole grid into constant-index f32 outputs (TPU grids are sequential)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    dim = wq_ref.shape[0]
    dh = dim // num_heads
    mask_add = (1.0 - mask_ref[0]) * _NEG_INF  # [1, M]

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _zero_weight_grads():
        for ref in (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                    dwo_ref, dbo_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    @pl.when(i == 0)
    def _project_kv():
        kv = x_kv_ref[0].astype(compute_dtype)
        k_scratch[...] = (
            _dot(kv, wk_ref[...].astype(compute_dtype)) + bk_ref[...]
        ).astype(k_scratch.dtype)
        v_scratch[...] = (
            _dot(kv, wv_ref[...].astype(compute_dtype)) + bv_ref[...]
        ).astype(v_scratch.dtype)
        dk_acc[...] = jnp.zeros(dk_acc.shape, dk_acc.dtype)
        dv_acc[...] = jnp.zeros(dv_acc.shape, dv_acc.dtype)

    xq = x_q_ref[0].astype(compute_dtype)
    q = (_dot(xq, wq_ref[...].astype(compute_dtype)) + bq_ref[...]).astype(
        compute_dtype
    )
    g = g_ref[0].astype(jnp.float32)  # [BQ, D] cotangent of msg
    gc = g.astype(compute_dtype)

    # dattn = g @ wo^T; also dbo += colsum(g)
    dattn = jax.lax.dot_general(
        gc, wo_ref[...].astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, D] f32
    dbo_ref[...] += jnp.sum(g, axis=0, keepdims=True)

    # dwo = attn^T @ g from the forward-saved pre-projection output — one
    # [D, D] matmul instead of a per-head P V recompute
    attn_saved = attn_ref[0].astype(compute_dtype)
    dwo_ref[...] += jax.lax.dot_general(
        attn_saved, gc,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dq_cols = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        kh = k_scratch[:, sl]
        vh = v_scratch[:, sl]
        logits = jax.lax.dot_general(
            q[:, sl], kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + mask_add  # [BQ, M]
        p = jnp.exp(logits - lse_ref[0, h][:, None])  # [BQ, M] f32, normalized
        pc = p.astype(compute_dtype)

        dah = dattn[:, sl].astype(compute_dtype)
        dv_acc[:, sl] += jax.lax.dot_general(
            pc, dah,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            dah, vh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, M]
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))  # [BQ, M] f32
        dsc = ds.astype(compute_dtype)
        dq_cols.append(
            jnp.dot(dsc, kh, preferred_element_type=jnp.float32) * scale
        )  # [BQ, dh]
        dk_acc[:, sl] += (
            jax.lax.dot_general(
                dsc, q[:, sl],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )

    dq = jnp.concatenate(dq_cols, axis=1)  # [BQ, D] f32
    dqc = dq.astype(compute_dtype)
    dxq_ref[0] = jax.lax.dot_general(
        dqc, wq_ref[...].astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dxq_ref.dtype)
    dwq_ref[...] += jax.lax.dot_general(
        xq, dqc,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbq_ref[...] += jnp.sum(dq, axis=0, keepdims=True)

    @pl.when(i == n_blocks - 1)
    def _key_side():
        kv = x_kv_ref[0].astype(compute_dtype)
        dkc = dk_acc[...].astype(compute_dtype)
        dvc = dv_acc[...].astype(compute_dtype)
        dxkv = jax.lax.dot_general(
            dkc, wk_ref[...].astype(compute_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            dvc, wv_ref[...].astype(compute_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dxkv_ref[0] = dxkv.astype(dxkv_ref.dtype)
        dwk_ref[...] += jax.lax.dot_general(
            kv, dkc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbk_ref[...] += jnp.sum(dk_acc[...], axis=0, keepdims=True)
        dwv_ref[...] += jax.lax.dot_general(
            kv, dvc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbv_ref[...] += jnp.sum(dv_acc[...], axis=0, keepdims=True)


def _message_shapes(n: int, m: int, block_q: Optional[int]):
    if block_q is None:
        # the backward holds two [BQ, M] f32 intermediates (p and dp) next to
        # the K/V + dK/dV scratch; 512 fits at M <= 1024, halve beyond
        block_q = 512 if m <= 1024 else 256
    block_q = min(block_q, _round_up(n, 128))
    return block_q, _round_up(n, block_q), _round_up(m, 128)


def _message_forward(
    x_q, x_kv, maskf, w: MessageWeights, num_heads, block_q, interpret,
    compute_dtype=None, save_stats: bool = False,
):
    batch, n, dim = x_q.shape
    m = x_kv.shape[1]
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    compute_dtype = jnp.dtype(compute_dtype or x_q.dtype)
    block_q, n_pad, m_pad = _message_shapes(n, m, block_q)

    if n_pad != n:
        x_q = jnp.pad(x_q, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        x_kv = jnp.pad(x_kv, ((0, 0), (0, m_pad - m), (0, 0)))
    mask = jnp.ones((batch, m), jnp.float32) if maskf is None else maskf
    mask = jnp.pad(mask, ((0, 0), (0, m_pad - m)))[:, None, :]

    const = lambda *shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _message_kernel,
        num_heads=num_heads,
        scale=(dim // num_heads) ** -0.5,
        compute_dtype=compute_dtype,
        save_stats=save_stats,
    )
    out_specs = pl.BlockSpec(
        (1, block_q, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((batch, n_pad, dim), compute_dtype)
    if save_stats:
        out_specs = (
            out_specs,
            pl.BlockSpec((1, block_q, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, block_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((batch, n_pad, dim), compute_dtype),
            jax.ShapeDtypeStruct((batch, num_heads, n_pad), jnp.float32),
        )
    out = pl.pallas_call(
        kernel,
        grid=(batch, n_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            *(const(*t.shape) for t in w),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((m_pad, dim), compute_dtype),
            pltpu.VMEM((m_pad, dim), compute_dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=batch * (8 * n_pad * dim * dim + 4 * n_pad * m_pad * dim),
            bytes_accessed=(2 * x_q.size + x_kv.size) * x_q.dtype.itemsize,
            transcendentals=batch * n_pad * m_pad,
        ),
    )(x_q, x_kv, mask, *w)
    if save_stats:
        out, attn, lse = out
        return out[:, :n], attn, lse  # attn/lse stay n_pad-padded for bwd
    return out[:, :n]


def _message_backward(
    x_q, x_kv, maskf, w: MessageWeights, g, attn, lse, num_heads, block_q,
    interpret, compute_dtype=None,
):
    batch, n, dim = x_q.shape
    m = x_kv.shape[1]
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    compute_dtype = jnp.dtype(compute_dtype or x_q.dtype)
    if m > 1024:
        # the backward holds P, dP, and the dK/dV accumulators live next to
        # the K/V scratch; at M=2048 the forward's 256-row block overruns the
        # 16 MB scoped VMEM by 920 KB (measured round-5 compile OOM) — halve
        # the backward block only
        block_q = min(block_q or 128, 128)
    block_q, n_pad, m_pad = _message_shapes(n, m, block_q)

    if n_pad != n:
        x_q = jnp.pad(x_q, ((0, 0), (0, n_pad - n), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        x_kv = jnp.pad(x_kv, ((0, 0), (0, m_pad - m), (0, 0)))
    mask = jnp.ones((batch, m), jnp.float32) if maskf is None else maskf
    mask = jnp.pad(mask, ((0, 0), (0, m_pad - m)))[:, None, :]

    const = lambda *shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _message_bwd_kernel,
        num_heads=num_heads,
        scale=(dim // num_heads) ** -0.5,
        compute_dtype=compute_dtype,
        n_blocks=n_pad // block_q,
    )
    wgrad_specs = []
    wgrad_shapes = []
    for t in w:
        wgrad_specs.append(const(*t.shape))
        wgrad_shapes.append(jax.ShapeDtypeStruct(t.shape, jnp.float32))
    dxq, dxkv, *dw = pl.pallas_call(
        kernel,
        grid=(batch, n_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, block_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            *(const(*t.shape) for t in w),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            *wgrad_specs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, n_pad, dim), x_q.dtype),
            jax.ShapeDtypeStruct((batch, m_pad, dim), x_kv.dtype),
            *wgrad_shapes,
        ),
        scratch_shapes=[
            pltpu.VMEM((m_pad, dim), compute_dtype),  # k
            pltpu.VMEM((m_pad, dim), compute_dtype),  # v
            pltpu.VMEM((m_pad, dim), jnp.float32),  # dk accumulator
            pltpu.VMEM((m_pad, dim), jnp.float32),  # dv accumulator
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=batch * (24 * n_pad * dim * dim + 12 * n_pad * m_pad * dim),
            bytes_accessed=4 * x_q.size * x_q.dtype.itemsize,
            transcendentals=batch * n_pad * m_pad,
        ),
    )(x_q, x_kv, mask, g, attn, lse, *w)
    dw = MessageWeights(*[d.astype(t.dtype) for d, t in zip(dw, w)])
    return dxq[:, :n], dxkv[:, :m], dw


def xla_reference_message(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    w: MessageWeights,
    num_heads: int,
    compute_dtype=None,
) -> jnp.ndarray:
    """Attention-half math in plain XLA — parity oracle for the message
    kernels (mirrors MultiheadAttention's softmax path, models/gnn.py)."""
    dim = x_q.shape[-1]
    dh = dim // num_heads
    dtype = compute_dtype or x_q.dtype

    def dense(x, kern, bias):
        return (
            jax.lax.dot_general(
                x.astype(dtype), kern.astype(dtype),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias[None]
        ).astype(dtype)

    q = dense(x_q, w.wq, w.bq)
    k = dense(x_kv, w.wk, w.bk)
    v = dense(x_kv, w.wv, w.bv)

    def split(x):
        b, l, _ = x.shape
        return x.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)

    b, n = x_q.shape[0], x_q.shape[1]
    logits = jnp.einsum("bhnd,bhmd->bhnm", split(q), split(k)).astype(jnp.float32) * dh**-0.5
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, _NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", p.astype(dtype), split(v))
    attn = out.transpose(0, 2, 1, 3).reshape(b, n, dim).astype(dtype)
    return dense(attn, w.wo, w.bo)


def _train_half_forward(
    x_q, x_kv, maskf, w: MessageWeights, w1, b1, num_heads, use_offset,
    block_q, interpret, compute_dtype=None, save_stats: bool = False,
):
    batch, n, dim = x_q.shape
    m = x_kv.shape[1]
    hidden = w1.shape[1]
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    compute_dtype = jnp.dtype(compute_dtype or x_q.dtype)
    block_q, n_pad, m_pad = _message_shapes(n, m, block_q)

    if n_pad != n:
        x_q = jnp.pad(x_q, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        x_kv = jnp.pad(x_kv, ((0, 0), (0, m_pad - m), (0, 0)))
    mask = jnp.ones((batch, m), jnp.float32) if maskf is None else maskf
    mask = jnp.pad(mask, ((0, 0), (0, m_pad - m)))[:, None, :]

    const = lambda *shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _train_half_kernel,
        num_heads=num_heads,
        scale=(dim // num_heads) ** -0.5,
        compute_dtype=compute_dtype,
        use_offset=use_offset,
        save_stats=save_stats,
    )
    blk = lambda cols: pl.BlockSpec(
        (1, block_q, cols), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    out_specs = blk(hidden)
    out_shape = jax.ShapeDtypeStruct((batch, n_pad, hidden), compute_dtype)
    if save_stats:
        out_specs = (
            out_specs,
            blk(dim),
            pl.BlockSpec((1, num_heads, block_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((batch, n_pad, dim), compute_dtype),
            jax.ShapeDtypeStruct((batch, num_heads, n_pad), jnp.float32),
        )
    out = pl.pallas_call(
        kernel,
        grid=(batch, n_pad // block_q),
        in_specs=[
            blk(dim),
            pl.BlockSpec((1, m_pad, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            *(const(*t.shape) for t in w),
            const(*w1.shape),
            const(*b1.shape),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((m_pad, dim), compute_dtype),
            pltpu.VMEM((m_pad, dim), compute_dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=batch
            * (8 * n_pad * dim * dim + 4 * n_pad * m_pad * dim + 4 * n_pad * dim * hidden),
            bytes_accessed=(2 * x_q.size + x_kv.size) * x_q.dtype.itemsize,
            transcendentals=batch * n_pad * m_pad,
        ),
    )(x_q, x_kv, mask, *w, w1, b1)
    if save_stats:
        z, attn, lse = out
        return z[:, :n], attn, lse  # attn/lse stay padded for bwd
    return out[:, :n]


def xla_reference_train_half(
    x_q, x_kv, kv_mask, w: MessageWeights, w1, b1, num_heads,
    use_offset: bool = False, compute_dtype=None,
):
    """Train-half math (attention message + concat + dense_0 + ReLU) in plain
    XLA — parity oracle for fused_train_layer_half."""
    dtype = jnp.dtype(compute_dtype or x_q.dtype)
    msg = xla_reference_message(x_q, x_kv, kv_mask, w, num_heads, dtype)
    xq_c = x_q.astype(dtype)
    cat = jnp.concatenate([xq_c - msg if use_offset else xq_c, msg], axis=-1)
    s = (
        jax.lax.dot_general(
            cat, w1.astype(dtype),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1[None]
    )
    return jax.nn.relu(s).astype(dtype)


def fused_train_layer_half(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    weights: MessageWeights,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    num_heads: int,
    use_offset: bool = False,
    block_q: Optional[int] = None,
    interpret: Optional[bool] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Train-path layer half as one fused kernel: attention message AND the
    FFN's first dense+ReLU, returning ``z = relu(concat[x_q, msg] @ w1 + b1)``
    [B, N, 2D]. The caller finishes the layer in XLA: masked train-mode
    BatchNorm on z (batch statistics are two cheap reductions over the
    materialized z), then dense_1 and the residual add — autodiff handles the
    BN-statistics gradient there, while this function's custom_vjp handles the
    fused half: an XLA prologue (ReLU mask, dcat = ds W1', dW1 = cat' ds) that
    peels the cotangent back to dmsg, then the fused attention backward kernel
    (_message_bwd_kernel) with its saved attn+lse residuals.

    w1 [2D, 2D] / b1 [1, 2D] in the PARAM dtype (f32); weight cotangents
    return in full precision. Masks travel as primal float arguments (zero
    cotangent) so the kernels compose with jax.checkpoint.
    Reference layer math: models/superglue/attention_gnn.py:36-56 +
    models/utils.py:48-58 (Dense -> ReLU -> BN -> Dense)."""
    maskf = None if kv_mask is None else kv_mask.astype(jnp.float32)
    dim = x_q.shape[-1]
    cdt = jnp.dtype(compute_dtype or x_q.dtype)

    @jax.custom_vjp
    def f(x_q, x_kv, w, w1, b1, mk):
        return _train_half_forward(
            x_q, x_kv, mk, w, w1, b1, num_heads, use_offset, block_q,
            interpret, cdt,
        )

    def f_fwd(x_q, x_kv, w, w1, b1, mk):
        z, attn, lse = _train_half_forward(
            x_q, x_kv, mk, w, w1, b1, num_heads, use_offset, block_q,
            interpret, cdt, save_stats=True,
        )
        return z, (x_q, x_kv, w, w1, b1, mk, z, attn, lse)

    def f_bwd(residuals, dz):
        x_q, x_kv, w, w1, b1, mk, z, attn, lse = residuals
        n = x_q.shape[1]
        # XLA prologue: peel the FFN first half off the cotangent. The concat
        # never materializes: w1 is consumed in row halves and dw1 assembled
        # from per-operand blocks (the first train-half cut materialized cat
        # [B, N, 2D] + dcat and measured SLOWER than the attention-half-only
        # kernel, 313 vs 328 pairs/s — bench/train_half_ab.py round 4).
        ds_c = jnp.where(z > 0, dz, 0.0).astype(cdt)  # [B, N, 2D]
        wh = w1.astype(cdt)

        def dotT(a, b):  # a [B, N, X] @ b[rows X] -> [B, N, rows]
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        d_first = dotT(ds_c, wh[:dim])    # cotangent of cat[..., :D]
        d_second = dotT(ds_c, wh[dim:])   # cotangent of cat[..., D:]
        if use_offset:  # cat = [x_q - msg, msg]
            dxq_direct = d_first
            dmsg = d_second - d_first
        else:  # cat = [x_q, msg]
            dxq_direct = d_first
            dmsg = d_second

        # msg rebuilt from the saved pre-projection attention output (one
        # [B*N, D] @ [D, D] matmul — cheaper than an HBM round-trip of a
        # third forward output)
        msg = (
            jax.lax.dot_general(
                attn[:, :n], w.wo.astype(cdt),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + w.bo[None]
        ).astype(cdt)

        def block(a):  # [B, N, D]^T @ ds over (B, N) -> [D, 2D]
            return jax.lax.dot_general(
                a.astype(cdt), ds_c,
                dimension_numbers=(((0, 1), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        e_x = block(x_q)
        e_m = block(msg)
        dw1 = jnp.concatenate([e_x - e_m if use_offset else e_x, e_m], axis=0)
        db1 = jnp.sum(ds_c.astype(jnp.float32), axis=(0, 1))[None, :]
        dxq_attn, dxkv, dw = _message_backward(
            x_q, x_kv, mk, w, dmsg.astype(cdt), attn, lse, num_heads,
            block_q, interpret, cdt,
        )
        dm = None if mk is None else jnp.zeros_like(mk)
        return (
            (dxq_attn.astype(jnp.float32) + dxq_direct).astype(x_q.dtype),
            dxkv.astype(x_kv.dtype),
            dw,
            dw1.astype(w1.dtype),
            db1.astype(b1.dtype),
            dm,
        )

    f.defvjp(f_fwd, f_bwd)
    return f(x_q, x_kv, weights, w1, b1, maskf)


def fused_attention_message(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    weights: MessageWeights,
    num_heads: int,
    block_q: Optional[int] = None,
    interpret: Optional[bool] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """The attention half of a propagation layer (projections + masked
    softmax attention + out projection) as one fused kernel with a FUSED
    BACKWARD kernel — the training path's replacement for the eval-only
    whole-layer kernel (train-mode BatchNorm lives in the XLA FFN half where
    autodiff handles the batch statistics).

    x_q [B, N, D] in the compute dtype (bf16 in the model); weights in the
    PARAM dtype (f32) so the weight cotangents return in full precision.
    Returns msg [B, N, D] in x_q.dtype. Masks travel as primal float
    arguments (zero cotangent) so the kernels compose with jax.checkpoint.
    """
    maskf = None if kv_mask is None else kv_mask.astype(jnp.float32)

    @jax.custom_vjp
    def f(x_q, x_kv, w, mk):
        return _message_forward(
            x_q, x_kv, mk, w, num_heads, block_q, interpret, compute_dtype
        )

    def f_fwd(x_q, x_kv, w, mk):
        out, attn, lse = _message_forward(
            x_q, x_kv, mk, w, num_heads, block_q, interpret, compute_dtype,
            save_stats=True,
        )
        return out, (x_q, x_kv, w, mk, attn, lse)

    def f_bwd(residuals, g):
        x_q, x_kv, w, mk, attn, lse = residuals
        dxq, dxkv, dw = _message_backward(
            x_q, x_kv, mk, w, g, attn, lse, num_heads, block_q, interpret,
            compute_dtype,
        )
        dm = None if mk is None else jnp.zeros_like(mk)
        return dxq.astype(x_q.dtype), dxkv.astype(x_kv.dtype), dw, dm

    f.defvjp(f_fwd, f_bwd)
    return f(x_q, x_kv, weights, maskf)


def fused_attention_propagation(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    weights: PropagationWeights,
    num_heads: int,
    use_offset: bool = False,
    block_q: Optional[int] = None,
    interpret: Optional[bool] = None,
    attention_kind: str = "softmax",
    projection: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One eval-mode AttentionalPropagation layer, fused. x_q [B, N, D],
    x_kv [B, M, D], kv_mask [B, M] bool or None -> [B, N, D].
    ``attention_kind``: "softmax", "linear" (ELU+1 feature map), or
    "favor_relu"/"favor_softmax" (Performer; pass the [F, dh] orthogonal
    ``projection`` — treated as a constant, matching the non-trainable
    favor_projections variable collection).
    block_q: 1024 measures ~2% faster at the flagship B=16/N=1024 shape
    (116 vs 114 TFLOP/s, bench/layer_block_sweep.py) but exceeds the 16 MB
    scoped-VMEM limit at B=32 (measured OOM by 664 KB), so 512 stays the
    default; the per-step score block is clamped to 256 rows when the key
    set exceeds 1024 (VMEM)."""
    if attention_kind not in ("softmax",) + _FEATURE_KINDS:
        raise ValueError(f"unsupported attention_kind {attention_kind!r}")
    # mask/projection travel as primal arguments (zero cotangents), not
    # closures: closed-over tracers escape jax.checkpoint when the caller is
    # rematerialized (same fix as attention_kernel.masked_softmax_attention)
    maskf = None if kv_mask is None else kv_mask.astype(jnp.float32)

    @jax.custom_vjp
    def f(x_q, x_kv, w, mk, pr):
        return _forward_pallas(
            x_q, x_kv, mk, w, num_heads, use_offset, block_q, interpret,
            attention_kind, pr,
        )

    def f_fwd(x_q, x_kv, w, mk, pr):
        return f(x_q, x_kv, w, mk, pr), (x_q, x_kv, w, mk, pr)

    def f_bwd(residuals, g):
        x_q, x_kv, w, mk, pr = residuals
        _, vjp = jax.vjp(
            lambda a, b, c: xla_reference_layer(
                a, b, None if mk is None else mk > 0.5, c, num_heads,
                use_offset, attention_kind, pr,
            ),
            x_q, x_kv, w,
        )
        dm = None if mk is None else jnp.zeros_like(mk)
        dp = None if pr is None else jnp.zeros_like(pr)
        return (*vjp(g), dm, dp)

    f.defvjp(f_fwd, f_bwd)
    return f(x_q, x_kv, weights, maskf, projection)
