"""Attentional GNN over the two keypoint graphs.

Structure mirrors reference models/superglue/attention_gnn.py:8-93:
``num_stages`` x (self-attention layer, cross-attention layer); each layer is a
residual message-passing update ``desc + FFN(concat[desc, message])`` where the
message is multi-head attention with q from the target graph and k=v from the
source graph. Semantics preserved for parity:

  * each self/cross layer applies ONE weight-shared module to both images
    (reference attention_gnn.py:63-66);
  * cross-attention is sequential — image1 attends to the ALREADY-UPDATED
    image0 descriptors (reference attention_gnn.py:74-77);
  * optional "offset attention" concat ``[desc - msg, msg]``
    (reference attention_gnn.py:49-55).

TPU-first differences: channels-last [B, N, D], mask-aware attention and
masked BatchNorm statistics, FAVOR projections held in a mutable
``favor_projections`` collection so the train loop redraws them by folding the
step into the RNG (the reference redraws via a Lightning callback mutating a
torch buffer, utils/lightning_callbacks.py:10-14).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openglue_tpu.models.layers import FeedForwardNet, torch_dense
from openglue_tpu.ops import attention as attn_ops

ATTENTION_KINDS = ("softmax", "linear", "favor_relu", "favor_softmax")


class MultiheadAttention(nn.Module):
    """Multi-head attention with pluggable score mechanisms
    (reference attention_gnn.py:8-32 + attention.py:8-118).

    ``ring_axis``: name of a mesh axis to run softmax attention as the
    hand-scheduled ring schedule (parallel.ring) under shard_map — queries
    stay on their keypoint shard, K/V blocks rotate over ICI. Composes inside
    a jitted model whose inputs are sharded on that axis (context
    parallelism); the jit must run under ``jax.set_mesh(mesh)`` so the nested
    shard_map resolves the axis. None = let XLA/GSPMD partition the einsums."""

    embed_dim: int
    num_heads: int
    attention: str = "softmax"
    favor_num_features: Optional[int] = None  # default 2*head_dim
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    ring_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        query_input: jnp.ndarray,
        kv_input: jnp.ndarray,
        kv_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if self.attention not in ATTENTION_KINDS:
            raise ValueError(
                f"Attention type {self.attention!r} is not supported; choose from {ATTENTION_KINDS}"
            )
        batch, n, _ = query_input.shape
        m = kv_input.shape[1]
        head_dim = self.embed_dim // self.num_heads

        # torch Conv1d default init (training parity — see layers.torch_dense)
        dense = lambda name: torch_dense(
            self.embed_dim, self.embed_dim, dtype=self.dtype, name=name
        )
        # [B, N, D] -> [B, H, N, Dh]; channel c maps to head c // Dh, matching
        # the reference's view(B, H, Dh, N) channel grouping for weight import.
        def split_heads(x, length):
            return x.reshape(batch, length, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split_heads(dense("q_proj")(query_input), n)
        k = split_heads(dense("k_proj")(kv_input), m)
        v = split_heads(dense("v_proj")(kv_input), m)

        if self.attention == "softmax":
            if self.ring_axis is not None:
                out = self._ring_attention(q, k, v, kv_mask, batch, m)
            elif self.use_pallas:
                from openglue_tpu.ops.pallas import (
                    attention_kernel,
                    use_pallas_for_shape,
                )

                # shape dispatch: XLA wins below ~512 keypoints, so
                # use_pallas=True is never a regression (BASELINE.md sweep)
                if use_pallas_for_shape(n, m):
                    out = attention_kernel.masked_softmax_attention(q, k, v, kv_mask)
                else:
                    out, _ = attn_ops.softmax_attention(q, k, v, kv_mask)
            else:
                out, _ = attn_ops.softmax_attention(q, k, v, kv_mask)
        elif self.attention == "linear":
            out, _ = attn_ops.linear_attention_elu(q, k, v, kv_mask)
        else:
            num_features = self.favor_num_features or 2 * head_dim
            projection = self.variable(
                "favor_projections",
                "projection",
                lambda: attn_ops.sample_orthogonal_random_matrix(
                    self.make_rng("params") if self.is_initializing() else jax.random.key(0),
                    num_features,
                    head_dim,
                ),
            )
            proj = projection.value.astype(q.dtype)
            if self.attention == "favor_relu":
                q_feat = attn_ops.favor_features_relu(q, proj)
                k_feat = attn_ops.favor_features_relu(k, proj)
            else:  # favor_softmax
                q_feat = attn_ops.favor_features_softmax(q, proj, is_query=True)
                k_feat = attn_ops.favor_features_softmax(k, proj, is_query=False, kv_mask=kv_mask)
            out, _ = attn_ops.linear_attention(q_feat, k_feat, v, kv_mask)

        out = out.transpose(0, 2, 1, 3).reshape(batch, n, self.embed_dim)
        return dense("out_proj")(out)

    def _ring_attention(self, q, k, v, kv_mask, batch, m):
        """Hand-scheduled ring attention under shard_map over ``ring_axis``
        (nested inside the jitted model; keypoint axes sharded on that axis)."""
        from functools import partial

        from jax.sharding import PartitionSpec as P

        from openglue_tpu.parallel.ring import ring_softmax_attention

        if kv_mask is None:
            kv_mask = jnp.ones((batch, m), dtype=bool)
        axis = self.ring_axis
        fn = jax.shard_map(
            partial(
                ring_softmax_attention, axis_name=axis, use_pallas=self.use_pallas
            ),
            in_specs=(P(None, None, axis), P(None, None, axis),
                      P(None, None, axis), P(None, axis)),
            out_specs=P(None, None, axis),
            axis_names={axis},
            # pallas interpret mode (CPU-mesh tests) trips the vma checker on
            # its internal dynamic_slices; numerics are covered by the ring
            # parity tests
            check_vma=not self.use_pallas,
        )
        return fn(q, k, v, kv_mask)


class AttentionalPropagation(nn.Module):
    """Residual attention message propagation
    (reference attention_gnn.py:36-56)."""

    embed_dim: int
    num_heads: int
    attention: str = "softmax"
    use_offset: bool = False
    favor_num_features: Optional[int] = None
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    ring_axis: Optional[str] = None
    quantize: Optional[str] = None  # "int8": serving path on the int8 MXU

    @nn.compact
    def __call__(
        self,
        desc_q: jnp.ndarray,
        desc_kv: jnp.ndarray,
        q_mask: Optional[jnp.ndarray] = None,
        kv_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        fused = self._fused_layer(desc_q, desc_kv, kv_mask, train)
        if fused is not None:
            return fused
        z = self._fused_train_half(desc_q, desc_kv, kv_mask, train)
        if z is not None:
            # the kernel already did concat + dense_0 + ReLU; finish with the
            # masked train-mode BatchNorm + dense_1 in XLA (autodiff owns the
            # batch-statistics gradient) and the residual add
            update = FeedForwardNet(
                (2 * self.embed_dim, self.embed_dim), dtype=self.dtype, name="ffn"
            )(z, mask=q_mask, train=train, skip_to_hidden=True)
            return desc_q + update
        message = self._fused_message(desc_q, desc_kv, kv_mask, train)
        if message is None:
            message = MultiheadAttention(
                self.embed_dim,
                self.num_heads,
                self.attention,
                self.favor_num_features,
                self.dtype,
                self.use_pallas,
                self.ring_axis,
                name="mha",
            )(desc_q, desc_kv, kv_mask)
        if self.use_offset:
            message = jnp.concatenate([desc_q - message, message], axis=-1)
        else:
            message = jnp.concatenate([desc_q, message], axis=-1)
        update = FeedForwardNet(
            (2 * self.embed_dim, self.embed_dim), dtype=self.dtype, name="ffn"
        )(message, mask=q_mask, train=train)
        return desc_q + update

    def _fused_train_half(self, desc_q, desc_kv, kv_mask, train):
        """TRAIN-mode fused layer half (ops/pallas/gnn_layer_kernel.py
        fused_train_layer_half): q/k/v/out projections + masked softmax
        attention + the FFN's dense_0+ReLU in one kernel, returning the
        pre-BatchNorm hidden z. The BN (batch statistics) + dense_1 +
        residual stay in XLA.

        OPT-IN (env OPENGLUE_TRAIN_HALF, read at trace time): the flagship
        interleaved A/B measured it a WASH vs the attention-half-only kernel
        (327 vs 328 pairs/s, bench/train_half_ab.py round 4) — XLA already
        fuses concat+dense_0+ReLU optimally, and the z/attn/lse outputs cost
        what the saved passes buy. The default train route stays the simpler
        _fused_message. Returns None when not routed."""
        if (
            self.attention != "softmax"
            or not self.use_pallas
            or self.ring_axis is not None
            or not train
            or self.is_initializing()
        ):
            return None
        import os

        if not os.environ.get("OPENGLUE_TRAIN_HALF"):
            return None
        if os.environ.get("OPENGLUE_NO_FUSED_MESSAGE") or os.environ.get(
            "OPENGLUE_FUSED_MESSAGE_ONLY"
        ):
            # bench/debug escapes (read at trace time, for A/B measurement
            # subprocesses): NO_FUSED_MESSAGE = fully composed train path;
            # FUSED_MESSAGE_ONLY = round-3 attention-half-only kernel
            return None
        from openglue_tpu.ops.pallas import use_pallas_for_shape
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        if not use_pallas_for_shape(desc_q.shape[1], desc_kv.shape[1]):
            return None
        params = self.variables.get("params", {})
        if "mha" not in params or "ffn" not in params:
            return None
        if "dense_0" not in params["ffn"]:
            return None
        weights = glk.extract_message_weights(params["mha"])
        d0 = params["ffn"]["dense_0"]
        compute_dtype = self.dtype or desc_q.dtype
        return glk.fused_train_layer_half(
            desc_q.astype(compute_dtype),
            desc_kv.astype(compute_dtype),
            kv_mask,
            weights,
            d0["kernel"],
            d0["bias"].astype(jnp.float32).reshape(1, -1),
            num_heads=self.num_heads,
            use_offset=self.use_offset,
            compute_dtype=compute_dtype,
        )

    def _fused_message(self, desc_q, desc_kv, kv_mask, train):
        """TRAIN-mode fused attention half (ops/pallas/gnn_layer_kernel.py
        fused_attention_message): q/k/v/out projections + masked softmax
        attention in one kernel with a FUSED BACKWARD kernel. The FFN half
        (with its batch-statistics BatchNorm) stays in XLA where autodiff
        handles the cross-batch reductions. Returns None when not routed
        (eval mode uses the whole-layer kernel instead)."""
        if (
            self.attention != "softmax"
            or not self.use_pallas
            or self.ring_axis is not None
            or not train
            or self.is_initializing()
        ):
            return None
        import os

        if os.environ.get("OPENGLUE_NO_FUSED_MESSAGE"):
            # bench/debug escape: route the train path through the composed
            # MHA (read at trace time; for A/B measurement subprocesses)
            return None
        from openglue_tpu.ops.pallas import use_pallas_for_shape
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        if not use_pallas_for_shape(desc_q.shape[1], desc_kv.shape[1]):
            return None
        params = self.variables.get("params", {})
        if "mha" not in params:
            return None
        weights = glk.extract_message_weights(params["mha"])
        compute_dtype = self.dtype or desc_q.dtype
        return glk.fused_attention_message(
            desc_q.astype(compute_dtype),
            desc_kv.astype(compute_dtype),
            kv_mask,
            weights,
            num_heads=self.num_heads,
            compute_dtype=compute_dtype,
        )

    def _fused_layer(self, desc_q, desc_kv, kv_mask, train):
        """Whole-layer Pallas kernel (ops/pallas/gnn_layer_kernel.py):
        projections + attention (softmax / linear / FAVOR) + FFN fused in
        VMEM. Eval-mode only (BN folds to an affine there); init and small
        shapes take the composed path. Returns None when not applicable."""
        if (
            self.attention not in ("softmax", "linear", "favor_relu", "favor_softmax")
            or not self.use_pallas
            or self.ring_axis is not None
            or train
            or self.is_initializing()
        ):
            return None
        from openglue_tpu.ops.pallas import fused_dispatch_forced, use_pallas_for_shape
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        if not use_pallas_for_shape(desc_q.shape[1], desc_kv.shape[1]):
            return None
        if not fused_dispatch_forced():
            if self.attention == "favor_relu" and desc_kv.shape[1] <= 1024:
                # the F=2*dh feature maps make the fused FAVOR-relu kernel
                # lose to XLA's batched einsums below eval scale (0.96x at
                # N=1024, 1.07x at N=2048 — BASELINE.md sweep)
                return None
            if self.attention == "favor_softmax":
                # the exp-heavy estimator map is faster as XLA batched einsums
                # at every measured size (0.71x fused at N=2048); the Pallas
                # win for this variant comes from the Sinkhorn kernel (1.23x
                # end to end at N=1024), which the composed path still uses
                return None
        variables = self.variables
        params = variables.get("params", {})
        if "mha" not in params or "ffn" not in params:
            return None
        projection = None
        if self.attention in ("favor_relu", "favor_softmax"):
            # the non-trainable orthogonal projection the composed path holds
            # in the favor_projections collection (redrawn by the train loop)
            favor = variables.get("favor_projections", {})
            if "mha" not in favor:
                return None
            projection = favor["mha"]["projection"]
        compute_dtype = self.dtype or desc_q.dtype
        weights = glk.fold_propagation_weights(
            params, variables["batch_stats"], compute_dtype
        )
        if (
            self.quantize in ("int8", "int8_static", "int8_attn", "int8_static_attn")
            and self.attention == "softmax"
        ):
            from openglue_tpu.ops.pallas import gnn_layer_int8 as gli8

            # *_attn: the attention contractions (qk^T, P.V) run int8 too —
            # the dh=64-narrow dots dominate at eval scale N=2048 and double
            # their MXU rate at int8 (ops/pallas/gnn_layer_int8.py)
            quant_attention = self.quantize.endswith("_attn")
            static = self.quantize.startswith("int8_static")
            qweights = gli8.quantize_propagation_weights(weights)
            act_scales = None
            if static:
                # static-scale PTQ: per-tensor activation scales live in the
                # "int8_calib" collection. Calibration = one apply with
                # mutable=["int8_calib"] on representative batches (running
                # max across calls); serving then skips every in-kernel
                # absmax reduction (~0.8 ms/batch at the serving headline —
                # BASELINE.md round-3 int8 disposition).
                n_sites = 8 if quant_attention else 5
                calib = self.variable(
                    "int8_calib", "act_absmax",
                    lambda: jnp.zeros((n_sites,), jnp.float32),
                )
                if self.is_mutable_collection("int8_calib"):
                    absmax = gli8.reference_activation_absmax(
                        desc_q, desc_kv, kv_mask, qweights,
                        num_heads=self.num_heads, use_offset=self.use_offset,
                        quant_attention=quant_attention,
                    )
                    calib.value = jnp.maximum(calib.value, absmax)
                    # the calibration pass serves through the dynamic path
                else:
                    if calib.value.shape[0] != n_sites:
                        # a checkpoint calibrated under the other int8_static
                        # flavor restores the wrong-length vector; the kernel
                        # would otherwise zero-fill the attention sites into
                        # ~1e-12 scales (silently wrong attention)
                        raise ValueError(
                            f"int8_calib/act_absmax has {calib.value.shape[0]} "
                            f"sites but quantize={self.quantize!r} needs "
                            f"{n_sites} — re-run calibration under this "
                            "quantize mode."
                        )
                    # 10% headroom absorbs mild calibration/serving drift;
                    # out-of-range values saturate (standard symmetric PTQ)
                    act_scales = calib.value * (1.1 / 127.0) + 1e-12
            return gli8.fused_attention_propagation_int8(
                desc_q, desc_kv, kv_mask, qweights,
                num_heads=self.num_heads, use_offset=self.use_offset,
                act_scales=act_scales, quant_attention=quant_attention,
            )
        return glk.fused_attention_propagation(
            desc_q, desc_kv, kv_mask, weights,
            num_heads=self.num_heads, use_offset=self.use_offset,
            attention_kind=self.attention, projection=projection,
        )


class AttentionGNN(nn.Module):
    """num_stages x (self + cross) attention over both keypoint graphs
    (reference attention_gnn.py:59-93).

    ``remat=True`` rematerializes each propagation layer under jax.checkpoint
    (activations recomputed in backward — trades ~30% more FLOPs for O(1)
    stage activations; lets batch x N scale past HBM on deep stacks)."""

    num_stages: int
    embed_dim: int
    num_heads: int
    attention: str = "softmax"
    use_offset: bool = False
    favor_num_features: Optional[int] = None
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    remat: bool = False
    ring_axis: Optional[str] = None
    quantize: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        desc0: jnp.ndarray,
        desc1: jnp.ndarray,
        mask0: Optional[jnp.ndarray] = None,
        mask1: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kwargs = dict(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            attention=self.attention,
            use_offset=self.use_offset,
            favor_num_features=self.favor_num_features,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            ring_axis=self.ring_axis,
            quantize=self.quantize,
        )
        layer_cls = (
            nn.remat(AttentionalPropagation, static_argnums=(5,))
            if self.remat
            else AttentionalPropagation
        )
        for stage in range(self.num_stages):
            # One module applied to both images => shared weights (reference
            # attention_gnn.py:63-66).
            self_layer = layer_cls(**kwargs, name=f"self_{stage}")
            desc0 = self_layer(desc0, desc0, mask0, mask0, train)
            desc1 = self_layer(desc1, desc1, mask1, mask1, train)

            # Sequential cross attention: image1 sees updated desc0 (reference
            # attention_gnn.py:74-77).
            cross_layer = layer_cls(**kwargs, name=f"cross_{stage}")
            desc0 = cross_layer(desc0, desc1, mask0, mask1, train)
            desc1 = cross_layer(desc1, desc0, mask1, mask0, train)
        return desc0, desc1
