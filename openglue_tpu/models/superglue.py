"""The SuperGlue matcher head (reference models/superglue/superglue.py:11-111).

Pipeline: normalize keypoints to [-1, 1] -> MLP positional encoding added to
local descriptors -> attentional GNN -> linear projection (+ optional residual
mix with learned per-channel sigmoid gate) -> scaled dot-product score matrix
-> dustbin-augmented log-domain Sinkhorn -> log-assignment scores.

TPU-first: channels-last [B, N, D]; static shapes with validity masks; the
Sinkhorn head optionally runs as a fused Pallas kernel. With masks=None and
float32 the forward is numerically parity-comparable to the torch reference
(weights imported via openglue_tpu.compat.torch_weights).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from openglue_tpu.models.gnn import AttentionGNN
from openglue_tpu.models.layers import torch_dense
from openglue_tpu.models.positional_encoding import MLPPositionalEncoding
from openglue_tpu.ops.sinkhorn import log_optimal_transport


@dataclasses.dataclass(frozen=True)
class SuperGlueConfig:
    """Static configuration (reference config/config.yaml:42-55 schema)."""

    descriptor_dim: int = 256
    # positional encoding
    pe_hidden_layers_sizes: Sequence[int] = (32, 64, 128)
    pe_encoder_name: str = "FeedForwardNet"
    side_info_size: int = 1
    # attention gnn
    num_stages: int = 9
    num_heads: int = 4
    attention: str = "softmax"
    use_offset: bool = False
    favor_num_features: Optional[int] = None
    # matching head
    dustbin_score_init: float = 1.0
    otp_num_iters: int = 20
    otp_reg: float = 1.0
    residual: bool = True
    no_descriptors: bool = False
    # implementation switches
    dtype: Any = None  # computation dtype; None = float32
    # dtype of the GNN residual chain (the [B, N, D] descriptors carried
    # between the 2*num_stages propagation layers). None keeps the promoted
    # input dtype (f32 — matches reference numerics); bfloat16 halves the
    # per-layer HBM traffic of the chain (~8% flagship inference) at the cost
    # of rounding the residual accumulation to bf16. Quality-validated on the
    # flagship synthetic pose-AUC run (BASELINE.md).
    chain_dtype: Any = None
    use_pallas: bool = False
    remat: bool = False  # jax.checkpoint each GNN layer (memory for FLOPs)
    ring_axis: Any = None  # mesh axis for hand-scheduled ring attention (CP)
    # "int8": eval-mode GNN layers run the int8-MXU fused kernel (serving
    # path; ~2x bf16 MXU rate on the dense chain). "int8_static": offline
    # per-tensor activation scales (calibrate via mutable=["int8_calib"])
    # remove the in-kernel absmax reductions. "int8_attn"/"int8_static_attn":
    # the attention contractions (qk^T, P.V) run int8 too — the dh=64-narrow
    # dots dominate at eval scale and double their MXU rate at int8
    # (ops/pallas/gnn_layer_int8.py). Requires use_pallas and softmax
    # attention; other configs keep the bf16 path and warn at trace time.
    quantize: Optional[str] = None
    # Emit the decode reductions (row/col argmax + row max) alongside the
    # scores so XLA fuses them into the final Sinkhorn pass; in an inference
    # jit that decodes from them (decode_matches_from_stats) the full
    # [B, N+1, M+1] scores materialization is dead-code-eliminated.
    decode_stats: bool = False

    @classmethod
    def from_dict(cls, cfg: Mapping[str, Any]) -> "SuperGlueConfig":
        """Build from a reference-schema config dict (config/config.yaml:42-55)."""
        pe = cfg.get("positional_encoding", {})
        gnn = cfg.get("attention_gnn", {})
        otp = cfg.get("otp", {})
        return cls(
            descriptor_dim=cfg["descriptor_dim"],
            pe_hidden_layers_sizes=tuple(pe.get("hidden_layers_sizes", ()) or ()),
            pe_encoder_name=pe.get("encoder_name", "FeedForwardNet"),
            side_info_size=pe.get("side_info_size", 1),
            num_stages=gnn.get("num_stages", 9),
            num_heads=gnn.get("num_heads", 4),
            attention=gnn.get("attention", "softmax"),
            use_offset=gnn.get("use_offset", False),
            favor_num_features=gnn.get("favor_num_features"),
            dustbin_score_init=cfg.get("dustbin_score_init", 1.0),
            otp_num_iters=otp.get("num_iters", 20),
            otp_reg=otp.get("reg", 1.0),
            residual=cfg.get("residual", False),
            no_descriptors=cfg.get("no_descriptors", False),
            dtype=cfg.get("dtype"),
            chain_dtype=cfg.get("chain_dtype"),
            use_pallas=cfg.get("use_pallas", False),
            remat=cfg.get("remat", False),
            ring_axis=cfg.get("ring_axis"),
            quantize=cfg.get("quantize"),
            decode_stats=cfg.get("decode_stats", False),
        )


def _pallas_ot_shape(S: jnp.ndarray) -> bool:
    """Shape dispatch for the Sinkhorn kernel: XLA wins on small score
    matrices (same rationale as ops.pallas.use_pallas_for_shape)."""
    from openglue_tpu.ops.pallas import use_pallas_for_shape

    return use_pallas_for_shape(S.shape[1], S.shape[2])


def normalize_keypoints(kpts: jnp.ndarray, image_size: jnp.ndarray) -> jnp.ndarray:
    """Map pixel coordinates to [-1, 1] (reference superglue.py:74-78).

    kpts: [B, N, 2] (x, y); image_size: [2] or [B, 2] as (width, height).
    """
    image_size = jnp.asarray(image_size, dtype=kpts.dtype)
    if image_size.ndim == 1:
        wh = image_size[None, None, :]
    else:
        wh = image_size[:, None, :]
    return 2.0 * kpts / (wh - 1.0) - 1.0


class SuperGlue(nn.Module):
    """The matcher (reference superglue.py:11-72)."""

    config: SuperGlueConfig

    @nn.compact
    def __call__(
        self,
        kpts0: jnp.ndarray,
        kpts1: jnp.ndarray,
        desc0: jnp.ndarray,
        desc1: jnp.ndarray,
        side_info0: jnp.ndarray,
        side_info1: jnp.ndarray,
        image_size0: jnp.ndarray,
        image_size1: jnp.ndarray,
        mask0: Optional[jnp.ndarray] = None,
        mask1: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        dtype = cfg.dtype
        if cfg.quantize is not None:
            # the int8 kernels only exist for the Pallas softmax path; any
            # other config silently serves bf16, so say so loudly (once per
            # trace) instead of letting "quantize: int8_static" be a no-op
            reasons = []
            if not cfg.use_pallas:
                reasons.append("use_pallas=False")
            if cfg.attention != "softmax":
                reasons.append(f"attention={cfg.attention!r} (softmax only)")
            if cfg.ring_axis is not None:
                reasons.append("ring_axis is set")
            if reasons:
                import warnings

                warnings.warn(
                    f"quantize={cfg.quantize!r} requested but the int8 serving "
                    f"path cannot run ({', '.join(reasons)}); serving the "
                    "bf16/f32 path instead.",
                    stacklevel=2,
                )

        kpts0 = normalize_keypoints(kpts0, image_size0)
        kpts1 = normalize_keypoints(kpts1, image_size1)

        pe = MLPPositionalEncoding(
            output_size=cfg.descriptor_dim,
            hidden_layers_sizes=tuple(cfg.pe_hidden_layers_sizes),
            encoder_name=cfg.pe_encoder_name,
            dtype=dtype,
            name="positional_encoding",
        )
        pe0 = pe(kpts0, side_info0, mask=mask0, train=train)
        pe1 = pe(kpts1, side_info1, mask=mask1, train=train)

        gnn = AttentionGNN(
            num_stages=cfg.num_stages,
            embed_dim=cfg.descriptor_dim,
            num_heads=cfg.num_heads,
            attention=cfg.attention,
            use_offset=cfg.use_offset,
            favor_num_features=cfg.favor_num_features,
            dtype=dtype,
            use_pallas=cfg.use_pallas,
            remat=cfg.remat,
            ring_axis=cfg.ring_axis,
            quantize=cfg.quantize,
            name="attention_gnn",
        )
        if cfg.no_descriptors:
            x0, x1 = pe0, pe1
        else:
            x0, x1 = desc0 + pe0, desc1 + pe1
        if cfg.chain_dtype is not None:
            x0, x1 = x0.astype(cfg.chain_dtype), x1.astype(cfg.chain_dtype)
        gdesc0, gdesc1 = gnn(x0, x1, mask0, mask1, train)

        linear_proj = torch_dense(
            cfg.descriptor_dim, cfg.descriptor_dim, dtype=dtype, name="linear_proj"
        )
        gdesc0, gdesc1 = linear_proj(gdesc0), linear_proj(gdesc1)

        if cfg.residual:
            mix_coefs = self.param(
                "mix_coefs", nn.initializers.zeros, (cfg.descriptor_dim,)
            )
            alpha = nn.sigmoid(mix_coefs)
            gdesc0 = alpha * gdesc0 + (1.0 - alpha) * desc0
            gdesc1 = alpha * gdesc1 + (1.0 - alpha) * desc1

        # Score matrix S = gdesc0 @ gdesc1^T / sqrt(D) (reference superglue.py:64,80-86)
        S = jnp.einsum("bnd,bmd->bnm", gdesc0, gdesc1) * cfg.descriptor_dim**-0.5

        dustbin = self.param(
            "dustbin_score",
            lambda _key: jnp.asarray(cfg.dustbin_score_init, jnp.float32),
        )
        if cfg.ring_axis is not None:
            from openglue_tpu.parallel.ring import log_optimal_transport_ring

            log_P = log_optimal_transport_ring(
                S.astype(jnp.float32),
                dustbin,
                axis_name=cfg.ring_axis,
                num_iters=cfg.otp_num_iters,
                reg=cfg.otp_reg,
                mask0=mask0,
                mask1=mask1,
            )
        elif cfg.use_pallas and _pallas_ot_shape(S):
            from openglue_tpu.ops.pallas import sinkhorn_kernel

            log_P = sinkhorn_kernel.log_optimal_transport(
                S.astype(jnp.float32),
                dustbin,
                num_iters=cfg.otp_num_iters,
                reg=cfg.otp_reg,
                mask0=mask0,
                mask1=mask1,
            )
        else:
            log_P = log_optimal_transport(
                S.astype(jnp.float32),
                dustbin,
                num_iters=cfg.otp_num_iters,
                reg=cfg.otp_reg,
                mask0=mask0,
                mask1=mask1,
            )
        out = {
            "context_descriptors0": gdesc0,
            "context_descriptors1": gdesc1,
            "scores": log_P,
        }
        if cfg.decode_stats:
            from openglue_tpu.models.matching import assignment_stats

            idx0, idx1, max0 = assignment_stats(log_P, mask0=mask0, mask1=mask1)
            out["decode_indices0"] = idx0
            out["decode_indices1"] = idx1
            out["decode_max0"] = max0
        return out
