"""Fused Pallas TPU kernels for the hot ops (attention, Sinkhorn).

Each kernel has a pure-XLA reference implementation in openglue_tpu.ops that
it is tested against; kernels are opt-in via config (use_pallas=True).
"""

from openglue_tpu.ops.pallas.attention_kernel import masked_softmax_attention
from openglue_tpu.ops.pallas.sinkhorn_kernel import log_optimal_transport

__all__ = ["masked_softmax_attention", "log_optimal_transport"]
