"""Fused Pallas TPU kernels for the hot ops (attention, Sinkhorn, the whole
GNN layer).

Each kernel has a pure-XLA reference implementation (in openglue_tpu.ops or
alongside the kernel) that it is tested against; kernels are opt-in via
config (use_pallas=True).

Shape dispatch: below ~N=512 keypoints the XLA-fused path beats the kernels
(kernel launch + VMEM staging overheads dominate the tiny score matrices), so
``use_pallas=True`` only engages the kernels above the thresholds here —
turning it on is never a regression.
"""

from openglue_tpu.ops.pallas.attention_kernel import masked_softmax_attention
from openglue_tpu.ops.pallas.sinkhorn_kernel import log_optimal_transport

# Minimum query-set size before the Pallas paths engage (bench sweep
# N in {256, 512, 1024, 2048}, BASELINE.md: XLA wins below ~512).
PALLAS_MIN_KEYPOINTS = 512

# Test/bench escape hatch: when True, the measured never-lose dispatch gates
# (shape thresholds + per-variant fused-vs-composed decisions) are bypassed
# and the fused kernels are used whenever structurally possible. Set via
# force_fused_dispatch(); never enable in production paths — the gates exist
# because XLA wins at the gated shapes/variants.
_FORCE_FUSED = False


def force_fused_dispatch(enabled: bool) -> None:
    """Globally bypass the measured dispatch gates (tests/benches only)."""
    global _FORCE_FUSED
    _FORCE_FUSED = bool(enabled)


def fused_dispatch_forced() -> bool:
    return _FORCE_FUSED


def use_pallas_for_shape(n: int, m: int | None = None) -> bool:
    """True when the [N, M] score-matrix shape is large enough for the Pallas
    kernels to win over XLA (see PALLAS_MIN_KEYPOINTS)."""
    if _FORCE_FUSED:
        return True
    m = n if m is None else m
    return min(n, m) >= PALLAS_MIN_KEYPOINTS


__all__ = [
    "masked_softmax_attention",
    "log_optimal_transport",
    "use_pallas_for_shape",
    "force_fused_dispatch",
    "fused_dispatch_forced",
    "PALLAS_MIN_KEYPOINTS",
]
