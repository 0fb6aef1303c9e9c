"""Fused Pallas TPU kernels for the hot ops (attention, Sinkhorn).

Each kernel has a pure-XLA reference implementation in openglue_tpu.ops that
it is tested against; kernels are opt-in via config (use_pallas=True).
"""
