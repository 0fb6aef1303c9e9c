"""Kernel benchmarks: attention (XLA vs Pallas) and Sinkhorn (XLA vs Pallas).

Reports edges/s (keypoint-pair scores per second — the BASELINE.md scaling
metric) for attention and iterations/s for Sinkhorn.

Usage: python -m bench.kernels [--batch 16] [--kpts 1024] [--heads 4] [--dh 64]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.ops import attention as attn_ref
from openglue_tpu.ops import sinkhorn as sink_ref
from openglue_tpu.ops.pallas import attention_kernel, sinkhorn_kernel
from openglue_tpu.profiling import device_timeit


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--heads", type=int, default=4)
    parser.add_argument("--dh", type=int, default=64)
    parser.add_argument("--sinkhorn-iters", type=int, default=20)
    args = parser.parse_args()

    B, H, N, Dh = args.batch, args.heads, args.kpts, args.dh
    q = jax.random.normal(jax.random.key(0), (B, H, N, Dh), jnp.float32)

    results = {}
    t_xla = device_timeit(lambda x: attn_ref.softmax_attention(x, x, x, None)[0], q)
    t_pal = device_timeit(
        lambda x: attention_kernel.masked_softmax_attention(x, x, x, None), q
    )
    edges = B * H * N * N
    results["attention"] = {
        "xla_ms": round(t_xla * 1e3, 3),
        "pallas_ms": round(t_pal * 1e3, 3),
        "speedup": round(t_xla / t_pal, 2),
        "pallas_edges_per_s": round(edges / t_pal, 0),
    }

    S = jax.random.normal(jax.random.key(1), (B, N, N), jnp.float32)
    d = jnp.asarray(1.0)
    iters = args.sinkhorn_iters
    t_xla = device_timeit(lambda s: sink_ref.log_optimal_transport(s, d, iters), S)
    t_pal = device_timeit(
        lambda s: sinkhorn_kernel.log_optimal_transport(s, d, iters), S
    )
    results["sinkhorn"] = {
        "xla_ms": round(t_xla * 1e3, 3),
        "pallas_ms": round(t_pal * 1e3, 3),
        "speedup": round(t_xla / t_pal, 2),
        "pallas_iters_per_s": round(iters * B / t_pal, 1),
    }

    results["config"] = {"batch": B, "heads": H, "kpts": N, "dh": Dh,
                         "device": str(jax.devices()[0])}
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
