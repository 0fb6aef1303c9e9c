"""Kernel benchmarks: attention, Sinkhorn, the whole fused GNN layer, and
the ring-block (LSE-emitting) attention variant, each XLA vs Pallas.

Reports edges/s (keypoint-pair scores per second — the BASELINE.md scaling
metric) for attention and iterations/s for Sinkhorn.

Usage: python -m bench.kernels [--batch 16] [--kpts 1024] [--heads 4] [--dh 64]
                               [--skip-layer] [--skip-lse]
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
    parser.add_argument("--skip-layer", action="store_true")
    parser.add_argument("--skip-lse", action="store_true")
    parser.add_argument("--skip-bwd", action="store_true")
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

    if not args.skip_bwd:
        # backward (training path): grads of the attention in bf16 — the
        # dtype the model trains in; the bwd kernel's matmul operands must
        # stay bf16 or the MXU runs at the f32 fraction of peak
        qb = q.astype(jnp.bfloat16)

        def grads_of(attn_fn):
            def f(x):
                return jax.grad(
                    lambda y: jnp.sum(attn_fn(y).astype(jnp.float32))
                )(x)
            return f

        t_xla = device_timeit(
            grads_of(lambda y: attn_ref.softmax_attention(y, y, y, None)[0]), qb
        )
        t_pal = device_timeit(
            grads_of(
                lambda y: attention_kernel.masked_softmax_attention(y, y, y, None)
            ),
            qb,
        )
        results["attention_bwd_bf16"] = {
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "speedup": round(t_xla / t_pal, 2),
        }

    results["config"] = {"batch": B, "heads": H, "kpts": N, "dh": Dh,
                         "device": str(jax.devices()[0])}
    if not args.skip_lse:
        # ring-block variant: same math + the per-row logsumexp output
        t_lse = device_timeit(
            lambda x: attention_kernel.masked_softmax_attention_with_lse(x, x, x, None),
            q,
        )
        results["attention_lse_ring_block"] = {
            "pallas_ms": round(t_lse * 1e3, 3),
            "pallas_edges_per_s": round(edges / t_lse, 0),
        }

    if not args.skip_layer:
        # whole fused GNN layer (projections + attention + FFN + residual)
        from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

        dim = H * Dh
        x = jax.random.normal(jax.random.key(2), (B, N, dim), jnp.float32)
        ks = jax.random.split(jax.random.key(3), 14)
        mk = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) / (s[-2] ** 0.5 if len(s) > 1 and s[-2] > 1 else 1.0)
        w = glk.PropagationWeights(
            wq=mk(0, dim, dim).astype(jnp.bfloat16), bq=mk(1, 1, dim),
            wk=mk(2, dim, dim).astype(jnp.bfloat16), bk=mk(3, 1, dim),
            wv=mk(4, dim, dim).astype(jnp.bfloat16), bv=mk(5, 1, dim),
            wo=mk(6, dim, dim).astype(jnp.bfloat16), bo=mk(7, 1, dim),
            w1=mk(8, 2 * dim, 2 * dim).astype(jnp.bfloat16), b1=mk(9, 1, 2 * dim),
            a1=1.0 + 0.1 * mk(10, 1, 2 * dim), c1=0.1 * mk(11, 1, 2 * dim),
            w2=mk(12, 2 * dim, dim).astype(jnp.bfloat16), b2=mk(13, 1, dim),
        )
        t_fused = device_timeit(
            lambda x_: glk.fused_attention_propagation(x_, x_, None, w, num_heads=H), x
        )
        t_comp = device_timeit(
            lambda x_: glk.xla_reference_layer(x_, x_, None, w, H, False), x
        )
        # layer FLOPs: 20*N*D^2 (projections + FFN) + 4*N*N*D (attention)
        layer_flops = B * (20 * N * dim * dim + 4 * N * N * dim)
        results["fused_gnn_layer"] = {
            "xla_ms": round(t_comp * 1e3, 3),
            "pallas_ms": round(t_fused * 1e3, 3),
            "speedup": round(t_comp / t_fused, 2),
            "pallas_tflops": round(layer_flops / t_fused / 1e12, 1),
        }

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
