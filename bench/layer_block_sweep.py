"""Query-block-size sweep for the fused GNN-layer kernel.

Times fused_attention_propagation at the flagship shape for several block_q
values (and both chain dtypes) to pick the kernel's default.

Usage: python -m bench.layer_block_sweep [--batch 16] [--kpts 1024]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.ops.pallas import gnn_layer_kernel as glk
from openglue_tpu.profiling import device_timeit


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--dim", type=int, default=256)
    parser.add_argument("--heads", type=int, default=4)
    args = parser.parse_args()

    B, N, dim, H = args.batch, args.kpts, args.dim, args.heads
    ks = jax.random.split(jax.random.key(3), 14)
    mk = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) / (
        s[-2] ** 0.5 if len(s) > 1 and s[-2] > 1 else 1.0
    )
    w = glk.PropagationWeights(
        wq=mk(0, dim, dim).astype(jnp.bfloat16), bq=mk(1, 1, dim),
        wk=mk(2, dim, dim).astype(jnp.bfloat16), bk=mk(3, 1, dim),
        wv=mk(4, dim, dim).astype(jnp.bfloat16), bv=mk(5, 1, dim),
        wo=mk(6, dim, dim).astype(jnp.bfloat16), bo=mk(7, 1, dim),
        w1=mk(8, 2 * dim, 2 * dim).astype(jnp.bfloat16), b1=mk(9, 1, 2 * dim),
        a1=1.0 + 0.1 * mk(10, 1, 2 * dim), c1=0.1 * mk(11, 1, 2 * dim),
        w2=mk(12, 2 * dim, dim).astype(jnp.bfloat16), b2=mk(13, 1, dim),
    )
    layer_flops = B * (20 * N * dim * dim + 4 * N * N * dim)
    results = {}
    for chain_name, chain_dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        x = jax.random.normal(jax.random.key(2), (B, N, dim), chain_dtype)
        for bq in (256, 512, 1024):
            t = device_timeit(
                lambda x_, bq=bq: glk.fused_attention_propagation(
                    x_, x_, None, w, num_heads=H, block_q=bq
                ),
                x,
            )
            results[f"chain_{chain_name}_bq{bq}"] = {
                "ms": round(t * 1e3, 3),
                "tflops": round(layer_flops / t / 1e12, 1),
            }
            print(chain_name, bq, round(t * 1e3, 3), "ms", flush=True)
    results["config"] = {"batch": B, "kpts": N, "dim": dim,
                         "device": str(jax.devices()[0])}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
