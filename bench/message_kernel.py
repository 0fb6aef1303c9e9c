"""Micro-benchmark: the fused attention-half (message) kernels vs the
composed path (XLA projections + Pallas attention custom_vjp + XLA out
projection) — forward and forward+backward, at the flagship train shape.

Usage: python -m bench.message_kernel [--batch 12] [--kpts 1024] [--dim 256]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.ops.pallas import attention_kernel
from openglue_tpu.ops.pallas import gnn_layer_kernel as glk
from openglue_tpu.profiling import device_timeit


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=12)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--dim", type=int, default=256)
    parser.add_argument("--heads", type=int, default=4)
    args = parser.parse_args()

    B, N, D, H = args.batch, args.kpts, args.dim, args.heads
    dh = D // H
    key = jax.random.key(0)
    ks = jax.random.split(key, 12)
    x_q = jax.random.normal(ks[0], (B, N, D), jnp.bfloat16)
    x_kv = jax.random.normal(ks[1], (B, N, D), jnp.bfloat16)
    mask = jnp.ones((B, N), bool)
    mk = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) / (s[-2] ** 0.5 if len(s) > 1 else 1.0)
    w = glk.MessageWeights(
        wq=mk(2, D, D), bq=mk(3, 1, D), wk=mk(4, D, D), bk=mk(5, 1, D),
        wv=mk(6, D, D), bv=mk(7, 1, D), wo=mk(8, D, D), bo=mk(9, 1, D),
    )

    def fused(xq, xkv, w):
        return glk.fused_attention_message(
            xq, xkv, mask, w, H, compute_dtype=jnp.bfloat16
        )

    def composed(xq, xkv, w):
        # the composed module path: XLA denses (bf16 operands, f32 accum) +
        # the Pallas attention custom_vjp (models/gnn.py MultiheadAttention)
        dt = jnp.bfloat16

        def dense(x, kern, bias):
            return (
                jax.lax.dot_general(
                    x.astype(dt), kern.astype(dt),
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bias[None]
            ).astype(dt)

        q = dense(xq, w.wq, w.bq)
        k = dense(xkv, w.wk, w.bk)
        v = dense(xkv, w.wv, w.bv)
        split = lambda x: x.reshape(B, N, H, dh).transpose(0, 2, 1, 3)
        out = attention_kernel.masked_softmax_attention(split(q), split(k), split(v), mask)
        attn = out.transpose(0, 2, 1, 3).reshape(B, N, D).astype(dt)
        return dense(attn, w.wo, w.bo)

    # round-4 train-half: message + FFN dense_0+ReLU in-kernel, vs the same
    # math as (fused message kernel + XLA dense_0+ReLU) — isolates what the
    # z-fusion buys/costs per layer half
    k1, k2 = jax.random.split(ks[10], 2)
    w1 = jax.random.normal(k1, (2 * D, 2 * D), jnp.float32) / (2 * D) ** 0.5
    b1 = jax.random.normal(k2, (1, 2 * D), jnp.float32) * 0.1

    def train_half(xq, xkv, w):
        return glk.fused_train_layer_half(
            xq, xkv, mask, w, w1, b1, H, compute_dtype=jnp.bfloat16
        )

    def message_plus_xla_ffn0(xq, xkv, w):
        msg = glk.fused_attention_message(
            xq, xkv, mask, w, H, compute_dtype=jnp.bfloat16
        )
        cat = jnp.concatenate([xq.astype(jnp.bfloat16), msg], axis=-1)
        s = jax.lax.dot_general(
            cat, w1.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1[None]
        return jax.nn.relu(s).astype(jnp.bfloat16)

    results = {}
    for name, fn in (
        ("fused", fused), ("composed", composed),
        ("train_half", train_half), ("message_xla_ffn0", message_plus_xla_ffn0),
    ):
        fwd = lambda xq, f=fn: jnp.sum(f(xq, x_kv, w).astype(jnp.float32))
        s = device_timeit(fwd, x_q, perturb=lambda x, sc: x * sc)
        results[f"{name}_fwd_ms"] = round(s * 1e3, 3)

        def fwd_bwd(xq, f=fn):
            def loss(xq_, w_):
                o = f(xq_, x_kv, w_).astype(jnp.float32)
                return jnp.sum(o * jnp.cos(o))

            l, g = jax.value_and_grad(loss, argnums=(0, 1))(xq, w)
            return l + sum(
                jnp.sum(jnp.square(t.astype(jnp.float32)))
                for t in jax.tree_util.tree_leaves(g)
            )

        s = device_timeit(fwd_bwd, x_q, perturb=lambda x, sc: x * sc)
        results[f"{name}_fwd_bwd_ms"] = round(s * 1e3, 3)

    results["config"] = {
        "batch": B, "kpts": N, "dim": D, "heads": H,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
