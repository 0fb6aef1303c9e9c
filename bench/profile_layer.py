"""Per-layer cost profile of one AttentionalPropagation layer.

Isolates where the composed (training-path) layer spends its time: forward
eval vs train, full grads, attention-only grads, and a BN-free (eval-mode
statistics) grad variant — the difference exposes how much the train-mode
BatchNorm chain costs in XLA's backward.

Usage: python -m bench.profile_layer [--batch 12] [--kpts 1024] [--pallas]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.models.gnn import AttentionalPropagation
from openglue_tpu.profiling import device_timeit


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=12)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--dim", type=int, default=256)
    parser.add_argument("--heads", type=int, default=4)
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("--chain-f32", action="store_true")
    parser.add_argument("--pallas", action="store_true")
    args = parser.parse_args()

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    chain = jnp.float32 if (args.f32 or args.chain_f32) else jnp.bfloat16
    B, N, dim = args.batch, args.kpts, args.dim
    layer = AttentionalPropagation(
        embed_dim=dim, num_heads=args.heads, attention="softmax", dtype=dtype,
        use_pallas=args.pallas,
    )
    x = jax.random.normal(jax.random.key(0), (B, N, dim), chain)
    variables = layer.init(jax.random.key(1), x, x, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def fwd(p, xx, train):
        out = layer.apply(
            {"params": p, "batch_stats": batch_stats}, xx, xx, train=train,
            mutable=["batch_stats"] if train else False,
        )
        return out[0] if train else out

    def anchor(t):
        return sum(
            jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(t)
        )

    stages = {
        "fwd_eval": lambda xx: anchor(fwd(params, xx, False)),
        "fwd_train": lambda xx: anchor(fwd(params, xx, True)),
        "grad_train": lambda xx: anchor(
            jax.grad(lambda p: anchor(fwd(p, xx, True)))(params)
        ),
        "grad_eval_stats": lambda xx: anchor(
            jax.grad(lambda p: anchor(fwd(p, xx, False)))(params)
        ),
        "grad_wrt_input": lambda xx: anchor(
            jax.grad(lambda y: anchor(fwd(params, y, True)))(xx)
        ),
    }
    result = {}
    for name, fn in stages.items():
        t = device_timeit(fn, x, perturb=lambda xx, s: xx * s)
        result[name + "_ms"] = round(t * 1e3, 3)
        print(f"{name}: {t * 1e3:.3f} ms", flush=True)

    result["config"] = {
        "batch": B, "kpts": N, "dim": dim,
        "dtype": str(dtype.__name__), "chain": str(chain.__name__),
        "pallas": bool(args.pallas), "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
