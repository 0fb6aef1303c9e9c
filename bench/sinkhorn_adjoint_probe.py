"""Probe: Sinkhorn forward vs adjoint cost at the train shape (B=12, N=1024).

Splits the train step's `head_and_loss_fwd_bwd` bucket (bench/profile_train.py)
into OT forward, OT forward+adjoint, and the NLL loss around it.

Usage: python -m bench.sinkhorn_adjoint_probe [--batch 12] [--kpts 1024]
       [--pallas]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.profiling import device_timeit


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=12)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--pallas", action="store_true")
    args = parser.parse_args()

    B, N = args.batch, args.kpts
    if args.pallas:
        from openglue_tpu.ops.pallas.sinkhorn_kernel import log_optimal_transport
    else:
        from openglue_tpu.ops.sinkhorn import log_optimal_transport

    S = jax.random.normal(jax.random.key(0), (B, N, N), jnp.float32)
    dustbin = jnp.asarray(1.0, jnp.float32)
    mask = jnp.ones((B, N), bool)

    def fwd(s):
        out = log_optimal_transport(
            s, dustbin, num_iters=args.iters, reg=1.0, mask0=mask, mask1=mask
        )
        return jnp.sum(out.astype(jnp.float32))

    def fwd_bwd(s):
        val, grad = jax.value_and_grad(fwd)(s)
        return val + jnp.sum(grad.astype(jnp.float32))

    result = {}
    for name, fn in (("fwd", fwd), ("fwd_bwd", fwd_bwd)):
        t = device_timeit(fn, S)
        result[name + "_ms"] = round(t * 1e3, 3)
        print(f"{name}: {t * 1e3:.3f} ms", flush=True)
    result["adjoint_ms"] = round(result["fwd_bwd_ms"] - result["fwd_ms"], 3)
    result["config"] = {
        "batch": B, "kpts": N, "iters": args.iters, "pallas": bool(args.pallas),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
