"""Blocked-Sinkhorn matvec sweep (eval-scale N=2048, VERDICT r3 #5).

The HBM-streaming kernel's DMA roofline is one bf16 K read per iteration
(~10.2 us per element-iteration at N=2048); round-3 measured ~18.4 us — the
VPU broadcast-multiply + cross-lane reduce serializes with the stream. This
sweep times the kernel's matvec variants (vpu / mxu_y / mxu) x r_blk at the
eval shape, interleaved in one window.

Usage: python -m bench.sinkhorn_matvec_sweep [--kpts 2048] [--batch 8]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.ops.pallas import sinkhorn_kernel as sk
from openglue_tpu.ops import sinkhorn as sk_ref
from openglue_tpu.profiling import device_timeit


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kpts", type=int, default=2048)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()
    b, n, T = args.batch, args.kpts + 1, args.iters  # +1 = dustbin-augmented

    key = jax.random.key(0)
    M = jax.random.normal(key, (b, n, n), jnp.float32)
    log_a = jnp.full((b, n), -jnp.log(float(2 * n)))
    log_b = jnp.full((b, n), -jnp.log(float(2 * n)))

    # parity oracle (XLA log-domain); marginals as args, not baked constants
    ref = jax.jit(lambda m, a, bb: sk_ref.log_sinkhorn(a, bb, m, num_iters=T))
    ref_out = ref(M, log_a, log_b)

    results = {}
    variants = [("vpu", 256), ("mxu_y", 256), ("mxu", 256), ("mxu", 512), ("vpu", 512)]
    fns = {}
    for mv, rb in variants:
        def make(mv=mv, rb=rb):
            def f(m):
                rows = cols = n
                rp = -(-rows // rb) * rb
                cp = -(-cols // 128) * 128
                M_pad = jnp.full((b, rp, cp), -1e9, jnp.float32)
                M_pad = M_pad.at[:, :rows, :cols].set(m)
                la, lb = sk._padded_marginals(log_a, log_b, rows, cols, rp, cp)
                return sk._blocked_from_padded(
                    la, lb, M_pad, rows, cols, T, False, r_blk=rb, matvec=mv
                )
            return f
        fns[(mv, rb)] = jax.jit(make())
        out = fns[(mv, rb)](M)
        err = float(jnp.max(jnp.abs(out - ref_out)))
        results[f"{mv}_r{rb}"] = {"max_abs_err_vs_xla": round(err, 5)}
        print(f"{mv}_r{rb} parity {err:.5f}", flush=True)

    for (mv, rb), fn in fns.items():
        t = device_timeit(lambda m, f=fn: f(m), M)
        results[f"{mv}_r{rb}"].update(
            ms=round(t * 1e3, 3),
            us_per_elem_iter=round(t * 1e6 / (b * T), 2),
        )
        print(f"{mv}_r{rb}", results[f"{mv}_r{rb}"], flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
