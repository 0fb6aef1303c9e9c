"""Per-kernel roofline: achieved vs attainable for every production Pallas
kernel at its production shape/dtype (VERDICT r3 #4 — fixes the round-3 MFU
bookkeeping contradiction).

Peaks used (v5e): bf16 MXU paper peak ~197 TFLOP/s; MEASURED practical dense
peak on this chip (bench/narrow_dot_probe.py dense_chain_512, 512-cube bf16
chain fully VMEM-resident): ~179 TFLOP/s. A dh=64-narrow dot occupies half
the 128-wide MXU (probe: 36 vs 80 TF/s isolated), so narrow-dot FLOPs are
bounded by ~practical/2. HBM bandwidth ~819 GB/s. "attainable_ms" charges
full-width FLOPs at the practical peak, narrow FLOPs at half, and takes the
max with the DMA bound; kernels are healthy at 70-100% of attainable.

Usage: python -m bench.roofline [--quick]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.profiling import device_timeit

PRACTICAL_PEAK = 179e12  # measured, bench/narrow_dot_probe.py
PAPER_PEAK = 197e12
HBM_GBPS = 819e9


def attainable_ms(full_flops, narrow_flops, hbm_bytes, transcendentals=0):
    compute_s = full_flops / PRACTICAL_PEAK + narrow_flops / (PRACTICAL_PEAK / 2)
    dma_s = hbm_bytes / HBM_GBPS
    # VPU transcendentals (exp): ~4e11/s sustained on v5e-class VPUs
    vpu_s = transcendentals / 4e11
    return max(compute_s, dma_s, vpu_s) * 1e3, {
        "compute_ms": round(compute_s * 1e3, 3),
        "dma_ms": round(dma_s * 1e3, 3),
        "vpu_ms": round(vpu_s * 1e3, 3),
    }


def row(name, seconds, full_flops, narrow_flops, hbm_bytes, transcendentals, binding):
    total = full_flops + narrow_flops
    att, parts = attainable_ms(full_flops, narrow_flops, hbm_bytes, transcendentals)
    return {
        "kernel": name,
        "measured_ms": round(seconds * 1e3, 3),
        "gflops": round(total / 1e9, 1),
        "achieved_tflops": round(total / seconds / 1e12, 1),
        "pct_paper_peak": round(100 * total / seconds / PAPER_PEAK, 1),
        "binding": binding,
        "attainable_ms": round(att, 3),
        "pct_of_attainable": round(100 * att / (seconds * 1e3), 1),
        "bound_parts": parts,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    results = []
    ks = jax.random.split(jax.random.key(0), 8)

    # ---- attention kernel (eval serving path), bf16, B=16 H=4 N=M=1024 ----
    from openglue_tpu.ops.pallas import attention_kernel as ak

    B, H, N, dh = 16, 4, 1024, 64
    D = H * dh
    q = jax.random.normal(ks[0], (B, H, N, dh), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, N, dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, N, dh), jnp.bfloat16)
    mask = jnp.ones((B, N), bool)
    fn = jax.jit(lambda t: ak.masked_softmax_attention(*t, mask))
    t = device_timeit(lambda x: fn(x), (q, k, v))
    attn_flops = 2 * 2 * B * H * N * N * dh  # qk + pv, both dh-narrow
    results.append(row(
        "attention fwd (bf16 B=16 N=1024)", t, 0, attn_flops,
        hbm_bytes=3 * q.size * 2 + B * H * N * dh * 2,
        transcendentals=B * H * N * N, binding="narrow MXU (dh=64)",
    ))

    # ---- fused train-half fwd and fwd+bwd, bf16, B=12 N=1024 D=256 ----
    from openglue_tpu.ops.pallas import gnn_layer_kernel as glk

    B = 12
    x_q = jax.random.normal(ks[3], (B, N, D), jnp.bfloat16)
    x_kv = jax.random.normal(ks[4], (B, N, D), jnp.bfloat16)
    maskb = jnp.ones((B, N), bool)
    mk = lambda i, *s: jax.random.normal(ks[i % 8], s, jnp.float32) / (s[-2] ** 0.5 if len(s) > 1 else 1.0)
    w = glk.MessageWeights(
        wq=mk(0, D, D), bq=mk(1, 1, D), wk=mk(2, D, D), bk=mk(3, 1, D),
        wv=mk(4, D, D), bv=mk(5, 1, D), wo=mk(6, D, D), bo=mk(7, 1, D),
    )
    w1 = mk(0, 2 * D, 2 * D)
    b1 = mk(1, 1, 2 * D)

    def th(t):
        return glk.fused_train_layer_half(
            t[0], t[1], maskb, w, w1, b1, 4, compute_dtype=jnp.bfloat16
        )

    fn = jax.jit(th)
    t = device_timeit(lambda x: fn(x), (x_q, x_kv))
    proj_flops = 2 * B * N * (4 * D * D + 2 * D * 2 * D)  # qkvo + dense_0
    attn_flops = 2 * 2 * B * N * N * D
    results.append(row(
        "train-half fwd (bf16 B=12 N=1024)", t, proj_flops, attn_flops,
        hbm_bytes=(2 * x_q.size + B * N * 2 * D) * 2,
        transcendentals=B * 4 * N * N, binding="narrow MXU (attention dots)",
    ))

    def th_grad(t):
        def loss(a, b):
            z = glk.fused_train_layer_half(
                a, b, maskb, w, w1, b1, 4, compute_dtype=jnp.bfloat16
            )
            return jnp.sum(z.astype(jnp.float32))

        return jax.grad(loss, argnums=(0, 1))(t[0], t[1])

    fn = jax.jit(th_grad)
    t = device_timeit(lambda x: fn(x), (x_q, x_kv))
    # bwd: logits recompute + dv/dp/dq/dk (5 narrow attention dots) + ~3x
    # the projection/dense FLOPs (grad wrt inputs + weights)
    results.append(row(
        "train-half fwd+bwd (bf16 B=12 N=1024)", t,
        3 * proj_flops, attn_flops + 2 * 5 * B * N * N * D,
        hbm_bytes=6 * x_q.size * 2 + 2 * B * N * 2 * D * 2,
        transcendentals=2 * B * 4 * N * N, binding="narrow MXU (attention dots)",
    ))

    # ---- fused whole layer (eval), bf16, B=16 N=1024 ----
    B = 16
    x_q = jax.random.normal(ks[3], (B, N, D), jnp.bfloat16)
    x_kv = jax.random.normal(ks[4], (B, N, D), jnp.bfloat16)
    maskb = jnp.ones((B, N), bool)
    pw = glk.PropagationWeights(
        wq=mk(0, D, D).astype(jnp.bfloat16), bq=mk(1, 1, D),
        wk=mk(2, D, D).astype(jnp.bfloat16), bk=mk(3, 1, D),
        wv=mk(4, D, D).astype(jnp.bfloat16), bv=mk(5, 1, D),
        wo=mk(6, D, D).astype(jnp.bfloat16), bo=mk(7, 1, D),
        w1=mk(0, 2 * D, 2 * D).astype(jnp.bfloat16), b1=mk(1, 1, 2 * D),
        a1=jnp.ones((1, 2 * D), jnp.float32), c1=jnp.zeros((1, 2 * D), jnp.float32),
        w2=mk(2, 2 * D, D).astype(jnp.bfloat16), b2=mk(3, 1, D),
    )
    fn = jax.jit(lambda t: glk.fused_attention_propagation(t[0], t[1], maskb, pw, 4))
    t = device_timeit(lambda x: fn(x), (x_q, x_kv))
    dense_flops = 2 * B * N * (4 * D * D + 2 * D * 2 * D + 2 * D * D)
    attn_flops = 2 * 2 * B * N * N * D
    results.append(row(
        "fused layer eval (bf16 B=16 N=1024)", t, dense_flops, attn_flops,
        hbm_bytes=3 * x_q.size * 2,
        transcendentals=B * 4 * N * N, binding="narrow MXU (attention dots)",
    ))

    # ---- Sinkhorn kernels ----
    from openglue_tpu.ops.pallas import sinkhorn_kernel

    for (n, b) in ((1024, 16), (2048, 8)):
        scores = jax.random.normal(ks[5], (b, n, n), jnp.float32)
        m0 = jnp.ones((b, n), bool)
        fn = jax.jit(lambda t, _m=m0: sinkhorn_kernel.log_optimal_transport(
            t, jnp.zeros(()), num_iters=20, mask0=_m, mask1=_m
        ))
        t = device_timeit(lambda x: fn(x), scores)
        # per iteration: one K matvec sweep each way = 2*2*B*N^2 FLOP (VPU/MXU
        # matvec) ; DMA: N<=1024 K resident in VMEM, N=2048 one bf16 K read
        # per iteration
        it_flops = 20 * 2 * 2 * b * n * n
        dma = (20 * b * n * n * 2 + 2 * b * n * n * 4) if n > 1024 else (3 * b * n * n * 4)
        binding = "HBM DMA (K stream)" if n > 1024 else "VMEM matvec recursion (latency)"
        results.append(row(
            f"sinkhorn 20it (N={n} B={b})", t, 0, it_flops, dma,
            transcendentals=3 * b * n * n, binding=binding,
        ))

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
