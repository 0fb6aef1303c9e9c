"""MXU width probe: what does a dh=64-narrow attention dot actually cost?

The flagship matcher's attention dots contract (logits) or emit (P-V, and
four backward products) a 64-wide head dimension on a 128x128 MXU. The
round-3 roofline note assumed half-width dots cap the MXU at 50%, making the
per-layer bound ~0.65 ms and the train-step floor ~390 pairs/s; VERDICT #1b
asks whether head-packing (256-wide contractions) can raise that. This probe
measures the same nominal FLOPs at head widths 64/128/256 inside a Pallas
kernel shaped like the message kernel's inner loop, for both dot families:

  * qk: logits_h = q_h [BQ, dh] @ k_h^T [dh, M]   (narrow CONTRACTION)
  * pv: o_h = p_h [BQ, M] @ v_h [M, dh]           (narrow OUTPUT)

If width 64 == width 256 wall-clock, Mosaic already packs narrow lanes and
head-packing is a measured negative result; if 64 is ~2x slower, a packed
layout is worth building. Also emits a dense [512,256]x[256,512] chain as the
practical bf16 MXU peak for BASELINE.md's roofline table (v5e paper peak:
~197 TFLOP/s bf16).

Usage: python -m bench.narrow_dot_probe [--batch 12] [--kpts 1024]
"""

from __future__ import annotations

import argparse
import functools
import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openglue_tpu.profiling import device_timeit


def _qk_kernel(q_ref, k_ref, out_ref, *, dh: int):
    """Per grid step: all-head logits at head width dh; rows reduced so the
    output write is negligible next to the MACs."""
    q = q_ref[0]
    k = k_ref[0]
    dim = q.shape[1]
    acc = jnp.zeros((q.shape[0], 128), jnp.float32)
    for h in range(dim // dh):
        sl = slice(h * dh, (h + 1) * dh)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, M]
        acc += jnp.sum(logits.reshape(q.shape[0], -1, 128), axis=1)
    out_ref[0] = acc


def _pv_kernel(p_ref, v_ref, out_ref, *, dh: int):
    """Per grid step: all-head P-V aggregation at head width dh. p is reused
    per head (the MAC count, not the softmax semantics, is what is timed)."""
    p = p_ref[0]
    v = v_ref[0]
    dim = v.shape[1]
    cols = []
    for h in range(dim // dh):
        sl = slice(h * dh, (h + 1) * dh)
        cols.append(
            jnp.dot(p, v[:, sl], preferred_element_type=jnp.float32)
        )  # [BQ, dh]
    out_ref[0] = jnp.concatenate(cols, axis=1)


def _run(kernel, dh, a, b, out_cols, block_q):
    batch, n, _ = a.shape
    return pl.pallas_call(
        functools.partial(kernel, dh=dh),
        grid=(batch, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, a.shape[2]), lambda bt, i: (bt, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[1], b.shape[2]), lambda bt, i: (bt, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, out_cols), lambda bt, i: (bt, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, n, out_cols), jnp.float32),
    )(a, b)


def _dense_chain_kernel(x_ref, w_ref, out_ref, *, steps: int):
    x = x_ref[...]
    for _ in range(steps):
        x = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32).astype(x.dtype)
    out_ref[...] = x.astype(jnp.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=12)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--dim", type=int, default=256)
    parser.add_argument("--block_q", type=int, default=512)
    args = parser.parse_args()
    B, N, D, BQ = args.batch, args.kpts, args.dim, args.block_q

    ks = jax.random.split(jax.random.key(0), 4)
    q = jax.random.normal(ks[0], (B, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, N, D), jnp.bfloat16)
    # pv side pre-expanded to one grid row per query block (no in-loop repeat
    # polluting the DMA account)
    nb = N // BQ
    p = jax.random.normal(ks[2], (B * nb, BQ, N), jnp.bfloat16)
    v = jax.random.normal(ks[3], (B * nb, N, D), jnp.bfloat16)

    results = {}
    flops = 2 * B * N * N * D  # nominal MACs*2, identical across widths

    for dh in (64, 128, 256):
        fn = jax.jit(lambda qq, kk, _dh=dh: _run(_qk_kernel, _dh, qq, kk, 128, BQ))
        t = device_timeit(lambda x: fn(*x), (q, k))
        results[f"qk_dh{dh}"] = {"ms": t * 1e3, "tflops": flops / t / 1e12}

    # pv: batch' = B*(N/BQ) grid rows of [BQ, N] x [N, D] — total MACs match qk
    for dh in (64, 128, 256):
        fn = jax.jit(lambda pp, vv, _dh=dh: _run(_pv_kernel, _dh, pp, vv, D, BQ))
        t = device_timeit(lambda x: fn(*x), (p, v))
        results[f"pv_dh{dh}"] = {"ms": t * 1e3, "tflops": flops / t / 1e12}

    # practical bf16 MXU peak: a 512x512 @ 512x512 chain fully resident in VMEM
    steps = 64
    x = jax.random.normal(ks[0], (512, 512), jnp.bfloat16)
    w = jax.random.normal(ks[1], (512, 512), jnp.bfloat16) * 0.04
    chain = jax.jit(
        lambda t: pl.pallas_call(
            functools.partial(_dense_chain_kernel, steps=steps),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((512, 512), jnp.float32),
        )(*t)
    )
    t = device_timeit(lambda x: chain(x), (x, w))
    results["dense_chain_512"] = {
        "ms": t * 1e3,
        "tflops": steps * 2 * 512**3 / t / 1e12,
    }

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
