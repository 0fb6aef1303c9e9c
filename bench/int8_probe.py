"""Probe: does int8 matmul reach the v5e's 2x-bf16 MXU rate, and does Mosaic
lower an int8 dot inside a Pallas kernel?

The v5e MXU runs int8 at ~394 TOPS vs ~197 TFLOP/s bf16 — if Pallas/XLA can
tap it, the dense projections + FFN of the fused GNN layer (~55% of layer
FLOPs) can run twice as fast in a quantized serving path.

Usage: python -m bench.int8_probe
"""

from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openglue_tpu.profiling import device_timeit


def _xla_matmul_rate(dtype, out_dtype, m=8192, k=512, n=512):
    a = jnp.ones((m, k), dtype)
    b = jnp.ones((k, n), dtype)

    def run(a):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=out_dtype,
        )

    # perturb via int-safe add so the loop is not hoisted
    t = device_timeit(run, a, perturb=lambda x, s: x + jnp.array(0, dtype))
    return 2 * m * k * n / t / 1e12


def _pallas_int8_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _pallas_int8(m=1024, k=512, n=512, interpret=False):
    a = jnp.ones((m, k), jnp.int8)
    b = jnp.ones((k, n), jnp.int8)
    out = pl.pallas_call(
        _pallas_int8_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        in_specs=[
            pl.BlockSpec((m, k), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, n), lambda: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b)
    return out


def _pallas_quant_kernel(x_ref, w_ref, sw_ref, o_ref):
    """Dynamic per-block activation quant + int8 dot + f32 dequant epilogue."""
    x = x_ref[...].astype(jnp.float32)
    sx = jnp.max(jnp.abs(x)) / 127.0 + 1e-12
    xi8 = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xi8, w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = acc.astype(jnp.float32) * (sx * sw_ref[...])


def _pallas_quant(m=1024, k=512, n=512, interpret=False):
    x = jax.random.normal(jax.random.key(0), (m, k), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (k, n), jnp.float32)
    sw = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    wi8 = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    out = pl.pallas_call(
        _pallas_quant_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        in_specs=[
            pl.BlockSpec((m, k), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, n), lambda: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, wi8, sw)
    ref = x @ w
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    return rel


def main():
    result = {"device": str(jax.devices()[0])}
    result["xla_bf16_tflops"] = round(_xla_matmul_rate(jnp.bfloat16, jnp.float32), 1)
    print("xla bf16:", result["xla_bf16_tflops"], "TF/s", flush=True)
    try:
        result["xla_int8_tops"] = round(_xla_matmul_rate(jnp.int8, jnp.int32), 1)
        print("xla int8:", result["xla_int8_tops"], "TOP/s", flush=True)
    except Exception as e:  # noqa: BLE001
        result["xla_int8_tops"] = f"FAILED: {e}"
        print("xla int8 FAILED:", e, flush=True)
    try:
        out = _pallas_int8()
        jax.block_until_ready(out)
        ok = int(out[0, 0]) == 512
        result["pallas_int8_dot"] = "ok" if ok else f"wrong value {out[0, 0]}"
        print("pallas int8 dot:", result["pallas_int8_dot"], flush=True)
    except Exception as e:  # noqa: BLE001
        result["pallas_int8_dot"] = f"FAILED: {type(e).__name__}"
        print("pallas int8 dot FAILED:", repr(e)[:500], flush=True)
    try:
        rel = _pallas_quant()
        result["pallas_quant_rel_err"] = round(rel, 5)
        print("pallas quantized matmul rel err:", rel, flush=True)
    except Exception as e:  # noqa: BLE001
        result["pallas_quant_rel_err"] = f"FAILED: {type(e).__name__}"
        print("pallas quant FAILED:", repr(e)[:500], flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
