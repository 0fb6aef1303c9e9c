"""Interleaved A/B/A of the serving quantization paths at one shape.

Builds the flagship matcher (inference, fused decode) in bf16-Pallas,
int8_static, and int8_static_attn in ONE process, compiles all three, then
measures them interleaved (A/B/C/A) in one window — chip throughput drifts a
few percent across hours, so cross-window comparisons are unreliable
(BASELINE.md measurement note). The repeated A pins window stability.

int8_static_attn is the eval-scale candidate (VERDICT r3 #5): at N=2048 the
dh=64-narrow attention dots are 62% of per-layer FLOPs and run at half MXU
width in bf16; quantizing them doubles their MXU rate
(ops/pallas/gnn_layer_int8.py).

Usage: python -m bench.quant_ab [--kpts 2048] [--batch 4]
       [--paths bf16 int8_static int8_static_attn]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.data.synthetic import SyntheticHomographyPairs
from openglue_tpu.models.matching import decode_matches_from_stats
from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
from openglue_tpu.profiling import device_timeit
from openglue_tpu.train.step import superglue_inputs


def build(kpts: int, batch: int, quantize):
    cfg = SuperGlueConfig(
        descriptor_dim=256, pe_hidden_layers_sizes=(32, 64, 128),
        side_info_size=1, num_stages=9, num_heads=4, otp_num_iters=20,
        residual=True, dtype=jnp.bfloat16, chain_dtype=jnp.bfloat16,
        use_pallas=True, quantize=quantize, decode_stats=True,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=kpts, descriptor_dim=256)
    b = gen.sample(jax.random.key(0), batch)
    init = jax.jit(lambda rng, bb: model.init(rng, **superglue_inputs(bb, train=False)))
    variables = init(jax.random.key(1), b)
    jax.block_until_ready(variables)
    if quantize and quantize.startswith("int8_static"):
        _, calib = jax.jit(
            lambda v, bb: model.apply(
                v, **superglue_inputs(bb, train=False), mutable=["int8_calib"]
            )
        )(variables, b)
        variables = {**variables, **dict(calib)}
        jax.block_until_ready(variables)

    def run(bb):
        out = model.apply(variables, **superglue_inputs(bb, train=False))
        return decode_matches_from_stats(
            out["decode_indices0"], out["decode_indices1"], out["decode_max0"],
            mask0=bb.side0.mask, mask1=bb.side1.mask,
        )["matches0"]

    return jax.jit(run), b


def perturb(b, s):
    return b.replace(
        side0=b.side0.replace(
            descriptors=b.side0.descriptors * s,
            keypoints=b.side0.keypoints * s,
        )
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kpts", type=int, default=2048)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument(
        "--paths", nargs="*",
        default=["bf16", "int8_static", "int8_static_attn"],
    )
    args = parser.parse_args()

    built = {}
    for name in args.paths:
        q = None if name == "bf16" else name
        fn, b = build(args.kpts, args.batch, q)
        jax.block_until_ready(fn(b))  # compile before the timed window
        built[name] = (fn, b)
        print(f"compiled {name}", flush=True)

    order = list(built) + [next(iter(built))]  # A/B/C/A window-stability pin
    results = {}
    for i, name in enumerate(order):
        fn, b = built[name]
        t = device_timeit(fn, b, perturb=perturb)
        key = name if i < len(built) else f"{name}/A2"
        results[key] = {
            "pairs_per_s": round(args.batch / t, 1),
            "ms_per_batch": round(t * 1e3, 3),
        }
        print(key, results[key], flush=True)
    print(json.dumps({"kpts": args.kpts, "batch": args.batch, "paths": results}))


if __name__ == "__main__":
    main()
