"""Full-matcher benchmark across attention variants and dtypes.

Reports image pairs matched/sec/chip at the reference flagship shape
(D=256, 9 stages, 4 heads, Sinkhorn 20, N keypoints).

Usage: python -m bench.matcher [--kpts 1024] [--batch 16] \
    [--attention softmax linear favor_relu] [--dtypes bf16 f32]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.data.synthetic import SyntheticHomographyPairs
from openglue_tpu.models.matching import decode_matches
from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
from openglue_tpu.profiling import device_timeit
from openglue_tpu.train.step import superglue_inputs


def bench_variant(attention: str, dtype, batch: int, kpts: int, use_pallas: bool):
    cfg = SuperGlueConfig(
        descriptor_dim=256,
        pe_hidden_layers_sizes=(32, 64, 128),
        side_info_size=1,
        num_stages=9,
        num_heads=4,
        attention=attention,
        otp_num_iters=20,
        residual=True,
        dtype=dtype,
        use_pallas=use_pallas,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=kpts, descriptor_dim=256)
    batch_data = gen.sample(jax.random.key(0), batch)
    variables = model.init(jax.random.key(1), **superglue_inputs(batch_data, train=False))

    def run(b):
        out = model.apply(variables, **superglue_inputs(b, train=False))
        return decode_matches(out["scores"], mask0=b.side0.mask, mask1=b.side1.mask)[
            "matches0"
        ]

    def perturb(b, s):
        return b.replace(
            side0=b.side0.replace(descriptors=b.side0.descriptors * s)
        )

    seconds = device_timeit(run, batch_data, perturb=perturb)
    return {
        "pairs_per_s": round(batch / seconds, 1),
        "ms_per_batch": round(seconds * 1e3, 2),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--attention", nargs="+", default=["softmax", "linear", "favor_relu"])
    parser.add_argument("--dtypes", nargs="+", default=["bf16"])
    parser.add_argument("--pallas", action="store_true")
    args = parser.parse_args()

    dtype_map = {"bf16": jnp.bfloat16, "f32": jnp.float32}
    results = {"config": {"batch": args.batch, "kpts": args.kpts,
                          "device": str(jax.devices()[0]), "pallas": args.pallas}}
    for attention in args.attention:
        for dname in args.dtypes:
            key = f"{attention}_{dname}"
            results[key] = bench_variant(
                attention, dtype_map[dname], args.batch, args.kpts, args.pallas
            )
            print(f"{key}: {results[key]}", flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
