"""Headline benchmark: image pairs matched per second per chip.

Runs the flagship matcher (reference scale: D=256, 9 GNN stages, 4 heads,
Sinkhorn 20 iterations, 1024 keypoints/image — reference
config/config.yaml:42-55, config/config_cached.yaml:8) in inference mode and
prints ONE JSON line.

Methodology: the per-call dispatch to the TPU behind the axon tunnel costs
~40 ms and block_until_ready does not actually synchronize, so timing runs the
matcher in a device-side fori_loop inside one jit with per-iteration input
perturbation, fetches a scalar to force sync, and differences two iteration
counts (openglue_tpu.profiling.device_timeit).

``vs_baseline`` is the ratio to the measured PyTorch reference on this host's
CPU (1.7 pairs/s at the same N=1024 flagship config, bench/torch_reference.py;
the reference repo publishes no numbers of its own — BASELINE.md).

Usage: python bench.py [--batch 16] [--kpts 1024] [--f32] [--pallas]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--iters-low", type=int, default=4)
    parser.add_argument("--iters-high", type=int, default=16)
    parser.add_argument("--f32", action="store_true", help="float32 compute (default bf16)")
    parser.add_argument("--pallas", action="store_true", help="use Pallas kernels")
    parser.add_argument("--attention", default="softmax")
    args = parser.parse_args()

    from openglue_tpu.data.synthetic import SyntheticHomographyPairs
    from openglue_tpu.models.matching import decode_matches
    from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
    from openglue_tpu.train.step import superglue_inputs

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    cfg = SuperGlueConfig(
        descriptor_dim=256,
        pe_hidden_layers_sizes=(32, 64, 128),
        side_info_size=1,
        num_stages=9,
        num_heads=4,
        attention=args.attention,
        otp_num_iters=20,
        residual=True,
        dtype=dtype,
        use_pallas=args.pallas,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=args.kpts, descriptor_dim=256)
    batch = gen.sample(jax.random.key(0), args.batch)
    # jitted init: eager init dispatches per-op over the tunnel (minutes)
    init = jax.jit(lambda rng, b: model.init(rng, **superglue_inputs(b, train=False)))
    variables = init(jax.random.key(1), batch)
    jax.block_until_ready(variables)

    from openglue_tpu.profiling import device_timeit

    def run(b):
        out = model.apply(variables, **superglue_inputs(b, train=False))
        return decode_matches(
            out["scores"], mask0=b.side0.mask, mask1=b.side1.mask
        )["matches0"]

    def perturb(b, s):
        return b.replace(side0=b.side0.replace(descriptors=b.side0.descriptors * s))

    per_iter = device_timeit(
        run, batch, iters_low=args.iters_low, iters_high=args.iters_high,
        perturb=perturb,
    )
    pairs_per_sec = args.batch / per_iter

    # measured torch-reference baseline on this host's CPU at N=1024
    # (bench/torch_reference.py; see BASELINE.md)
    TORCH_CPU_BASELINE_PAIRS_PER_S = 1.7
    vs_baseline = (
        round(pairs_per_sec / TORCH_CPU_BASELINE_PAIRS_PER_S, 2)
        if args.kpts == 1024
        else 1.0
    )
    print(
        json.dumps(
            {
                "metric": "image_pairs_matched_per_sec_per_chip",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": vs_baseline,
                "detail": {
                    "device": str(jax.devices()[0]),
                    "batch": args.batch,
                    "kpts": args.kpts,
                    "dtype": "float32" if args.f32 else "bfloat16",
                    "attention": args.attention,
                    "pallas": bool(args.pallas),
                    "ms_per_batch": round(1000 * per_iter, 3),
                    "baseline": "torch reference CPU same host, 1.7 pairs/s @N=1024",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
