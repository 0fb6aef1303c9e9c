"""Training-throughput benchmark: full jitted train step (GT generation +
forward + backward + Adam) at the cached-flagship config.

Usage: python -m bench.train_step [--batch 12] [--kpts 1024] [--f32]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.data.synthetic import SyntheticHomographyPairs
from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
from openglue_tpu.profiling import device_timeit
from openglue_tpu.train import LossConfig, create_train_state, make_train_step
from openglue_tpu.train.step import superglue_inputs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=12)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("--pallas", action="store_true")
    parser.add_argument(
        "--chain-bf16", action="store_true",
        help="carry the GNN residual chain in bf16 (halves layer/activation "
        "HBM traffic in forward AND backward)",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="jax.checkpoint each GNN layer (recompute in backward; frees "
        "activation HBM so larger batches fit)",
    )
    parser.add_argument("--attention", default="softmax")
    args = parser.parse_args()

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    cfg = SuperGlueConfig(
        descriptor_dim=256, pe_hidden_layers_sizes=(32, 64, 128), num_stages=9,
        num_heads=4, otp_num_iters=20, residual=True, dtype=dtype,
        attention=args.attention,
        chain_dtype=jnp.bfloat16 if args.chain_bf16 else None,
        use_pallas=args.pallas, remat=args.remat,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=args.kpts, descriptor_dim=256)
    batch = gen.sample(jax.random.key(0), args.batch)
    init = jax.jit(lambda rng, b: model.init(rng, **superglue_inputs(b, train=True)))
    variables = init(jax.random.key(1), batch)
    jax.block_until_ready(variables)
    state = create_train_state(model.apply, variables, learning_rate=1e-4)
    step = make_train_step(LossConfig(positive_threshold=2.0, negative_threshold=7.0))

    def run(b):
        new_state, metrics = step(state, b)
        # anchor the WHOLE step: loss alone would let XLA delete the backward
        # pass and optimizer update as dead code
        param_norm = sum(
            jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(new_state.params)
        )
        return metrics["total_loss"] + metrics["grad_norm"] + param_norm

    def perturb(b, s):
        # keypoints too: GT generation and the positional encoding depend only
        # on keypoints — left constant they are loop-invariant and XLA hoists
        # them out of the timing loop (a 1+1e-6 scale keeps GT labels intact)
        return b.replace(
            side0=b.side0.replace(
                descriptors=b.side0.descriptors * s,
                keypoints=b.side0.keypoints * s,
            )
        )

    seconds = device_timeit(run, batch, perturb=perturb)
    print(
        json.dumps(
            {
                "metric": "train_pairs_per_sec_per_chip",
                "value": round(args.batch / seconds, 2),
                "unit": "pairs/s",
                "detail": {
                    "device": str(jax.devices()[0]),
                    "batch": args.batch,
                    "kpts": args.kpts,
                    "dtype": "float32" if args.f32 else "bfloat16",
                    "chain_bf16": bool(args.chain_bf16),
                    "attention": args.attention,
                    "remat": bool(args.remat),
                    "pallas": bool(args.pallas),
                    "ms_per_step": round(seconds * 1e3, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
