"""Interleaved A/B: round-4 fused TRAIN-HALF kernel (attention + FFN
dense_0+ReLU, z out) vs the round-3 attention-half-only kernel vs composed.

All variants trace in one process (the route env vars are read at TRACE time,
so each jit is traced under its own setting) and are timed back-to-back with
device_timeit — the within-window comparison standard (chip drifts a few
percent across hours).

Usage: python -m bench.train_half_ab [--batch 12] [--kpts 1024]
"""

from __future__ import annotations

import argparse
import json
import os

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
    parser.add_argument("--skip-composed", action="store_true")
    args = parser.parse_args()

    cfg = SuperGlueConfig(
        descriptor_dim=256, pe_hidden_layers_sizes=(32, 64, 128), num_stages=9,
        num_heads=4, otp_num_iters=20, residual=True, dtype=jnp.bfloat16,
        chain_dtype=jnp.bfloat16, use_pallas=True,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=args.kpts, descriptor_dim=256)
    batch = gen.sample(jax.random.key(0), args.batch)
    init = jax.jit(lambda rng, b: model.init(rng, **superglue_inputs(b, train=True)))
    variables = init(jax.random.key(1), batch)
    jax.block_until_ready(variables)
    state = create_train_state(model.apply, variables, learning_rate=1e-4)
    step = make_train_step(LossConfig(positive_threshold=2.0, negative_threshold=7.0))

    def make_run():
        # a FRESH function object per variant: jax's tracing cache keys on
        # function identity, so reusing one `run` across env-var variants
        # silently serves the first variant's trace to all of them (the env
        # is read at trace time) — measured identical numbers for all three
        # paths before this fix
        def run(b):
            new_state, metrics = step(state, b)
            param_norm = sum(
                jnp.sum(jnp.square(x))
                for x in jax.tree_util.tree_leaves(new_state.params)
            )
            return metrics["total_loss"] + metrics["grad_norm"] + param_norm

        return run

    def perturb(b, s):
        return b.replace(
            side0=b.side0.replace(
                descriptors=b.side0.descriptors * s,
                keypoints=b.side0.keypoints * s,
            )
        )

    # trace each variant under its env (read at trace time), keep the jits
    variants = {"train_half": {"OPENGLUE_TRAIN_HALF": "1"}}
    variants["message_only"] = {}
    if not args.skip_composed:
        variants["composed"] = {"OPENGLUE_NO_FUSED_MESSAGE": "1"}

    _ROUTE_VARS = (
        "OPENGLUE_TRAIN_HALF", "OPENGLUE_FUSED_MESSAGE_ONLY",
        "OPENGLUE_NO_FUSED_MESSAGE",
    )
    fns = {}
    for name, env in variants.items():
        saved = {k: os.environ.pop(k, None) for k in _ROUTE_VARS}
        os.environ.update(env)
        try:
            fns[name] = jax.jit(make_run())
            # force trace+compile now, under this env
            float(fns[name](batch))
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
            for k in env:
                os.environ.pop(k, None)

    results = {}
    order = list(fns) + ["train_half"]  # A/B/C/A pins window stability
    for name in order:
        t = device_timeit(lambda b, f=fns[name]: f(b), batch, perturb=perturb)
        results.setdefault(name, []).append(
            {"pairs_per_s": round(args.batch / t, 1), "ms": round(t * 1e3, 3)}
        )
    print(json.dumps({"batch": args.batch, "kpts": args.kpts, **results}, indent=2))


if __name__ == "__main__":
    main()
