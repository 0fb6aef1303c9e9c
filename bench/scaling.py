"""Scaling-efficiency benchmark: edges/s (keypoint-pair scores per second)
at 1 device vs the whole mesh (BASELINE.md: >= 80% edges/s efficiency at 2+
hosts). Default times the FULL TRAIN STEP (GT generation + forward +
backward + Adam) — the >=80% target is about training; --forward-only
restores the inference measurement.

Modes:
  * dp   — batch sharded over all devices;
  * cp   — keypoint axis sharded over all devices (context parallelism);
  * dpcp — 2D mesh (data x model).

On a single-chip environment this still runs (mesh = 1 device) and on the
virtual CPU mesh (JAX_PLATFORMS=cpu JAX_NUM_CPU_DEVICES=8) it validates the
harness; meaningful efficiency numbers require a real multi-chip slice.

Usage: python -m bench.scaling [--mode dp|cp|dpcp] [--kpts 1024] [--batch 8]
                               [--forward-only]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.data.synthetic import SyntheticHomographyPairs
from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
from openglue_tpu.parallel import make_mesh
from openglue_tpu.parallel.context_parallel import pair_batch_pspec
from openglue_tpu.profiling import device_timeit
from openglue_tpu.train.step import superglue_inputs


def build(batch, kpts, dtype):
    cfg = SuperGlueConfig(
        descriptor_dim=256,
        pe_hidden_layers_sizes=(32, 64, 128),
        num_stages=9,
        num_heads=4,
        otp_num_iters=20,
        residual=True,
        dtype=dtype,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=kpts, descriptor_dim=256)
    batch_data = gen.sample(jax.random.key(0), batch)
    variables = model.init(jax.random.key(1), **superglue_inputs(batch_data))
    return model, variables, batch_data


def time_forward(model, variables, batch_data, mesh=None, train_state=None):
    from jax.sharding import NamedSharding, PartitionSpec as P

    if train_state is not None:
        from openglue_tpu.train import LossConfig, make_train_step

        step = make_train_step(
            LossConfig(positive_threshold=3.0, negative_threshold=5.0)
        )

        def fwd(b):
            # returning (state, metrics) anchors every numeric leaf incl. the
            # updated params, so XLA cannot DCE the backward or the optimizer
            return step(train_state, b)

    else:

        def fwd(b):
            return model.apply(variables, **superglue_inputs(b))["scores"]

    def perturb(b, s):
        return b.replace(side0=b.side0.replace(descriptors=b.side0.descriptors * s))

    if mesh is not None:
        shardings = jax.tree_util.tree_map(
            lambda spec: None if spec is None else NamedSharding(mesh, spec),
            pair_batch_pspec(mesh, batch_data),
            is_leaf=lambda x: isinstance(x, P) or x is None,
        )
        batch_data = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s) if s is not None else x,
            batch_data,
            shardings,
        )
    return device_timeit(fwd, batch_data, perturb=perturb)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", default="dp", choices=["dp", "cp", "dpcp"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--f32", action="store_true")
    parser.add_argument(
        "--forward-only", action="store_true",
        help="time inference instead of the full train step",
    )
    args = parser.parse_args()

    n_dev = len(jax.devices())
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model, variables, batch_data = build(args.batch, args.kpts, dtype)
    train_state = None
    if not args.forward_only:
        from openglue_tpu.train import create_train_state

        train_state = create_train_state(model.apply, variables, learning_rate=1e-4)

    # single-device baseline on device 0
    single = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, jax.devices()[0]), batch_data
    )
    t1 = time_forward(model, variables, single, train_state=train_state)

    if args.mode == "dp":
        mesh = make_mesh({"data": n_dev})
    elif args.mode == "cp":
        mesh = make_mesh({"model": n_dev})
    else:
        m = 2 if n_dev % 2 == 0 else 1
        mesh = make_mesh({"data": n_dev // m, "model": m})
    tn = time_forward(model, variables, batch_data, mesh, train_state=train_state)

    edges = args.batch * args.kpts * args.kpts * 18  # 18 attention layers
    speedup = t1 / tn
    efficiency = speedup / n_dev
    print(
        json.dumps(
            {
                "mode": args.mode,
                "timed": "forward" if args.forward_only else "train_step",
                "devices": n_dev,
                "t1_ms": round(t1 * 1e3, 3),
                "tn_ms": round(tn * 1e3, 3),
                "speedup": round(speedup, 3),
                "efficiency": round(efficiency, 3),
                "edges_per_s_mesh": round(edges / tn, 0),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
