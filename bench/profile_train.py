"""Train-step decomposition profile: where does a training step spend time?

Times each stage of the flagship train step (GT generation, train-mode
forward+loss, forward+backward, the full step with Adam, and the eval-mode
forward for contrast) with the device-side loop methodology
(openglue_tpu.profiling.device_timeit — the axon tunnel's block_until_ready
does not sync). Differences between stages isolate the backward cost, the
optimizer cost, and the train-vs-eval forward gap (train mode cannot use the
fused whole-layer kernel because BatchNorm needs batch statistics).

Usage: python -m bench.profile_train [--batch 12] [--kpts 1024] [--f32] [--pallas]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.data.synthetic import SyntheticHomographyPairs
from openglue_tpu.geometry.gt_matches import generate_gt_matches
from openglue_tpu.losses import criterion
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
    args = parser.parse_args()

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    cfg = SuperGlueConfig(
        descriptor_dim=256, pe_hidden_layers_sizes=(32, 64, 128), num_stages=9,
        num_heads=4, otp_num_iters=20, residual=True, dtype=dtype,
        use_pallas=args.pallas,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=args.kpts, descriptor_dim=256)
    batch = gen.sample(jax.random.key(0), args.batch)
    init = jax.jit(lambda rng, b: model.init(rng, **superglue_inputs(b, train=True)))
    variables = init(jax.random.key(1), batch)
    jax.block_until_ready(variables)
    state = create_train_state(model.apply, variables, learning_rate=1e-4)
    loss_cfg = LossConfig(positive_threshold=2.0, negative_threshold=7.0)

    def perturb(b, s):
        # keypoints too, so GT generation / positional encoding stay inside
        # the timed loop (see bench/train_step.py)
        return b.replace(
            side0=b.side0.replace(
                descriptors=b.side0.descriptors * s,
                keypoints=b.side0.keypoints * s,
            )
        )

    def gt_of(b):
        return generate_gt_matches(
            b.side0.keypoints, b.side1.keypoints, b.transformation,
            positive_threshold=2.0, negative_threshold=7.0,
            mask0=b.side0.mask, mask1=b.side1.mask,
        )

    def loss_of(params, b, train):
        mutable = ["batch_stats"] if train else False
        out = state.apply_fn(
            {"params": params, **state.model_state},
            **superglue_inputs(b, train=train),
            mutable=mutable,
        )
        out = out[0] if train else out
        losses = criterion(gt_of(b), out, mask0=b.side0.mask, mask1=b.side1.mask)
        return losses["loss"]

    # ---- stages, each anchored so XLA cannot dead-code the work ----
    def gt_only(b):
        gt = gt_of(b)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in gt.values())

    def fwd_eval(b):
        out = state.apply_fn(
            {"params": state.params, **state.model_state},
            **superglue_inputs(b, train=False),
        )
        return jnp.sum(out["scores"].astype(jnp.float32))

    def fwd_train_loss(b):
        return loss_of(state.params, b, train=True)

    def fwd_bwd(b):
        loss, grads = jax.value_and_grad(loss_of)(state.params, b, True)
        gnorm = sum(jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads))
        return loss + gnorm

    def gnn_bwd(b):
        # grad through PE + GNN only (head/Sinkhorn/loss excluded): isolates
        # the layer-stack backward from the matching-head backward
        def gnn_loss(params):
            out, _ = state.apply_fn(
                {"params": params, **state.model_state},
                **superglue_inputs(b, train=True),
                mutable=["batch_stats"],
            )
            return (
                jnp.sum(out["context_descriptors0"].astype(jnp.float32))
                + jnp.sum(out["context_descriptors1"].astype(jnp.float32))
            )

        loss, grads = jax.value_and_grad(gnn_loss)(state.params)
        gnorm = sum(jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads))
        return loss + gnorm

    step = make_train_step(loss_cfg)

    def full_step(b):
        new_state, metrics = step(state, b)
        pnorm = sum(
            jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(new_state.params)
        )
        return metrics["total_loss"] + metrics["grad_norm"] + pnorm

    stages = {
        "gt_only": gt_only,
        "fwd_eval": fwd_eval,
        "fwd_train_loss": fwd_train_loss,
        "fwd_bwd": fwd_bwd,
        "gnn_bwd": gnn_bwd,
        "full_step": full_step,
    }
    result = {}
    for name, fn in stages.items():
        seconds = device_timeit(fn, batch, perturb=perturb)
        result[name + "_ms"] = round(seconds * 1e3, 3)
        print(f"{name}: {seconds * 1e3:.3f} ms", flush=True)

    result["derived"] = {
        "bwd_only_ms": round(result["fwd_bwd_ms"] - result["fwd_train_loss_ms"], 3),
        "optimizer_ms": round(result["full_step_ms"] - result["fwd_bwd_ms"], 3),
        "train_vs_eval_fwd_ms": round(
            result["fwd_train_loss_ms"] - result["fwd_eval_ms"], 3
        ),
        "head_and_loss_fwd_bwd_ms": round(
            result["fwd_bwd_ms"] - result["gnn_bwd_ms"], 3
        ),
    }
    result["config"] = {
        "batch": args.batch, "kpts": args.kpts,
        "dtype": "float32" if args.f32 else "bfloat16",
        "pallas": bool(args.pallas), "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
