"""Decomposition of the online (image-in) train step — BASELINE #4 hot-path
profile: where do the 23 ms/step go at the reference's 960×720 resolution?

Stages timed independently (each its own jit, device_timeit):
  * extractor fwd, batch 2B (both sides of every pair at once)
  * extractor conv backbone only vs full extract (isolates NMS/top-k/
    descriptor-sampling epilogue)
  * matcher-only train step at the online batch (B pairs, N kpts)
  * full online train step (augment -> extract -> GT -> matcher -> bwd ->
    Adam)

Usage: python -m bench.profile_online [--batch 2] [--pallas]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from openglue_tpu.profiling import device_timeit


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--height", type=int, default=720)
    parser.add_argument("--width", type=int, default=960)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("--pallas", action="store_true")
    args = parser.parse_args()

    from bench.online import synthetic_image_batch
    from openglue_tpu.models.matching_module import MatchingModule
    from openglue_tpu.train import LossConfig, create_train_state, make_train_step
    from openglue_tpu.train.state import make_online_optimizer
    from openglue_tpu.train.step import (
        make_online_train_step,
        superglue_inputs,
    )

    dtype = jnp.float32 if args.f32 else jnp.bfloat16

    from openglue_tpu.models.matching_module import MatchingModuleConfig

    module_cfg = MatchingModuleConfig.from_dict(
        {
            "features": {
                "name": "SuperPointNet",
                "parameters": {
                    "max_keypoints": args.kpts,
                    "descriptor_dim": 256,
                    "nms_kernel": 9,
                    "remove_borders_size": 4,
                    "keypoint_threshold": 0.005,
                    "dtype": dtype,
                },
            },
            "superglue": {
                "positional_encoding": {"hidden_layers_sizes": [32, 64, 128]},
                "attention_gnn": {"num_stages": 9, "num_heads": 4,
                                  "attention": "softmax"},
                "otp": {"num_iters": 20, "reg": 1.0},
                "residual": True,
                "dtype": dtype,
                "chain_dtype": None if args.f32 else jnp.bfloat16,
                "use_pallas": args.pallas,
            },
            "train": {"finetune_features_extractor": False},
        }
    )
    model = MatchingModule(module_cfg)
    batch = synthetic_image_batch(args.batch, args.height, args.width)
    init = jax.jit(lambda r, b: model.init(r, b["image0"], b["image1"], train=True))
    variables = init(jax.random.key(0), batch)
    jax.block_until_ready(jax.tree_util.tree_leaves(variables)[0])
    result = {}

    def record(name, fn, x, perturb=None):
        t = device_timeit(fn, x, perturb=perturb)
        result[name + "_ms"] = round(t * 1e3, 3)
        print(f"{name}: {t * 1e3:.3f} ms", flush=True)

    # --- extractor: full extract at 2B ---------------------------------
    images = jnp.concatenate([batch["image0"], batch["image1"]], axis=0)
    ex_apply = jax.jit(lambda v, im: model.apply(v, im, train=False, method="extract"))

    def run_extract(im):
        f = ex_apply(variables, im)
        return (
            jnp.sum(f.lafs.astype(jnp.float32))
            + jnp.sum(f.descriptors.astype(jnp.float32))
            + jnp.sum(f.responses.astype(jnp.float32))
        )

    record("extract_full_2B", run_extract, images, perturb=lambda im, s: im * s)

    # --- extractor: conv backbone only (dense score + descriptor maps;
    # fresh init params — timing is weight-independent) ------------------
    from openglue_tpu.features.superpoint import SuperPointBackbone

    bb = SuperPointBackbone(descriptor_dim=256, bn=False, dtype=dtype)
    img4 = images[..., None]
    bbv = jax.jit(bb.init)(jax.random.key(3), img4)
    jax.block_until_ready(jax.tree_util.tree_leaves(bbv)[0])
    bb_apply = jax.jit(lambda v, im: bb.apply(v, im))

    def run_backbone(im):
        desc_map, cell_scores = bb_apply(bbv, im)
        return jnp.sum(desc_map.astype(jnp.float32)) + jnp.sum(
            cell_scores.astype(jnp.float32)
        )

    record("backbone_2B", run_backbone, img4, perturb=lambda im, s: im * s)

    # --- matcher-only train step at the online batch/kpts ---------------
    from openglue_tpu.data.synthetic import SyntheticHomographyPairs
    from openglue_tpu.models.superglue import SuperGlue

    matcher = SuperGlue(module_cfg.superglue)
    gen = SyntheticHomographyPairs(num_keypoints=args.kpts, descriptor_dim=256)
    mbatch = gen.sample(jax.random.key(1), args.batch)
    minit = jax.jit(lambda r, b: matcher.init(r, **superglue_inputs(b, train=True)))
    mvars = minit(jax.random.key(2), mbatch)
    jax.block_until_ready(mvars)
    mstate = create_train_state(matcher.apply, mvars, learning_rate=1e-4)
    mstep = make_train_step(LossConfig(positive_threshold=3.0, negative_threshold=3.0))

    def run_matcher(b):
        s, m = mstep(mstate, b)
        pn = sum(jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(s.params))
        return m["total_loss"] + m["grad_norm"] + pn

    record("matcher_step_B", run_matcher, mbatch)

    # --- full online step ------------------------------------------------
    tx = make_online_optimizer(
        variables["params"], learning_rate=1e-4, finetune_extractor=False
    )
    state = create_train_state(model.apply, variables, tx=tx)
    step = make_online_train_step(
        LossConfig(positive_threshold=3.0, negative_threshold=3.0),
        augmentation="none",
    )
    rng = jax.random.key(1)

    def run_full(b):
        s, m = step(state, b, rng)
        pn = sum(jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(s.params))
        return m["total_loss"] + m["grad_norm"] + pn

    record(
        "full_online_step", run_full, batch,
        perturb=lambda b, s: {**b, "image0": b["image0"] * s, "image1": b["image1"] * s},
    )

    result["config"] = {
        "batch": args.batch, "image": [args.width, args.height],
        "kpts": args.kpts, "dtype": str(dtype.__name__),
        "pallas": bool(args.pallas), "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
