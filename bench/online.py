"""Online (image-in) path benchmark — BASELINE #4.

Times the two image-in hot paths at the reference's online resolution
(960x720, reference config/config.yaml target_size):

  * the FULL jitted online train step — augmentation -> SuperPoint CNN
    (reference hot loop #3, models/features/superpoint/model.py:61-78) ->
    GT generation -> 9-stage matcher -> backward -> Adam (reference online
    entry train.py:69-85), in image pairs/s;
  * the feature-extraction (cacher) forward — jitted SuperPoint at 960x720 —
    in images/s (reference extract_features.py:121-163).

Synthetic on-device image pairs (random images + random perspective H):
throughput is shape-static, so content does not affect the measurement.

Usage: python -m bench.online [--batch 2] [--height 720] [--width 960]
       [--f32] [--pallas] [--finetune] [--aug weak_color_aug]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from openglue_tpu.core.types import Transformation
from openglue_tpu.models.matching_module import MatchingModule, MatchingModuleConfig
from openglue_tpu.profiling import device_timeit
from openglue_tpu.train import LossConfig, create_train_state
from openglue_tpu.train.state import make_online_optimizer
from openglue_tpu.train.step import make_online_train_step


def synthetic_image_batch(batch: int, height: int, width: int, seed: int = 0):
    """Random grayscale image pairs + mild random perspective H (the online
    homography-pretraining shape, reference oxford_paris_dataset.py:27-66)."""
    rng = np.random.default_rng(seed)
    image0 = rng.random((batch, height, width), dtype=np.float32)
    image1 = rng.random((batch, height, width), dtype=np.float32)
    # H = identity + small perspective jitter; exact geometry is irrelevant to
    # throughput (GT generation cost is shape-static)
    H = np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1))
    H[:, :2, 2] = rng.uniform(-20, 20, (batch, 2)).astype(np.float32)
    return {
        "image0": jnp.asarray(image0),
        "image1": jnp.asarray(image1),
        "transformation": Transformation(kind="perspective", H=jnp.asarray(H)),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--height", type=int, default=720)
    parser.add_argument("--width", type=int, default=960)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("--pallas", action="store_true")
    parser.add_argument("--finetune", action="store_true",
                        help="extractor gradients on (reference finetune flag)")
    parser.add_argument("--aug", default="none")
    parser.add_argument("--extract-batch", type=int, default=8,
                        help="batch for the cacher (extractor-only) timing")
    parser.add_argument("--skip-train", action="store_true")
    parser.add_argument("--skip-extract", action="store_true")
    parser.add_argument(
        "--sweep-batches", type=int, nargs="*", default=None,
        help="measure the train step at several batch sizes interleaved in "
        "ONE process/window (chip drift makes cross-window batch "
        "comparisons unreliable)",
    )
    parser.add_argument(
        "--extract-sweep", type=int, nargs="*", default=None,
        help="cacher batch sizes, interleaved in-window (default: just "
        "--extract-batch)",
    )
    args = parser.parse_args()

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    module_cfg = MatchingModuleConfig.from_dict(
        {
            # the superpoint_magicleap online preset (configs/features_online)
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
            # flagship matcher (reference config/config.yaml:42-55)
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
            "train": {"finetune_features_extractor": bool(args.finetune)},
        }
    )
    model = MatchingModule(module_cfg)
    batch = synthetic_image_batch(args.batch, args.height, args.width)

    init = jax.jit(
        lambda rng, b: model.init(rng, b["image0"], b["image1"], train=True)
    )
    variables = init(jax.random.key(0), batch)
    jax.block_until_ready(jax.tree_util.tree_leaves(variables)[0])

    result = {
        "metric": "online_train_pairs_per_sec_per_chip",
        "unit": "pairs/s",
        "detail": {
            "device": str(jax.devices()[0]),
            "batch": args.batch,
            "image": [args.width, args.height],
            "kpts": args.kpts,
            "dtype": "float32" if args.f32 else "bfloat16",
            "pallas": bool(args.pallas),
            "finetune": bool(args.finetune),
            "augmentation": args.aug,
        },
    }

    if not args.skip_train:
        tx = make_online_optimizer(
            variables["params"], learning_rate=1e-4,
            finetune_extractor=args.finetune,
        )
        state = create_train_state(model.apply, variables, tx=tx)
        step = make_online_train_step(
            LossConfig(positive_threshold=3.0, negative_threshold=3.0),
            augmentation=args.aug,
        )
        rng = jax.random.key(1)

        def run(b):
            new_state, metrics = step(state, b, rng)
            # anchor the whole step (loss alone lets XLA delete bwd + Adam)
            param_norm = sum(
                jnp.sum(jnp.square(x))
                for x in jax.tree_util.tree_leaves(new_state.params)
            )
            return metrics["total_loss"] + metrics["grad_norm"] + param_norm

        def perturb(b, s):
            # keep the CNN + GT gen inside the timed loop
            return {**b, "image0": b["image0"] * s, "image1": b["image1"] * s}

        for bsz in args.sweep_batches or [args.batch]:
            b = (
                batch if bsz == args.batch
                else synthetic_image_batch(bsz, args.height, args.width)
            )
            seconds = device_timeit(run, b, perturb=perturb)
            result["value"] = round(bsz / seconds, 2)
            result["detail"]["batch"] = bsz
            result["detail"]["ms_per_step"] = round(seconds * 1e3, 2)
            print(json.dumps(result), flush=True)

    if not args.skip_extract:
        # cacher throughput: extractor-only forward (reference
        # extract_features.py process_chunk inner loop, device part)
        ex_apply = jax.jit(
            lambda v, im: model.apply(v, im, train=False, method="extract")
        )

        def run_extract(im):
            f = ex_apply(variables, im)
            return (
                jnp.sum(f.lafs.astype(jnp.float32))
                + jnp.sum(f.descriptors.astype(jnp.float32))
                + jnp.sum(f.responses.astype(jnp.float32))
            )

        for eb in args.extract_sweep or [args.extract_batch]:
            images = jnp.asarray(
                np.random.default_rng(1).random(
                    (eb, args.height, args.width), dtype=np.float32
                )
            )
            seconds = device_timeit(run_extract, images, perturb=lambda im, s: im * s)
            print(
                json.dumps(
                    {
                        "metric": "extract_images_per_sec_per_chip",
                        "value": round(eb / seconds, 2),
                        "unit": "images/s",
                        "detail": {
                            "device": str(jax.devices()[0]),
                            "batch": eb,
                            "image": [args.width, args.height],
                            "kpts": args.kpts,
                            "dtype": "float32" if args.f32 else "bfloat16",
                            "ms_per_batch": round(seconds * 1e3, 2),
                        },
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
