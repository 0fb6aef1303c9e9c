"""Image-level demo (no downloads): generates a small synthetic image folder,
runs homography pretraining of SuperPoint+SuperGlue for a few steps, then
matches a warped pair and writes a visualization.

Run: python examples/pretrain_and_match_images.py --workdir /tmp/og_demo
"""

import argparse
from pathlib import Path

import numpy as np


def make_images(img_dir: Path, count=6, size=(320, 240), seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    img_dir.mkdir(parents=True, exist_ok=True)
    for i in range(count):
        img = np.zeros((size[1], size[0], 3), np.uint8)
        for _ in range(60):
            x, y = int(rng.integers(10, size[0] - 10)), int(rng.integers(10, size[1] - 10))
            color = tuple(int(c) for c in rng.integers(40, 255, 3))
            if rng.random() < 0.5:
                cv2.circle(img, (x, y), int(rng.integers(3, 14)), color, -1)
            else:
                w, h = int(rng.integers(6, 25)), int(rng.integers(6, 25))
                cv2.rectangle(img, (x, y), (x + w, y + h), color, -1)
        cv2.imwrite(str(img_dir / f"img_{i}.png"), img)


def main():
    import yaml

    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/openglue_tpu_demo")
    parser.add_argument("--steps", type=int, default=20)
    args = parser.parse_args()

    work = Path(args.workdir)
    img_dir = work / "images"
    make_images(img_dir)

    config = {
        "data": {
            "root_path": str(img_dir),
            "batch_size": len(__import__("jax").devices()),
            "dataloader_workers": 0,
            "target_size": [256, 192],
            "warp_offset": 24,
        },
        "logging": {"root_path": str(work / "logs"), "name": "demo", "train_logs_steps": 5},
        "train": {
            "epochs": 1, "steps_per_epoch": args.steps, "grad_clip": 10.0,
            "gt_positive_threshold": 3, "gt_negative_threshold": 3,
            "margin": None, "nll_weight": 1.0, "metric_weight": 0.0,
            "lr": 1.0e-3, "scheduler_gamma": 0.999994,
            "augmentations": {"name": "weak_color_aug"},
            "finetune_features_extractor": False,
        },
        "features": {
            "name": "SuperPointNet",
            "parameters": {"max_keypoints": 256, "descriptor_dim": 128},
            "weights": None,
        },
        "superglue": {
            "laf_to_sideinfo_method": "none",
            "positional_encoding": {"hidden_layers_sizes": [32, 64]},
            "attention_gnn": {"num_stages": 3, "num_heads": 4,
                               "attention": "softmax", "use_offset": False},
            "dustbin_score_init": 1.0,
            "otp": {"num_iters": 10, "reg": 1.0},
            "residual": True,
        },
        "inference": {"match_threshold": 0.1},
    }
    cfg_path = work / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(config))

    from openglue_tpu.cli import pretrain_homography

    print(f"pretraining for {args.steps} steps ...")
    state = pretrain_homography.main(["--config", str(cfg_path)])
    print(f"done at step {int(state.step)}")

    # match a fresh warped pair with the trained weights
    import cv2
    import jax
    import jax.numpy as jnp

    from openglue_tpu.cli.online import build_matching_module
    from openglue_tpu.core.config import Config
    from openglue_tpu.data.homography import HomographyPairsDataset
    from openglue_tpu.models.matching import decode_matches
    from openglue_tpu.visualization import draw_matches

    model = build_matching_module(Config(config))
    ds = HomographyPairsDataset(
        img_dir, target_size=(256, 192), max_corner_offset=24,
        color_augmentation=False, seed=123,
    )
    sample = ds[0]
    im0 = jnp.asarray(sample["image0"])[None]
    im1 = jnp.asarray(sample["image1"])[None]
    variables = {"params": state.params, **state.model_state}
    (out, pair) = jax.jit(lambda v, a, b: model.apply(v, a, b))(variables, im0, im1)
    decoded = decode_matches(out["scores"], 0.1, pair.side0.mask, pair.side1.mask)
    m0 = np.asarray(decoded["matches0"][0])
    idx0 = np.flatnonzero(m0 >= 0)
    k0 = np.asarray(pair.side0.keypoints[0])[idx0]
    k1 = np.asarray(pair.side1.keypoints[0])[m0[idx0]]
    conf = np.asarray(decoded["matching_scores0"][0])[idx0]
    out_path = work / "matches.png"
    draw_matches(
        (sample["image0"] * 255).astype(np.uint8),
        (sample["image1"] * 255).astype(np.uint8),
        k0, k1, conf, output_path=out_path,
    )
    print(f"{len(k0)} matches -> {out_path}")


if __name__ == "__main__":
    main()
