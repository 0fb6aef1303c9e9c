"""Homography pretraining on an image folder (reference pretrain_homography.py):
random perspective warps of single images provide exact GT, thresholds 3/3 px.

Usage:
  python -m openglue_tpu.cli.pretrain_homography \
      --config configs/homography_pretraining.yaml [--smoke]
"""

from __future__ import annotations

import argparse

from openglue_tpu.cli import common
from openglue_tpu.cli.online import collate_image_pairs, run_online_training


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/homography_pretraining.yaml")
    parser.add_argument("--config_override", default=None)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--smoke", action="store_true")
    args = parser.parse_args(argv)

    from openglue_tpu.parallel.distributed import initialize as distributed_initialize

    distributed_initialize()
    config = common.load_merged_config(args.config, args.config_override)
    if args.smoke:
        config["train"]["steps_per_epoch"] = 2
        config["train"]["epochs"] = 1

    from openglue_tpu.data import DataLoader, HomographyPairsDataset
    from openglue_tpu.parallel.mesh import local_batch_slice

    data = config["data"]
    start, stop = local_batch_slice(int(data["batch_size"]))
    dataset = HomographyPairsDataset(
        data["root_path"],
        target_size=tuple(data.get("target_size", (960, 720))),
        max_corner_offset=int(data.get("warp_offset", 256)),
        seed=int(config.get("train.seed", 0)) + start,
    )

    import numpy as np

    rng = np.random.default_rng(1234 + start)

    def infinite_indices():
        while True:
            yield int(rng.integers(len(dataset)))

    loader = DataLoader(
        dataset,
        batch_size=stop - start,
        collate_fn=collate_image_pairs,
        sampler=infinite_indices(),
        num_workers=int(data.get("dataloader_workers", 2)),
    )

    # Optional homography-precision validation (the reference disables eval in
    # pretraining — 'evaluation: False'; enable with train.evaluation: true)
    val_loader_fn = None
    if config.get("train.evaluation", False):
        val_ds = HomographyPairsDataset(
            data["root_path"],
            target_size=tuple(data.get("target_size", (960, 720))),
            max_corner_offset=int(data.get("warp_offset", 256)),
            color_augmentation=False,
            seed=999,
        )
        n_val = min(len(val_ds), int(data.get("val_pairs", 32)))
        val_loader_fn = lambda: DataLoader(
            val_ds,
            batch_size=stop - start,
            collate_fn=collate_image_pairs,
            sampler=iter([i % len(val_ds) for i in range(n_val)]),
            num_workers=0,
        )

    state, model, log_dir = run_online_training(
        config, loader, val_loader_fn, checkpoint=args.checkpoint
    )
    return state


if __name__ == "__main__":
    main()
