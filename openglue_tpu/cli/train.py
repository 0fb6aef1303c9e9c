"""Online end-to-end MegaDepth training (reference train.py): SuperPoint
extraction + matching jointly in the jitted step.

Usage:
  python -m openglue_tpu.cli.train --config configs/config.yaml \
      --features_config configs/features_online/superpoint_magicleap.yaml [--smoke]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from openglue_tpu.cli import common
from openglue_tpu.cli.online import collate_image_pairs, run_online_training
from openglue_tpu.core.config import load_config


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("--config_override", default=None)
    parser.add_argument(
        "--features_config", default="configs/features_online/superpoint_magicleap.yaml"
    )
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--smoke", action="store_true")
    args = parser.parse_args(argv)

    from openglue_tpu.parallel.distributed import initialize as distributed_initialize

    distributed_initialize()
    config = common.load_merged_config(args.config, args.config_override)
    features_config = load_config(args.features_config)
    if args.smoke:
        config["train"]["steps_per_epoch"] = 2
        config["train"]["epochs"] = 1

    from openglue_tpu.data import BalancedSceneSampler, DataLoader, MegaDepthPairsDataset
    from openglue_tpu.parallel.mesh import local_batch_slice

    data = config["data"]
    root = data["root_path"]

    def read_scene_list(path):
        p = Path(path)
        if not p.is_absolute():
            p = Path(root) / p
        return [s.strip() for s in p.read_text().splitlines() if s.strip()]

    start, stop = local_batch_slice(int(data["batch_size"]))
    train_ds = MegaDepthPairsDataset(
        root,
        read_scene_list(data["train_list_path"]),
        target_size=tuple(data.get("target_size", (960, 720))),
        random_crop=True,
        overlap=tuple(data["train_pairs_overlap"]) if data.get("train_pairs_overlap") else None,
    )
    loader = DataLoader(
        train_ds,
        batch_size=stop - start,
        collate_fn=collate_image_pairs,
        sampler=iter(BalancedSceneSampler(train_ds.index.scene_sizes())),
        num_workers=int(data.get("dataloader_workers", 2)),
    )

    from openglue_tpu.data import ShardedSequentialSampler

    val_ds = MegaDepthPairsDataset(
        root,
        read_scene_list(data["val_list_path"]),
        target_size=tuple(data.get("target_size", (960, 720))),
        random_crop=False,
        max_pairs_per_scene=data.get("val_max_pairs_per_scene"),
    )
    val_loader_fn = (
        (
            lambda: DataLoader(
                val_ds,
                batch_size=stop - start,
                collate_fn=collate_image_pairs,
                sampler=iter(ShardedSequentialSampler(len(val_ds))),
                num_workers=int(data.get("dataloader_workers", 2)),
            )
        )
        if len(val_ds)
        else None
    )
    state, model, log_dir = run_online_training(
        config, loader, val_loader_fn,
        features_config=features_config, checkpoint=args.checkpoint,
    )
    return state


if __name__ == "__main__":
    main()
