"""Standalone evaluation: run a trained matcher over MegaDepth validation
pairs and report epipolar precision / matching score / pose AUC (the
reference's `trainer.validate` path, matching_module.py:107-131, as a CLI).

Usage:
  python -m openglue_tpu.cli.evaluate --experiment logs/<name>/<exp> \
      --config configs/config_cached.yaml [--max_pairs 200]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from openglue_tpu.cli import common
from openglue_tpu.core.config import load_config


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--experiment", required=True, help="training experiment dir")
    parser.add_argument("--config", default=None, help="data config (defaults to the experiment's)")
    parser.add_argument("--checkpoint_step", type=int, default=None)
    parser.add_argument("--split", default="val", choices=["val", "test"])
    parser.add_argument("--max_pairs", type=int, default=None)
    args = parser.parse_args(argv)

    from openglue_tpu.parallel.distributed import initialize as distributed_initialize

    distributed_initialize()
    exp = Path(args.experiment)
    config = common.load_merged_config(
        str(exp / "config.yaml"), args.config
    )
    features_config = load_config(exp / "features_config.yaml")
    descriptor_dim = int(features_config["descriptor_dim"])

    from functools import partial

    from openglue_tpu.data import (
        DataLoader,
        MegaDepthPairsDatasetFeatures,
        ShardedSequentialSampler,
        stack_keypoints_batch,
    )
    from openglue_tpu.features.lafs import get_laf_to_sideinfo_converter
    from openglue_tpu.models.superglue import SuperGlue
    from openglue_tpu.train import create_train_state, make_eval_step
    from openglue_tpu.train.checkpoint import restore_train_state
    from openglue_tpu.train.loop import TrainLoopConfig, evaluate

    laf_method = config.get("superglue.laf_to_sideinfo_method", "none")
    laf_converter = get_laf_to_sideinfo_converter(laf_method)
    sg_config = common.superglue_config_from(config, descriptor_dim, laf_converter.side_info_dim)
    model = SuperGlue(sg_config)

    data = config["data"]
    root = data["root_path"]
    list_key = "val_list_path" if args.split == "val" else "test_list_path"

    def read_scene_list(path):
        p = Path(path)
        if not p.is_absolute():
            p = Path(root) / p
        return [s.strip() for s in p.read_text().splitlines() if s.strip()]

    dataset = MegaDepthPairsDatasetFeatures(
        root, data["features_dir"], read_scene_list(data[list_key]),
        target_size=tuple(data.get("target_size", (960, 720))),
        random_crop=False,
        max_pairs_per_scene=data.get("val_max_pairs_per_scene"),
    )
    num_kpts = int(data.get("max_keypoints", 1024))
    # data.buckets: bucketed padding, same contract as the train_cached CLI.
    buckets = data.get("buckets")
    buckets = tuple(int(b) for b in buckets) if buckets else None
    batch_size = max(int(data.get("batch_size", 8)) // jax.process_count(), 1)
    length = len(dataset)
    if args.max_pairs is not None:
        length = min(length, args.max_pairs)
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        collate_fn=partial(
            stack_keypoints_batch,
            target_num_keypoints=num_kpts,
            random=False,
            laf_converter=laf_converter,
            buckets=buckets,
        ),
        sampler=iter(ShardedSequentialSampler(length)),
        num_workers=int(data.get("dataloader_workers", 2)),
        drop_last=False,
    )

    # init template + restore
    first = None
    for batch in loader:
        first = batch
        break
    if first is None:
        raise SystemExit("no evaluation pairs found")
    from openglue_tpu.train.step import superglue_inputs

    variables = model.init(jax.random.key(0), **superglue_inputs(first))
    state = create_train_state(model.apply, variables)
    state = restore_train_state(exp / "checkpoints", state, step=args.checkpoint_step)

    eval_step = jax.jit(make_eval_step(float(config.get("inference.match_threshold", 0.2))))
    loop_cfg = common.loop_config_from(config, None)

    def batches():
        return DataLoader(
            dataset,
            batch_size=batch_size,
            collate_fn=partial(
                stack_keypoints_batch,
                target_num_keypoints=num_kpts,
                random=False,
                laf_converter=laf_converter,
                buckets=buckets,
            ),
            sampler=iter(ShardedSequentialSampler(length)),
            num_workers=int(data.get("dataloader_workers", 2)),
            drop_last=False,
        )

    metrics = evaluate(state, eval_step, batches(), loop_cfg)
    print(json.dumps(metrics, indent=2))
    return metrics


if __name__ == "__main__":
    main()
