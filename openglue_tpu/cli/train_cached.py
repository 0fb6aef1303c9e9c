"""Cached-feature MegaDepth training (reference train_cached.py).

The features config is read from ``<root>/<features_dir>/config.yaml`` — the
contract written by the feature cacher (reference train_cached.py:58-59 /
extract_features.py:103-104).

Usage:
  python -m openglue_tpu.cli.train_cached --config configs/config_cached.yaml \
      [--config_override my.yaml] [--checkpoint path] [--smoke]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from openglue_tpu.cli import common
from openglue_tpu.core.config import load_config


def build_dataloaders(config, laf_converter):
    from functools import partial

    from openglue_tpu.data import (
        BalancedSceneSampler,
        DataLoader,
        MegaDepthPairsDatasetFeatures,
        ShardedSequentialSampler,
        stack_keypoints_batch,
    )
    from openglue_tpu.parallel.mesh import local_batch_slice

    data = config["data"]
    root = data["root_path"]

    def read_scene_list(path):
        p = Path(path)
        if not p.is_absolute():
            p = Path(root) / p
        return [s.strip() for s in p.read_text().splitlines() if s.strip()]

    num_kpts = int(data.get("max_keypoints", 1024))
    # data.buckets: [256, 512, 1024] pads each batch to the smallest bucket
    # that fits its largest keypoint count (one XLA program per bucket) —
    # sparse batches run on smaller graphs (data/bucketing.py).
    buckets = data.get("buckets")
    buckets = tuple(int(b) for b in buckets) if buckets else None
    # data.bucket_grouping: group samples into same-bucket batches BEFORE
    # forming them — at flagship batch sizes per-batch bucketing alone is a
    # wash because one saturated image drags the batch to the cap. Grouping
    # runs on INDICES with cheap h5-metadata keypoint counts
    # (BucketGroupedIndexBatches): the schedule is computed identically on
    # every host from the shared global sampler stream (multi-host DP safe —
    # shapes agree by construction), and loading + collate both run in the
    # DataLoader worker pool (the round-4 trainer was collate-bound on the
    # consumer thread).
    bucket_grouping = bool(data.get("bucket_grouping")) and buckets is not None
    global_batch = int(data["batch_size"])
    start, stop = local_batch_slice(global_batch)
    local_batch = stop - start

    cache_images = int(data.get("cache_images", 64))
    # data.device_descriptor_cache: keep per-image descriptor blocks resident
    # in HBM and send only row indices per batch (data/device_cache.py) —
    # descriptors are ~97% of batch bytes, so on an H2D-limited link this is
    # the difference between transfer-bound and device-bound training.
    device_cache_slots = int(data.get("device_descriptor_cache", 0))
    device_desc = device_cache_slots > 0
    train_ds = MegaDepthPairsDatasetFeatures(
        root, data["features_dir"], read_scene_list(data["train_list_path"]),
        target_size=tuple(data.get("target_size", (960, 720))),
        random_crop=True,
        overlap=tuple(data["train_pairs_overlap"]) if data.get("train_pairs_overlap") else None,
        cache_images=cache_images,
        device_descriptors=device_desc,
    )
    val_ds = MegaDepthPairsDatasetFeatures(
        root, data["features_dir"], read_scene_list(data["val_list_path"]),
        target_size=tuple(data.get("target_size", (960, 720))),
        random_crop=False,
        max_pairs_per_scene=data.get("val_max_pairs_per_scene"),
        cache_images=cache_images,
        device_descriptors=device_desc,
    )

    collate_base = stack_keypoints_batch
    if device_desc:
        from openglue_tpu.data.collate import stack_keypoints_batch_device

        collate_base = stack_keypoints_batch_device
    train_collate = partial(
        collate_base,
        target_num_keypoints=num_kpts,
        random=True,
        laf_converter=laf_converter,
        buckets=buckets,
    )
    val_collate = partial(
        collate_base,
        target_num_keypoints=num_kpts,
        random=False,
        laf_converter=laf_converter,
        buckets=buckets,
    )
    # bf16-compute models cast descriptors to bf16 on arrival anyway; casting
    # them host-side halves the H2D payload (descriptors are ~97% of the
    # batch bytes) — data/collate.py:cast_for_transfer. Runs in the worker
    # pool. Opt out with data.transfer_bf16: false. (Moot in device-cache
    # mode: descriptors never ride the batch.)
    if (
        not device_desc
        and str(config.get("superglue.dtype") or "") in ("bfloat16", "bf16")
        and bool(data.get("transfer_bf16", True))
    ):
        from openglue_tpu.data.collate import cast_for_transfer

        def _bf16_collate(base):
            return lambda samples, **kw: cast_for_transfer(base(samples, **kw))

        train_collate = _bf16_collate(train_collate)
        val_collate = _bf16_collate(val_collate)
    workers = int(data.get("dataloader_workers", 2))

    def make_train_loader():
        if not bucket_grouping:
            return DataLoader(
                train_ds, batch_size=local_batch, collate_fn=train_collate,
                sampler=iter(BalancedSceneSampler(train_ds.index.scene_sizes())),
                num_workers=workers,
            )
        from openglue_tpu.data.bucketing import BucketGroupedIndexBatches

        # GLOBAL sampler stream (shard_index=0 on every host) — the grouped
        # schedule must be host-invariant; distribution happens by slicing
        # each global batch (local_slice), not by decorrelated streams
        global_stream = iter(
            BalancedSceneSampler(
                train_ds.index.scene_sizes(), num_shards=1, shard_index=0
            )
        )
        groups = BucketGroupedIndexBatches(
            global_stream, train_ds.keypoint_count,
            batch_size=global_batch, buckets=buckets,
            local_slice=(start, stop),
        )
        return DataLoader(
            train_ds, batch_size=local_batch, collate_fn=train_collate,
            batch_sampler=iter(groups), num_workers=workers,
        )

    # drop_last=False for validation: the ungrouped val DataLoader keeps the
    # trailing partial batch, so the grouped path must too — val metrics must
    # not change based on a throughput flag. Val grouping is PER-HOST (no
    # local_slice): the eval jit runs on local arrays, only the metric sync
    # at the end is collective, so shapes need not match across hosts.
    def make_val_loader():
        sampler = iter(ShardedSequentialSampler(len(val_ds)))
        if not bucket_grouping:
            return DataLoader(
                val_ds, batch_size=local_batch, collate_fn=val_collate,
                sampler=sampler, num_workers=workers, drop_last=False,
            )
        from openglue_tpu.data.bucketing import BucketGroupedIndexBatches

        groups = BucketGroupedIndexBatches(
            sampler, val_ds.keypoint_count,
            batch_size=local_batch, buckets=buckets, drop_last=False,
        )
        return DataLoader(
            val_ds, batch_size=local_batch, collate_fn=val_collate,
            batch_sampler=iter(groups), num_workers=workers, drop_last=False,
        )

    return make_train_loader(), make_val_loader


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/config_cached.yaml")
    parser.add_argument("--config_override", default=None)
    parser.add_argument("--checkpoint", default=None, help="resume from this checkpoint dir")
    parser.add_argument("--smoke", action="store_true", help="tiny loop for CI")
    parser.add_argument(
        "--checkify", action="store_true",
        help="wrap the train step with NaN/Inf checks (debugging; slower)",
    )
    args = parser.parse_args(argv)

    from openglue_tpu.parallel.distributed import initialize as distributed_initialize

    distributed_initialize()
    config = common.load_merged_config(args.config, args.config_override)
    if args.smoke:
        config["train"]["steps_per_epoch"] = 2
        config["train"]["epochs"] = 1

    features_dir = Path(config["data"]["root_path"]) / config["data"]["features_dir"]
    features_config = load_config(features_dir / "config.yaml")
    descriptor_dim = int(features_config["descriptor_dim"])

    from openglue_tpu.features.lafs import get_laf_to_sideinfo_converter
    from openglue_tpu.models.superglue import SuperGlue
    from openglue_tpu.train import create_train_state, make_eval_step, make_train_step
    from openglue_tpu.train.checkpoint import restore_train_state
    from openglue_tpu.train.loop import fit
    from openglue_tpu.train.step import superglue_inputs

    laf_method = config.get("superglue.laf_to_sideinfo_method", "none")
    laf_converter = get_laf_to_sideinfo_converter(laf_method)
    sg_config = common.superglue_config_from(config, descriptor_dim, laf_converter.side_info_dim)
    model = SuperGlue(sg_config)

    log_dir = common.prepare_logging_directory(config, features_config)
    train_loader, val_loader_fn = build_dataloaders(config, laf_converter)

    mesh, shard_batch, shard_train_step, shard_eval_step = common.build_mesh_and_sharding()
    device_cache_slots = int(config.get("data.device_descriptor_cache", 0) or 0)
    if device_cache_slots > 0:
        from openglue_tpu.data.device_cache import DeviceDescriptorCache

        desc_cache = DeviceDescriptorCache(
            device_cache_slots,
            cap=int(config.get("data.device_cache_cap", 2048)),
            dim=descriptor_dim,
            mesh=mesh,
        )
        shard_fn = desc_cache.shard_fn(mesh)
    else:
        shard_fn = lambda b: shard_batch(b, mesh)

    train_iter = iter(train_loader)
    first = next(train_iter)
    # device-cache mode: materialize descriptors for the init batch
    first_for_init = shard_fn(first) if device_cache_slots > 0 else first
    # jitted init: eager init dispatches per-op over the tunnel (minutes)
    init = jax.jit(lambda rng, b: model.init(rng, **superglue_inputs(b)))
    variables = init(jax.random.key(0), first_for_init)
    jax.block_until_ready(variables)
    # superglue.weights: warm-start just the matcher (reference
    # superglue.py:25-27 / config_cached_sp_magicleap.yaml): .pth/.pt loads a
    # torch SuperGlue state dict through the converter, anything else the
    # save_weights npz tree.
    warm_start = config.get("superglue.weights")
    if warm_start:
        if str(warm_start).endswith((".pth", ".pt")):
            import torch

            from openglue_tpu.compat.torch_weights import superglue_params_from_torch

            sd = torch.load(warm_start, map_location="cpu")
            sd = sd.get("state_dict", sd)
            variables = superglue_params_from_torch(sd, sg_config)
        else:
            from openglue_tpu.train.checkpoint import load_weights

            variables = load_weights(warm_start, variables)
    warmup_steps = int(config.get("train.warmup_steps", 0))
    tx = None
    if warmup_steps > 0:
        from openglue_tpu.train.state import make_warmup_optimizer

        tx = make_warmup_optimizer(
            learning_rate=float(config.get("train.lr", 1e-4)),
            warmup_steps=warmup_steps,
            gamma=float(config.get("train.scheduler_gamma", 0.999994)),
            gradient_clip=float(config.get("train.grad_clip", 10.0)),
        )
    state = create_train_state(
        model.apply,
        variables,
        learning_rate=float(config.get("train.lr", 1e-4)),
        gamma=float(config.get("train.scheduler_gamma", 0.999994)),
        gradient_clip=float(config.get("train.grad_clip", 10.0)),
        tx=tx,
    )
    # Full train-state resume: CLI flag wins; the config's top-level
    # `checkpoint:` field is the in-config resume example the reference ships
    # (config_cached_sp_magicleap.yaml:73, consumed at train.py:83-85).
    resume_from = args.checkpoint or config.get("checkpoint")
    if resume_from:
        state = restore_train_state(resume_from, state)

    raw_step = make_train_step(common.loss_config_from(config))
    if args.checkify:
        # checkify composes under jit (single-host debug path; the error
        # reduction is not mesh-aware, so no DP sharding here)
        from jax.experimental import checkify as _checkify

        from openglue_tpu.debugging import DEFAULT_CHECKS

        _checked = jax.jit(_checkify.checkify(raw_step, errors=DEFAULT_CHECKS))

        def train_step(state, batch):
            err, out = _checked(state, batch)
            _checkify.check_error(err)
            return out
    else:
        train_step = shard_train_step(raw_step, mesh)
    eval_step_fn = make_eval_step(float(config.get("inference.match_threshold", 0.2)))
    # eval outputs come back to host for RANSAC; keep them on data sharding
    eval_step = jax.jit(eval_step_fn)

    buckets_cfg = config.get("data.buckets")
    if buckets_cfg and bool(config.get("train.precompile_buckets", True)) and not args.checkify:
        # one up-front warmup per bucket shape instead of multi-minute
        # compile stalls on each bucket's first mid-epoch appearance
        from openglue_tpu.train.loop import precompile_buckets

        num_kpts = int(config.get("data.max_keypoints", 1024))
        sizes = sorted({min(int(b), num_kpts) for b in buckets_cfg})
        precompile_buckets(train_step, state, first, sizes, shard_fn=shard_fn)

    import itertools

    loop_cfg = common.loop_config_from(config, log_dir)
    state = fit(
        state,
        train_step,
        itertools.chain([first], train_iter),  # init batch still gets trained on
        loop_cfg,
        eval_step=eval_step,
        eval_batches_fn=val_loader_fn,
        shard_fn=shard_fn,
    )
    return state


if __name__ == "__main__":
    main()
