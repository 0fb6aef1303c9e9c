"""Shared online-training assembly for train.py / pretrain_homography.py
(reference train.py + pretrain_homography.py differ only in the dataset and
GT thresholds)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np

from openglue_tpu.cli import common
from openglue_tpu.core.types import Transformation


def collate_image_pairs(samples):
    """Image-pair sample dicts -> jit-consumable dict batch."""
    batch = {
        "image0": np.stack([s["image0"] for s in samples]),
        "image1": np.stack([s["image1"] for s in samples]),
    }
    tf0 = samples[0]["transformation"]
    if tf0["type"] == "perspective":
        batch["transformation"] = Transformation(
            kind="perspective", H=np.stack([s["transformation"]["H"] for s in samples])
        )
    else:
        batch["transformation"] = Transformation(
            kind="3d_reprojection",
            K0=np.stack([s["transformation"]["K0"] for s in samples]),
            K1=np.stack([s["transformation"]["K1"] for s in samples]),
            R=np.stack([s["transformation"]["R"] for s in samples]),
            T=np.stack([s["transformation"]["T"] for s in samples]),
            depth0=np.stack([s["transformation"]["depth0"] for s in samples]),
            depth1=np.stack([s["transformation"]["depth1"] for s in samples]),
        )
    return batch


def build_matching_module(config, features_config=None):
    """MatchingModule from the merged config (+ optional separate features
    config for the online MegaDepth path); loads torch extractor weights when
    given (reference matching_module.py:25-31)."""
    from openglue_tpu.models.matching_module import MatchingModule, MatchingModuleConfig

    cfg_dict = {
        "features": features_config if features_config is not None else config.get("features", {}),
        "laf_to_sideinfo_method": config.get("superglue.laf_to_sideinfo_method", "none"),
        "superglue": config.get("superglue", {}).to_dict() if hasattr(config.get("superglue", {}), "to_dict") else dict(config.get("superglue", {})),
        "train": {"finetune_features_extractor": bool(config.get("train.finetune_features_extractor", False))},
    }
    module_config = MatchingModuleConfig.from_dict(cfg_dict)
    return MatchingModule(module_config)


def load_extractor_weights_into(variables, weights_path: Optional[str], bn: bool):
    """Replace the extractor subtree with converted torch weights."""
    if not weights_path:
        return variables
    import torch

    from openglue_tpu.compat.torch_weights import superpoint_params_from_torch

    sd = torch.load(weights_path, map_location="cpu")
    converted = superpoint_params_from_torch(sd, with_bn=bn)
    variables = dict(variables)
    params = dict(variables["params"])
    params["extractor"] = converted["params"]
    variables["params"] = params
    if "batch_stats" in converted:
        stats = dict(variables.get("batch_stats", {}))
        stats["extractor"] = converted["batch_stats"]
        variables["batch_stats"] = stats
    return variables


def run_online_training(
    config,
    train_loader,
    val_loader_fn: Optional[Callable],
    features_config=None,
    checkpoint: Optional[str] = None,
):
    from openglue_tpu.train import create_train_state
    from openglue_tpu.train.checkpoint import restore_train_state
    from openglue_tpu.train.loop import fit
    from openglue_tpu.train.state import make_online_optimizer
    from openglue_tpu.train.step import make_online_train_step

    model = build_matching_module(config, features_config)
    # pretrain-style configs carry the extractor in config['features']; write
    # it as the experiment's features_config.yaml so inference/evaluate can
    # reconstruct the extractor from the experiment dir alone
    snapshot_features = features_config
    if snapshot_features is None and config.get("features"):
        from openglue_tpu.core.config import Config

        snapshot_features = Config(dict(config.get("features")))
    log_dir = common.prepare_logging_directory(config, snapshot_features)

    first = next(iter(train_loader))
    # jitted init: eager init dispatches PER-OP over a remote-TPU tunnel —
    # the SIFT scale space alone is dozens of 960x720 convs, each paying its
    # own compile+dispatch (observed: the online CLI stuck >20 min inside
    # eager gaussian_blur; train_cached already jits its init)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jax.numpy.asarray(first["image0"]),
        jax.numpy.asarray(first["image1"]),
    )
    jax.block_until_ready(variables)
    weights = (features_config or config.get("features", {})).get("weights")
    bn = "Bn" in str((features_config or config.get("features", {})).get("name", ""))
    variables = load_extractor_weights_into(variables, weights, bn)

    finetune = bool(config.get("train.finetune_features_extractor", False))
    tx = make_online_optimizer(
        variables["params"],
        learning_rate=float(config.get("train.lr", 1e-4)),
        gamma=float(config.get("train.scheduler_gamma", 0.999994)),
        gradient_clip=float(config.get("train.grad_clip", 10.0)),
        finetune_extractor=finetune,
    )
    state = create_train_state(model.apply, variables, tx=tx)
    if checkpoint:
        state = restore_train_state(checkpoint, state)

    mesh, shard_batch, shard_train_step, _ = common.build_mesh_and_sharding()
    aug = config.get("train.augmentations.name", "none")
    step = make_online_train_step(common.loss_config_from(config), augmentation=aug)
    # rng is replicated; (state, batch, rng) signature
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    from openglue_tpu.parallel.mesh import batch_pspec

    data = NamedSharding(mesh, batch_pspec(mesh))
    train_step = jax.jit(step, in_shardings=(repl, data, repl), out_shardings=(repl, repl))

    loop_cfg = common.loop_config_from(config, log_dir)
    eval_step = None
    evaluate_fn = None
    if val_loader_fn is not None:
        from openglue_tpu.train.loop import evaluate_online
        from openglue_tpu.train.step import make_online_eval_step

        eval_step = jax.jit(
            make_online_eval_step(float(config.get("inference.match_threshold", 0.2)))
        )
        evaluate_fn = evaluate_online

    state = fit(
        state,
        lambda s, b, r=jax.random.key(loop_cfg.seed): train_step(s, b, r),
        train_loader,
        loop_cfg,
        eval_step=eval_step,
        eval_batches_fn=val_loader_fn,
        shard_fn=lambda b: shard_batch(b, mesh),
        evaluate_fn=evaluate_fn,
    )
    return state, model, log_dir
