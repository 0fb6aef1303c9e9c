"""Shared CLI plumbing (reference train.py:22-66, utils/train_utils.py:13-30).

Config loading/merging, experiment naming, rank-0 log-dir preparation with
config snapshots, and the standard state/mesh assembly used by all training
entry points.
"""

from __future__ import annotations

import datetime
from pathlib import Path
from typing import Optional, Tuple

from openglue_tpu.core.config import Config, load_config, merge_configs, save_config


def load_merged_config(base_path: str, override_path: Optional[str] = None) -> Config:
    """Base YAML + optional override merged (reference train.py:22-27)."""
    base = load_config(base_path)
    if override_path:
        return merge_configs(base, load_config(override_path))
    return base


def experiment_name(config: Config, features_config: Optional[Config]) -> str:
    """`{features}__attn_{...}__laf_{...}__{timestamp}` (reference train.py:33-38)."""
    features = features_config["name"] if features_config else "cached"
    attention = config.get("superglue.attention_gnn.attention", "softmax")
    laf = config.get("superglue.laf_to_sideinfo_method", "none")
    stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    return f"{features}__attn_{attention}__laf_{laf}__{stamp}"

def prepare_logging_directory(
    config: Config, features_config: Optional[Config] = None
) -> Path:
    """Create the experiment dir and snapshot configs into it on the main host
    (reference utils/train_utils.py:13-30)."""
    import jax

    root = Path(config.get("logging.root_path", "logs"))
    name = config.get("logging.name", "default")
    log_dir = root / name / experiment_name(config, features_config)
    if jax.process_index() == 0:
        log_dir.mkdir(parents=True, exist_ok=True)
        save_config(config, log_dir / "config.yaml")
        if features_config is not None:
            save_config(features_config, log_dir / "features_config.yaml")
    return log_dir


def loss_config_from(config: Config):
    from openglue_tpu.train.step import LossConfig

    train = config.get("train", {})
    return LossConfig(
        positive_threshold=float(train.get("gt_positive_threshold", 2.0)),
        negative_threshold=float(train.get("gt_negative_threshold", 7.0)),
        nll_weight=float(train.get("nll_weight", 1.0)),
        metric_weight=float(train.get("metric_weight", 0.0)),
        margin=train.get("margin"),
    )


def loop_config_from(config: Config, log_dir: Optional[Path], lr_schedule=None):
    from openglue_tpu.train.loop import TrainLoopConfig
    from openglue_tpu.train.state import make_lr_schedule

    train = config.get("train", {})
    ev = config.get("evaluation", {}) or {}
    gnn = config.get("superglue.attention_gnn", {}) or {}
    favor_interval = (
        gnn.get("redraw_interval")
        if str(gnn.get("attention", "")).startswith("favor")
        else None
    )
    return TrainLoopConfig(
        steps_per_epoch=int(train.get("steps_per_epoch", 1000)),
        max_epochs=int(train.get("epochs", 1)),
        log_every_n_steps=int(config.get("logging.train_logs_steps", 50)),
        favor_redraw_interval=favor_interval,
        checkpoint_dir=str(log_dir / "checkpoints") if log_dir else None,
        log_dir=str(log_dir / "tb") if log_dir else None,
        eval_threshold=float(ev.get("epipolar_dist_threshold", 5e-4)),
        pose_auc_thresholds=tuple(ev.get("camera_auc_thresholds", (5.0, 10.0, 20.0))),
        ransac_thresh_px=float(ev.get("camera_auc_ransac_inliers_threshold", 1.0)),
        # W&B adapter (reference utils/train_utils.py:58-60): enabled via
        # logging.wandb, no-op when the wandb package is not installed.
        wandb_enabled=bool(config.get("logging.wandb", False)),
        wandb_project=str(config.get("logging.wandb_project", "superglue")),
        wandb_run_name=log_dir.name if log_dir else None,
        config_snapshot=config.to_dict() if hasattr(config, "to_dict") else None,
        # lr monitor (reference LearningRateMonitor): the SAME optax schedule
        # object the optimizer builders use (train.state.make_lr_schedule),
        # evaluated host-side at state.step — so warmup, decay, and resume all
        # log the lr the optimizer actually applies. CLIs that build a custom
        # tx pass its schedule via ``lr_schedule``.
        lr_schedule=lr_schedule
        or make_lr_schedule(
            learning_rate=float(train.get("lr", 1e-4)),
            gamma=float(train.get("scheduler_gamma", 0.999994)),
            warmup_steps=int(train.get("warmup_steps", 0)),
        ),
    )


def build_mesh_and_sharding():
    """All-device data-parallel mesh + helpers."""
    from openglue_tpu.parallel import make_mesh, shard_batch, shard_train_step
    from openglue_tpu.parallel.mesh import shard_eval_step

    mesh = make_mesh()
    return mesh, shard_batch, shard_train_step, shard_eval_step


def superglue_config_from(config: Config, descriptor_dim: int, side_info_dim: int):
    from openglue_tpu.models.superglue import SuperGlueConfig

    sg = dict(config.get("superglue", {}))
    sg["descriptor_dim"] = descriptor_dim
    # fused decode stats by default: free in training (nothing consumes them
    # -> DCE'd from the train jit) and they keep validation/eval decodes off
    # the full score matrix (config can still disable)
    sg.setdefault("decode_stats", True)
    cfg = SuperGlueConfig.from_dict(sg)
    import dataclasses

    return dataclasses.replace(cfg, side_info_size=side_info_dim + 1)
