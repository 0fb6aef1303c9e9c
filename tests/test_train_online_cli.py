"""Online MegaDepth training CLI smoke (train.py): extraction + matching +
GT-from-depth supervision end-to-end on fixture data, with online validation."""

import numpy as np
import pytest
import yaml

from tests.test_cli import SMALL_SUPERGLUE, write_yaml
from tests.test_data import make_megadepth_fixture


@pytest.mark.slow
def test_train_online_cli_smoke(tmp_path):
    make_megadepth_fixture(tmp_path, pairs_per_scene=4, with_features=False)
    (tmp_path / "train_list.txt").write_text("scene_a\n")
    (tmp_path / "val_list.txt").write_text("scene_b\n")

    feat_cfg = tmp_path / "features.yaml"
    write_yaml(
        feat_cfg,
        {
            "name": "SuperPointNet",
            "descriptor_dim": 32,
            "parameters": {"max_keypoints": 64, "descriptor_dim": 32},
            "weights": None,
        },
    )
    config = {
        "data": {
            "root_path": str(tmp_path),
            "train_list_path": "train_list.txt",
            "val_list_path": "val_list.txt",
            "batch_size": 8,
            "dataloader_workers": 0,
            "target_size": [320, 240],
            "val_max_pairs_per_scene": 2,
            "train_pairs_overlap": None,
        },
        "logging": {"root_path": str(tmp_path / "logs"), "name": "on", "train_logs_steps": 1},
        "train": {
            "epochs": 1, "steps_per_epoch": 2, "grad_clip": 10.0,
            "gt_positive_threshold": 3, "gt_negative_threshold": 5,
            "margin": None, "nll_weight": 1.0, "metric_weight": 0.0,
            "lr": 1.0e-3, "scheduler_gamma": 0.999994,
            "augmentations": {"name": "none"},
            "finetune_features_extractor": False,
        },
        "evaluation": {"epipolar_dist_threshold": 5.0e-4,
                        "camera_auc_thresholds": [5, 10, 20],
                        "camera_auc_ransac_inliers_threshold": 1.0},
        "inference": {"match_threshold": 0.0},
        "superglue": SMALL_SUPERGLUE,
    }
    cfg_path = tmp_path / "cfg.yaml"
    write_yaml(cfg_path, config)

    from openglue_tpu.cli import train

    state = train.main(
        ["--config", str(cfg_path), "--features_config", str(feat_cfg)]
    )
    assert int(state.step) == 2
    exp_dirs = list((tmp_path / "logs" / "on").iterdir())
    assert (exp_dirs[0] / "checkpoints").exists()
