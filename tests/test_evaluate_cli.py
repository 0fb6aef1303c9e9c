"""Evaluate-CLI smoke: train-cached experiment dir -> standalone evaluation
produces the full metric set on fixture data."""

import numpy as np
import pytest
import yaml

import jax

from tests.test_cli import SMALL_SUPERGLUE, write_yaml
from tests.test_data import TARGET_CACHED, make_megadepth_fixture


@pytest.mark.slow
def test_evaluate_cli_end_to_end(tmp_path):
    make_megadepth_fixture(tmp_path, pairs_per_scene=6)
    feat_dir = tmp_path / "features_cache"
    write_yaml(
        feat_dir / "config.yaml",
        {"name": "OPENCV_SIFT", "descriptor_dim": 32, "parameters": {}},
    )
    (tmp_path / "train_list.txt").write_text("scene_a\n")
    (tmp_path / "val_list.txt").write_text("scene_b\n")
    config = {
        "data": {
            "root_path": str(tmp_path),
            "train_list_path": "train_list.txt",
            "val_list_path": "val_list.txt",
            "test_list_path": "val_list.txt",
            "features_dir": "features_cache",
            "max_keypoints": 48,
            "batch_size": 8,
            "dataloader_workers": 0,
            "target_size": list(TARGET_CACHED),
            "val_max_pairs_per_scene": 4,
            "train_pairs_overlap": None,
        },
        "logging": {"root_path": str(tmp_path / "logs"), "name": "t", "train_logs_steps": 1},
        "train": {
            "epochs": 1, "steps_per_epoch": 1, "grad_clip": 10.0,
            "gt_positive_threshold": 3, "gt_negative_threshold": 5,
            "margin": None, "nll_weight": 1.0, "metric_weight": 0.0,
            "lr": 1.0e-3, "scheduler_gamma": 0.999994,
        },
        "evaluation": {"epipolar_dist_threshold": 5.0e-4,
                        "camera_auc_thresholds": [5, 10, 20],
                        "camera_auc_ransac_inliers_threshold": 1.0},
        "inference": {"match_threshold": 0.0},
        "superglue": SMALL_SUPERGLUE,
    }
    cfg_path = tmp_path / "cfg.yaml"
    write_yaml(cfg_path, config)

    from openglue_tpu.cli import evaluate, train_cached

    train_cached.main(["--config", str(cfg_path)])
    exp = next((tmp_path / "logs" / "t").iterdir())

    metrics = evaluate.main(["--experiment", str(exp)])
    assert "Precision@0.0005" in metrics
    assert "AUC@5deg" in metrics
    for v in metrics.values():
        assert 0.0 <= v <= 1.0 or v >= 0.0
