"""End-to-end CLI tests on generated fixtures: checkpoint roundtrip, cached
training smoke, homography pretraining smoke, feature extraction + inference
(the five BASELINE.json config shapes, miniaturized)."""

import numpy as np
import pytest
import yaml

import jax

from tests.test_data import make_megadepth_fixture, TARGET_CACHED


def write_yaml(path, data):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(yaml.safe_dump(data))


SMALL_SUPERGLUE = {
    "laf_to_sideinfo_method": "none",
    "positional_encoding": {"hidden_layers_sizes": [16]},
    "attention_gnn": {"num_stages": 1, "num_heads": 4, "attention": "softmax", "use_offset": False},
    "dustbin_score_init": 1.0,
    "otp": {"num_iters": 5, "reg": 1.0},
    "residual": True,
}


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from openglue_tpu.data.synthetic import SyntheticHomographyPairs
        from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
        from openglue_tpu.train import LossConfig, create_train_state, make_train_step
        from openglue_tpu.train.checkpoint import (
            latest_step,
            restore_train_state,
            save_train_state,
        )
        from openglue_tpu.train.step import superglue_inputs

        cfg = SuperGlueConfig(descriptor_dim=32, pe_hidden_layers_sizes=(16,), num_stages=1, otp_num_iters=4)
        model = SuperGlue(cfg)
        gen = SyntheticHomographyPairs(num_keypoints=32, descriptor_dim=32)
        batch = gen.sample(jax.random.key(0), 2)
        variables = model.init(jax.random.key(1), **superglue_inputs(batch))
        state = create_train_state(model.apply, variables)
        step = jax.jit(make_train_step(LossConfig(positive_threshold=3.0)))
        for _ in range(3):
            state, _ = step(state, batch)

        ckpt_dir = tmp_path / "ckpts"
        save_train_state(ckpt_dir, state)
        assert latest_step(ckpt_dir) == 3

        fresh = create_train_state(model.apply, variables)
        restored = restore_train_state(ckpt_dir, fresh)
        assert int(restored.step) == 3
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # resumed training continues bit-identically
        s1, m1 = step(state, batch)
        s2, m2 = step(restored, batch)
        np.testing.assert_allclose(float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-6)

    def test_weights_npz_roundtrip(self, tmp_path):
        from openglue_tpu.train.checkpoint import load_weights, save_weights

        tree = {"a": {"b": np.arange(6.0).reshape(2, 3)}, "c": np.ones(4)}
        save_weights(tmp_path / "w.npz", tree)
        out = load_weights(tmp_path / "w.npz", jax.tree_util.tree_map(np.zeros_like, tree))
        np.testing.assert_array_equal(out["a"]["b"], tree["a"]["b"])


@pytest.mark.slow
class TestTrainCachedCLI:
    def test_smoke(self, tmp_path, monkeypatch):
        make_megadepth_fixture(tmp_path, pairs_per_scene=10)
        # features cache config contract
        feat_dir = tmp_path / "features_cache"
        write_yaml(
            feat_dir / "config.yaml",
            {"name": "OPENCV_SIFT", "descriptor_dim": 32, "parameters": {}},
        )
        (tmp_path / "train_list.txt").write_text("scene_a\nscene_b\n")
        (tmp_path / "val_list.txt").write_text("scene_a\n")
        config = {
            "data": {
                "root_path": str(tmp_path),
                "train_list_path": "train_list.txt",
                "val_list_path": "val_list.txt",
                "features_dir": "features_cache",
                "max_keypoints": 64,
                "batch_size": 8,
                "dataloader_workers": 0,
                "target_size": list(TARGET_CACHED),
                "val_max_pairs_per_scene": 2,
                "train_pairs_overlap": None,
            },
            "logging": {"root_path": str(tmp_path / "logs"), "name": "t", "train_logs_steps": 1},
            "train": {
                "epochs": 1, "steps_per_epoch": 2, "grad_clip": 10.0,
                "gt_positive_threshold": 3, "gt_negative_threshold": 5,
                "margin": None, "nll_weight": 1.0, "metric_weight": 0.0,
                "lr": 1.0e-3, "scheduler_gamma": 0.999994,
            },
            "evaluation": {"epipolar_dist_threshold": 5.0e-4, "camera_auc_thresholds": [5, 10, 20],
                           "camera_auc_ransac_inliers_threshold": 1.0},
            "inference": {"match_threshold": 0.2},
            "superglue": SMALL_SUPERGLUE,
        }
        cfg_path = tmp_path / "cfg.yaml"
        write_yaml(cfg_path, config)

        from openglue_tpu.cli import train_cached

        state = train_cached.main(["--config", str(cfg_path)])
        assert int(state.step) == 2
        # experiment dir written with config snapshots + checkpoint
        exp_dirs = list((tmp_path / "logs" / "t").iterdir())
        assert len(exp_dirs) == 1
        assert (exp_dirs[0] / "config.yaml").exists()
        assert (exp_dirs[0] / "features_config.yaml").exists()
        assert (exp_dirs[0] / "checkpoints").exists()

    def test_device_descriptor_cache_smoke(self, tmp_path):
        """data.device_descriptor_cache: descriptors live in a device-side
        LRU; batches carry row indices; the CLI trains and validates through
        the gather path end to end (grouped loader + precompile included)."""
        make_megadepth_fixture(tmp_path, pairs_per_scene=10)
        feat_dir = tmp_path / "features_cache"
        write_yaml(
            feat_dir / "config.yaml",
            {"name": "OPENCV_SIFT", "descriptor_dim": 32, "parameters": {}},
        )
        (tmp_path / "train_list.txt").write_text("scene_a\nscene_b\n")
        (tmp_path / "val_list.txt").write_text("scene_a\n")
        config = {
            "data": {
                "root_path": str(tmp_path),
                "train_list_path": "train_list.txt",
                "val_list_path": "val_list.txt",
                "features_dir": "features_cache",
                "max_keypoints": 64,
                "batch_size": 8,
                "dataloader_workers": 2,
                "target_size": list(TARGET_CACHED),
                "val_max_pairs_per_scene": 2,
                "train_pairs_overlap": None,
                "device_descriptor_cache": 16,
                "device_cache_cap": 64,
                "buckets": [16, 64],
                "bucket_grouping": True,
            },
            "logging": {"root_path": str(tmp_path / "logs"), "name": "t", "train_logs_steps": 1},
            "train": {
                "epochs": 1, "steps_per_epoch": 2, "grad_clip": 10.0,
                "gt_positive_threshold": 3, "gt_negative_threshold": 5,
                "margin": None, "nll_weight": 1.0, "metric_weight": 0.0,
                "lr": 1.0e-3, "scheduler_gamma": 0.999994,
            },
            "evaluation": {"epipolar_dist_threshold": 5.0e-4, "camera_auc_thresholds": [5, 10, 20],
                           "camera_auc_ransac_inliers_threshold": 1.0},
            "inference": {"match_threshold": 0.2},
            "superglue": {**SMALL_SUPERGLUE, "dtype": "bfloat16"},
        }
        cfg_path = tmp_path / "cfg.yaml"
        write_yaml(cfg_path, config)

        from openglue_tpu.cli import train_cached

        state = train_cached.main(["--config", str(cfg_path)])
        assert int(state.step) == 2

    def test_bf16_transfer_cast(self, tmp_path):
        """superglue.dtype: bfloat16 turns on the bf16 descriptor transfer
        (data/collate.py:cast_for_transfer) — the CLI trains through it and
        the collated batches really carry bf16 descriptors."""
        import ml_dtypes
        import numpy as np

        make_megadepth_fixture(tmp_path, pairs_per_scene=10)
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
                "features_dir": "features_cache",
                "max_keypoints": 64,
                "batch_size": 8,
                "dataloader_workers": 0,
                "target_size": list(TARGET_CACHED),
                "val_max_pairs_per_scene": 2,
                "train_pairs_overlap": None,
            },
            "logging": {"root_path": str(tmp_path / "logs"), "name": "t", "train_logs_steps": 1},
            "train": {
                "epochs": 1, "steps_per_epoch": 2, "grad_clip": 10.0,
                "gt_positive_threshold": 3, "gt_negative_threshold": 5,
                "margin": None, "nll_weight": 1.0, "metric_weight": 0.0,
                "lr": 1.0e-3, "scheduler_gamma": 0.999994,
            },
            "evaluation": {"epipolar_dist_threshold": 5.0e-4, "camera_auc_thresholds": [5, 10, 20],
                           "camera_auc_ransac_inliers_threshold": 1.0},
            "inference": {"match_threshold": 0.2},
            "superglue": {**SMALL_SUPERGLUE, "dtype": "bfloat16"},
        }
        cfg_path = tmp_path / "cfg.yaml"
        write_yaml(cfg_path, config)

        from openglue_tpu.cli import train_cached
        from openglue_tpu.core.config import load_config
        from openglue_tpu.features.lafs import LAFConverter

        train_loader, _ = train_cached.build_dataloaders(
            load_config(cfg_path), LAFConverter()
        )
        b = next(iter(train_loader))
        assert np.asarray(b.side0.descriptors).dtype == ml_dtypes.bfloat16
        assert np.asarray(b.side0.keypoints).dtype == np.float32  # geometry stays f32

        state = train_cached.main(["--config", str(cfg_path)])
        assert int(state.step) == 2


class TestExperimentConfigFields:
    """The reference's concrete-experiment config fields (analog of
    config_cached_sp_magicleap.yaml): `superglue.weights` matcher warm-start
    and top-level `checkpoint:` full resume, plus the shipped preset file."""

    def _base_config(self, tmp_path):
        make_megadepth_fixture(tmp_path, pairs_per_scene=10)
        feat_dir = tmp_path / "features_cache"
        write_yaml(
            feat_dir / "config.yaml",
            {"name": "OPENCV_SIFT", "descriptor_dim": 32, "parameters": {}},
        )
        (tmp_path / "train_list.txt").write_text("scene_a\nscene_b\n")
        (tmp_path / "val_list.txt").write_text("scene_a\n")
        return {
            "data": {
                "root_path": str(tmp_path),
                "train_list_path": "train_list.txt",
                "val_list_path": "val_list.txt",
                "features_dir": "features_cache",
                "max_keypoints": 64,
                "batch_size": 8,
                "dataloader_workers": 0,
                "target_size": list(TARGET_CACHED),
                "val_max_pairs_per_scene": 2,
                "train_pairs_overlap": None,
            },
            "logging": {"root_path": str(tmp_path / "logs"), "name": "t", "train_logs_steps": 1},
            "train": {
                "epochs": 1, "steps_per_epoch": 2, "grad_clip": 10.0,
                "gt_positive_threshold": 3, "gt_negative_threshold": 5,
                "margin": None, "nll_weight": 1.0, "metric_weight": 0.0,
                "lr": 1.0e-3, "scheduler_gamma": 0.999994,
            },
            "evaluation": {"epipolar_dist_threshold": 5.0e-4, "camera_auc_thresholds": [5, 10, 20],
                           "camera_auc_ransac_inliers_threshold": 1.0},
            "inference": {"match_threshold": 0.2},
            "superglue": dict(SMALL_SUPERGLUE),
        }

    def test_weights_warmstart_and_config_checkpoint_resume(self, tmp_path):
        from openglue_tpu.cli import train_cached
        from openglue_tpu.train.checkpoint import save_weights

        config = self._base_config(tmp_path)
        cfg_path = tmp_path / "cfg.yaml"
        write_yaml(cfg_path, config)
        state = train_cached.main(["--config", str(cfg_path)])
        assert int(state.step) == 2
        ckpt_dir = next((tmp_path / "logs" / "t").iterdir()) / "checkpoints"
        assert ckpt_dir.exists()

        # Matcher warm-start from an npz weights tree (superglue.weights).
        weights_path = tmp_path / "warm.npz"
        variables = {"params": state.params, **dict(state.model_state)}
        save_weights(weights_path, variables)
        config2 = self._base_config(tmp_path)
        config2["superglue"]["weights"] = str(weights_path)
        cfg2 = tmp_path / "cfg_warm.yaml"
        write_yaml(cfg2, config2)
        state2 = train_cached.main(["--config", str(cfg2)])
        assert int(state2.step) == 2  # warm-start does NOT restore the step

        # Full resume via the config's top-level checkpoint: field.
        config3 = self._base_config(tmp_path)
        config3["checkpoint"] = str(ckpt_dir)
        cfg3 = tmp_path / "cfg_resume.yaml"
        write_yaml(cfg3, config3)
        state3 = train_cached.main(["--config", str(cfg3)])
        assert int(state3.step) == 4  # resumed at 2, trained 2 more

    def test_shipped_preset_parses(self):
        from pathlib import Path

        from openglue_tpu.cli import common
        from openglue_tpu.features.lafs import get_laf_to_sideinfo_converter

        path = Path(__file__).resolve().parents[1] / "configs" / "config_cached_sp_magicleap.yaml"
        config = common.load_merged_config(str(path))
        laf = get_laf_to_sideinfo_converter(config.get("superglue.laf_to_sideinfo_method", "none"))
        sg = common.superglue_config_from(config, 256, laf.side_info_dim)
        assert sg.num_stages == 9 and sg.descriptor_dim == 256
        # The reference preset's distinguishing fields exist in the schema
        # (commented examples in the shipped file; active consumption is
        # covered by test_weights_warmstart_and_config_checkpoint_resume).
        text = path.read_text()
        assert "weights:" in text and "checkpoint:" in text


@pytest.mark.slow
class TestPretrainHomographyCLI:
    def test_smoke(self, tmp_path):
        import cv2

        rng = np.random.default_rng(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        for i in range(3):
            img = rng.integers(0, 255, (200, 260, 3), np.uint8)
            cv2.imwrite(str(img_dir / f"{i}.jpg"), img)

        config = {
            "data": {
                "root_path": str(img_dir), "batch_size": 8, "dataloader_workers": 0,
                "target_size": [160, 120], "warp_offset": 20,
            },
            "logging": {"root_path": str(tmp_path / "logs"), "name": "p", "train_logs_steps": 1},
            "train": {
                "epochs": 1, "steps_per_epoch": 2, "grad_clip": 10.0,
                "gt_positive_threshold": 3, "gt_negative_threshold": 3,
                "margin": None, "nll_weight": 1.0, "metric_weight": 0.0,
                "lr": 1.0e-3, "scheduler_gamma": 0.999994,
                "augmentations": {"name": "weak_color_aug"}, "evaluation": False,
                "finetune_features_extractor": False,
            },
            "features": {
                "name": "SuperPointNet",
                "parameters": {"max_keypoints": 64, "descriptor_dim": 32},
                "weights": None,
            },
            "superglue": SMALL_SUPERGLUE,
            "inference": {"match_threshold": 0.2},
        }
        cfg_path = tmp_path / "cfg.yaml"
        write_yaml(cfg_path, config)

        from openglue_tpu.cli import pretrain_homography

        state = pretrain_homography.main(["--config", str(cfg_path)])
        assert int(state.step) == 2


@pytest.mark.slow
class TestExtractAndInference:
    def test_extract_then_inference(self, tmp_path):
        import cv2

        # images with structure
        rng = np.random.default_rng(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        base = np.zeros((240, 320), np.uint8)
        for _ in range(80):
            x, y = rng.integers(10, 310), rng.integers(10, 230)
            cv2.circle(base, (int(x), int(y)), int(rng.integers(3, 9)), int(rng.integers(60, 255)), -1)
        cv2.imwrite(str(img_dir / "a.png"), base)
        shifted = np.roll(base, 6, axis=1)
        cv2.imwrite(str(img_dir / "b.png"), shifted)

        feat_cfg = tmp_path / "feat.yaml"
        write_yaml(
            feat_cfg,
            {"name": "OPENCV_SIFT", "descriptor_dim": 128,
             "parameters": {"max_keypoints": 256, "nms_diameter": 9, "rootsift": True}},
        )

        from openglue_tpu.cli import extract_features

        extract_features.main([
            "--features_config", str(feat_cfg),
            "--data_dir", str(img_dir),
            "--output_dir", str(tmp_path / "cache"),
            "--target_size", "320", "240",
        ])
        out_dir = tmp_path / "cache" / "OPENCV_SIFT_320_240"
        assert (out_dir / "config.yaml").exists()
        assert (out_dir / "a_lafs.h5").exists() and (out_dir / "b_descriptors.h5").exists()

        # build an experiment dir with an untrained matcher, then run inference
        from openglue_tpu.data.synthetic import SyntheticHomographyPairs
        from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
        from openglue_tpu.train import create_train_state
        from openglue_tpu.train.checkpoint import save_train_state
        from openglue_tpu.train.step import superglue_inputs

        exp = tmp_path / "exp"
        exp.mkdir()
        config = {
            "superglue": SMALL_SUPERGLUE,
            "inference": {"match_threshold": 0.0},
        }
        write_yaml(exp / "config.yaml", config)
        write_yaml(
            exp / "features_config.yaml",
            {"name": "OPENCV_SIFT", "descriptor_dim": 128,
             "parameters": {"max_keypoints": 256, "nms_diameter": 9, "rootsift": True}},
        )
        sg = SuperGlueConfig(
            descriptor_dim=128, pe_hidden_layers_sizes=(16,), side_info_size=1,
            num_stages=1, num_heads=4, otp_num_iters=5, residual=True,
        )
        model = SuperGlue(sg)
        gen = SyntheticHomographyPairs(num_keypoints=16, descriptor_dim=128)
        dummy = gen.sample(jax.random.key(0), 1)
        variables = model.init(jax.random.key(0), **superglue_inputs(dummy))
        state = create_train_state(model.apply, variables)
        save_train_state(exp / "checkpoints", state, step=0)

        from openglue_tpu.cli.inference import initialize_matcher, run_inference

        matcher = initialize_matcher(exp, target_size=(320, 240))
        result = run_inference(matcher, img_dir / "a.png", img_dir / "b.png", ransac=True)
        assert result["keypoints0"].shape == result["keypoints1"].shape
        # untrained matcher: only a handful of confident mutual matches
        # survive, but the residual local-descriptor mix carries signal and
        # MAGSAC keeps the geometrically consistent ones: same y, x shifted
        assert len(result["keypoints0"]) >= 4
        dx = result["keypoints1"][:, 0] - result["keypoints0"][:, 0]
        dy = result["keypoints1"][:, 1] - result["keypoints0"][:, 1]
        assert np.median(np.abs(dy)) < 3.0
        assert abs(np.median(dx) - 6.0) < 3.0

        # AOT serving path: precompile at the extractor's keypoint count and
        # verify the compiled executable reproduces the jit path exactly
        base = run_inference(matcher, img_dir / "a.png", img_dir / "b.png", ransac=False)
        matcher.precompile(num_keypoints=256)
        assert (256, 128, 1) in matcher._compiled
        result_aot = run_inference(
            matcher, img_dir / "a.png", img_dir / "b.png", ransac=False
        )
        np.testing.assert_array_equal(result_aot["indices0"], base["indices0"])
        np.testing.assert_allclose(
            result_aot["confidence"], base["confidence"], rtol=1e-6
        )

        # bucketed inference (inference.buckets, same contract as data.buckets
        # in the train/eval CLIs): the pair runs at the smallest bucket that
        # fits its real keypoint counts, not the extractor cap
        bucketed = initialize_matcher(
            exp, target_size=(320, 240), buckets=(64, 512)
        )
        res_b = run_inference(
            bucketed, img_dir / "a.png", img_dir / "b.png", ransac=False
        )
        assert bucketed._last_num_keypoints in (64, 512)
        assert len(res_b["keypoints0"]) >= 1
        # matched keypoints are a subset of the unbucketed run's keypoint set
        # when the bucket only trims padding/low-response rows
        if bucketed._last_num_keypoints == 512:
            kp_base = {tuple(np.round(k, 3)) for k in base["keypoints0"]}
            assert all(tuple(np.round(k, 3)) in kp_base for k in res_b["keypoints0"])

        # static-scale PTQ serving (superglue.quantize: int8_static): the
        # first match calibrates (records int8_calib absmaxes), later matches
        # serve with static scales and reproduce the first-match results.
        # (force_fused_dispatch: at 256 kpts the measured shape gate routes to
        # XLA; the flow under test is the calibrate-then-serve plumbing.)
        import yaml as _yaml

        from openglue_tpu.ops.pallas import force_fused_dispatch

        cfg_file = exp / "config.yaml"
        cfg = _yaml.safe_load(cfg_file.read_text())
        cfg["superglue"]["quantize"] = "int8_static"
        cfg["superglue"]["use_pallas"] = True
        cfg_file.write_text(_yaml.safe_dump(cfg))
        static_m = initialize_matcher(exp, target_size=(320, 240))
        force_fused_dispatch(True)
        try:
            with pytest.raises(RuntimeError, match="uncalibrated"):
                static_m.precompile(num_keypoints=256)
            run_inference(static_m, img_dir / "a.png", img_dir / "b.png", ransac=False)
            assert any("int8_calib" in k for k in static_m.variables)
            second = run_inference(
                static_m, img_dir / "a.png", img_dir / "b.png", ransac=False
            )
            # calibrated static path vs the f32 run: matched pairs must agree
            # on the overwhelming majority of keypoints
            base_map = dict(zip(base["indices0"], base["indices1"]))
            agree = sum(
                1 for i0, i1 in zip(second["indices0"], second["indices1"])
                if base_map.get(i0) == i1
            )
            assert agree >= 0.9 * max(len(second["indices0"]), 1)
            # calibrated AOT precompile now works
            static_m.precompile(num_keypoints=256)
        finally:
            force_fused_dispatch(False)
        cfg["superglue"].pop("quantize")
        cfg["superglue"].pop("use_pallas")
        cfg_file.write_text(_yaml.safe_dump(cfg))


class TestBucketTrimPad:
    def test_to_bucket_trims_valid_first_and_pads(self):
        from openglue_tpu.cli.inference import OpenGlueMatcher

        n = 8
        lafs = np.arange(n * 6, dtype=np.float32).reshape(n, 2, 3)
        scores = np.array([0.9, 0.1, 0.5, 0.7, 0.3, 0.0, 0.0, 0.0], np.float32)
        mask = np.array([1, 1, 1, 1, 1, 0, 0, 0], bool)
        desc = np.tile(np.arange(n, dtype=np.float32)[:, None], (1, 4))

        # trim to 3: top responses among VALID rows, descending
        l2, s2, d2, m2 = OpenGlueMatcher._to_bucket(lafs, scores, desc, mask, 3)
        np.testing.assert_array_equal(s2, np.array([0.9, 0.7, 0.5], np.float32))
        assert m2.all() and l2.shape == (3, 2, 3) and d2.shape == (3, 4)

        # trim to 6: all 5 valid kept (padding rows can fill the remainder)
        _, s6, _, m6 = OpenGlueMatcher._to_bucket(lafs, scores, desc, mask, 6)
        assert m6.sum() == 5
        np.testing.assert_array_equal(
            np.sort(s6[m6]), np.array([0.1, 0.3, 0.5, 0.7, 0.9], np.float32)
        )

        # pad to 12: originals preserved in place, padding masked out
        l12, s12, d12, m12 = OpenGlueMatcher._to_bucket(lafs, scores, desc, mask, 12)
        np.testing.assert_array_equal(l12[:n], lafs)
        np.testing.assert_array_equal(m12, list(mask) + [False] * 4)
        assert d12.shape == (12, 4) and not s12[n:].any()


@pytest.mark.slow
class TestInferenceFromOnlineExperiment:
    def test_pretrain_then_inference(self, tmp_path):
        """An online (pretrain) experiment dir must be directly usable by the
        inference CLI: features_config.yaml snapshot + combined-checkpoint
        restore (review gap: online checkpoints hold {extractor, superglue})."""
        import cv2

        rng = np.random.default_rng(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        base = np.zeros((192, 256), np.uint8)
        for _ in range(70):
            x, y = rng.integers(10, 246), rng.integers(10, 182)
            cv2.circle(base, (int(x), int(y)), int(rng.integers(3, 8)), int(rng.integers(60, 255)), -1)
        for i in range(3):
            cv2.imwrite(str(img_dir / f"{i}.png"), np.roll(base, i * 5, axis=1))

        config = {
            "data": {
                "root_path": str(img_dir), "batch_size": 8, "dataloader_workers": 0,
                "target_size": [256, 192], "warp_offset": 16,
            },
            "logging": {"root_path": str(tmp_path / "logs"), "name": "p", "train_logs_steps": 1},
            "train": {
                "epochs": 1, "steps_per_epoch": 2, "grad_clip": 10.0,
                "gt_positive_threshold": 3, "gt_negative_threshold": 3,
                "margin": None, "nll_weight": 1.0, "metric_weight": 0.0,
                "lr": 1.0e-3, "scheduler_gamma": 0.999994,
                "augmentations": {"name": "none"},
                "finetune_features_extractor": False,
            },
            "features": {
                "name": "SuperPointNet",
                "descriptor_dim": 32,
                "parameters": {"max_keypoints": 64, "descriptor_dim": 32},
                "weights": None,
            },
            "superglue": SMALL_SUPERGLUE,
            "inference": {"match_threshold": 0.0},
        }
        cfg_path = tmp_path / "cfg.yaml"
        write_yaml(cfg_path, config)

        from openglue_tpu.cli import pretrain_homography

        pretrain_homography.main(["--config", str(cfg_path)])
        exp = next((tmp_path / "logs" / "p").iterdir())
        assert (exp / "features_config.yaml").exists()

        from openglue_tpu.cli.inference import initialize_matcher, run_inference

        matcher = initialize_matcher(exp, target_size=(256, 192))
        result = run_inference(
            matcher, img_dir / "0.png", img_dir / "1.png", ransac=False
        )
        assert result["keypoints0"].shape == result["keypoints1"].shape
        assert len(result["keypoints0"]) >= 1


@pytest.mark.slow
class TestExtractorPresetConfigs:
    """The shipped preset YAMLs (configs/features*/) must stay 1:1 with the
    reference's config/features/ + config/features_online/ inventories
    (reference config/features/superpoint_coco.yaml:1 etc.), and each must
    actually launch: cached presets through the extract_features CLI,
    online presets through the homography-pretraining CLI (random init where
    the reference points at unavailable pretrained checkpoints)."""

    import pathlib

    CONFIGS = pathlib.Path(__file__).resolve().parent.parent / "configs"

    def test_inventory_matches_reference(self):
        import pathlib

        ref = pathlib.Path("/root/reference/config")
        if not ref.exists():
            pytest.skip("reference snapshot unavailable")
        for sub in ("features", "features_online"):
            theirs = {p.name for p in (ref / sub).glob("*.yaml")}
            ours = {p.name for p in (self.CONFIGS / sub).glob("*.yaml")}
            missing = theirs - ours
            assert not missing, f"configs/{sub} missing reference presets: {missing}"

    @staticmethod
    def _structured_images(tmp_path, n=2, size=(320, 240)):
        import cv2

        rng = np.random.default_rng(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir(exist_ok=True)
        base = np.zeros((size[1], size[0]), np.uint8)
        for _ in range(80):
            x, y = rng.integers(10, size[0] - 10), rng.integers(10, size[1] - 10)
            cv2.circle(base, (int(x), int(y)), int(rng.integers(3, 9)), int(rng.integers(60, 255)), -1)
        for i in range(n):
            cv2.imwrite(str(img_dir / f"{i}.png"), np.roll(base, 5 * i, axis=1))
        return img_dir

    @pytest.mark.parametrize(
        "preset",
        ["superpoint_coco", "superpoint_kitti", "superpoint_magicleap",
         "dog_opencv_affnet_hardnet", "sift_opencv"],
    )
    def test_cached_preset_launches(self, tmp_path, preset):
        cfg = yaml.safe_load((self.CONFIGS / "features" / f"{preset}.yaml").read_text())
        cfg["parameters"]["max_keypoints"] = 128  # CPU-speed shrink only
        cfg_path = tmp_path / f"{preset}.yaml"
        write_yaml(cfg_path, cfg)
        img_dir = self._structured_images(tmp_path)

        from openglue_tpu.cli import extract_features

        extract_features.main([
            "--features_config", str(cfg_path),
            "--data_dir", str(img_dir),
            "--output_dir", str(tmp_path / "cache"),
            "--target_size", "320", "240",
        ])
        out = tmp_path / "cache" / f"{cfg['name']}_320_240"
        assert (out / "config.yaml").exists()
        for sfx in ("_lafs.h5", "_scores.h5", "_descriptors.h5", "_size.h5"):
            assert (out / f"0{sfx}").exists()

    @pytest.mark.parametrize(
        "preset",
        ["superpoint_coco", "superpoint_kitti", "superpoint_magicleap",
         "gftt_affnet_hardnet", "sift"],
    )
    def test_online_preset_launches(self, tmp_path, preset):
        features = yaml.safe_load(
            (self.CONFIGS / "features_online" / f"{preset}.yaml").read_text()
        )
        features["parameters"]["max_keypoints"] = 32  # CPU-speed shrink only
        img_dir = self._structured_images(tmp_path, n=3, size=(160, 128))
        config = {
            "data": {
                # batch divisible by the 8-device virtual data mesh
                "root_path": str(img_dir), "batch_size": 8, "dataloader_workers": 0,
                "target_size": [160, 128], "warp_offset": 12,
            },
            "logging": {"root_path": str(tmp_path / "logs"), "name": "p", "train_logs_steps": 1},
            "train": {
                "epochs": 1, "steps_per_epoch": 1, "grad_clip": 10.0,
                "gt_positive_threshold": 3, "gt_negative_threshold": 3,
                "margin": None, "nll_weight": 1.0, "metric_weight": 0.0,
                "lr": 1.0e-3, "scheduler_gamma": 0.999994,
                "augmentations": {"name": "none"}, "evaluation": False,
                "finetune_features_extractor": False,
            },
            "features": features,
            "superglue": SMALL_SUPERGLUE,
            "inference": {"match_threshold": 0.2},
        }
        cfg_path = tmp_path / "cfg.yaml"
        write_yaml(cfg_path, config)

        from openglue_tpu.cli import pretrain_homography

        state = pretrain_homography.main(["--config", str(cfg_path)])
        assert int(state.step) == 1


@pytest.mark.slow
class TestBucketedPaddingCLI:
    """data.buckets wires bucketed padding (data/bucketing.py) through the
    cached-training CLI: each batch pads to the smallest bucket that fits its
    largest keypoint count instead of always max_keypoints."""

    def _config(self, tmp_path):
        return {
            "data": {
                "root_path": str(tmp_path),
                "train_list_path": "train_list.txt",
                "val_list_path": "val_list.txt",
                "features_dir": "features_cache",
                "max_keypoints": 64,
                "buckets": [16, 64],
                "batch_size": 8,
                "dataloader_workers": 0,
                "target_size": list(TARGET_CACHED),
                "val_max_pairs_per_scene": 8,
                "train_pairs_overlap": None,
            },
            "logging": {"root_path": str(tmp_path / "logs"), "name": "t", "train_logs_steps": 1},
            "train": {
                "epochs": 1, "steps_per_epoch": 2, "grad_clip": 10.0,
                "gt_positive_threshold": 3, "gt_negative_threshold": 5,
                "margin": None, "nll_weight": 1.0, "metric_weight": 0.0,
                "lr": 1.0e-3, "scheduler_gamma": 0.999994,
            },
            "evaluation": {"epipolar_dist_threshold": 5.0e-4, "camera_auc_thresholds": [5, 10, 20],
                           "camera_auc_ransac_inliers_threshold": 1.0},
            "inference": {"match_threshold": 0.2},
            "superglue": SMALL_SUPERGLUE,
        }

    def test_two_buckets_exercised(self, tmp_path):
        # scene_a has ~50 kpts/image (-> bucket 64), scene_b only 9 (-> bucket 16)
        make_megadepth_fixture(tmp_path, scenes=("scene_a",), pairs_per_scene=10, num_kpts=50)
        make_megadepth_fixture(tmp_path, scenes=("scene_b",), pairs_per_scene=10, num_kpts=9)
        feat_dir = tmp_path / "features_cache"
        write_yaml(
            feat_dir / "config.yaml",
            {"name": "OPENCV_SIFT", "descriptor_dim": 32, "parameters": {}},
        )
        (tmp_path / "train_list.txt").write_text("scene_a\n")
        (tmp_path / "val_list.txt").write_text("scene_b\n")
        cfg_path = tmp_path / "cfg.yaml"
        write_yaml(cfg_path, self._config(tmp_path))

        from openglue_tpu.cli.train_cached import build_dataloaders, main
        from openglue_tpu.core.config import load_config
        from openglue_tpu.features.lafs import LAFConverter

        train_loader, val_loader_fn = build_dataloaders(
            load_config(cfg_path), LAFConverter()
        )
        train_batch = next(iter(train_loader))
        val_batch = next(iter(val_loader_fn()))
        assert train_batch.side0.keypoints.shape[1] == 64
        assert val_batch.side0.keypoints.shape[1] == 16

        # full CLI smoke with bucketed batches (train bucket 64, val bucket 16)
        state = main(["--config", str(cfg_path)])
        assert int(state.step) == 2

    def test_bucket_grouping_emits_uniform_batches(self, tmp_path):
        # both scenes in the TRAIN list: iid batches mix 9-kpt and 50-kpt
        # pairs (every mixed batch pads to 64); data.bucket_grouping regroups
        # them so 16-bucket batches appear
        make_megadepth_fixture(tmp_path, scenes=("scene_a",), pairs_per_scene=10, num_kpts=50)
        make_megadepth_fixture(tmp_path, scenes=("scene_b",), pairs_per_scene=10, num_kpts=9)
        feat_dir = tmp_path / "features_cache"
        write_yaml(
            feat_dir / "config.yaml",
            {"name": "OPENCV_SIFT", "descriptor_dim": 32, "parameters": {}},
        )
        (tmp_path / "train_list.txt").write_text("scene_a\nscene_b\n")
        (tmp_path / "val_list.txt").write_text("scene_b\n")
        cfg = self._config(tmp_path)
        cfg["data"]["bucket_grouping"] = True
        cfg_path = tmp_path / "cfg.yaml"
        write_yaml(cfg_path, cfg)

        from openglue_tpu.cli.train_cached import build_dataloaders, main
        from openglue_tpu.core.config import load_config
        from openglue_tpu.features.lafs import LAFConverter

        train_loader, _ = build_dataloaders(load_config(cfg_path), LAFConverter())
        it = iter(train_loader)
        shapes = [next(it).side0.keypoints.shape[1] for _ in range(8)]
        assert set(shapes) == {16, 64}, shapes

        # full CLI smoke through the grouped loader
        state = main(["--config", str(cfg_path)])
        assert int(state.step) == 2
