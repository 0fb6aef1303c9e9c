"""Tests for the DoG-AffNet-HardNet hybrid, visualization, metric sync no-op,
and bf16 matcher training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def checkerboard(h=160, w=200, cell=20):
    ys, xs = np.mgrid[0:h, 0:w]
    img = (((ys // cell) + (xs // cell)) % 2 * 255).astype(np.uint8)
    rng = np.random.default_rng(0)
    return np.clip(img + rng.normal(0, 8, img.shape), 0, 255).astype(np.uint8)


class TestDoGAffNetHardNet:
    def test_detect_and_compute_contract(self):
        from openglue_tpu.features.dog_affnet_hardnet import DoGAffNetHardNet

        extractor = DoGAffNetHardNet(max_keypoints=64)
        lafs, scores, desc, mask = extractor.detect_and_compute(checkerboard())
        assert lafs.shape == (64, 2, 3) and desc.shape == (64, 128)
        assert mask.sum() > 10
        np.testing.assert_allclose(
            np.linalg.norm(desc[mask], axis=1), 1.0, atol=1e-4
        )
        # AffNet preserves |det| of the original LAF; OriNet rotates -> the
        # LAF centers must be untouched
        assert (np.abs(lafs[mask][:, :, 2]).max()) < max(checkerboard().shape)

    def test_registered(self):
        from openglue_tpu.features.registry import get_feature_extractor, is_device_extractor

        assert not is_device_extractor("OPENCVDoGAffNetHardNet")
        assert get_feature_extractor("OPENCVDoGAffNetHardNet") is not None


class TestVisualization:
    def test_draw_matches_canvas(self, tmp_path):
        from openglue_tpu.visualization import draw_matches

        img0 = checkerboard(100, 120)
        img1 = checkerboard(100, 120)
        kpts0 = np.asarray([[10.0, 20], [50, 60], [100, 80]])
        kpts1 = kpts0 + [5, 0]
        lafs = np.tile(np.asarray([[8.0, 0, 0], [0, 8.0, 0]]), (3, 1, 1))
        lafs[:, :, 2] = kpts0
        out = draw_matches(
            img0, img1, kpts0, kpts1, np.asarray([0.9, 0.5, 0.1]),
            lafs0=lafs, output_path=tmp_path / "m.png",
        )
        assert out.shape == (100, 240, 3)
        assert (tmp_path / "m.png").exists()
        # lines drawn -> canvas differs from plain concatenation
        import cv2

        plain = np.concatenate(
            [cv2.cvtColor(img0, cv2.COLOR_GRAY2BGR), cv2.cvtColor(img1, cv2.COLOR_GRAY2BGR)],
            axis=1,
        )
        assert (out != plain).any()


class TestMetricSync:
    def test_single_host_noop(self):
        from openglue_tpu.metrics import EpipolarDistanceMetric, _allgather_list

        assert _allgather_list([1.0, 2.0]) == [1.0, 2.0]
        m = EpipolarDistanceMetric()
        m.precisions = [0.5]
        m.matching_scores = [0.25]
        m.sync()
        assert m.compute()["Precision@0.0005"] == 0.5


class TestBf16Training:
    def test_bf16_matcher_train_step(self):
        from openglue_tpu.data.synthetic import SyntheticHomographyPairs
        from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
        from openglue_tpu.train import LossConfig, create_train_state, make_train_step
        from openglue_tpu.train.step import superglue_inputs

        cfg = SuperGlueConfig(
            descriptor_dim=64, pe_hidden_layers_sizes=(32,), num_stages=2,
            num_heads=4, otp_num_iters=8, residual=True, dtype=jnp.bfloat16,
        )
        model = SuperGlue(cfg)
        gen = SyntheticHomographyPairs(num_keypoints=64, descriptor_dim=64)
        batch = gen.sample(jax.random.key(0), 2)
        variables = model.init(jax.random.key(1), **superglue_inputs(batch))
        # params stay f32 under mixed precision
        assert jax.tree_util.tree_leaves(variables["params"])[0].dtype == jnp.float32
        state = create_train_state(model.apply, variables, learning_rate=1e-3)
        step = jax.jit(make_train_step(LossConfig(positive_threshold=3.0)))
        state, m0 = step(state, batch)
        for _ in range(10):
            state, metrics = step(state, batch)
        assert float(metrics["total_loss"]) < float(m0["total_loss"])
        assert np.isfinite(float(metrics["total_loss"]))


class TestWandbAdapter:
    """Gated W&B logging (reference utils/train_utils.py:54-60)."""

    def test_noop_when_wandb_absent(self, tmp_path):
        from openglue_tpu.train.loop import MetricsLogger

        logger = MetricsLogger(str(tmp_path / "tb"), wandb_enabled=True)
        assert logger.wandb_run is None  # wandb not installed in this env
        logger.log({"train/loss": 1.0}, 0)  # must not raise
        logger.close()

    def test_fake_wandb_receives_config_and_logs(self, tmp_path, monkeypatch):
        import sys
        import types

        from openglue_tpu.train.loop import MetricsLogger

        calls = {"logs": []}

        class FakeRun:
            def log(self, values, step=None):
                calls["logs"].append((dict(values), step))

            def finish(self):
                calls["finished"] = True

        fake = types.ModuleType("wandb")

        def init(project=None, name=None, config=None):
            calls["init"] = {"project": project, "name": name, "config": config}
            return FakeRun()

        fake.init = init
        monkeypatch.setitem(sys.modules, "wandb", fake)

        logger = MetricsLogger(
            None,
            wandb_enabled=True,
            wandb_project="superglue",
            wandb_run_name="exp1",
            config_snapshot={"train": {"epochs": 1}},
        )
        logger.log({"train/loss": 0.5}, 3)
        logger.close()
        assert calls["init"] == {
            "project": "superglue",
            "name": "exp1",
            "config": {"train": {"epochs": 1}},
        }
        assert calls["logs"] == [({"train/loss": 0.5}, 3)]
        assert calls.get("finished")

    def test_loop_config_plumbs_wandb_fields(self, tmp_path):
        from openglue_tpu.cli.common import loop_config_from
        from openglue_tpu.core.config import Config

        cfg = Config({"logging": {"wandb": True, "wandb_project": "p"}, "train": {}})
        loop_cfg = loop_config_from(cfg, tmp_path / "exp_name")
        assert loop_cfg.wandb_enabled is True
        assert loop_cfg.wandb_project == "p"
        assert loop_cfg.wandb_run_name == "exp_name"
        assert loop_cfg.config_snapshot["logging"]["wandb"] is True


class TestDecodeStats:
    """Stats-based decode (models/matching.py:assignment_stats +
    decode_matches_from_stats) must equal the matrix decode exactly — it is
    the same computation reassociated so XLA can fuse the reductions into the
    final Sinkhorn pass and DCE the scores materialization in inference."""

    def _random_scores(self, seed, b=3, n=40, m=33):
        rng = np.random.default_rng(seed)
        raw = rng.normal(size=(b, n + 1, m + 1)).astype(np.float32)
        mask0 = np.arange(n)[None, :] < np.asarray([n, 30, 17])[:, None]
        mask1 = np.arange(m)[None, :] < np.asarray([m, 25, 33])[:, None]
        return jnp.asarray(raw), jnp.asarray(mask0), jnp.asarray(mask1)

    def test_equals_matrix_decode(self):
        from openglue_tpu.models.matching import (
            assignment_stats, decode_matches, decode_matches_from_stats,
        )

        scores, mask0, mask1 = self._random_scores(0)
        ref = decode_matches(scores, mask0=mask0, mask1=mask1)
        out = decode_matches_from_stats(
            *assignment_stats(scores, mask0=mask0, mask1=mask1),
            mask0=mask0, mask1=mask1,
        )
        for k in ref:
            np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(out[k]), err_msg=k)

    def test_model_emits_stats(self):
        from openglue_tpu.data.synthetic import SyntheticHomographyPairs
        from openglue_tpu.models.matching import assignment_stats
        from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
        from openglue_tpu.train.step import superglue_inputs
        import dataclasses

        cfg = SuperGlueConfig(
            descriptor_dim=64, pe_hidden_layers_sizes=(32,), side_info_size=1,
            num_stages=2, num_heads=4, otp_num_iters=8, residual=True,
            decode_stats=True,
        )
        model = SuperGlue(cfg)
        gen = SyntheticHomographyPairs(num_keypoints=64, descriptor_dim=64)
        batch = gen.sample(jax.random.key(0), 2)
        inputs = superglue_inputs(batch, train=False)
        variables = model.init(jax.random.key(1), **inputs)
        out = model.apply(variables, **inputs)
        idx0, idx1, max0 = assignment_stats(
            out["scores"], mask0=batch.side0.mask, mask1=batch.side1.mask
        )
        np.testing.assert_array_equal(np.asarray(out["decode_indices0"]), np.asarray(idx0))
        np.testing.assert_array_equal(np.asarray(out["decode_indices1"]), np.asarray(idx1))
        np.testing.assert_array_equal(np.asarray(out["decode_max0"]), np.asarray(max0))
        # config without the flag keeps the old output surface
        plain = SuperGlue(dataclasses.replace(cfg, decode_stats=False)).apply(
            variables, **inputs
        )
        assert "decode_indices0" not in plain
