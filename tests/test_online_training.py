"""Online-path tests: augmentations, MatchingModule (extractor + matcher in
one jitted graph), frozen-vs-finetuned extractor semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglue_tpu.augmentations import get_augmentation_transform, weak_color_aug
from openglue_tpu.core.types import Transformation
from openglue_tpu.features.superpoint import SuperPointConfig
from openglue_tpu.models.matching_module import MatchingModule, MatchingModuleConfig
from openglue_tpu.models.superglue import SuperGlueConfig
from openglue_tpu.train import LossConfig, create_train_state
from openglue_tpu.train.state import make_online_optimizer
from openglue_tpu.train.step import make_online_train_step


def image_pair_batch(batch=2, h=64, w=80, seed=0):
    """Structured images + known homography (small shift)."""
    import cv2

    rng = np.random.default_rng(seed)
    images0, images1, Hs = [], [], []
    for _ in range(batch):
        img = np.zeros((h, w), np.uint8)
        for _ in range(25):
            x, y = rng.integers(5, w - 5), rng.integers(5, h - 5)
            cv2.circle(img, (int(x), int(y)), int(rng.integers(2, 6)), int(rng.integers(80, 255)), -1)
        H = np.array([[1, 0, 3.0], [0, 1, -2.0], [0, 0, 1]], np.float32)
        warped = cv2.warpPerspective(img, H, (w, h))
        images0.append(img.astype(np.float32) / 255.0)
        images1.append(warped.astype(np.float32) / 255.0)
        Hs.append(H)
    return {
        "image0": jnp.asarray(np.stack(images0)),
        "image1": jnp.asarray(np.stack(images1)),
        "transformation": Transformation(kind="perspective", H=jnp.asarray(np.stack(Hs))),
    }


def small_config(finetune=False):
    return MatchingModuleConfig(
        superglue=SuperGlueConfig(
            descriptor_dim=64,
            pe_hidden_layers_sizes=(32,),
            side_info_size=1,
            num_stages=2,
            num_heads=4,
            otp_num_iters=8,
            residual=True,
        ),
        superpoint=SuperPointConfig(max_keypoints=64, descriptor_dim=64),
        laf_converter="none",
        finetune=finetune,
    )


class TestAugmentations:
    def test_shapes_bounds_determinism(self):
        rng = jax.random.key(0)
        images = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 32, 40)).astype(np.float32))
        out1 = weak_color_aug(rng, images)
        out2 = weak_color_aug(rng, images)
        assert out1.shape == images.shape
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert float(out1.min()) >= 0.0 and float(out1.max()) <= 1.0
        # different key -> different augmentation
        out3 = weak_color_aug(jax.random.key(1), images)
        assert not np.allclose(np.asarray(out1), np.asarray(out3))

    def test_registry_none_is_identity(self):
        images = jnp.ones((2, 8, 8)) * 0.3
        fn = get_augmentation_transform("none")
        np.testing.assert_array_equal(np.asarray(fn(jax.random.key(0), images)), np.asarray(images))
        with pytest.raises(ValueError):
            get_augmentation_transform("bogus")

    def test_jit_compatible(self):
        images = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 16, 16)).astype(np.float32))
        out = jax.jit(weak_color_aug)(jax.random.key(0), images)
        assert np.isfinite(np.asarray(out)).all()


class TestMatchingModule:
    def test_forward_produces_scores_and_pairbatch(self):
        batch = image_pair_batch()
        model = MatchingModule(small_config())
        variables = model.init(jax.random.key(0), batch["image0"], batch["image1"])
        (out, pair) = jax.jit(lambda v, a, b: model.apply(v, a, b))(
            variables, batch["image0"], batch["image1"]
        )
        assert out["scores"].shape == (2, 65, 65)
        assert pair.side0.keypoints.shape == (2, 64, 2)
        assert pair.side0.mask.sum() > 0

    def test_online_train_step_frozen_extractor(self):
        batch = image_pair_batch()
        model = MatchingModule(small_config(finetune=False))
        variables = model.init(jax.random.key(0), batch["image0"], batch["image1"])
        params = variables["params"]
        tx = make_online_optimizer(params, learning_rate=1e-3, finetune_extractor=False)
        state = create_train_state(model.apply, variables, tx=tx)
        step = jax.jit(
            make_online_train_step(
                LossConfig(positive_threshold=3.0, negative_threshold=5.0),
                augmentation="none",
            )
        )
        ext_before = jax.tree_util.tree_leaves(state.params["extractor"])[0]
        sg_before = jax.tree_util.tree_leaves(state.params["superglue"])[0]
        first = None
        for i in range(15):
            state, metrics = step(state, batch, jax.random.key(42))
            if first is None:
                first = float(metrics["total_loss"])
        assert float(metrics["total_loss"]) < first
        ext_after = jax.tree_util.tree_leaves(state.params["extractor"])[0]
        sg_after = jax.tree_util.tree_leaves(state.params["superglue"])[0]
        np.testing.assert_array_equal(np.asarray(ext_before), np.asarray(ext_after))
        assert not np.allclose(np.asarray(sg_before), np.asarray(sg_after))

    def test_online_train_step_finetune_updates_extractor(self):
        batch = image_pair_batch()
        model = MatchingModule(small_config(finetune=True))
        variables = model.init(jax.random.key(0), batch["image0"], batch["image1"])
        tx = make_online_optimizer(
            variables["params"], learning_rate=1e-3, finetune_extractor=True
        )
        state = create_train_state(model.apply, variables, tx=tx)
        step = jax.jit(
            make_online_train_step(LossConfig(positive_threshold=3.0), augmentation="none")
        )
        ext_before = jax.tree_util.tree_leaves(state.params["extractor"])[0]
        for _ in range(3):
            state, metrics = step(state, batch, jax.random.key(1))
        ext_after = jax.tree_util.tree_leaves(state.params["extractor"])[0]
        assert not np.allclose(np.asarray(ext_before), np.asarray(ext_after))
        assert np.isfinite(float(metrics["total_loss"]))

    def test_config_from_dict_propagates_dims(self):
        cfg = MatchingModuleConfig.from_dict(
            {
                "features": {"parameters": {"max_keypoints": 128, "descriptor_dim": 128}},
                "laf_to_sideinfo_method": "scale_rotation",
                "superglue": {
                    "descriptor_dim": 999,  # overridden by extractor dim
                    "attention_gnn": {"num_stages": 3},
                },
            }
        )
        assert cfg.superglue.descriptor_dim == 128
        assert cfg.superglue.side_info_size == 4  # 1 response + 1 scale + 2 rot
        assert cfg.superglue.num_stages == 3


class TestSIFTOnline:
    def test_sift_extractor_matching_module(self):
        """Online path with the parameter-free device SIFT extractor."""
        cfg = MatchingModuleConfig.from_dict(
            {
                "features": {
                    "name": "SIFT",
                    "descriptor_dim": 128,
                    "parameters": {"max_keypoints": 64, "double_image": False},
                },
                "laf_to_sideinfo_method": "scale_rotation",
                "superglue": {
                    "positional_encoding": {"hidden_layers_sizes": [16]},
                    "attention_gnn": {"num_stages": 1, "num_heads": 4},
                    "otp": {"num_iters": 5},
                    "residual": True,
                },
            }
        )
        assert cfg.superglue.descriptor_dim == 128
        assert cfg.superglue.side_info_size == 4
        model = MatchingModule(cfg)
        batch = image_pair_batch(h=96, w=128)
        variables = model.init(jax.random.key(0), batch["image0"], batch["image1"])
        # no extractor params: only the matcher subtree exists
        assert set(variables["params"].keys()) == {"superglue"}
        out, pair = jax.jit(lambda v, a, b: model.apply(v, a, b))(
            variables, batch["image0"], batch["image1"]
        )
        assert out["scores"].shape == (2, 65, 65)
        assert pair.side0.side_info.shape[-1] == 4

    def test_sift_online_training_learns(self):
        cfg = MatchingModuleConfig.from_dict(
            {
                "features": {
                    "name": "SIFT",
                    "descriptor_dim": 128,
                    "parameters": {"max_keypoints": 64, "double_image": False},
                },
                "laf_to_sideinfo_method": "none",
                "superglue": {
                    "positional_encoding": {"hidden_layers_sizes": [16]},
                    "attention_gnn": {"num_stages": 1, "num_heads": 4},
                    "otp": {"num_iters": 5},
                    "residual": True,
                },
            }
        )
        model = MatchingModule(cfg)
        batch = image_pair_batch(h=96, w=128)
        variables = model.init(jax.random.key(0), batch["image0"], batch["image1"])
        tx = make_online_optimizer(variables["params"], learning_rate=1e-3,
                                   finetune_extractor=False, extractor_key="extractor")
        state = create_train_state(model.apply, variables, tx=tx)
        step = jax.jit(
            make_online_train_step(LossConfig(positive_threshold=3.0), augmentation="none")
        )
        state, m0 = step(state, batch, jax.random.key(0))
        for _ in range(10):
            state, metrics = step(state, batch, jax.random.key(0))
        assert float(metrics["total_loss"]) < float(m0["total_loss"])


def test_evaluate_online_homography_metric():
    """evaluate_online on perspective batches reports H-precision."""
    from openglue_tpu.train.loop import TrainLoopConfig, evaluate_online
    from openglue_tpu.train.step import make_online_eval_step

    model = MatchingModule(small_config())
    batch = image_pair_batch()
    variables = model.init(jax.random.key(0), batch["image0"], batch["image1"])
    state = create_train_state(model.apply, variables)
    eval_step = jax.jit(make_online_eval_step(0.0))
    metrics = evaluate_online(state, eval_step, [batch], TrainLoopConfig())
    assert "H-Precision@3.0px" in metrics
    assert 0.0 <= metrics["H-Precision@3.0px"] <= 1.0


class TestModuleRegistryExtractors:
    def test_gftt_hardnet_extractor_frozen_semantics(self):
        """Parameterized registry extractors must land under 'extractor' and
        respect the frozen contract (review finding: they silently trained)."""
        cfg = MatchingModuleConfig.from_dict(
            {
                "features": {
                    "name": "GFTTAffNetHardNet",
                    "descriptor_dim": 128,
                    "parameters": {"max_keypoints": 32, "descriptor_dim": 128},
                },
                "laf_to_sideinfo_method": "none",
                "superglue": {
                    "positional_encoding": {"hidden_layers_sizes": [16]},
                    "attention_gnn": {"num_stages": 1, "num_heads": 4},
                    "otp": {"num_iters": 5},
                    "residual": True,
                },
                "train": {"finetune_features_extractor": False},
            }
        )
        model = MatchingModule(cfg)
        batch = image_pair_batch(h=96, w=128)
        variables = model.init(jax.random.key(0), batch["image0"], batch["image1"])
        assert "extractor" in variables["params"], list(variables["params"])

        tx = make_online_optimizer(variables["params"], learning_rate=1e-3,
                                   finetune_extractor=False)
        state = create_train_state(model.apply, variables, tx=tx)
        step = jax.jit(
            make_online_train_step(LossConfig(positive_threshold=3.0), augmentation="none")
        )
        ext_before = jax.tree_util.tree_leaves(state.params["extractor"])[0]
        state, metrics = step(state, batch, jax.random.key(0))
        ext_after = jax.tree_util.tree_leaves(state.params["extractor"])[0]
        np.testing.assert_array_equal(np.asarray(ext_before), np.asarray(ext_after))
        assert np.isfinite(float(metrics["total_loss"]))

    def test_superpoint_bn_param_in_dict_no_crash(self):
        cfg = MatchingModuleConfig.from_dict(
            {
                "features": {
                    "name": "SuperPointNetBn",
                    "parameters": {"max_keypoints": 32, "descriptor_dim": 32, "bn": True},
                },
                "superglue": {
                    "positional_encoding": {"hidden_layers_sizes": [16]},
                    "attention_gnn": {"num_stages": 1, "num_heads": 4},
                    "otp": {"num_iters": 4},
                },
            }
        )
        model = MatchingModule(cfg)
        batch = image_pair_batch(h=64, w=64)
        variables = model.init(jax.random.key(0), batch["image0"], batch["image1"])
        assert "batch_stats" in variables  # the Bn variant really has BNs
