"""Jitted train / eval steps.

One step replicates the reference training_step (models/matching_module.py:71-105):
GT match generation from geometry -> SuperGlue forward -> weighted NLL (+ metric)
loss -> gradients. Lightning's backward/DDP-allreduce is replaced by
jax.value_and_grad inside jit over a device mesh — the gradient all-reduce is
emitted by XLA from the sharding annotations, not by a communication library.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from openglue_tpu.core.types import PairBatch
from openglue_tpu.geometry.gt_matches import generate_gt_matches
from openglue_tpu.losses import criterion
from openglue_tpu.models.matching import decode_from_output
from openglue_tpu.ops.attention import sample_orthogonal_random_matrix
from openglue_tpu.train.state import MatcherTrainState


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss/supervision configuration (reference config/config.yaml:24-32)."""

    positive_threshold: float = 2.0
    negative_threshold: float = 7.0
    nll_weight: float = 1.0
    metric_weight: float = 0.0
    margin: Optional[float] = None
    gt_parity_mode: bool = False


def superglue_inputs(batch: PairBatch, train: bool = False) -> Dict[str, Any]:
    """Map a PairBatch onto the SuperGlue.__call__ keyword arguments."""
    s0, s1 = batch.side0, batch.side1
    return dict(
        kpts0=s0.keypoints,
        kpts1=s1.keypoints,
        desc0=s0.descriptors,
        desc1=s1.descriptors,
        side_info0=s0.side_info,
        side_info1=s1.side_info,
        image_size0=s0.image_size,
        image_size1=s1.image_size,
        mask0=s0.mask,
        mask1=s1.mask,
        train=train,
    )


def make_train_step(loss_config: LossConfig):
    """Build the jittable train step: (state, batch) -> (state, metrics)."""

    def train_step(
        state: MatcherTrainState, batch: PairBatch
    ) -> Tuple[MatcherTrainState, Dict[str, jnp.ndarray]]:
        s0, s1 = batch.side0, batch.side1
        gt = generate_gt_matches(
            s0.keypoints,
            s1.keypoints,
            batch.transformation,
            positive_threshold=loss_config.positive_threshold,
            negative_threshold=loss_config.negative_threshold,
            mask0=s0.mask,
            mask1=s1.mask,
            parity_mode=loss_config.gt_parity_mode,
        )

        mutable = [k for k in state.model_state if k == "batch_stats"]

        def loss_fn(params):
            variables = {"params": params, **state.model_state}
            out = state.apply_fn(
                variables, **superglue_inputs(batch, train=True), mutable=mutable
            )
            if mutable:
                out, mutated = out
            else:
                mutated = {}
            losses = criterion(
                gt, out, margin=loss_config.margin, mask0=s0.mask, mask1=s1.mask
            )
            total = (
                loss_config.nll_weight * losses["loss"]
                + loss_config.metric_weight * losses["metric_loss"]
            )
            return total, (mutated, losses)

        (total, (mutated, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_model_state = {**state.model_state, **dict(mutated)}
        state = state.apply_gradients(grads=grads, model_state=new_model_state)
        metrics = {
            "total_loss": total,
            "nll_loss": losses["loss"],
            "metric_loss": losses["metric_loss"],
            "grad_norm": optax_global_norm(grads),
        }
        return state, metrics

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_step(match_threshold: float = 0.2):
    """Build the jittable eval step: full match decode
    (reference matching_module.py:107-124 validation_step)."""

    def eval_step(
        state: MatcherTrainState, batch: PairBatch
    ) -> Dict[str, jnp.ndarray]:
        s0, s1 = batch.side0, batch.side1
        variables = {"params": state.params, **state.model_state}
        out = state.apply_fn(variables, **superglue_inputs(batch, train=False))
        matches = decode_from_output(
            out, match_threshold=match_threshold, mask0=s0.mask, mask1=s1.mask
        )
        matches["scores"] = out["scores"]
        return matches

    return eval_step


def make_online_train_step(
    loss_config: LossConfig,
    augmentation: str = "none",
):
    """Train step for the ONLINE path (reference matching_module.py:71-105):
    device-side augmentation -> feature extraction -> GT generation from the
    batch transformation -> SuperGlue -> loss. The whole chain is one jit;
    state.apply_fn must be a MatchingModule.apply.

    batch: dict with image0/image1 [B, H, W] and a Transformation pytree.
    """
    from openglue_tpu.augmentations import get_augmentation_transform

    augment = get_augmentation_transform(augmentation)

    def train_step(state: MatcherTrainState, batch, rng: jax.Array):
        rng0, rng1 = jax.random.split(jax.random.fold_in(rng, state.step))
        image0 = augment(rng0, batch["image0"])
        image1 = augment(rng1, batch["image1"])
        transformation = batch["transformation"]

        mutable = [k for k in state.model_state if k == "batch_stats"]

        def loss_fn(params):
            variables = {"params": params, **state.model_state}
            out = state.apply_fn(
                variables, image0, image1, train=True, mutable=mutable
            )
            (pred, pair), mutated = out if mutable else (out, {})
            gt = generate_gt_matches(
                pair.side0.keypoints,
                pair.side1.keypoints,
                transformation,
                positive_threshold=loss_config.positive_threshold,
                negative_threshold=loss_config.negative_threshold,
                mask0=pair.side0.mask,
                mask1=pair.side1.mask,
                parity_mode=loss_config.gt_parity_mode,
            )
            losses = criterion(
                gt, pred, margin=loss_config.margin,
                mask0=pair.side0.mask, mask1=pair.side1.mask,
            )
            total = (
                loss_config.nll_weight * losses["loss"]
                + loss_config.metric_weight * losses["metric_loss"]
            )
            return total, (mutated, losses)

        (total, (mutated, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_model_state = {**state.model_state, **dict(mutated)}
        state = state.apply_gradients(grads=grads, model_state=new_model_state)
        metrics = {
            "total_loss": total,
            "nll_loss": losses["loss"],
            "metric_loss": losses["metric_loss"],
            "grad_norm": optax_global_norm(grads),
        }
        return state, metrics

    return train_step


def make_online_eval_step(match_threshold: float = 0.2):
    """Eval step for the ONLINE path: images -> extraction -> matching ->
    decode (reference validation_step with online features). Returns the
    decoded matches plus the extracted keypoint sets (the metrics need the
    keypoint coordinates)."""

    def eval_step(state: MatcherTrainState, batch):
        variables = {"params": state.params, **state.model_state}
        pred, pair = state.apply_fn(
            variables, batch["image0"], batch["image1"], train=False
        )
        matches = decode_from_output(
            pred,
            match_threshold=match_threshold,
            mask0=pair.side0.mask,
            mask1=pair.side1.mask,
        )
        matches["keypoints0"] = pair.side0.keypoints
        matches["keypoints1"] = pair.side1.keypoints
        matches["mask0"] = pair.side0.mask
        return matches

    return eval_step


def redraw_favor_projections(
    state: MatcherTrainState, rng: jax.Array
) -> MatcherTrainState:
    """Resample every FAVOR orthogonal projection (Performer redraw; reference
    utils/lightning_callbacks.py:10-14 does this by mutating torch buffers every
    N steps). Fold the step into the key so all hosts derive identical draws."""
    projections = state.model_state.get("favor_projections")
    if not projections:
        return state

    flat, treedef = jax.tree_util.tree_flatten(projections)
    keys = jax.random.split(jax.random.fold_in(rng, state.step), len(flat))
    new_flat = [
        sample_orthogonal_random_matrix(k, p.shape[0], p.shape[1], dtype=p.dtype)
        for k, p in zip(keys, flat)
    ]
    new_projections = jax.tree_util.tree_unflatten(treedef, new_flat)
    return state.replace(
        model_state={**state.model_state, "favor_projections": new_projections}
    )
