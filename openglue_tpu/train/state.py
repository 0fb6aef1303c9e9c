"""Train state: parameters + mutable model collections + optimizer.

Optimization matches the reference (models/matching_module.py:133-147): Adam on
the matcher parameters with a per-STEP exponential LR decay (torch StepLR with
step_size=1, gamma**step) and global-norm gradient clipping
(pl.Trainer(gradient_clip_val), reference train.py:75).

TPU-first: the state is a single pytree replicated (or sharded) via
jax.sharding; there is no DDP wrapper — data parallelism is a mesh axis and
XLA inserts the gradient all-reduce from the shardings.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional

import jax
import optax
from flax import core, struct


class MatcherTrainState(struct.PyTreeNode):
    """Functional train state (flax train_state.TrainState + extra collections).

    model_state holds the non-parameter variable collections: ``batch_stats``
    (the MaskedBatchNorm running statistics) and ``favor_projections`` (the
    Performer random features, redrawn periodically — reference
    utils/lightning_callbacks.py:10-14).
    """

    step: jax.Array
    apply_fn: Callable = struct.field(pytree_node=False)
    params: core.FrozenDict[str, Any]
    model_state: Dict[str, Any]
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    opt_state: optax.OptState

    def apply_gradients(self, *, grads, model_state=None, **kwargs):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            model_state=self.model_state if model_state is None else model_state,
            **kwargs,
        )

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, **self.model_state}


def make_lr_schedule(
    learning_rate: float = 1e-4,
    gamma: float = 0.999994,
    warmup_steps: int = 0,
) -> optax.Schedule:
    """The single source of truth for the learning-rate schedule.

    Both the optimizer builders below and the train loop's lr monitor
    (TrainLoopConfig.lr_schedule) consume this, so the logged train/lr is the
    value the optimizer actually applies — including during warmup and after
    resume (the loop evaluates it at state.step, which equals the optax update
    count because apply_gradients advances both together)."""
    decay = optax.exponential_decay(
        init_value=learning_rate, transition_steps=1, decay_rate=gamma, staircase=True
    )
    if warmup_steps <= 0:
        return decay
    return optax.join_schedules(
        [optax.linear_schedule(0.0, learning_rate, warmup_steps), decay],
        boundaries=[warmup_steps],
    )


def make_optimizer(
    learning_rate: float = 1e-4,
    gamma: float = 0.999994,
    gradient_clip: Optional[float] = 10.0,
) -> optax.GradientTransformation:
    """Adam + per-step exponential decay + grad clipping
    (reference matching_module.py:133-147, train.py:75, config/config.yaml:22,29-30)."""
    schedule = make_lr_schedule(learning_rate, gamma)
    transforms = []
    if gradient_clip is not None:
        transforms.append(optax.clip_by_global_norm(gradient_clip))
    transforms.append(optax.adam(schedule))
    return optax.chain(*transforms)


def make_warmup_optimizer(
    learning_rate: float = 1e-4,
    warmup_steps: int = 1000,
    gamma: float = 0.999994,
    gradient_clip: Optional[float] = 10.0,
) -> optax.GradientTransformation:
    """Linear warmup into the reference per-step exponential decay.

    Beyond the reference (its StepLR has no warmup, matching_module.py:139-147)
    but required at depth: the 9-stage GNN's init gradient norm is ~150x the
    4-stage one (residual FFN updates compound over 18 layers), and cold-start
    full-size Adam steps leave the matcher oscillating around the
    uniform-assignment saddle (loss pinned at log(N+1)) before diverging."""
    schedule = make_lr_schedule(learning_rate, gamma, warmup_steps)
    transforms = []
    if gradient_clip is not None:
        transforms.append(optax.clip_by_global_norm(gradient_clip))
    transforms.append(optax.adam(schedule))
    return optax.chain(*transforms)


def make_online_optimizer(
    params: Mapping[str, Any],
    learning_rate: float = 1e-4,
    gamma: float = 0.999994,
    gradient_clip: Optional[float] = 10.0,
    finetune_extractor: bool = False,
    extractor_key: str = "extractor",
) -> optax.GradientTransformation:
    """Optimizer for the combined extractor+matcher module: when the extractor
    is frozen its subtree gets zero updates (the reference sets
    requires_grad=False and optimizes superglue params only,
    matching_module.py:29-31,133-136)."""
    base = make_optimizer(learning_rate, gamma, gradient_clip)
    if finetune_extractor:
        return base
    labels = {k: ("frozen" if k == extractor_key else "train") for k in params}
    return optax.multi_transform(
        {"train": base, "frozen": optax.set_to_zero()}, labels
    )


def create_train_state(
    apply_fn: Callable,
    variables: Mapping[str, Any],
    learning_rate: float = 1e-4,
    gamma: float = 0.999994,
    gradient_clip: Optional[float] = 10.0,
    tx: Optional[optax.GradientTransformation] = None,
) -> MatcherTrainState:
    """Build a train state from ``model.init`` output."""
    variables = dict(variables)
    params = variables.pop("params")
    if tx is None:
        tx = make_optimizer(learning_rate, gamma, gradient_clip)
    import jax.numpy as jnp

    return MatcherTrainState(
        step=jnp.zeros((), jnp.int32),
        apply_fn=apply_fn,
        params=params,
        model_state=variables,
        tx=tx,
        opt_state=tx.init(params),
    )
