"""Checkpointing via Orbax (reference: Lightning ModelCheckpoint keeping every
epoch, utils/train_utils.py:33-43, plus raw-weight warm starts,
superglue.py:25-27 / superpoint model.py:55-59).

Three tiers, mirroring the reference:
  * full train state (params + optimizer + step + model_state) for resume;
  * matcher-only weights for warm-starting / inference;
  * torch-checkpoint import through openglue_tpu.compat.torch_weights.

Orbax handles multi-host coordination (async save optional); every epoch is
kept (save_top_k=-1 semantics).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

from openglue_tpu.train.state import MatcherTrainState


def _manager(directory, keep: Optional[int] = None):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep,  # None = keep all (reference save_top_k=-1)
        create=True,
        enable_async_checkpointing=False,
    )
    return ocp.CheckpointManager(Path(directory).absolute(), options=options)


def save_train_state(directory, state: MatcherTrainState, step: Optional[int] = None) -> None:
    import orbax.checkpoint as ocp

    step = int(state.step) if step is None else step
    with _manager(directory) as mgr:
        payload = {
            "step": np.asarray(state.step),
            "params": jax.device_get(state.params),
            "model_state": jax.device_get(state.model_state),
            "opt_state": jax.device_get(state.opt_state),
        }
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()


def restore_train_state(directory, state: MatcherTrainState, step: Optional[int] = None) -> MatcherTrainState:
    """Restore into an existing (abstract or concrete) state: shapes/dtypes are
    taken from ``state`` so restoration works under any sharding."""
    import orbax.checkpoint as ocp

    with _manager(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        template = {
            "step": np.asarray(state.step),
            "params": jax.device_get(state.params),
            "model_state": jax.device_get(state.model_state),
            "opt_state": jax.device_get(state.opt_state),
        }
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    import jax.numpy as jnp

    return state.replace(
        step=jnp.asarray(restored["step"]),
        params=restored["params"],
        model_state=restored["model_state"],
        opt_state=restored["opt_state"],
    )


def latest_step(directory) -> Optional[int]:
    import orbax.checkpoint as ocp

    path = Path(directory)
    if not path.exists():
        return None
    with _manager(directory) as mgr:
        return mgr.latest_step()


def save_weights(path, variables: Dict[str, Any]) -> None:
    """Raw weights (params + collections) as a single-file npz tree."""
    flat = {}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(variables)
    for key_path, leaf in leaves:
        flat[jax.tree_util.keystr(key_path)] = np.asarray(leaf)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_weights(path, template: Dict[str, Any]) -> Dict[str, Any]:
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    restored = []
    for key_path, leaf in leaves:
        key = jax.tree_util.keystr(key_path)
        if key not in data:
            raise KeyError(f"{path} missing weight {key}")
        value = data[key]
        if tuple(value.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"{key}: shape {value.shape} != template {np.shape(leaf)}")
        restored.append(value)
    return jax.tree_util.tree_unflatten(treedef, restored)
