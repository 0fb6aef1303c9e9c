"""Tensor parallelism for the matcher: parameter PartitionSpecs over the
``model`` mesh axis (SURVEY.md §2.6 — optional for this model size; provided
as GSPMD sharding rules, XLA inserts the collectives).

Layout follows the Megatron convention per attention/FFN block:
  * q/k/v projections column-parallel (output/head dim sharded),
  * out-projection row-parallel (input dim sharded),
  * FFN first dense column-parallel, second dense row-parallel,
  * everything else (PE MLP, linear_proj, mix/dustbin, BN) replicated — the
    BN between the FFN halves is per-channel so its scale/bias shard with the
    hidden dim.

The same 'model' axis can alternatively carry keypoint-axis context
parallelism (parallel.context_parallel); combine on a 3D mesh if both are
wanted at once.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openglue_tpu.parallel.mesh import MODEL_AXIS


def _spec_for(path: str, leaf, axis: str) -> P:
    ndim = getattr(leaf, "ndim", 0)
    if "attention_gnn" not in path:
        return P()  # PE / head / misc: replicate
    if "mha" in path:
        if any(f"{name}_proj" in path for name in ("q", "k", "v")):
            if "kernel" in path and ndim == 2:
                return P(None, axis)  # column parallel
            if "bias" in path and ndim == 1:
                return P(axis)
        if "out_proj" in path:
            if "kernel" in path and ndim == 2:
                return P(axis, None)  # row parallel
            return P()  # bias replicated (after the psum)
    if "ffn" in path:
        if "dense_0" in path:
            if "kernel" in path and ndim == 2:
                return P(None, axis)
            if "bias" in path and ndim == 1:
                return P(axis)
        if "bn_0" in path and ndim == 1:
            return P(axis)  # per-channel params on the sharded hidden dim
        if "dense_1" in path:
            if "kernel" in path and ndim == 2:
                return P(axis, None)
            return P()
    return P()


def matcher_param_pspecs(params: Dict[str, Any], axis: str = MODEL_AXIS):
    """PartitionSpec pytree matching ``params`` (the SuperGlue param tree)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for key_path, leaf in flat:
        path = jax.tree_util.keystr(key_path)
        specs.append(_spec_for(path, leaf, axis))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params_tp(params: Dict[str, Any], mesh: Mesh, axis: str = MODEL_AXIS):
    """Place the param tree with TP shardings (batch-stat collections and
    optimizer states follow the same specs via tree_map at the call site)."""
    specs = matcher_param_pspecs(params, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def tp_forward_jit(apply_fn, mesh: Mesh, variables, axis: str = MODEL_AXIS):
    """Jit a (variables, kwargs) forward with the TP parameter shardings
    constrained at the jit boundary (batch replicated; compose with data/CP
    by extending the kwargs sharding)."""
    param_specs = matcher_param_pspecs(variables["params"], axis)
    var_shardings = {
        key: (
            jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), param_specs)
            if key == "params"
            else jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), value)
        )
        for key, value in variables.items()
    }

    def fn(variables, kwargs):
        return apply_fn(variables, **kwargs)

    return jax.jit(fn, in_shardings=(var_shardings, None))
