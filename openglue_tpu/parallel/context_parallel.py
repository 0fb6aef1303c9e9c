"""GSPMD keypoint-axis context parallelism for the full model.

The whole-model CP path: annotate the keypoint axis of every per-keypoint
array with the ``model`` mesh axis and jit the EXISTING train/eval step — XLA
partitions the attention einsums (score rows stay sharded; the small K/V
tensors are gathered over ICI), the Sinkhorn logsumexps (sharded-reduce), the
GT-generation cdist, and the losses. This is the idiomatic TPU scaling path
(mesh + PartitionSpec IS the backend, SURVEY.md §2.6); the hand-scheduled
ring/ppermute variants live in openglue_tpu.parallel.ring for the
bandwidth-optimal attention inner loop.

Composes with data parallelism: batch over ``data``, keypoints over ``model``.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openglue_tpu.core.types import KeypointSet, PairBatch, Transformation
from openglue_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _axes(mesh: Mesh):
    data = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    model = MODEL_AXIS if MODEL_AXIS in mesh.axis_names else None
    return data, model


def keypoint_set_pspec(mesh: Mesh) -> KeypointSet:
    """PartitionSpecs for a KeypointSet: batch over data, keypoints over model."""
    d, m = _axes(mesh)
    return KeypointSet(
        keypoints=P(d, m, None),
        descriptors=P(d, m, None),
        side_info=P(d, m, None),
        mask=P(d, m),
        image_size=P(d, None),
    )


def transformation_pspec(mesh: Mesh, tf: Transformation) -> Transformation:
    d, m = _axes(mesh)

    def dep(x):
        if x is None:
            return None
        # per-keypoint depth [B, N] shards with keypoints; dense [B, H, W] does not
        return P(d, m) if x.ndim == 2 else P(d, None, None)

    if tf.kind == "perspective":
        return Transformation(kind="perspective", H=P(d, None, None))
    return Transformation(
        kind="3d_reprojection",
        K0=P(d, None, None),
        K1=P(d, None, None),
        R=P(d, None, None),
        T=P(d, None),
        depth0=dep(tf.depth0),
        depth1=dep(tf.depth1),
    )


def pair_batch_pspec(mesh: Mesh, batch: PairBatch) -> PairBatch:
    ks = keypoint_set_pspec(mesh)
    return PairBatch(
        side0=ks,
        side1=ks,
        transformation=(
            transformation_pspec(mesh, batch.transformation)
            if batch.transformation is not None
            else None
        ),
    )


def shard_pair_batch_cp(batch: PairBatch, mesh: Mesh) -> PairBatch:
    """Place a host PairBatch with batch-over-data and keypoints-over-model."""
    import numpy as np

    specs = pair_batch_pspec(mesh, batch)

    def place(x, spec):
        if x is None:
            return None
        arr = np.asarray(x) if not isinstance(x, jax.Array) else x
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, batch, specs)


def shard_train_step_cp(train_step, mesh: Mesh, batch: PairBatch):
    """Jit a (state, batch) step with CP shardings on the batch; the state is
    replicated and gradients psum over BOTH mesh axes (emitted by XLA)."""
    repl = NamedSharding(mesh, P())
    batch_shardings = jax.tree_util.tree_map(
        lambda spec: None if spec is None else NamedSharding(mesh, spec),
        pair_batch_pspec(mesh, batch),
        is_leaf=lambda x: isinstance(x, P) or x is None,
    )
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_shardings),
        out_shardings=(repl, repl),
    )
