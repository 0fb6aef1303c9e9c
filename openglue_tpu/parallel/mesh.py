"""Device mesh + sharding layer — the TPU-native replacement for the
reference's DDP/NCCL stack (reference train.py:69-81 Lightning ddp +
DDPPlugin; SURVEY.md §2.6).

There is no user-space communication backend: the mesh plus PartitionSpecs ARE
the backend. Data parallelism is the batch axis sharded over ``data``; the
gradient all-reduce is emitted by XLA from replicated-parameter out-shardings.
The ``model`` axis is reserved for tensor/sequence parallelism (keypoint-axis
context parallelism lives in openglue_tpu.parallel.context_parallel).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    axis_sizes: Optional[Mapping[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    axis_sizes maps axis name -> size; a single axis may be -1 to absorb the
    remaining devices. Default: all devices on the ``data`` axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {DATA_AXIS: len(devices)}
    names = tuple(axis_sizes)
    sizes = [int(s) for s in axis_sizes.values()]
    n_dev = len(devices)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1])) if len(sizes) > 1 else 1
        sizes[sizes.index(-1)] = n_dev // max(known, 1)
    total = int(np.prod(sizes))
    if total != n_dev:
        raise ValueError(f"Mesh {dict(zip(names, sizes))} needs {total} devices, have {n_dev}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def batch_pspec(mesh: Mesh) -> P:
    """PartitionSpec sharding the leading (batch) dimension over ``data``."""
    if DATA_AXIS in mesh.axis_names:
        return P(DATA_AXIS)
    return P()


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a pytree of [B_local, ...] arrays with the batch axis over ``data``.

    Single host: device_put with the NamedSharding. Multi-host: each host
    passes its LOCAL slice of the global batch (see local_batch_slice) and
    jax.make_array_from_process_local_data assembles the global array —
    device_put alone would treat every host's slice as the full global batch.
    """
    sharding = NamedSharding(mesh, batch_pspec(mesh))
    multi_host = jax.process_count() > 1

    def place(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if multi_host:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, batch)


def shard_train_step(train_step, mesh: Mesh):
    """Jit a (state, batch) -> (state, metrics) step over the mesh.

    Parameters/optimizer state are replicated; the batch is sharded on
    ``data``. XLA inserts the psum of gradients over the data axis because the
    output state must be replicated — this is the whole of DDP here.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, batch_pspec(mesh))
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
    )


def shard_eval_step(eval_step, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, batch_pspec(mesh))
    return jax.jit(eval_step, in_shardings=(repl, data), out_shardings=data)


def local_batch_slice(global_batch_size: int) -> Tuple[int, int]:
    """[start, stop) of this host's slice of the global batch
    (replaces DistributedSampler rank logic, reference
    megadepth_balanced_sampler.py:8-20)."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc:
        raise ValueError(f"global batch {global_batch_size} not divisible by {n_proc} hosts")
    per_host = global_batch_size // n_proc
    start = jax.process_index() * per_host
    return start, start + per_host
