"""Multi-host initialization (the TPU-native replacement for Lightning's DDP
process management; SURVEY.md §2.6 — jax.distributed.initialize + mesh, no
user-space backend).

On TPU pods the coordinator/process ids come from the environment, so
``initialize()`` is usually argument-free. Call once at entry-point start,
before any other jax API. All CLIs work unchanged afterward: per-host data
sharding (parallel.mesh.local_batch_slice, data.sampler), global meshes over
all devices, rank-0-only logging and metric sync are already keyed off
jax.process_index()/process_count().
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host; no-op single-host.

    Returns True if distributed mode was initialized. Safe to call when the
    runtime is single-host (missing env => no-op) or already initialized.
    """
    import jax

    multi_host_env = any(
        os.environ.get(var)
        for var in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and num_processes is None and not multi_host_env:
        # single host (TPU pods auto-detect through the TPU runtime; explicit
        # args are only needed for CPU/GPU clusters)
        try:
            if jax.process_count() > 1:
                return True
        except Exception:
            pass
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError as exc:  # already initialized
        if "already" in str(exc).lower():
            return True
        raise


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (e.g. 'checkpoint written before eval reads')."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
