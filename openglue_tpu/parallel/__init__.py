from openglue_tpu.parallel.mesh import (
    batch_pspec,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_train_step,
)

__all__ = [
    "make_mesh",
    "batch_pspec",
    "replicated_sharding",
    "shard_batch",
    "shard_train_step",
]
