"""Device-resident (HBM) descriptor cache for cached-feature training.

Motivation (bench/trainer_feed.py round-5 decomposition): descriptors are
~97% of the collated batch bytes (25.2 of 26 MB at B=12 N=1024 D=256), and
on a bandwidth-limited host->device link they — not h5 IO or collate — bound
the product trainer (the axon tunnel moves ~85 MB/s; a real PCIe host moves
GB/s but the same ratio governs its DMA budget at high step rates). Each
image's descriptors are REUSED across every pair it appears in, so the
TPU-native fix is to keep per-image descriptor blocks resident in HBM and
send only [B, N] int32 row indices per batch:

  host                          device (HBM)
  ----                          ------------
  collate -> selection indices  cache [slots, cap, D] (bf16)
  miss    -> one block H2D      dynamic_update_slice into its slot (donated)
  batch   -> slots + indices    gather: cache[slots] take_along_axis -> [B,N,D]

The gather output feeds the train step as ordinary [B, N, D] descriptor
arrays — the model/step are unchanged. Masked (padding) rows gather row 0
and are zeroed, matching the zero-padded host collate exactly.

Reference counterpart: none — the torch reference re-reads and re-ships
descriptors every batch (data/megadepth_datamodule.py:104-168).

Single-host meshes replicate the cache over the mesh and emit
batch-sharded gathers. Multi-host DP runs a PER-HOST cache: the
host-invariant grouped loader hands each host only its local slice, the
host gathers locally, and shard_fn assembles the global batch-sharded
array (make_array_from_single_device_arrays) — two-process CPU test in
tests/test_multiprocess.py.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

Key = Tuple[str, str]


class DeviceDescriptorCache:
    """LRU of per-image descriptor blocks in device memory.

    slots x cap x dim, ``dtype`` storage (bf16 by default: a bf16-compute
    model casts descriptors on arrival anyway — data/collate.py
    cast_for_transfer rationale). ~slots*cap*dim*2 bytes of HBM:
    512 slots x 2048 x 256 bf16 = 512 MB.
    """

    def __init__(self, slots: int, cap: int, dim: int, dtype=None, mesh=None):
        import jax
        import jax.numpy as jnp

        if dtype is None:
            dtype = jnp.bfloat16
        self.slots = int(slots)
        self.cap = int(cap)
        self.dim = int(dim)
        self.dtype = dtype
        self.mesh = mesh
        repl = data = None
        if mesh is not None and jax.process_count() == 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from openglue_tpu.parallel.mesh import batch_pspec

            # cache replicated over the (single-host) mesh; gathers come out
            # batch-sharded to match the train step's in_shardings. In
            # MULTI-HOST mode the cache stays a per-host local array — each
            # host gathers its slice and shard_fn assembles the global batch
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, batch_pspec(mesh))
        self.cache = jnp.zeros((self.slots, self.cap, self.dim), dtype)
        if repl is not None:
            self.cache = jax.device_put(self.cache, repl)
        self.slot_of: "OrderedDict[Key, int]" = OrderedDict()  # LRU: oldest first
        self._free: List[int] = list(range(self.slots))
        self.misses = 0
        self.hits = 0

        def _update(cache, slot, block):
            return jax.lax.dynamic_update_slice(cache, block[None], (slot, 0, 0))

        # donate the cache buffer: the update is in-place in HBM
        self._update = jax.jit(
            _update, donate_argnums=0,
            **({"out_shardings": repl} if repl is not None else {}),
        )

        def _gather(cache, slots_, idx, mask):
            blocks = cache[slots_]  # [B, cap, D]
            d = jnp.take_along_axis(blocks, idx[..., None], axis=1)  # [B, N, D]
            return d * mask[..., None].astype(d.dtype)

        self._gather = jax.jit(
            _gather,
            **(
                {"in_shardings": (repl, data, data, data), "out_shardings": data}
                if repl is not None
                else {}
            ),
        )
        # unsharded variant for batches that cannot ride the data axis
        # (validation tail batches smaller than the mesh)
        self._gather_plain = jax.jit(_gather)

    def _block_for(self, desc: np.ndarray) -> np.ndarray:
        """Pad/cast a [n, D] f32 block to [cap, D] storage dtype."""
        import ml_dtypes

        n = desc.shape[0]
        if n > self.cap:
            raise ValueError(
                f"image has {n} keypoints but the device cache cap is "
                f"{self.cap} — raise data.device_cache_cap"
            )
        del ml_dtypes  # imported for the side effect: registers bfloat16 with numpy
        np_dtype = np.dtype(self.dtype)
        out = np.zeros((self.cap, self.dim), np_dtype)
        out[:n] = desc.astype(np_dtype)
        return out

    def ensure(self, keys: Sequence[Key], blocks: Dict[Key, np.ndarray]) -> None:
        """Install any missing images (one H2D of ~cap*D*2 bytes per miss,
        applied with a donated dynamic_update_slice) and refresh LRU order."""
        import jax.numpy as jnp

        for key in keys:
            slot = self.slot_of.get(key)
            if slot is not None:
                self.slot_of.move_to_end(key)
                self.hits += 1
                continue
            self.misses += 1
            if self._free:
                slot = self._free.pop()
            else:
                _, slot = self.slot_of.popitem(last=False)  # evict LRU
            block = jnp.asarray(self._block_for(np.asarray(blocks[key])))
            self.cache = self._update(self.cache, slot, block)
            self.slot_of[key] = slot

    def gather(
        self, keys: Sequence[Key], idx: np.ndarray, mask: np.ndarray,
        sharded: bool = True,
    ):
        """[B] image keys + [B, N] row indices + [B, N] mask -> [B, N, D]
        device descriptors (storage dtype; masked rows exactly zero)."""
        slots = np.asarray([self.slot_of[k] for k in keys], np.int32)
        fn = self._gather if sharded else self._gather_plain
        return fn(self.cache, slots, np.asarray(idx), np.asarray(mask))

    def _assemble_global(self, local, mesh):
        """Multi-host: turn this host's gathered [B_local, N, D] (device
        array on local devices) into the GLOBAL batch-sharded jax.Array.
        Every host calls this with its own slice; the global batch is the
        concatenation in data-axis device order (the same contract
        make_array_from_process_local_data applies to the light fields)."""
        import jax
        from jax.sharding import NamedSharding

        from openglue_tpu.parallel.mesh import batch_pspec

        sharding = NamedSharding(mesh, batch_pspec(mesh))
        b_local = local.shape[0]
        gshape = (b_local * jax.process_count(), *local.shape[1:])
        imap = sharding.addressable_devices_indices_map(gshape)
        # this host's rows occupy one contiguous global range; derive its
        # start from the smallest addressable row index
        starts = [idx[0].start or 0 for idx in imap.values()]
        host_start = min(starts)
        shards = [
            jax.device_put(local[(idx[0].start or 0) - host_start:(idx[0].stop or gshape[0]) - host_start], dev)
            for dev, idx in imap.items()
        ]
        return jax.make_array_from_single_device_arrays(gshape, sharding, shards)

    def shard_fn(self, mesh, cast_light_bf16: bool = False):
        """Returns a shard_fn for the train/eval loop: consumes the
        DeviceDescBatch host object (data/collate.py), installs missing
        blocks, gathers device descriptors, and places the light fields on
        the mesh — a drop-in for parallel.mesh.shard_batch in the
        device-cache mode of cli/train_cached.

        Multi-host: each host runs an independent cache over ITS slice's
        images (the host-invariant grouped loader already hands every host
        only its local_batch_slice); the local gather output is assembled
        into the global batch-sharded array with
        make_array_from_single_device_arrays, mirroring what
        make_array_from_process_local_data does for the light numpy fields."""
        import jax

        from openglue_tpu.parallel.mesh import DATA_AXIS, shard_batch

        multi_host = jax.process_count() > 1
        axis = dict(zip(mesh.axis_names, mesh.devices.shape)).get(DATA_AXIS, 1)

        def fn(item):
            import jax.numpy as jnp

            from openglue_tpu.data.collate import DeviceDescBatch

            if not isinstance(item, DeviceDescBatch):
                return shard_batch(item, mesh)
            self.ensure([*item.keys0, *item.keys1], item.blocks)
            b = item.batch
            if multi_host:
                # local (unsharded) gather on this host, then global assembly
                d0 = self._assemble_global(
                    self.gather(item.keys0, item.index0, b.side0.mask, sharded=False),
                    mesh,
                )
                d1 = self._assemble_global(
                    self.gather(item.keys1, item.index1, b.side1.mask, sharded=False),
                    mesh,
                )
                light = b.replace(
                    side0=b.side0.replace(descriptors=np.zeros((0,), np.float32)),
                    side1=b.side1.replace(descriptors=np.zeros((0,), np.float32)),
                )
                placed = shard_batch(light, mesh)
                return placed.replace(
                    side0=placed.side0.replace(descriptors=d0),
                    side1=placed.side1.replace(descriptors=d1),
                )
            # validation tail batches smaller than the data axis cannot be
            # sharded over it — place them unsharded (the plain-jit eval
            # step accepts either; same fallback as loop._shard_eval_batch)
            divisible = b.side0.mask.shape[0] % axis == 0
            d0 = self.gather(item.keys0, item.index0, b.side0.mask, sharded=divisible)
            d1 = self.gather(item.keys1, item.index1, b.side1.mask, sharded=divisible)
            light = b.replace(
                side0=b.side0.replace(descriptors=np.zeros((0,), np.float32)),
                side1=b.side1.replace(descriptors=np.zeros((0,), np.float32)),
            )
            if divisible:
                placed = shard_batch(light, mesh)
            else:
                placed = jax.tree_util.tree_map(jnp.asarray, light)
            return placed.replace(
                side0=placed.side0.replace(descriptors=d0),
                side1=placed.side1.replace(descriptors=d1),
            )

        return fn
