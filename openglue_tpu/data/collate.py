"""Fixed-size batching of cached-feature samples into PairBatch arrays
(reference MegaDepthPairsDataModuleFeatures.stack_keypoints_batch,
data/megadepth_datamodule.py:104-168).

Semantics preserved: oversized keypoint sets are subsampled randomly (train)
or by top score (val); undersized are zero-padded with depth=0 virtual
keypoints (auto-IGNOREd by GT generation); per-keypoint depth is gathered at
the integer keypoint pixel. TPU addition: an explicit validity mask rides
along so padding can also be excluded from attention/Sinkhorn/BatchNorm.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from openglue_tpu.core.types import KeypointSet, PairBatch, Transformation
from openglue_tpu.features.lafs import LAFConverter


def _select_keypoints(
    lafs: np.ndarray,
    scores: np.ndarray,
    descriptors: np.ndarray,
    depth_map: np.ndarray,
    target: int,
    random: bool,
    rng: np.random.Generator,
):
    """Returns fixed-size (lafs, scores, descriptors, kpt_depth, mask,
    sel_idx) — sel_idx [target] int32 maps each output row to its INPUT row
    (0 for padding rows; the mask disambiguates), so callers that keep
    descriptors elsewhere (the device descriptor cache) can replay the
    selection as a gather."""
    n = lafs.shape[0]
    d = descriptors.shape[1] if descriptors.ndim == 2 else 0
    out_lafs = np.zeros((target, 2, 3), np.float32)
    out_scores = np.zeros((target,), np.float32)
    out_desc = np.zeros((target, d), np.float32)
    out_depth = np.zeros((target,), np.float32)
    out_mask = np.zeros((target,), bool)
    sel_idx = np.zeros((target,), np.int32)

    if n > target:
        idx = rng.permutation(n)[:target] if random else np.argsort(-scores)[:target]
        lafs, scores, descriptors = lafs[idx], scores[idx], descriptors[idx]
        sel_idx[:target] = idx
        n = target
    else:
        sel_idx[:n] = np.arange(n, dtype=np.int32)
    out_lafs[:n] = lafs
    out_scores[:n] = scores
    out_desc[:n] = descriptors
    out_mask[:n] = True
    if n:
        ys = np.clip(lafs[:, 1, 2].astype(np.int64), 0, depth_map.shape[0] - 1)
        xs = np.clip(lafs[:, 0, 2].astype(np.int64), 0, depth_map.shape[1] - 1)
        out_depth[:n] = depth_map[ys, xs]
    return out_lafs, out_scores, out_desc, out_depth, out_mask, sel_idx


def stack_keypoints_batch(
    samples: Sequence[Dict],
    target_num_keypoints: int,
    random: bool = False,
    laf_converter: Optional[LAFConverter] = None,
    log_response: bool = False,
    rng: Optional[np.random.Generator] = None,
    buckets: Optional[Sequence[int]] = None,
    force_bucket: Optional[int] = None,
) -> PairBatch:
    """Collate cached-feature sample dicts into a PairBatch of numpy arrays.

    side_info is built host-side (response + LAF-converter features,
    reference models/features/utils.py:54-65) so the device step is pure
    matcher compute.

    ``buckets``: optional static bucket sizes (data/bucketing.py) — the batch
    is padded to the smallest bucket fitting its largest real keypoint count
    (capped by target_num_keypoints) instead of always target_num_keypoints.

    ``force_bucket``: pad to exactly this bucket (still capped by
    target_num_keypoints), ignoring the members' counts — required by
    host-invariant bucket grouping (BucketGroupedIndexBatches), where the pad
    is chosen globally from pre-crop counts and a host's local slice must not
    re-derive a smaller one.
    """
    rng = rng or np.random.default_rng()
    laf_converter = laf_converter or LAFConverter()
    batch = len(samples)

    if force_bucket is not None:
        target_num_keypoints = min(int(force_bucket), target_num_keypoints)
    elif buckets is not None:
        from openglue_tpu.data.bucketing import batch_bucket

        counts = [
            s[f"lafs{i}"].shape[0] for s in samples for i in (0, 1)
        ]
        target_num_keypoints = min(
            batch_bucket(counts, buckets), target_num_keypoints
        )

    sides = []
    depths = {0: [], 1: []}
    for image_id in (0, 1):
        all_lafs, all_scores, all_desc, all_mask = [], [], [], []
        for s in samples:
            lafs, scores, desc, depth, mask, _ = _select_keypoints(
                s[f"lafs{image_id}"],
                s[f"scores{image_id}"],
                s[f"descriptors{image_id}"],
                s["transformation"][f"depth{image_id}"],
                target_num_keypoints,
                random,
                rng,
            )
            all_lafs.append(lafs)
            all_scores.append(scores)
            all_desc.append(desc)
            all_mask.append(mask)
            depths[image_id].append(depth)
        lafs = np.stack(all_lafs)
        scores = np.stack(all_scores)
        desc = np.stack(all_desc)
        mask = np.stack(all_mask)

        kpts = lafs[:, :, :, 2]  # LAF translation column = keypoint xy
        resp = scores[..., None]
        if log_response:
            resp = np.log(resp + 0.1)
        # the LAF converter must run HOST-side (numpy in -> numpy out,
        # features/lafs.py _xp): a jnp round-trip here puts a device fetch
        # on every collate — ~40 ms each over the axon tunnel, and a single
        # dropped RPC hangs the data loader forever (round-4 trainer hang)
        side_info = np.concatenate(
            [resp, np.asarray(laf_converter(lafs))], axis=-1
        ).astype(np.float32)
        image_size = np.stack(
            [np.asarray(s[f"image{image_id}_size"], np.float32) for s in samples]
        )
        sides.append(
            KeypointSet(
                keypoints=kpts.astype(np.float32),
                descriptors=desc,
                side_info=side_info,
                mask=mask,
                image_size=image_size,
            )
        )

    tf = Transformation(
        kind="3d_reprojection",
        K0=np.stack([s["transformation"]["K0"] for s in samples]).astype(np.float32),
        K1=np.stack([s["transformation"]["K1"] for s in samples]).astype(np.float32),
        R=np.stack([s["transformation"]["R"] for s in samples]).astype(np.float32),
        T=np.stack([s["transformation"]["T"] for s in samples]).astype(np.float32),
        depth0=np.stack(depths[0]),
        depth1=np.stack(depths[1]),
    )
    return PairBatch(side0=sides[0], side1=sides[1], transformation=tf)


class DeviceDescBatch:
    """A collated batch whose descriptors live (or will live) in the
    device-resident descriptor cache (data/device_cache.py) instead of in
    the batch: ``batch`` carries placeholder [B, N, 0] descriptors, and
    ``keys/index/blocks`` let the cache shard-fn materialize the real
    [B, N, D] descriptor arrays with a device-side gather — per-batch H2D
    drops from the descriptor payload (~97% of bytes) to the [B, N] int32
    index arrays. Plain attribute class (not a pytree): it only exists on
    the host side of the shard_fn."""

    __slots__ = ("batch", "keys0", "keys1", "index0", "index1", "blocks")

    def __init__(self, batch, keys0, keys1, index0, index1, blocks):
        self.batch = batch
        self.keys0 = keys0
        self.keys1 = keys1
        self.index0 = index0
        self.index1 = index1
        self.blocks = blocks


def stack_keypoints_batch_device(
    samples: Sequence[Dict],
    target_num_keypoints: int,
    random: bool = False,
    laf_converter: Optional[LAFConverter] = None,
    log_response: bool = False,
    rng: Optional[np.random.Generator] = None,
    buckets: Optional[Sequence[int]] = None,
    force_bucket: Optional[int] = None,
) -> DeviceDescBatch:
    """stack_keypoints_batch for device-cached descriptors: samples come
    from MegaDepthPairsDatasetFeatures(device_descriptors=True) and carry
    the unfiltered per-image descriptor block + surviving-row indices; the
    collate replays its keypoint selection as index math and never touches
    descriptor bytes. Returns a DeviceDescBatch for
    DeviceDescriptorCache.shard_fn."""
    rng = rng or np.random.default_rng()
    laf_converter = laf_converter or LAFConverter()
    batch = len(samples)

    if force_bucket is not None:
        target_num_keypoints = min(int(force_bucket), target_num_keypoints)
    elif buckets is not None:
        from openglue_tpu.data.bucketing import batch_bucket

        counts = [s[f"lafs{i}"].shape[0] for s in samples for i in (0, 1)]
        target_num_keypoints = min(batch_bucket(counts, buckets), target_num_keypoints)

    sides, indices, keys = [], {0: [], 1: []}, {0: [], 1: []}
    depths = {0: [], 1: []}
    blocks = {}
    for image_id in (0, 1):
        all_lafs, all_scores, all_mask, all_idx = [], [], [], []
        for s in samples:
            lafs_in = s[f"lafs{image_id}"]
            lafs, scores, _, depth, mask, sel = _select_keypoints(
                lafs_in,
                s[f"scores{image_id}"],
                np.zeros((lafs_in.shape[0], 0), np.float32),
                s["transformation"][f"depth{image_id}"],
                target_num_keypoints,
                random,
                rng,
            )
            orig = s[f"desc_orig_idx{image_id}"]
            # padding rows (mask False) keep index 0 — the gather zeroes them
            row_idx = orig[sel] if orig.shape[0] else np.zeros_like(sel)
            key = s[f"desc_key{image_id}"]
            blocks[key] = s[f"descriptors{image_id}"]
            keys[image_id].append(key)
            all_lafs.append(lafs)
            all_scores.append(scores)
            all_mask.append(mask)
            all_idx.append(row_idx.astype(np.int32))
            depths[image_id].append(depth)
        lafs = np.stack(all_lafs)
        scores = np.stack(all_scores)
        mask = np.stack(all_mask)
        indices[image_id] = np.stack(all_idx)

        kpts = lafs[:, :, :, 2]
        resp = scores[..., None]
        if log_response:
            resp = np.log(resp + 0.1)
        side_info = np.concatenate(
            [resp, np.asarray(laf_converter(lafs))], axis=-1
        ).astype(np.float32)
        image_size = np.stack(
            [np.asarray(s[f"image{image_id}_size"], np.float32) for s in samples]
        )
        sides.append(
            KeypointSet(
                keypoints=kpts.astype(np.float32),
                descriptors=np.zeros((batch, target_num_keypoints, 0), np.float32),
                side_info=side_info,
                mask=mask,
                image_size=image_size,
            )
        )

    tf = Transformation(
        kind="3d_reprojection",
        K0=np.stack([s["transformation"]["K0"] for s in samples]).astype(np.float32),
        K1=np.stack([s["transformation"]["K1"] for s in samples]).astype(np.float32),
        R=np.stack([s["transformation"]["R"] for s in samples]).astype(np.float32),
        T=np.stack([s["transformation"]["T"] for s in samples]).astype(np.float32),
        depth0=np.stack(depths[0]),
        depth1=np.stack(depths[1]),
    )
    return DeviceDescBatch(
        batch=PairBatch(side0=sides[0], side1=sides[1], transformation=tf),
        keys0=keys[0], keys1=keys[1],
        index0=indices[0], index1=indices[1],
        blocks=blocks,
    )


def cast_for_transfer(batch: PairBatch, dtype=None) -> PairBatch:
    """Cast the transfer-dominant arrays (descriptors + side_info) to bf16
    for the host->device copy. At flagship shapes descriptors are ~97% of
    the batch bytes (25.2 of 26 MB at B=12 N=1024 D=256), and a bf16-compute
    model (superglue.dtype: bfloat16) casts them to bf16 on arrival anyway —
    so when the H2D link is the bottleneck this halves the batch wall time
    for free (measured: the axon tunnel moves ~85 MB/s regardless of RPC
    count or packing — bench/trainer_feed.py round-5 decomposition; on a
    real PCIe host it halves DMA traffic instead). Geometry (keypoints,
    depth, K/R/T) stays f32 — GT generation is f32-pinned."""
    if dtype is None:
        import ml_dtypes

        dtype = ml_dtypes.bfloat16

    def cast_side(s: KeypointSet) -> KeypointSet:
        return KeypointSet(
            keypoints=s.keypoints,
            descriptors=np.asarray(s.descriptors).astype(dtype),
            side_info=np.asarray(s.side_info).astype(dtype),
            mask=s.mask,
            image_size=s.image_size,
        )

    return PairBatch(
        side0=cast_side(batch.side0),
        side1=cast_side(batch.side1),
        transformation=batch.transformation,
    )


def resize_keypoint_axis(batch: PairBatch, n: int) -> PairBatch:
    """Pad (zeros + False mask) or truncate every per-keypoint array of a
    PairBatch to ``n`` keypoints — dummy-shape construction for the trainer's
    up-front per-bucket compile warmup (train/loop.py precompile_buckets).
    Derived from a REAL batch so the warmup step sees benign values (valid
    masks, finite depths). Per-keypoint depth [B, N] resizes with the
    keypoint axis; dense depth maps [B, H, W] pass through untouched.
    DeviceDescBatch resizes its inner batch and [B, N] index arrays."""
    if isinstance(batch, DeviceDescBatch):
        def fix_idx(x):
            x = np.asarray(x)
            if x.shape[1] >= n:
                return x[:, :n]
            return np.pad(x, [(0, 0), (0, n - x.shape[1])])

        return DeviceDescBatch(
            batch=resize_keypoint_axis(batch.batch, n),
            keys0=batch.keys0, keys1=batch.keys1,
            index0=fix_idx(batch.index0), index1=fix_idx(batch.index1),
            blocks=batch.blocks,
        )

    def fix(x):
        x = np.asarray(x)
        cur = x.shape[1]
        if cur == n:
            return x
        if cur > n:
            return x[:, :n]
        pad = [(0, 0), (0, n - cur)] + [(0, 0)] * (x.ndim - 2)
        return np.pad(x, pad)

    def fix_side(s: KeypointSet) -> KeypointSet:
        return KeypointSet(
            keypoints=fix(s.keypoints),
            descriptors=fix(s.descriptors),
            side_info=fix(s.side_info),
            mask=fix(s.mask),
            image_size=np.asarray(s.image_size),
        )

    tf = batch.transformation
    if tf is not None:
        fix_depth = lambda d: (
            fix(d) if d is not None and np.ndim(d) == 2 else d
        )
        tf = Transformation(
            kind=tf.kind,
            H=tf.H,
            K0=tf.K0, K1=tf.K1, R=tf.R, T=tf.T,
            depth0=fix_depth(tf.depth0),
            depth1=fix_depth(tf.depth1),
        )
    return PairBatch(
        side0=fix_side(batch.side0), side1=fix_side(batch.side1), transformation=tf
    )
