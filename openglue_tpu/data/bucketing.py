"""Bucketed padding for variable-size keypoint sets.

Fixed-size padding (the default, reference collate semantics —
reference data/megadepth_datamodule.py:104-168 pads every batch to the cap)
wastes compute when most images detect far fewer keypoints than the cap.
Bucketing keeps shapes static per bucket: each batch is padded to the
smallest bucket that fits its largest real keypoint count, so XLA compiles
once per bucket (a handful of programs) and sparse batches run on smaller
graphs.

Two levels:

* **Per-batch bucketing** — pass ``buckets=(256, 512, 1024)`` to
  stack_keypoints_batch: each already-formed batch is padded to the smallest
  bucket that fits its largest member. Cheap, but at flagship batch sizes a
  single saturated image drags the whole batch to the cap (measured a wash
  at B=12 on iid mixed sizes — bench/bucketing.py).
* **Bucket-GROUPED batching** (``BucketGroupedBatches``) — regroup loaded
  samples by bucket BEFORE forming batches, so every batch is uniformly
  small-or-large. This is what realizes the O(N²) savings at large batch;
  the trade is batch-order shuffling within a bounded buffer (same trade
  torchtext/fairseq-style bucket batching makes).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence


def choose_bucket(count: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= count; the largest bucket if none fit (the set is
    then truncated by the usual top-score/random selection)."""
    for b in sorted(buckets):
        if count <= b:
            return b
    return max(buckets)


def batch_bucket(counts: Sequence[int], buckets: Sequence[int]) -> int:
    """Bucket for a whole batch: fit the largest member."""
    return choose_bucket(max(counts) if len(counts) else min(buckets), buckets)


def pair_keypoint_count(sample: Dict) -> int:
    """Bucket key for a cached-feature pair sample: the larger side's
    detector count (both sides of a pair share one padded keypoint axis)."""
    return max(sample["lafs0"].shape[0], sample["lafs1"].shape[0])


def iter_bucket_groups(
    items: Iterable,
    key_fn: Callable[[object], int],
    batch_size: int,
    buckets: Sequence[int],
    drop_last: bool = True,
    num_batches: Optional[int] = None,
) -> Iterator[tuple]:
    """Core grouping loop shared by sample-level and index-level grouping:
    accumulate items in per-bucket buffers, yield ``(bucket, items)`` when a
    buffer fills; at exhaustion merge leftovers largest-bucket-first (mixed
    tail batches carry the bucket of their largest member). Deterministic
    given (items, key_fn) — the property host-invariant grouping relies on.

    Buffered items are bounded by ``len(buckets) * (batch_size - 1)``."""
    buckets = tuple(sorted(buckets))
    buffers: Dict[int, List] = {b: [] for b in buckets}
    emitted = 0

    def done() -> bool:
        return num_batches is not None and emitted >= num_batches

    for item in items:
        if done():
            return
        b = choose_bucket(key_fn(item), buckets)
        buf = buffers[b]
        buf.append(item)
        if len(buf) == batch_size:
            yield b, buf
            emitted += 1
            buffers[b] = []
    # tail: merge leftovers largest-first so mixed batches pad upward only as
    # far as their largest member requires
    leftovers: List[tuple] = []
    for b in reversed(buckets):
        leftovers.extend((b, item) for item in buffers[b])
    while len(leftovers) >= batch_size and not done():
        chunk = leftovers[:batch_size]
        yield max(b for b, _ in chunk), [item for _, item in chunk]
        emitted += 1
        leftovers = leftovers[batch_size:]
    if leftovers and not drop_last and not done():
        yield max(b for b, _ in leftovers), [item for _, item in leftovers]


class BucketGroupedBatches:
    """Regroup an iterable of SAMPLES into same-bucket batches.

    Samples accumulate in per-bucket buffers; a buffer that reaches
    ``batch_size`` is collated (padded to exactly its bucket via the
    ``buckets`` argument of stack_keypoints_batch) and yielded. At
    exhaustion, leftovers are merged largest-bucket-first into final batches
    (padded to the largest member's bucket); a trailing partial batch is
    dropped when ``drop_last``.

    Buffered samples are bounded by ``len(buckets) * (batch_size - 1)``.
    Yields ``collate_fn(samples)`` — pass a collate already carrying the
    bucket list (e.g. functools.partial(stack_keypoints_batch, buckets=...)).
    """

    def __init__(
        self,
        samples: Iterable[Dict],
        batch_size: int,
        buckets: Sequence[int],
        collate_fn: Callable[[List[Dict]], object],
        bucket_key: Callable[[Dict], int] = pair_keypoint_count,
        drop_last: bool = True,
        num_batches: Optional[int] = None,
    ):
        self.samples = samples
        self.batch_size = batch_size
        self.buckets = tuple(sorted(buckets))
        self.collate_fn = collate_fn
        self.bucket_key = bucket_key
        self.drop_last = drop_last
        self.num_batches = num_batches

    def __iter__(self) -> Iterator:
        for _bucket, samples in iter_bucket_groups(
            self.samples,
            self.bucket_key,
            self.batch_size,
            self.buckets,
            drop_last=self.drop_last,
            num_batches=self.num_batches,
        ):
            yield self.collate_fn(samples)


class BucketGroupedIndexBatches:
    """Host-invariant bucket grouping computed on INDICES + cheap counts
    (VERDICT round-4 #5: synchronize bucket-grouped batching across hosts).

    ``BucketGroupedBatches`` groups LOADED samples, so each host's regrouper
    picks batch shapes from its own local stream — divergent bucket choices
    deadlock the multi-host DP collectives (each step's
    make_array_from_process_local_data needs identical local shapes on every
    process). Here grouping runs on a GLOBAL index stream with a cheap
    ``count_fn`` (e.g. MegaDepthPairsDatasetFeatures.keypoint_count — h5
    dataset-shape metadata, no data reads), so every host computes the
    identical ``(bucket, global_indices)`` schedule by construction; each
    host then loads and collates only ``indices[start:stop]`` of its slice.

    Yields ``(local_indices, {"force_bucket": bucket})`` — the batch-sampler
    contract of data/loader.py DataLoader, which runs the collate in its
    worker pool. ``force_bucket`` is required because post-crop counts on a
    host's slice can be smaller than the group's bucket; deriving the pad
    from local members would desynchronize shapes again.

    Single host is the ``local_slice=(0, batch_size)`` special case — the
    same schedule, whole batches. The mild difference vs sample-level
    grouping is the PRE-crop bucket key: a crop that drops many keypoints
    can leave a batch one bucket larger than strictly needed (padding
    efficiency, never correctness).
    """

    def __init__(
        self,
        indices: Iterable[int],
        count_fn: Callable[[int], int],
        batch_size: int,
        buckets: Sequence[int],
        local_slice: Optional[tuple] = None,
        drop_last: bool = True,
        num_batches: Optional[int] = None,
    ):
        self.indices = indices
        self.count_fn = count_fn
        self.batch_size = batch_size
        self.buckets = tuple(sorted(buckets))
        self.local_slice = local_slice
        self.drop_last = drop_last
        self.num_batches = num_batches

    def __iter__(self) -> Iterator[tuple]:
        for bucket, idxs in iter_bucket_groups(
            self.indices,
            self.count_fn,
            self.batch_size,
            self.buckets,
            drop_last=self.drop_last,
            num_batches=self.num_batches,
        ):
            if self.local_slice is None:
                yield idxs, {"force_bucket": bucket}
                continue
            start, stop = self.local_slice
            if len(idxs) < self.batch_size:
                # partial tail (drop_last=False): slicing it would give
                # UNEVEN local batch sizes across hosts — every host computes
                # the same len(idxs), so every host drops it identically.
                # (Sliced mode is for the DP train step, whose collectives
                # need matching shapes; per-host eval should group its own
                # local stream without a slice instead.)
                continue
            yield idxs[start:stop], {"force_bucket": bucket}
