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
        buffers: Dict[int, List[Dict]] = {b: [] for b in self.buckets}
        emitted = 0

        def done() -> bool:
            return self.num_batches is not None and emitted >= self.num_batches

        for sample in self.samples:
            if done():
                return
            b = choose_bucket(self.bucket_key(sample), self.buckets)
            buf = buffers[b]
            buf.append(sample)
            if len(buf) == self.batch_size:
                yield self.collate_fn(buf)
                emitted += 1
                buffers[b] = []
        # tail: merge leftovers largest-first so mixed batches pad upward
        # only as far as their largest member requires
        leftovers: List[Dict] = []
        for b in reversed(self.buckets):
            leftovers.extend(buffers[b])
        while len(leftovers) >= self.batch_size and not done():
            yield self.collate_fn(leftovers[: self.batch_size])
            emitted += 1
            leftovers = leftovers[self.batch_size:]
        if leftovers and not self.drop_last and not done():
            yield self.collate_fn(leftovers)
