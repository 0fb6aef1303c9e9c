"""Bucketed padding for variable-size keypoint sets.

Fixed-size padding (the default, reference collate semantics) wastes compute
when most images detect far fewer keypoints than the cap. Bucketing keeps
shapes static per bucket: each batch is padded to the smallest bucket that
fits its largest real keypoint count, so XLA compiles once per bucket (a
handful of programs) and sparse batches run on smaller graphs.

Use by passing ``buckets=(256, 512, 1024)`` to stack_keypoints_batch — the
returned PairBatch's keypoint dimension is then data-dependent across batches
but static within each jitted call.
"""

from __future__ import annotations

from typing import Sequence


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
