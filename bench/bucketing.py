"""End-to-end bucketed-padding benchmark — quantifies the O(N²) savings of
``data.buckets`` on a realistic mixed-size keypoint distribution.

The reference pads every batch to the fixed ``max_keypoints`` cap
(reference data/megadepth_datamodule.py:104-168 pad-to-max collate); with
bucketing (data/bucketing.py, wired into cli/train_cached.py and
cli/inference.py) each batch is padded only to the smallest bucket that fits
its largest real keypoint count, so sparse batches run on smaller graphs.

Methodology: the train step is shape-static, so its cost depends only on the
padded size. We (1) draw per-image detector counts from a MegaDepth-like
mixture (a saturated mode at the cap — SuperPoint on texture-rich scenes —
plus a lognormal body for sparse scenes), (2) form batches under each policy
(fixed padding / per-batch bucketing / bucket-grouped batching), (3) measure
the jitted train step ONCE per distinct padded shape with
profiling.device_timeit, and (4) report distribution-weighted effective
throughput per policy. One process, interleaved shapes — the within-window
comparison standard (CLAUDE.md perf-drift note).

Usage: python -m bench.bucketing [--batch 12] [--buckets 256,512,768,1024]
       [--saturated 0.35] [--num-batches 400] [--pallas] [--chain-bf16]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from openglue_tpu.data.bucketing import batch_bucket
from openglue_tpu.data.synthetic import SyntheticHomographyPairs
from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
from openglue_tpu.profiling import device_timeit
from openglue_tpu.train import LossConfig, create_train_state, make_train_step
from openglue_tpu.train.step import superglue_inputs


def draw_counts(rng: np.random.Generator, num_images: int, cap: int,
                saturated_frac: float) -> np.ndarray:
    """MegaDepth-like detector-count mixture: a point mass at the cap plus a
    lognormal body (median ~420, long right tail) clipped to [64, cap]."""
    sat = rng.random(num_images) < saturated_frac
    body = np.exp(rng.normal(np.log(420.0), 0.55, num_images))
    counts = np.where(sat, cap, np.clip(body, 64, cap)).astype(np.int64)
    return counts


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=12)
    parser.add_argument("--buckets", default="256,512,768,1024")
    parser.add_argument("--saturated", type=float, default=0.35,
                        help="fraction of images that saturate the keypoint cap")
    parser.add_argument("--num-batches", type=int, default=400)
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("--pallas", action="store_true")
    parser.add_argument("--chain-bf16", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    buckets = tuple(int(b) for b in args.buckets.split(","))
    cap = max(buckets)
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    cfg = SuperGlueConfig(
        descriptor_dim=256, pe_hidden_layers_sizes=(32, 64, 128), num_stages=9,
        num_heads=4, otp_num_iters=20, residual=True, dtype=dtype,
        chain_dtype=jnp.bfloat16 if args.chain_bf16 else None,
        use_pallas=args.pallas,
    )
    model = SuperGlue(cfg)
    step = make_train_step(LossConfig(positive_threshold=2.0, negative_threshold=7.0))

    # the empirical bucket distribution under BOTH batching policies:
    #  * per-batch bucketing (iid batch formation): the batch pads to its
    #    largest member's bucket — at flagship batch sizes one saturated
    #    image drags the batch to the cap (P[any of 2B saturates] ~ 1)
    #  * bucket-GROUPED batching (data/bucketing.py BucketGroupedBatches,
    #    data.bucket_grouping): samples regroup into uniform-bucket batches,
    #    so the batch distribution follows the per-PAIR distribution
    rng = np.random.default_rng(args.seed)
    perbatch_buckets = []
    pair_buckets = []
    for _ in range(args.num_batches):
        counts = draw_counts(rng, 2 * args.batch, cap, args.saturated)
        perbatch_buckets.append(batch_bucket(list(counts), buckets))
        pair_counts = counts.reshape(args.batch, 2).max(axis=1)
        pair_buckets.extend(
            batch_bucket([int(c)], buckets) for c in pair_counts
        )
    # grouped: full uniform batches per bucket; the O(per-bucket) remainder
    # pairs are charged at the cap (tail-merge worst case)
    grouped_batches = []
    leftover = 0
    for b in buckets:
        k = sum(1 for x in pair_buckets if x == b)
        grouped_batches.extend([int(b)] * (k // args.batch))
        leftover += k % args.batch
    grouped_batches.extend([cap] * -(-leftover // args.batch))
    batch_buckets = grouped_batches[: args.num_batches]
    hist = {int(b): int(sum(1 for x in batch_buckets if x == b)) for b in buckets}
    hist_perbatch = {
        int(b): int(sum(1 for x in perbatch_buckets if x == b)) for b in buckets
    }

    # one measured step time per distinct padded shape
    ms_per_shape = {}
    for n in sorted(set(batch_buckets) | {cap}, reverse=True):
        gen = SyntheticHomographyPairs(num_keypoints=int(n), descriptor_dim=256)
        batch = gen.sample(jax.random.key(1), args.batch)
        init = jax.jit(
            lambda rng_, b: model.init(rng_, **superglue_inputs(b, train=True))
        )
        variables = init(jax.random.key(2), batch)
        jax.block_until_ready(variables)
        state = create_train_state(model.apply, variables, learning_rate=1e-4)

        def run(b, _state=state):
            new_state, metrics = step(_state, b)
            anchor = metrics["total_loss"] + metrics["grad_norm"]
            anchor += sum(
                jnp.sum(l.astype(jnp.float32)) / l.size
                for l in jax.tree_util.tree_leaves(new_state.params)
            )
            return anchor

        t = device_timeit(run, batch)
        ms_per_shape[int(n)] = round(t * 1e3, 3)
        print(f"N={n}: {t * 1e3:.2f} ms/step", flush=True)

    pairs = len(batch_buckets) * args.batch
    fixed_s = len(batch_buckets) * ms_per_shape[cap] / 1e3
    grouped_s = sum(ms_per_shape[b] for b in batch_buckets) / 1e3
    perbatch_s = sum(ms_per_shape[b] for b in perbatch_buckets[: len(batch_buckets)]) / 1e3
    out = {
        "metric": "bucket_grouped_vs_fixed_train_speedup",
        "value": round(fixed_s / grouped_s, 3),
        "unit": "x",
        "detail": {
            "fixed_pairs_per_s": round(pairs / fixed_s, 2),
            "grouped_pairs_per_s": round(pairs / grouped_s, 2),
            "perbatch_bucketing_pairs_per_s": round(pairs / perbatch_s, 2),
            "ms_per_shape": ms_per_shape,
            "grouped_bucket_histogram": hist,
            "perbatch_bucket_histogram": hist_perbatch,
            "saturated_frac": args.saturated,
            "batch": args.batch,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
