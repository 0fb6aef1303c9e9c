"""B=1 latency decomposition (VERDICT round-4 #2 follow-up).

Splits the single-pair serving latency into per-GNN-layer, per-Sinkhorn-iter,
and fixed (PE + head + decode + dispatch) components by fitting
t(L, K) = a + b*L + c*K over a small (stages x otp_iters) grid — the B=1
analog of bench/profile_inference.py. Identifies whether the B=1 gap vs
batched throughput (0.80 ms/pair at B=1 vs 0.76 ms/pair at B=16, N=1024)
is underutilized layer kernels, the unpaired B=1 Sinkhorn, or fixed
overhead.

Usage: python -m bench.latency_decompose [--kpts 1024]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from openglue_tpu.data.synthetic import SyntheticHomographyPairs
from openglue_tpu.models.matching import decode_matches_from_stats
from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
from openglue_tpu.profiling import device_timeit
from openglue_tpu.train.step import superglue_inputs


def build(kpts, stages, otp_iters, batch=1, use_pallas=True):
    cfg = SuperGlueConfig(
        descriptor_dim=256, pe_hidden_layers_sizes=(32, 64, 128),
        side_info_size=1, num_stages=stages, num_heads=4,
        otp_num_iters=otp_iters, residual=True,
        dtype=jnp.bfloat16, chain_dtype=jnp.bfloat16,
        use_pallas=use_pallas, decode_stats=True,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=kpts, descriptor_dim=256)
    batch_data = gen.sample(jax.random.key(0), batch)
    init = jax.jit(lambda rng, b: model.init(rng, **superglue_inputs(b, train=False)))
    variables = init(jax.random.key(1), batch_data)
    jax.block_until_ready(variables)

    def run(b):
        out = model.apply(variables, **superglue_inputs(b, train=False))
        return decode_matches_from_stats(
            out["decode_indices0"], out["decode_indices1"], out["decode_max0"],
            mask0=b.side0.mask, mask1=b.side1.mask,
        )["matches0"]

    return jax.jit(run), batch_data


def perturb(b, s):
    return b.replace(
        side0=b.side0.replace(
            descriptors=b.side0.descriptors * s, keypoints=b.side0.keypoints * s
        )
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=1)
    args = parser.parse_args()

    grid = [(9, 20), (9, 5), (5, 20), (5, 5), (1, 20), (1, 5)]
    rows = []
    for stages, iters in grid:
        fn, b = build(args.kpts, stages, iters, batch=args.batch)
        float(jnp.sum(fn(b)))
        t = device_timeit(lambda x, f=fn: f(x), b, perturb=perturb) * 1e3
        rows.append((stages, iters, t))
        print(f"stages={stages} otp={iters}: {t / args.batch:.3f} ms/pair", flush=True)

    # least squares t = a + b_L * (2*stages) + c_K * iters
    A = np.array([[1.0, 2 * s, k] for s, k, _ in rows])
    y = np.array([t for _, _, t in rows])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    a, b_l, c_k = coef / args.batch
    print(
        f"fit (per pair): fixed {a:.3f} ms + {b_l * 1e3:.1f} us/GNN-layer "
        f"(one self or cross layer, both images) + {c_k * 1e3:.1f} us/sinkhorn-iter  "
        f"(flagship 9 stages: layers {18 * b_l:.3f} ms, sinkhorn {20 * c_k:.3f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    main()
