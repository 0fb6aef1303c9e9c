"""B=1 single-pair serving latency (VERDICT round-3 #6).

The reference's inference entry is a one-pair CLI
(/root/reference/inference.py:238-264); the number an OpenGlueMatcher user
feels is ms per single pair, not batched throughput. Measures the full
inference jit (PE -> 9-stage GNN -> head -> Sinkhorn -> fused decode) at
batch 1 for N in {512, 1024, 2048} x {bf16, int8_static}, device-side
(device_timeit: host dispatch excluded — on the axon tunnel the fixed ~40 ms
dispatch is an environment artifact, on a real TPU host it is sub-ms).

All variants trace and run interleaved in one process (one window).

Usage: python -m bench.latency [--kpts 512 1024 2048]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.data.synthetic import SyntheticHomographyPairs
from openglue_tpu.models.matching import decode_matches_from_stats
from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
from openglue_tpu.profiling import device_timeit
from openglue_tpu.train.step import superglue_inputs


def build(kpts: int, quantize, use_pallas: bool = True):
    cfg = SuperGlueConfig(
        descriptor_dim=256, pe_hidden_layers_sizes=(32, 64, 128),
        side_info_size=1, num_stages=9, num_heads=4, otp_num_iters=20,
        residual=True, dtype=jnp.bfloat16, chain_dtype=jnp.bfloat16,
        use_pallas=use_pallas, quantize=quantize, decode_stats=True,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=kpts, descriptor_dim=256)
    batch = gen.sample(jax.random.key(0), 1)
    init = jax.jit(lambda rng, b: model.init(rng, **superglue_inputs(b, train=False)))
    variables = init(jax.random.key(1), batch)
    jax.block_until_ready(variables)
    if quantize and quantize.startswith("int8_static"):
        _, calib = jax.jit(
            lambda v, b: model.apply(
                v, **superglue_inputs(b, train=False), mutable=["int8_calib"]
            )
        )(variables, batch)
        variables = {**variables, **dict(calib)}
        jax.block_until_ready(variables)

    def run(b):
        out = model.apply(variables, **superglue_inputs(b, train=False))
        return decode_matches_from_stats(
            out["decode_indices0"], out["decode_indices1"], out["decode_max0"],
            mask0=b.side0.mask, mask1=b.side1.mask,
        )["matches0"]

    return jax.jit(run), batch


def perturb(b, s):
    return b.replace(
        side0=b.side0.replace(
            descriptors=b.side0.descriptors * s,
            keypoints=b.side0.keypoints * s,
        )
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kpts", type=int, nargs="+", default=[512, 1024, 2048])
    parser.add_argument("--skip-int8", action="store_true")
    parser.add_argument("--xla", action="store_true", help="also time the XLA path")
    args = parser.parse_args()

    cases = []
    for n in args.kpts:
        cases.append((n, None, True))
        if not args.skip_int8:
            cases.append((n, "int8_static", True))
            cases.append((n, "int8_static_attn", True))
        if args.xla:
            cases.append((n, None, False))

    built = {}
    for n, q, pallas in cases:
        try:
            fn, batch = build(n, q, pallas)
            float(jnp.sum(fn(batch)))  # compile now
        except Exception as exc:  # one failing variant must not kill the matrix
            print(f"SKIP N={n} {q or 'bf16'}{'' if pallas else ' xla'}: {exc}", flush=True)
            continue
        built[(n, q, pallas)] = (fn, batch)

    results = {}
    for (n, q, pallas), (fn, batch) in built.items():
        t = device_timeit(lambda b, f=fn: f(b), batch, perturb=perturb)
        label = f"N={n} {q if q else 'bf16'}{'' if pallas else ' xla'}"
        results[label] = {
            "ms_per_pair": round(t * 1e3, 3),
            "pairs_per_s": round(1.0 / t, 1),
        }
        print(label, results[label], flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
