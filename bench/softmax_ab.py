"""Interleaved A/B/A of the bf16 softmax-epilogue variant (VERDICT r4 #4).

The fused layer's f32 VPU softmax epilogue is ~half the attention time at
N=2048; OPENGLUE_BF16_SOFTMAX switches the exp + p-cast to bf16 operands
(gnn_layer_kernel._layer_kernel). Both variants build in ONE process (the
env var is read at trace time; each build makes fresh function objects, the
round-4 tracing-cache trap does not apply) and measure interleaved in one
window.

Usage: python -m bench.softmax_ab [--kpts 2048] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from bench.quant_ab import build, perturb
from openglue_tpu.profiling import device_timeit


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kpts", type=int, default=2048)
    parser.add_argument("--batch", type=int, default=4)
    args = parser.parse_args()

    built = {}
    for name, env in (("f32_softmax", None), ("bf16_softmax", "1")):
        if env is None:
            os.environ.pop("OPENGLUE_BF16_SOFTMAX", None)
        else:
            os.environ["OPENGLUE_BF16_SOFTMAX"] = env
        fn, b = build(args.kpts, args.batch, None)
        out = fn(b)
        jax.block_until_ready(out)
        built[name] = (fn, b, np.asarray(out))
        print(f"compiled {name}", flush=True)
    os.environ.pop("OPENGLUE_BF16_SOFTMAX", None)

    # decode agreement between the two numeric variants (quality guard)
    m_a, m_b = built["f32_softmax"][2], built["bf16_softmax"][2]
    agreement = float((m_a == m_b).mean())
    print(f"decode agreement f32-vs-bf16 softmax: {agreement:.4f}", flush=True)

    order = ["f32_softmax", "bf16_softmax", "f32_softmax"]
    results = {}
    for i, name in enumerate(order):
        fn, b, _ = built[name]
        t = device_timeit(fn, b, perturb=perturb)
        key = name if i < 2 else f"{name}/A2"
        results[key] = {
            "pairs_per_s": round(args.batch / t, 1),
            "ms_per_batch": round(t * 1e3, 3),
        }
        print(key, results[key], flush=True)
    print(json.dumps({
        "kpts": args.kpts, "batch": args.batch,
        "decode_agreement": agreement, "paths": results,
    }))


if __name__ == "__main__":
    main()
