"""Measure the PyTorch reference matcher (ucuapps/OpenGlue) against this
framework on identical hardware (CPU — the only device both sides can use
here; the TPU numbers in bench.py stand separately).

Loads the reference's SuperGlue from /root/reference (read-only) at the
flagship config and times forward passes, then times the JAX matcher on the
same CPU. Records pairs/s for BASELINE.md.

Usage: python -m bench.torch_reference [--kpts 512] [--batch 4] [--stages 9]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REFERENCE_PATH = "/root/reference"


def bench_torch(batch, kpts, stages, iters=5):
    sys.path.insert(0, REFERENCE_PATH)
    import torch

    from models.superglue.superglue import SuperGlue as TorchSuperGlue

    torch.manual_seed(0)
    config = {
        "descriptor_dim": 256,
        "positional_encoding": {"output_size": 256, "hidden_layers_sizes": [32, 64, 128],
                                 "side_info_size": 1},
        "attention_gnn": {"embed_dim": 256, "num_stages": stages, "num_heads": 4,
                           "attention": "softmax", "use_offset": False},
        "dustbin_score_init": 1.0,
        "otp": {"num_iters": 20, "reg": 1.0},
        "residual": True,
    }
    model = TorchSuperGlue(config).eval()

    data = {
        "keypoints0": torch.rand(batch, kpts, 2) * 700,
        "keypoints1": torch.rand(batch, kpts, 2) * 700,
        "local_descriptors0": torch.nn.functional.normalize(
            torch.randn(batch, kpts, 256), dim=-1
        ),
        "local_descriptors1": torch.nn.functional.normalize(
            torch.randn(batch, kpts, 256), dim=-1
        ),
        "side_info0": torch.rand(batch, kpts, 1),
        "side_info1": torch.rand(batch, kpts, 1),
        "image0_size": (720, 960),
        "image1_size": (720, 960),
    }
    with torch.no_grad():
        model(data)  # warm
        start = time.perf_counter()
        for _ in range(iters):
            out = model(data)
        elapsed = time.perf_counter() - start
    return batch * iters / elapsed


def bench_jax_cpu(batch, kpts, stages, iters=5):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from openglue_tpu.data.synthetic import SyntheticHomographyPairs
    from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
    from openglue_tpu.train.step import superglue_inputs

    cfg = SuperGlueConfig(
        descriptor_dim=256, pe_hidden_layers_sizes=(32, 64, 128), num_stages=stages,
        num_heads=4, otp_num_iters=20, residual=True,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=kpts, descriptor_dim=256)
    batch_data = gen.sample(jax.random.key(0), batch)
    variables = model.init(jax.random.key(1), **superglue_inputs(batch_data))

    fn = jax.jit(lambda v, b: model.apply(v, **superglue_inputs(b))["scores"])
    jax.block_until_ready(fn(variables, batch_data))  # CPU: block works
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, batch_data)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    return batch * iters / elapsed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kpts", type=int, default=512)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--stages", type=int, default=9)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--skip-jax", action="store_true")
    args = parser.parse_args()

    torch_pps = bench_torch(args.batch, args.kpts, args.stages, args.iters)
    result = {
        "config": {"batch": args.batch, "kpts": args.kpts, "stages": args.stages},
        "torch_cpu_pairs_per_s": round(torch_pps, 2),
    }
    if not args.skip_jax:
        jax_pps = bench_jax_cpu(args.batch, args.kpts, args.stages, args.iters)
        result["jax_cpu_pairs_per_s"] = round(jax_pps, 2)
        result["jax_over_torch_cpu"] = round(jax_pps / torch_pps, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
