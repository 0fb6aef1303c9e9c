"""Kernel-dispatch sweep: XLA vs Pallas across keypoint-graph sizes.

Runs the headline inference measurement (bench.measure, decode included) at
N in {256, 512, 1024, 2048} on both paths in ONE process and prints a JSON
table. This is the evidence behind ops.pallas.use_pallas_for_shape — the
shape gate that makes ``use_pallas=True`` never a regression (XLA wins below
~512 keypoints, the kernels win above).

Optionally sweeps an attention variant (--attention linear covers the fused
linear-attention layer kernel at eval scale).

Usage: python -m bench.dispatch_sweep [--attention softmax] [--sizes 256,512,1024,2048]
"""

from __future__ import annotations

import argparse
import json

import importlib.util
import os

# the bench/ package shadows the repo-root bench.py; load the file directly
_spec = importlib.util.spec_from_file_location(
    "bench_headline",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench)
build_parser, measure = _bench.build_parser, _bench.measure

# batch per graph size: B=16 at the training size, B=4 at eval/IMC scale
# (matching the existing BASELINE.md entries), larger at small graphs to
# keep the device busy
BATCH_FOR = {256: 64, 512: 32, 1024: 16, 2048: 4}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--attention", default="softmax")
    parser.add_argument("--sizes", default="256,512,1024,2048")
    parser.add_argument("--paths", default="xla,pallas")
    parser.add_argument("--batch", type=int, default=None,
                        help="override the per-size default batch")
    args = parser.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    paths = args.paths.split(",")

    rows = []
    for kpts in sizes:
        row = {"kpts": kpts, "batch": args.batch or BATCH_FOR.get(kpts, 16)}
        for path in paths:
            margs = build_parser().parse_args(
                ["--kpts", str(kpts), "--batch", str(row["batch"]),
                 "--attention", args.attention]
            )
            margs.pallas = path == "pallas"
            res = measure(margs)
            row[f"{path}_pairs_per_s"] = res["value"]
            row[f"{path}_ms_per_batch"] = res["detail"]["ms_per_batch"]
            print(f"N={kpts} B={row['batch']} {path}: {res['value']} pairs/s", flush=True)
        if "xla_pairs_per_s" in row and "pallas_pairs_per_s" in row:
            row["pallas_speedup"] = round(
                row["pallas_pairs_per_s"] / row["xla_pairs_per_s"], 3
            )
        rows.append(row)
    print(json.dumps({"attention": args.attention, "rows": rows}))


if __name__ == "__main__":
    main()
