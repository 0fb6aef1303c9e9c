"""Headline benchmark: image pairs matched per second per chip.

Runs the flagship matcher (reference scale: D=256, 9 GNN stages, 4 heads,
Sinkhorn 20 iterations, 1024 keypoints/image — reference
config/config.yaml:42-55, config/config_cached.yaml:8) in inference mode and
prints ONE JSON line.

Default behavior: the parent process is a jax-free orchestrator (it never
touches the TPU, so each measurement subprocess gets exclusive device access
— on normal TPU hosts a parent holding the chip would starve the child). It
measures the XLA path first (reliable), then attempts the faster Pallas path
within a time budget (the axon tunnel's one-time remote Mosaic compile costs
minutes; normal hosts compile in seconds), and prints the better result. A
SIGTERM/SIGINT after the first measurement emits the best result so far, so a
harness timeout can never lose the number. ``--pallas`` / ``--xla-only``
measure a single path in-process.

Methodology: the per-call dispatch to the TPU behind the axon tunnel costs
~40 ms and block_until_ready does not actually synchronize, so timing runs the
matcher in a device-side fori_loop inside one jit with per-iteration input
perturbation, fetches a scalar to force sync, and differences two iteration
counts (openglue_tpu.profiling.device_timeit).

``vs_baseline`` is the ratio to the measured PyTorch reference on this host's
CPU (1.7 pairs/s at the same N=1024 flagship config, bench/torch_reference.py;
the reference repo publishes no numbers of its own — BASELINE.md).

Usage: python bench.py [--batch 16] [--kpts 1024] [--f32]
                       [--pallas | --xla-only] [--pallas-budget-s 1500]
"""

from __future__ import annotations

import argparse
import json
import signal
import subprocess
import sys

TORCH_CPU_BASELINE_PAIRS_PER_S = 1.7  # bench/torch_reference.py; BASELINE.md


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--iters-low", type=int, default=4)
    parser.add_argument("--iters-high", type=int, default=16)
    parser.add_argument("--f32", action="store_true", help="float32 compute (default bf16)")
    parser.add_argument(
        "--chain-f32", action="store_true",
        help="keep the GNN residual chain in f32 (default: bf16 when compute is bf16)",
    )
    parser.add_argument("--pallas", action="store_true", help="measure ONLY the Pallas path")
    parser.add_argument(
        "--int8", action="store_true",
        help="quantized serving path: eval GNN layers on the int8 MXU "
        "(implies --pallas; decode-agreement-validated, see BASELINE.md)",
    )
    parser.add_argument("--xla-only", action="store_true", help="measure ONLY the XLA path")
    parser.add_argument("--pallas-budget-s", type=int, default=1500)
    parser.add_argument(
        "--int8-static", action="store_true", dest="int8_static",
        help="int8 serving with OFFLINE-calibrated static activation scales "
        "(no in-kernel absmax reductions; calibrates on the bench batch)",
    )
    parser.add_argument(
        "--int8-static-attn", action="store_true", dest="int8_static_attn",
        help="int8_static + the attention contractions (qk^T, P.V) on the "
        "int8 MXU too — the narrow dh=64 dots dominate at eval scale and "
        "double their rate at int8 (decode-agreement-guarded)",
    )
    parser.add_argument("--attention", default="softmax")
    return parser


def measure(args) -> dict:
    """Measure one path in THIS process (touches the TPU)."""
    import jax
    import jax.numpy as jnp

    from openglue_tpu.data.synthetic import SyntheticHomographyPairs
    from openglue_tpu.models.matching import decode_matches_from_stats
    from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig
    from openglue_tpu.profiling import device_timeit
    from openglue_tpu.train.step import superglue_inputs

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    chain = None if (args.f32 or args.chain_f32) else jnp.bfloat16
    cfg = SuperGlueConfig(
        descriptor_dim=256,
        pe_hidden_layers_sizes=(32, 64, 128),
        side_info_size=1,
        num_stages=9,
        num_heads=4,
        attention=args.attention,
        otp_num_iters=20,
        residual=True,
        dtype=dtype,
        chain_dtype=chain,
        use_pallas=args.pallas,
        quantize=(
            "int8_static_attn" if getattr(args, "int8_static_attn", False)
            else "int8_static" if getattr(args, "int8_static", False)
            else "int8" if args.int8 else None
        ),
        decode_stats=True,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=args.kpts, descriptor_dim=256)
    batch = gen.sample(jax.random.key(0), args.batch)
    # jitted init: eager init dispatches per-op over the tunnel (minutes)
    init = jax.jit(lambda rng, b: model.init(rng, **superglue_inputs(b, train=False)))
    variables = init(jax.random.key(1), batch)
    jax.block_until_ready(variables)
    if getattr(args, "int8_static", False) or getattr(args, "int8_static_attn", False):
        # static-scale PTQ calibration: one mutable apply records per-layer
        # activation absmaxes; serving then runs with static scales
        _, calib = jax.jit(
            lambda v, b: model.apply(
                v, **superglue_inputs(b, train=False), mutable=["int8_calib"]
            )
        )(variables, batch)
        variables = {**variables, **dict(calib)}
        jax.block_until_ready(variables)

    def run(b):
        out = model.apply(variables, **superglue_inputs(b, train=False))
        # stats-based decode: the full scores matrix is unused in this jit, so
        # XLA dead-code-eliminates its [B, N+1, M+1] materialization
        return decode_matches_from_stats(
            out["decode_indices0"], out["decode_indices1"], out["decode_max0"],
            mask0=b.side0.mask, mask1=b.side1.mask,
        )["matches0"]

    def perturb(b, s):
        # perturb keypoints too: otherwise the positional-encoding branch is
        # loop-invariant and XLA hoists it out of the timing loop
        return b.replace(
            side0=b.side0.replace(
                descriptors=b.side0.descriptors * s,
                keypoints=b.side0.keypoints * s,
            )
        )

    per_iter = device_timeit(
        run, batch, iters_low=args.iters_low, iters_high=args.iters_high,
        perturb=perturb,
    )
    pairs_per_sec = args.batch / per_iter
    vs_baseline = (
        round(pairs_per_sec / TORCH_CPU_BASELINE_PAIRS_PER_S, 2)
        if args.kpts == 1024
        else 1.0
    )
    return {
        "metric": "image_pairs_matched_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": vs_baseline,
        "detail": {
            "device": str(jax.devices()[0]),
            "batch": args.batch,
            "kpts": args.kpts,
            "dtype": "float32" if args.f32 else "bfloat16",
            "attention": args.attention,
            "pallas": bool(args.pallas),
            "int8": bool(args.int8),
            "int8_static": bool(getattr(args, "int8_static", False)),
            "int8_static_attn": bool(getattr(args, "int8_static_attn", False)),
            "ms_per_batch": round(1000 * per_iter, 3),
            "baseline": "torch reference CPU same host, 1.7 pairs/s @N=1024",
        },
    }


def _child(args, path_flag: str, timeout_s: int):
    """Run one measurement in a subprocess; returns the parsed result or None."""
    cmd = [
        sys.executable, __file__, path_flag,
        "--batch", str(args.batch), "--kpts", str(args.kpts),
        "--iters-low", str(args.iters_low), "--iters-high", str(args.iters_high),
        "--attention", args.attention,
    ] + (["--f32"] if args.f32 else []) + (["--chain-f32"] if args.chain_f32 else []) + (
        ["--int8"] if args.int8 else []
    ) + (["--int8-static"] if args.int8_static else []) + (
        ["--int8-static-attn"] if getattr(args, "int8_static_attn", False) else []
    )
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout_s)
    except (subprocess.TimeoutExpired, OSError):
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def main():
    args = build_parser().parse_args()
    if args.int8 or args.int8_static or args.int8_static_attn:
        args.pallas = True  # the int8 paths are the quantized fused kernel

    if args.pallas or args.xla_only:
        print(json.dumps(measure(args)), flush=True)
        return

    # orchestrator: never touches the TPU itself
    best = [None]
    emitted = [False]

    def emit():
        if best[0] is not None and not emitted[0]:
            emitted[0] = True
            print(json.dumps(best[0]), flush=True)

    def on_signal(signum, frame):
        emit()
        sys.exit(0)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    def child_with_retry(path_flag, timeout_s, tries=2):
        # the axon remote-compile endpoint occasionally drops a request
        # ("response body closed before all bytes were read"); one retry
        # keeps a transient from zeroing the round artifact
        for _ in range(tries):
            result = _child(args, path_flag, timeout_s)
            if result is not None:
                return result
        return None

    best[0] = child_with_retry("--xla-only", timeout_s=max(args.pallas_budget_s, 900))
    pallas_result = child_with_retry("--pallas", timeout_s=args.pallas_budget_s)
    if pallas_result is not None and (
        best[0] is None or pallas_result.get("value", 0) > best[0].get("value", 0)
    ):
        best[0] = pallas_result
    if pallas_result is not None and args.kpts in (1024, 2048) and not args.f32:
        # the quantized static-PTQ serving paths (quality-guarded: >=97%
        # decode agreement tests + pose-AUC reproduction in BASELINE.md) are
        # the fastest measured serving configs — try them last, labeled in
        # detail.int8_static / detail.int8_static_attn, budget-boxed like
        # the pallas attempt. _attn also quantizes the attention dots (the
        # eval-scale winner; at N=1024 the dense-only variant can edge it).
        for flag in ("--int8-static-attn", "--int8-static"):
            static_result = child_with_retry(flag, timeout_s=args.pallas_budget_s)
            if static_result is not None and static_result.get("value", 0) > best[
                0
            ].get("value", 0):
                best[0] = static_result
    if best[0] is None:
        best[0] = {
            "metric": "image_pairs_matched_per_sec_per_chip",
            "value": 0.0,
            "unit": "pairs/s",
            "vs_baseline": 0.0,
            "detail": {"error": "both measurement subprocesses failed"},
        }
    emit()


if __name__ == "__main__":
    main()
