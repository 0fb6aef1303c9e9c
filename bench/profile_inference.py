"""Inference-path decomposition: where does the eval forward spend time?

Times CUMULATIVE prefixes of the flagship inference path (positional
encoding, + GNN stack, + head [proj/residual/score matmul], + Sinkhorn,
+ match decode) with the device-side loop methodology
(openglue_tpu.profiling.device_timeit); differencing adjacent prefixes
isolates each segment. The segments replicate SuperGlue.__call__
(models/superglue.py) exactly, applying the initialized submodule parameter
subtrees standalone, so the numbers decompose the same computation bench.py
measures end to end.

Usage: python -m bench.profile_inference [--batch 16] [--kpts 1024] [--f32]
       [--pallas] [--chain-f32]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from openglue_tpu.data.synthetic import SyntheticHomographyPairs
from openglue_tpu.models.gnn import AttentionGNN
from openglue_tpu.models.layers import torch_dense
from openglue_tpu.models.matching import decode_matches
from openglue_tpu.models.positional_encoding import MLPPositionalEncoding
from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig, normalize_keypoints
from openglue_tpu.ops.sinkhorn import log_optimal_transport
from openglue_tpu.profiling import device_timeit
from openglue_tpu.train.step import superglue_inputs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--kpts", type=int, default=1024)
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("--pallas", action="store_true")
    parser.add_argument("--chain-f32", action="store_true")
    args = parser.parse_args()

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    chain = jnp.float32 if (args.f32 or args.chain_f32) else jnp.bfloat16
    cfg = SuperGlueConfig(
        descriptor_dim=256, pe_hidden_layers_sizes=(32, 64, 128), num_stages=9,
        num_heads=4, otp_num_iters=20, residual=True, dtype=dtype,
        chain_dtype=chain, use_pallas=args.pallas,
    )
    model = SuperGlue(cfg)
    gen = SyntheticHomographyPairs(num_keypoints=args.kpts, descriptor_dim=256)
    batch = gen.sample(jax.random.key(0), args.batch)
    init = jax.jit(lambda rng, b: model.init(rng, **superglue_inputs(b, train=False)))
    variables = init(jax.random.key(1), batch)
    jax.block_until_ready(variables)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def sub_vars(name):
        v = {"params": params[name]}
        if name in stats:
            v["batch_stats"] = stats[name]
        return v

    pe_mod = MLPPositionalEncoding(
        output_size=cfg.descriptor_dim,
        hidden_layers_sizes=tuple(cfg.pe_hidden_layers_sizes),
        encoder_name=cfg.pe_encoder_name,
        dtype=dtype,
    )
    gnn_mod = AttentionGNN(
        num_stages=cfg.num_stages, embed_dim=cfg.descriptor_dim,
        num_heads=cfg.num_heads, attention=cfg.attention,
        use_offset=cfg.use_offset, favor_num_features=cfg.favor_num_features,
        dtype=dtype, use_pallas=cfg.use_pallas,
    )
    proj_mod = torch_dense(cfg.descriptor_dim, cfg.descriptor_dim, dtype=dtype)

    def seg_pe(b):
        s0, s1 = b.side0, b.side1
        k0 = normalize_keypoints(s0.keypoints, s0.image_size)
        k1 = normalize_keypoints(s1.keypoints, s1.image_size)
        pe0 = pe_mod.apply(sub_vars("positional_encoding"), k0, s0.side_info, mask=s0.mask)
        pe1 = pe_mod.apply(sub_vars("positional_encoding"), k1, s1.side_info, mask=s1.mask)
        x0 = (s0.descriptors + pe0).astype(chain)
        x1 = (s1.descriptors + pe1).astype(chain)
        return x0, x1

    def seg_gnn(b):
        x0, x1 = seg_pe(b)
        return gnn_mod.apply(sub_vars("attention_gnn"), x0, x1, b.side0.mask, b.side1.mask, False)

    def seg_head(b):
        g0, g1 = seg_gnn(b)
        g0 = proj_mod.apply(sub_vars("linear_proj"), g0)
        g1 = proj_mod.apply(sub_vars("linear_proj"), g1)
        alpha = jax.nn.sigmoid(params["mix_coefs"])
        g0 = alpha * g0 + (1.0 - alpha) * b.side0.descriptors
        g1 = alpha * g1 + (1.0 - alpha) * b.side1.descriptors
        S = jnp.einsum("bnd,bmd->bnm", g0, g1) * cfg.descriptor_dim**-0.5
        return S.astype(jnp.float32)

    def run_ot(S, b):
        dustbin = params["dustbin_score"]
        if args.pallas:
            from openglue_tpu.ops.pallas import sinkhorn_kernel

            return sinkhorn_kernel.log_optimal_transport(
                S, dustbin, num_iters=cfg.otp_num_iters, reg=cfg.otp_reg,
                mask0=b.side0.mask, mask1=b.side1.mask,
            )
        return log_optimal_transport(
            S, dustbin, num_iters=cfg.otp_num_iters, reg=cfg.otp_reg,
            mask0=b.side0.mask, mask1=b.side1.mask,
        )

    def seg_sinkhorn(b):
        return run_ot(seg_head(b), b)

    def seg_decode(b):
        log_P = seg_sinkhorn(b)
        return decode_matches(log_P, mask0=b.side0.mask, mask1=b.side1.mask)["matches0"]

    def full_model(b):
        out = model.apply(variables, **superglue_inputs(b, train=False))
        return decode_matches(out["scores"], mask0=b.side0.mask, mask1=b.side1.mask)["matches0"]

    def perturb(b, s):
        return b.replace(
            side0=b.side0.replace(
                descriptors=b.side0.descriptors * s,
                keypoints=b.side0.keypoints * s,
            )
        )

    stages = {
        "pe": seg_pe,
        "pe_gnn": seg_gnn,
        "pe_gnn_head": seg_head,
        "pe_gnn_head_ot": seg_sinkhorn,
        "pe_gnn_head_ot_decode": seg_decode,
        "full_model_parity_check": full_model,
    }
    result = {}
    for name, fn in stages.items():
        seconds = device_timeit(fn, batch, perturb=perturb)
        result[name + "_ms"] = round(seconds * 1e3, 3)
        print(f"{name}: {seconds * 1e3:.3f} ms", flush=True)

    result["derived"] = {
        "pe_ms": result["pe_ms"],
        "gnn_ms": round(result["pe_gnn_ms"] - result["pe_ms"], 3),
        "head_ms": round(result["pe_gnn_head_ms"] - result["pe_gnn_ms"], 3),
        "sinkhorn_ms": round(result["pe_gnn_head_ot_ms"] - result["pe_gnn_head_ms"], 3),
        "decode_ms": round(
            result["pe_gnn_head_ot_decode_ms"] - result["pe_gnn_head_ot_ms"], 3
        ),
    }
    result["config"] = {
        "batch": args.batch, "kpts": args.kpts,
        "dtype": "float32" if args.f32 else "bfloat16",
        "chain": str(chain.__name__), "pallas": bool(args.pallas),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
