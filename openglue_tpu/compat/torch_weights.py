"""Import PyTorch reference checkpoints into openglue_tpu parameter trees.

Supports the three checkpoint tiers of the reference:
  * raw SuperGlue weights (reference superglue.py:25-27),
  * Lightning training checkpoints with the ``superglue.`` prefix
    (reference inference.py:71-74),
  * SuperPoint extractor weights including the third-party BN key remapping
    (reference models/features/superpoint/model.py:151-178).

Layout conversion: torch Conv1d(k=1) weights ``[out, in, 1]`` become Dense
kernels ``[in, out]``; Conv2d ``[out, in, kh, kw]`` become ``[kh, kw, in, out]``;
BatchNorm weight/bias/running_mean/running_var map to scale/bias and the
``batch_stats`` collection. Head-grouping of the attention projections is
order-preserving (channel c -> head c // head_dim) so no permutation is needed.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from openglue_tpu.models.superglue import SuperGlueConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def strip_prefix(state_dict: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Strip e.g. the Lightning 'superglue.' prefix (reference inference.py:71-74)."""
    out = {}
    for key, value in state_dict.items():
        out[key[len(prefix):] if key.startswith(prefix) else key] = value
    return out


def _conv1x1(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    weight = _np(sd[f"{name}.weight"])  # [out, in, 1]
    bias = _np(sd[f"{name}.bias"])
    return {"kernel": weight[:, :, 0].T, "bias": bias}


def _linear(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    weight = _np(sd[f"{name}.weight"])  # [out, in]
    bias = _np(sd[f"{name}.bias"])
    return {"kernel": weight.T, "bias": bias}


def _bn_params(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _bn_stats(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {"mean": _np(sd[f"{name}.running_mean"]), "var": _np(sd[f"{name}.running_var"])}


def _ffn(sd: Mapping[str, Any], prefix: str, num_hidden: int) -> Tuple[dict, dict]:
    """Convert a reference FeedForwardNet ([Conv,ReLU,BN] x k + Conv Sequential,
    models/utils.py:48-58). Sequential index of hidden conv i is 3*i, its BN is
    3*i + 2, the final conv is 3*num_hidden."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(num_hidden):
        params[f"dense_{i}"] = _conv1x1(sd, f"{prefix}.{3 * i}")
        params[f"bn_{i}"] = _bn_params(sd, f"{prefix}.{3 * i + 2}")
        stats[f"bn_{i}"] = _bn_stats(sd, f"{prefix}.{3 * i + 2}")
    params[f"dense_{num_hidden}"] = _conv1x1(sd, f"{prefix}.{3 * num_hidden}")
    return params, stats


def _ffn_siren(sd: Mapping[str, Any], prefix: str, num_hidden: int) -> dict:
    """Reference FeedForwardNetSiren: [Conv,Sine] x k + Conv (models/utils.py:33-45)."""
    params: Dict[str, Any] = {}
    for i in range(num_hidden):
        params[f"dense_{i}"] = _conv1x1(sd, f"{prefix}.{2 * i}")
    params[f"dense_{num_hidden}"] = _conv1x1(sd, f"{prefix}.{2 * num_hidden}")
    return params


def superglue_params_from_torch(
    state_dict: Mapping[str, Any], config: SuperGlueConfig
) -> Dict[str, Any]:
    """Convert a torch SuperGlue state dict to flax variables.

    Returns {'params': ..., 'batch_stats': ...} matching
    openglue_tpu.models.SuperGlue's variable tree.
    """
    sd = dict(state_dict)
    if any(key.startswith("superglue.") for key in sd):
        sd = strip_prefix(sd, "superglue.")

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    num_pe_hidden = len(config.pe_hidden_layers_sizes)
    if config.pe_encoder_name == "FeedForwardNetSiren":
        enc_params = _ffn_siren(sd, "positional_encoding.encoder", num_pe_hidden)
        enc_stats: Dict[str, Any] = {}
    else:
        enc_params, enc_stats = _ffn(sd, "positional_encoding.encoder", num_pe_hidden)
    params["positional_encoding"] = {"encoder": enc_params}
    if enc_stats:
        stats["positional_encoding"] = {"encoder": enc_stats}

    gnn_params: Dict[str, Any] = {}
    gnn_stats: Dict[str, Any] = {}
    for stage in range(config.num_stages):
        for offset, kind in ((0, "self"), (1, "cross")):
            torch_prefix = f"attention_gnn.layers.{2 * stage + offset}.module"
            mha = {
                "q_proj": _conv1x1(sd, f"{torch_prefix}.mha.in_proj_q"),
                "k_proj": _conv1x1(sd, f"{torch_prefix}.mha.in_proj_k"),
                "v_proj": _conv1x1(sd, f"{torch_prefix}.mha.in_proj_v"),
                "out_proj": _conv1x1(sd, f"{torch_prefix}.mha.out_proj"),
            }
            ffn_params, ffn_stats = _ffn(sd, f"{torch_prefix}.fc", num_hidden=1)
            gnn_params[f"{kind}_{stage}"] = {"mha": mha, "ffn": ffn_params}
            gnn_stats[f"{kind}_{stage}"] = {"ffn": ffn_stats}
    params["attention_gnn"] = gnn_params
    stats["attention_gnn"] = gnn_stats

    params["linear_proj"] = _conv1x1(sd, "linear_proj")
    if config.residual:
        params["mix_coefs"] = _np(sd["mix_coefs"])[:, 0]
    params["dustbin_score"] = _np(sd["dustbin_score"])

    return {"params": params, "batch_stats": stats}


# --- SuperPoint ---------------------------------------------------------------

def _conv2d(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    weight = _np(sd[f"{name}.weight"])  # [out, in, kh, kw]
    bias = _np(sd[f"{name}.bias"])
    return {"kernel": weight.transpose(2, 3, 1, 0), "bias": bias}


def superpoint_params_from_torch(
    state_dict: Mapping[str, Any], with_bn: bool = False
) -> Dict[str, Any]:
    """Convert reference SuperPointNet(/Bn) weights
    (models/features/superpoint/model.py:16-199) to the flax SuperPoint tree."""
    sd = dict(state_dict)
    if "model_state_dict" in sd:
        sd = sd["model_state_dict"]
        sd = rename_thirdparty_superpoint_keys(sd)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    conv_names = [f"conv{i}{ab}" for i in range(1, 5) for ab in "ab"]
    conv_names += ["convPa", "convPb", "convDa", "convDb"]
    for name in conv_names:
        params[name] = _conv2d(sd, name)
    if with_bn:
        bn_names = [f"bn{i}{ab}" for i in range(1, 5) for ab in "ab"]
        bn_names += ["bnPa", "bnPb", "bnDa", "bnDb"]
        for name in bn_names:
            params[name] = _bn_params(sd, name)
            stats[name] = _bn_stats(sd, name)
    # the flax SuperPoint module nests the CNN under 'backbone'
    out: Dict[str, Any] = {"params": {"backbone": params}}
    if with_bn:
        out["batch_stats"] = {"backbone": stats}
    return out


def rename_thirdparty_superpoint_keys(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Key remapping for third-party KITTI/COCO SuperPoint checkpoints
    (reference superpoint/model.py:151-171)."""
    mapping = {}
    for i, block in enumerate(["inc.conv.conv", "down1.mpconv.1.conv", "down2.mpconv.1.conv", "down3.mpconv.1.conv"]):
        mapping[f"{block}.0"] = f"conv{i + 1}a"
        mapping[f"{block}.1"] = f"bn{i + 1}a"
        mapping[f"{block}.3"] = f"conv{i + 1}b"
        mapping[f"{block}.4"] = f"bn{i + 1}b"
    out = {}
    for key, value in state_dict.items():
        new_key = key
        for old, new in mapping.items():
            if key.startswith(old + "."):
                new_key = new + key[len(old):]
                break
        out[new_key] = value
    return out
