"""HardNet patch descriptor in flax (the descriptor behind the reference's
GFTTAffNetHardNet / DoG-AffNet-HardNet extractors, models/features/hardnet.py
and opencv/dog_affnet_harnet.py, which delegate to kornia's pretrained
HardNet).

Architecture (HardNet, Mishchuk et al. 2017; kornia layout — BatchNorms are
affine-free): 6 x [conv3x3 (-> 32/32/64/64/128/128, strides 1/1/2/1/2/1), BN,
ReLU] + dropout + conv8x8 -> 128 + BN, on instance-normalized 32x32 patches,
L2-normalized output. Torch checkpoints (kornia 'HardNet' / HardNet8-style
state dicts with ``features.N.*`` keys) convert via
``hardnet_params_from_torch``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openglue_tpu.features.patches import extract_laf_patches, normalize_patches

# (out_channels, stride) per conv layer; final conv is 8x8 VALID
_LAYERS = ((32, 1), (32, 1), (64, 2), (64, 1), (128, 2), (128, 1))


class HardNet(nn.Module):
    """32x32 patches [B, 32, 32, 1] -> descriptors [B, 128] (L2-normalized)."""

    descriptor_dim: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, patches: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = patches
        for i, (ch, stride) in enumerate(_LAYERS):
            x = nn.Conv(
                ch, (3, 3), strides=(stride, stride),
                padding=((1, 1), (1, 1)),  # torch padding=1 (flax SAME pads
                use_bias=False,            # asymmetrically at stride 2)
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, use_scale=False, use_bias=False,
                momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=f"bn_{i}",
            )(x)
            x = nn.relu(x)
        if train:
            x = nn.Dropout(0.3, deterministic=False)(x)
        x = nn.Conv(
            self.descriptor_dim, (8, 8), padding="VALID", use_bias=False,
            dtype=self.dtype, name=f"conv_{len(_LAYERS)}",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, use_scale=False, use_bias=False,
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=f"bn_{len(_LAYERS)}",
        )(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def describe_lafs(
    hardnet: HardNet,
    variables: Mapping[str, Any],
    image: jnp.ndarray,
    lafs: jnp.ndarray,
    patch_size: int = 32,
) -> jnp.ndarray:
    """image [B, H, W] + lafs [B, N, 2, 3] -> descriptors [B, N, 128]
    (the LAFDescriptor composition, reference hardnet.py:36-38)."""
    b, n = lafs.shape[:2]
    patches = extract_laf_patches(image, lafs, patch_size)
    patches = normalize_patches(patches)
    flat = patches.reshape(b * n, patch_size, patch_size, 1)
    desc = hardnet.apply(variables, flat)
    return desc.reshape(b, n, -1)


def hardnet_params_from_torch(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a kornia/HardNet torch state dict (``features.N.weight`` convs,
    ``features.N.running_mean/var`` affine-free BNs) to the flax tree."""

    def _np(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    sd = {k: _np(v) for k, v in state_dict.items()}
    # conv layers are the Sequential entries with a weight of ndim 4
    conv_keys = sorted(
        (k for k in sd if k.endswith(".weight") and sd[k].ndim == 4),
        key=lambda k: int(k.split(".")[1]),
    )
    bn_mean_keys = sorted(
        (k for k in sd if k.endswith(".running_mean")),
        key=lambda k: int(k.split(".")[1]),
    )
    if len(conv_keys) != len(_LAYERS) + 1 or len(bn_mean_keys) != len(_LAYERS) + 1:
        raise ValueError(
            f"unexpected HardNet checkpoint: {len(conv_keys)} convs, "
            f"{len(bn_mean_keys)} BNs (need {len(_LAYERS) + 1} each)"
        )
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, (ck, bk) in enumerate(zip(conv_keys, bn_mean_keys)):
        params[f"conv_{i}"] = {"kernel": sd[ck].transpose(2, 3, 1, 0)}
        prefix = bk[: -len("running_mean")]
        stats[f"bn_{i}"] = {
            "mean": sd[f"{prefix}running_mean"],
            "var": sd[f"{prefix}running_var"],
        }
    return {"params": params, "batch_stats": stats}
