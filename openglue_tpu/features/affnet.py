"""AffNet (affine-shape estimator) and OriNet (orientation estimator) in flax
(the modules behind the reference's GFTTAffNetHardNet and DoG-AffNet-HardNet
extractors, models/features/hardnet.py:33 and opencv/dog_affnet_harnet.py,
which delegate to kornia's pretrained AffNetFast / OriNet).

Both consume instance-normalized 32x32 LAF patches:
  * AffNet outputs 3 numbers -> a residual lower-triangular shape
    L = [[1+x0, 0], [x1, 1+x2]] normalized to det 1, composed into the LAF's
    affine part (scale preserved);
  * OriNet outputs (cos, sin)-like pair -> in-plane angle via atan2.

Torch checkpoints with kornia's ``features.N.*`` Sequential layout convert via
``affnet_params_from_torch`` / ``orinet_params_from_torch``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openglue_tpu.features.patches import extract_laf_patches, normalize_patches

_TRUNK = ((16, 1), (16, 1), (32, 2), (32, 1), (64, 2), (64, 1))


class _PatchRegressor(nn.Module):
    """Shared AffNet/OriNet trunk: 6 x [conv3x3-BN-ReLU] + conv8x8 -> out_dim,
    tanh head (kornia AffNetFast/OriNet layout, BNs affine-free)."""

    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, patches: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = patches
        for i, (ch, stride) in enumerate(_TRUNK):
            x = nn.Conv(
                ch, (3, 3), strides=(stride, stride), padding=((1, 1), (1, 1)),
                use_bias=False, dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, use_scale=False, use_bias=False,
                momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=f"bn_{i}",
            )(x)
            x = nn.relu(x)
        if train:
            x = nn.Dropout(0.25, deterministic=False)(x)
        x = nn.Conv(
            self.out_dim, (8, 8), padding="VALID", use_bias=True,
            dtype=self.dtype, name=f"conv_{len(_TRUNK)}",
        )(x)
        x = jnp.tanh(x.astype(jnp.float32))
        return jnp.mean(x, axis=(1, 2))  # [B, out_dim]


class AffNet(nn.Module):
    """32x32 patches [B, 32, 32, 1] -> det-1 shape matrices [B, 2, 2]."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, patches: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        xy = _PatchRegressor(3, dtype=self.dtype, name="trunk")(patches, train)
        a11 = 1.0 + xy[:, 0]
        a21 = xy[:, 1]
        a22 = 1.0 + xy[:, 2]
        det = jnp.abs(a11 * a22) + 1e-10
        norm = jnp.sqrt(det)
        zeros = jnp.zeros_like(a11)
        L = jnp.stack(
            [jnp.stack([a11, zeros], -1), jnp.stack([a21, a22], -1)], -2
        )
        return L / norm[:, None, None]


class OriNet(nn.Module):
    """32x32 patches [B, 32, 32, 1] -> in-plane angles [B] (radians)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, patches: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cs = _PatchRegressor(2, dtype=self.dtype, name="trunk")(patches, train)
        return jnp.arctan2(cs[:, 1], cs[:, 0] + 1e-8)


def estimate_laf_shapes(
    affnet: AffNet,
    variables: Mapping[str, Any],
    image: jnp.ndarray,
    lafs: jnp.ndarray,
    patch_size: int = 32,
) -> jnp.ndarray:
    """Compose AffNet's shape into each LAF (LAFAffNetShapeEstimator
    semantics: the LAF's scale is preserved, only the shape changes)."""
    b, n = lafs.shape[:2]
    patches = normalize_patches(extract_laf_patches(image, lafs, patch_size))
    L = affnet.apply(variables, patches.reshape(b * n, patch_size, patch_size, 1))
    L = L.reshape(b, n, 2, 2)
    A = jnp.einsum("bnij,bnjk->bnik", lafs[..., :2, :2], L)
    return jnp.concatenate([A, lafs[..., 2:]], axis=-1)


def estimate_laf_orientations(
    orinet: OriNet,
    variables: Mapping[str, Any],
    image: jnp.ndarray,
    lafs: jnp.ndarray,
    patch_size: int = 32,
) -> jnp.ndarray:
    """OriNet angles for each LAF [B, N] (radians)."""
    b, n = lafs.shape[:2]
    patches = normalize_patches(extract_laf_patches(image, lafs, patch_size))
    ang = orinet.apply(variables, patches.reshape(b * n, patch_size, patch_size, 1))
    return ang.reshape(b, n)


def _regressor_params_from_torch(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    def _np(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    sd = {k: _np(v) for k, v in state_dict.items()}
    conv_keys = sorted(
        (k for k in sd if k.endswith(".weight") and sd[k].ndim == 4),
        key=lambda k: int(k.split(".")[1]),
    )
    bn_keys = sorted(
        (k for k in sd if k.endswith(".running_mean")),
        key=lambda k: int(k.split(".")[1]),
    )
    if len(conv_keys) != len(_TRUNK) + 1 or len(bn_keys) != len(_TRUNK):
        raise ValueError(
            f"unexpected checkpoint: {len(conv_keys)} convs / {len(bn_keys)} BNs"
        )
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, ck in enumerate(conv_keys[:-1]):
        params[f"conv_{i}"] = {"kernel": sd[ck].transpose(2, 3, 1, 0)}
        prefix = bn_keys[i][: -len("running_mean")]
        stats[f"bn_{i}"] = {
            "mean": sd[f"{prefix}running_mean"],
            "var": sd[f"{prefix}running_var"],
        }
    last = conv_keys[-1]
    head = {"kernel": sd[last].transpose(2, 3, 1, 0)}
    bias_key = last[: -len("weight")] + "bias"
    if bias_key in sd:
        head["bias"] = sd[bias_key]
    params[f"conv_{len(_TRUNK)}"] = head
    return {
        "params": {"trunk": params},
        "batch_stats": {"trunk": stats},
    }


affnet_params_from_torch = _regressor_params_from_torch
orinet_params_from_torch = _regressor_params_from_torch
