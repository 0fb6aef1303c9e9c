"""Combined extractor + matcher module for online training
(reference models/matching_module.py:17-187).

Holds a device feature extractor (SuperPoint) and the SuperGlue matcher; the
LAF->side-info conversion sits between them (reference matching_module.py:40-43
wires side_info_dim = converter dims + 1 for the response). ``finetune=False``
reproduces the reference's frozen-extractor semantics (requires_grad=False +
eval() per step, matching_module.py:29-31,77-78): extractor outputs are
stop_gradient'ed, BatchNorm uses running stats, and the optimizer additionally
masks the extractor subtree (openglue_tpu.train.state label_extractor_frozen).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openglue_tpu.core.types import Features, PairBatch
from openglue_tpu.features.lafs import get_laf_to_sideinfo_converter
from openglue_tpu.features.prepare import features_to_keypoint_set
from openglue_tpu.features.superpoint import SuperPoint, SuperPointConfig
from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig


@dataclasses.dataclass(frozen=True)
class MatchingModuleConfig:
    superglue: SuperGlueConfig = SuperGlueConfig()
    extractor_name: str = "SuperPointNet"
    extractor_params: Any = dataclasses.field(default_factory=dict)
    # kept for backwards compatibility; used when extractor_name is SuperPoint*
    superpoint: Optional[SuperPointConfig] = None
    laf_converter: str = "none"
    finetune: bool = False
    log_response: bool = False

    @classmethod
    def from_dict(cls, cfg: Mapping[str, Any]) -> "MatchingModuleConfig":
        """Assemble from a reference-schema config: features params +
        superglue block; descriptor_dim and side_info_size are propagated into
        the matcher config (reference matching_module.py:35-43)."""
        features = cfg.get("features", {})
        name = features.get("name", "SuperPointNet")
        params = dict(features.get("parameters", {}))
        if name.startswith("SuperPointNet"):
            params = {
                k: v for k, v in params.items()
                if k in {f.name for f in dataclasses.fields(SuperPointConfig)}
            }
            descriptor_dim = SuperPointConfig(**params).descriptor_dim
        else:
            descriptor_dim = int(features.get("descriptor_dim", params.get("descriptor_dim", 128)))
        laf_name = cfg.get("laf_to_sideinfo_method", "none")
        converter = get_laf_to_sideinfo_converter(laf_name)
        sg_cfg = dict(cfg.get("superglue", {}))
        sg_cfg["descriptor_dim"] = descriptor_dim
        sg = SuperGlueConfig.from_dict(sg_cfg)
        sg = dataclasses.replace(sg, side_info_size=converter.side_info_dim + 1)
        return cls(
            superglue=sg,
            extractor_name=name,
            extractor_params=params,
            laf_converter=laf_name,
            finetune=cfg.get("train", {}).get("finetune_features_extractor", False),
            log_response=features.get("log_response", False),
        )


class MatchingModule(nn.Module):
    """image pair -> extracted features -> SuperGlue log-assignment."""

    config: MatchingModuleConfig

    def setup(self):
        cfg = self.config
        if cfg.extractor_name.startswith("SuperPointNet") or cfg.superpoint is not None:
            params = dict(cfg.extractor_params)
            params.pop("bn", None)  # variant name decides; avoid a duplicate kwarg
            sp_cfg = cfg.superpoint or SuperPointConfig(
                **params, bn=(cfg.extractor_name == "SuperPointNetBn")
            )
            self.extractor = SuperPoint(sp_cfg, name="extractor")
            self._param_free_extractor = None
        else:
            from openglue_tpu.features.registry import DEVICE_EXTRACTORS

            if cfg.extractor_name not in DEVICE_EXTRACTORS:
                raise ValueError(
                    f"MatchingModule requires a device extractor; {cfg.extractor_name!r} "
                    f"is not one of {sorted(DEVICE_EXTRACTORS)}"
                )
            candidate = DEVICE_EXTRACTORS[cfg.extractor_name](**dict(cfg.extractor_params))
            if isinstance(candidate, nn.Module):
                # parameterized registry extractor (e.g. GFTTAffNetHardNet):
                # adopt as the 'extractor' submodule so the optimizer freeze
                # mask and stop-gradient semantics apply like SuperPoint's
                self.extractor = candidate
                self._param_free_extractor = None
            else:
                # parameter-free device extractor (e.g. SIFT)
                self._param_free_extractor = candidate
        self.superglue = SuperGlue(cfg.superglue, name="superglue")
        self._laf_converter = get_laf_to_sideinfo_converter(cfg.laf_converter)

    def extract(self, image: jnp.ndarray, train: bool = False) -> Features:
        """image: [B, H, W] or [B, H, W, 1]."""
        if self._param_free_extractor is not None:
            if image.ndim == 4:
                image = image[..., 0]
            return self._param_free_extractor(image)
        if image.ndim == 3:
            image = image[..., None]
        extractor_train = train and self.config.finetune
        feats = self.extractor(image, train=extractor_train)
        if not self.config.finetune:
            feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
        return feats

    def __call__(
        self, image0: jnp.ndarray, image1: jnp.ndarray, train: bool = False
    ) -> Tuple[Dict[str, jnp.ndarray], PairBatch]:
        h, w = image0.shape[1:3] if image0.ndim >= 3 else image0.shape
        image_size = jnp.asarray([image0.shape[2], image0.shape[1]], jnp.float32)

        import os

        extractor_trains = train and self.config.finetune
        if (
            extractor_trains
            or image0.shape != image1.shape
            or os.environ.get("OPENGLUE_NO_FUSED_EXTRACT")  # bench A/B escape
        ):
            # training BatchNorm statistics must see each image batch
            # separately (reference matching_module.py:71-79 calls the
            # extractor once per side) — keep two calls for exact parity
            feats0 = self.extract(image0, train)
            feats1 = self.extract(image1, train)
        else:
            # frozen/eval extractor: one 2B-batch CNN forward instead of two
            # B-batch forwards (same math — eval BN is a per-sample affine;
            # halves kernel launches and doubles conv batch utilization)
            batch = image0.shape[0]
            feats = self.extract(
                jnp.concatenate([image0, image1], axis=0), train
            )
            feats0 = jax.tree_util.tree_map(lambda x: x[:batch], feats)
            feats1 = jax.tree_util.tree_map(lambda x: x[batch:], feats)
        side0 = features_to_keypoint_set(
            feats0, self._laf_converter, image_size, log_response=self.config.log_response
        )
        side1 = features_to_keypoint_set(
            feats1, self._laf_converter, image_size, log_response=self.config.log_response
        )
        out = self.superglue(
            kpts0=side0.keypoints,
            kpts1=side1.keypoints,
            desc0=side0.descriptors,
            desc1=side1.descriptors,
            side_info0=side0.side_info,
            side_info1=side1.side_info,
            image_size0=side0.image_size,
            image_size1=side1.image_size,
            mask0=side0.mask,
            mask1=side1.mask,
            train=train,
        )
        return out, PairBatch(side0=side0, side1=side1)
