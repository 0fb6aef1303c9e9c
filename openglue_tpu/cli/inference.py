"""Inference API + CLI (reference inference.py:41-270).

``OpenGlueMatcher`` mirrors the reference's kornia-LocalFeatureMatcher-style
module: initialize from an experiment directory (config.yaml +
features_config.yaml + checkpoints/, the layout written by the training CLIs),
take two images, return matched keypoints/LAFs/confidences after
mutual-NN + threshold decoding. ``run_inference`` adds MAGSAC fundamental-
matrix inlier filtering (reference inference.py:230-233).

Usage:
  python -m openglue_tpu.cli.inference --experiment logs/... \
      --image0 a.jpg --image1 b.jpg [--output matches.npz]
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from openglue_tpu.core.config import Config, load_config


class OpenGlueMatcher:
    """Two-image matcher built from an experiment directory."""

    def __init__(
        self,
        config: Config,
        features_config: Config,
        variables: Dict,
        match_threshold: Optional[float] = None,
        target_size: Tuple[int, int] = (960, 720),
        buckets: Optional[Tuple[int, ...]] = None,
    ):
        import jax

        from openglue_tpu.features.lafs import get_laf_to_sideinfo_converter
        from openglue_tpu.features.registry import is_device_extractor
        from openglue_tpu.cli.common import superglue_config_from
        from openglue_tpu.models.superglue import SuperGlue

        self.config = config
        self.features_config = features_config
        self.match_threshold = (
            match_threshold
            if match_threshold is not None
            else float(config.get("inference.match_threshold", 0.2))
        )
        self.target_size = tuple(target_size)
        # inference.buckets: pad each pair to the smallest bucket that fits its
        # real keypoint counts instead of the extractor cap — sparse images run
        # on smaller O(N^2) matcher graphs (same contract as data.buckets in
        # the train/eval CLIs; see data/bucketing.py)
        if buckets is None:
            buckets = config.get("inference.buckets")
        self.buckets = tuple(int(b) for b in buckets) if buckets else None

        laf_method = config.get("superglue.laf_to_sideinfo_method", "none")
        self.laf_converter = get_laf_to_sideinfo_converter(laf_method)
        descriptor_dim = int(features_config["descriptor_dim"])
        sg_config = superglue_config_from(config, descriptor_dim, self.laf_converter.side_info_dim)
        # inference decodes from the fused stats (decode_from_output), so the
        # full score matrix never materializes (params are unaffected)
        import dataclasses

        sg_config = dataclasses.replace(sg_config, decode_stats=True)
        self.matcher = SuperGlue(sg_config)
        self.variables = variables

        name = features_config["name"]
        self.device_extractor = is_device_extractor(name)
        if self.device_extractor:
            from openglue_tpu.cli.extract_features import build_device_extractor

            self.ext_variables, self.ext_apply = build_device_extractor(
                features_config, features_config.get("weights")
            )
        else:
            from openglue_tpu.features.registry import get_feature_extractor

            self.extractor = get_feature_extractor(name)(
                **features_config.get("parameters", {})
            )

        self._match_jit = jax.jit(
            lambda v, kw: self.matcher.apply(v, **kw)
        )
        self._compiled = {}  # (k, d, s) -> AOT executable — see precompile
        self._last_num_keypoints = None  # matcher N of the last match_images

    def precompile(self, num_keypoints) -> None:
        """Ahead-of-time compile the matcher at the serving shape(s).

        ``jit.lower(...).compile()`` takes seconds where the first jitted
        DISPATCH can pay a much larger kernel-compilation cost (minutes over
        a remote-compile TPU tunnel) — cold-start control for serving.
        Accepts one keypoint count or a sequence (e.g. ``matcher.buckets``);
        a compiled executable is used whenever the matcher-input keypoint
        count matches, other shapes fall back to the jit path."""
        import jax as _jax
        import jax.numpy as jnp

        if (
            str(getattr(self.matcher.config, "quantize", None) or "").startswith("int8_static")
            and not any("int8_calib" in k for k in self.variables)
        ):
            raise RuntimeError(
                "int8_static serving is uncalibrated: match one representative "
                "pair first (the first match_images call calibrates), then "
                "precompile"
            )
        # Anything non-iterable is a single count (covers numpy integer
        # scalars, which are not Python ints but must not be iterated).
        counts = (
            tuple(int(k) for k in num_keypoints)
            if hasattr(num_keypoints, "__iter__")
            else (int(num_keypoints),)
        )
        d = int(self.features_config["descriptor_dim"])
        s = self.laf_converter.side_info_dim + 1
        for k in counts:
            kw = dict(
                kpts0=jnp.zeros((1, k, 2), jnp.float32),
                kpts1=jnp.zeros((1, k, 2), jnp.float32),
                desc0=jnp.zeros((1, k, d), jnp.float32),
                desc1=jnp.zeros((1, k, d), jnp.float32),
                side_info0=jnp.zeros((1, k, s), jnp.float32),
                side_info1=jnp.zeros((1, k, s), jnp.float32),
                image_size0=jnp.zeros((1, 2), jnp.float32),
                image_size1=jnp.zeros((1, 2), jnp.float32),
                mask0=jnp.zeros((1, k), bool),
                mask1=jnp.zeros((1, k), bool),
            )
            self._compiled[(k, d, s)] = _jax.jit(
                lambda v, kw: self.matcher.apply(v, **kw)
            ).lower(self.variables, kw).compile()

    def _ensure_calibrated(self, kw) -> None:
        """Static-scale PTQ serving (`superglue.quantize: int8_static`): the
        first matched pair doubles as the calibration batch — one mutable
        apply records per-layer activation absmaxes into the "int8_calib"
        collection; every later pair serves with static scales (no in-kernel
        absmax reductions — BASELINE.md round-3 int8 disposition)."""
        if not str(getattr(self.matcher.config, "quantize", None) or "").startswith(
            "int8_static"
        ):
            return
        if any("int8_calib" in k for k in self.variables):
            return
        import jax as _jax

        _, calib = _jax.jit(
            lambda v, kw_: self.matcher.apply(v, **kw_, mutable=["int8_calib"])
        )(self.variables, kw)
        self.variables = {**self.variables, **dict(calib)}
        # AOT executables lowered pre-calibration baked the old variables
        # pytree; drop them so later matches re-precompile/jit with the
        # calibrated structure
        self._compiled.clear()

    def extract(self, image: np.ndarray):
        """grayscale uint8 [H, W] -> (lafs, scores, desc, mask) numpy."""
        from openglue_tpu.data.io import aspect_preserving_resize

        resized = aspect_preserving_resize(image, self.target_size)
        h, w = resized.shape[:2]
        if self.device_extractor:
            ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
            padded = np.zeros((ph, pw), np.float32)
            padded[:h, :w] = resized.astype(np.float32) / 255.0
            feats = self.ext_apply(self.ext_variables, padded[None, ..., None])
            lafs = np.asarray(feats.lafs[0])
            mask = np.asarray(feats.mask[0])
            # exclude padding-seam detections outside the true image bounds
            mask = mask & (lafs[:, 0, 2] < w) & (lafs[:, 1, 2] < h)
            return (
                lafs,
                np.asarray(feats.responses[0]),
                np.asarray(feats.descriptors[0]),
                mask,
                (w, h),
            )
        lafs, scores, desc, mask = self.extractor.detect_and_compute(resized)
        return lafs, scores, desc, mask, (w, h)

    @staticmethod
    def _to_bucket(lafs, scores, desc, mask, bucket: int):
        """Trim (top response among valid) or zero-pad the per-image feature
        arrays to ``bucket`` keypoints; padding rows carry mask=False."""
        n = len(scores)
        if n == bucket:
            return lafs, scores, desc, mask
        if n > bucket:
            # valid keypoints first (by response), invalid padding last —
            # the same top-score selection the collate path uses
            order = np.argsort(
                np.where(mask, -scores.astype(np.float64), np.inf), kind="stable"
            )[:bucket]
            return lafs[order], scores[order], desc[order], mask[order]
        pad = bucket - n
        return (
            np.concatenate([lafs, np.zeros((pad,) + lafs.shape[1:], lafs.dtype)]),
            np.concatenate([scores, np.zeros(pad, scores.dtype)]),
            np.concatenate([desc, np.zeros((pad, desc.shape[1]), desc.dtype)]),
            np.concatenate([mask, np.zeros(pad, bool)]),
        )

    def match_images(self, image0: np.ndarray, image1: np.ndarray) -> Dict[str, np.ndarray]:
        """Full pipeline on a pair of grayscale uint8 images."""
        import jax.numpy as jnp

        from openglue_tpu.features.prepare import prepare_features_output
        from openglue_tpu.models.matching import decode_from_output

        extracted = [self.extract(img) for img in (image0, image1)]
        if self.buckets is not None:
            from openglue_tpu.data.bucketing import batch_bucket

            counts = [int(np.sum(mask)) for _, _, _, mask, _ in extracted]
            bucket = batch_bucket(counts, self.buckets)
            extracted = [
                (*self._to_bucket(lafs, scores, desc, mask, bucket), size)
                for lafs, scores, desc, mask, size in extracted
            ]

        sides = []
        raw_lafs = []
        for lafs, scores, desc, mask, size in extracted:
            raw_lafs.append(lafs)
            side = prepare_features_output(
                jnp.asarray(lafs[None]),
                jnp.asarray(scores[None]),
                jnp.asarray(desc[None]),
                self.laf_converter,
                jnp.asarray(np.asarray(size, np.float32)[None]),
                mask=jnp.asarray(mask[None]),
            )
            sides.append(side)
        s0, s1 = sides

        kw = dict(
            kpts0=s0.keypoints, kpts1=s1.keypoints,
            desc0=s0.descriptors, desc1=s1.descriptors,
            side_info0=s0.side_info, side_info1=s1.side_info,
            image_size0=s0.image_size, image_size1=s1.image_size,
            mask0=s0.mask, mask1=s1.mask,
        )
        self._last_num_keypoints = int(s0.keypoints.shape[1])
        self._ensure_calibrated(kw)
        key = (s0.keypoints.shape[1], s0.descriptors.shape[2], s0.side_info.shape[2])
        executable = (
            self._compiled.get(key)
            if s1.keypoints.shape[1] == s0.keypoints.shape[1]
            else None
        )
        if executable is not None:
            out = executable(self.variables, kw)
        else:
            out = self._match_jit(self.variables, kw)
        decoded = decode_from_output(
            out, self.match_threshold, mask0=s0.mask, mask1=s1.mask
        )
        matches0 = np.asarray(decoded["matches0"][0])
        conf = np.asarray(decoded["matching_scores0"][0])
        valid = matches0 >= 0
        idx0 = np.flatnonzero(valid)
        idx1 = matches0[valid]
        return {
            "keypoints0": np.asarray(s0.keypoints[0])[idx0],
            "keypoints1": np.asarray(s1.keypoints[0])[idx1],
            "lafs0": raw_lafs[0][idx0],
            "lafs1": raw_lafs[1][idx1],
            "confidence": conf[idx0],
            "indices0": idx0,
            "indices1": idx1,
            "scores": np.asarray(out["scores"][0]),
        }


def initialize_matcher(experiment_dir, checkpoint_step: Optional[int] = None, **kwargs) -> OpenGlueMatcher:
    """Build a matcher from a training experiment directory
    (reference initialize_models, inference.py:41-78).

    Handles both checkpoint layouts: cached training (the state's params ARE
    the matcher tree) and online training (params = {extractor?, superglue}
    from the combined MatchingModule)."""
    import jax

    experiment_dir = Path(experiment_dir)
    config = load_config(experiment_dir / "config.yaml")
    features_config = load_config(experiment_dir / "features_config.yaml")

    matcher = OpenGlueMatcher(config, features_config, variables=None, **kwargs)

    import jax.numpy as jnp

    from openglue_tpu.train import create_train_state
    from openglue_tpu.train.checkpoint import latest_step, restore_train_state
    from openglue_tpu.train.step import superglue_inputs
    from openglue_tpu.data.synthetic import SyntheticHomographyPairs

    online_experiment = "features" in config  # pretrain/train.py experiments

    if online_experiment:
        from openglue_tpu.cli.online import build_matching_module

        from openglue_tpu.train.state import make_online_optimizer

        module = build_matching_module(config, features_config)
        dummy_hw = tuple(reversed(config.get("data.target_size", [64, 64])))
        dummy = jnp.zeros((1, *dummy_hw), jnp.float32)
        variables = module.init(jax.random.key(0), dummy, dummy)
        # the optimizer structure must match the saved state's (online training
        # uses the freeze-masked transform)
        tx = make_online_optimizer(
            variables["params"],
            finetune_extractor=bool(config.get("train.finetune_features_extractor", False)),
        )
        state = create_train_state(module.apply, variables, tx=tx)
        state = restore_train_state(
            experiment_dir / "checkpoints", state, step=checkpoint_step
        )
        params = dict(state.params)
        sg_params = params["superglue"]
        sg_state = {
            coll: tree["superglue"]
            for coll, tree in state.model_state.items()
            if "superglue" in tree
        }
        matcher.variables = {"params": sg_params, **sg_state}
        if "extractor" in params and matcher.device_extractor:
            ext_vars = {"params": params["extractor"]}
            for coll, tree in state.model_state.items():
                if "extractor" in tree:
                    ext_vars[coll] = tree["extractor"]
            matcher.ext_variables = ext_vars
        return matcher

    # cached training: template init then restore (matcher weights are the
    # whole params tree)
    descriptor_dim = int(features_config["descriptor_dim"])
    gen = SyntheticHomographyPairs(
        num_keypoints=16,
        descriptor_dim=descriptor_dim,
        side_info_dim=matcher.laf_converter.side_info_dim + 1,
    )
    dummy = gen.sample(jax.random.key(0), 1)
    variables = matcher.matcher.init(jax.random.key(0), **superglue_inputs(dummy))
    state = create_train_state(matcher.matcher.apply, variables)
    state = restore_train_state(experiment_dir / "checkpoints", state, step=checkpoint_step)
    matcher.variables = {"params": state.params, **state.model_state}
    return matcher


def magsac_inlier_filter(kpts0: np.ndarray, kpts1: np.ndarray) -> np.ndarray:
    """USAC_MAGSAC fundamental-matrix inlier mask (reference inference.py:230-233)."""
    import cv2

    if len(kpts0) < 8:
        return np.ones(len(kpts0), bool)
    _, mask = cv2.findFundamentalMat(
        kpts0.astype(np.float64), kpts1.astype(np.float64), cv2.USAC_MAGSAC,
        1.0, 0.999, 100000,
    )
    if mask is None:
        return np.ones(len(kpts0), bool)
    return mask.ravel().astype(bool)


def run_inference(matcher: OpenGlueMatcher, image0_path, image1_path, ransac: bool = True):
    import cv2

    img0 = cv2.cvtColor(cv2.imread(str(image0_path)), cv2.COLOR_BGR2GRAY)
    img1 = cv2.cvtColor(cv2.imread(str(image1_path)), cv2.COLOR_BGR2GRAY)
    result = matcher.match_images(img0, img1)
    if ransac:
        inliers = magsac_inlier_filter(result["keypoints0"], result["keypoints1"])
        for key in ("keypoints0", "keypoints1", "lafs0", "lafs1", "confidence", "indices0", "indices1"):
            result[key] = result[key][inliers]
    return result


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--experiment", required=True)
    parser.add_argument("--image0", required=True)
    parser.add_argument("--image1", required=True)
    parser.add_argument("--checkpoint_step", type=int, default=None)
    parser.add_argument("--match_threshold", type=float, default=None)
    parser.add_argument(
        "--buckets", type=int, nargs="*", default=None,
        help="static keypoint bucket sizes (e.g. --buckets 256 512 1024): pad "
        "each pair to the smallest bucket fitting its real counts instead of "
        "the extractor cap (defaults to config inference.buckets)",
    )
    parser.add_argument("--no_ransac", action="store_true")
    parser.add_argument("--output", default=None, help="save matches to .npz")
    parser.add_argument("--visualize", default=None, help="write a match image here")
    args = parser.parse_args(argv)

    matcher = initialize_matcher(
        args.experiment, args.checkpoint_step,
        match_threshold=args.match_threshold,
        buckets=tuple(args.buckets) if args.buckets else None,
    )
    result = run_inference(matcher, args.image0, args.image1, ransac=not args.no_ransac)
    print(f"{len(result['keypoints0'])} matches")
    if args.output:
        np.savez(
            args.output,
            keypoints0=result["keypoints0"],
            keypoints1=result["keypoints1"],
            confidence=result["confidence"],
        )
        print(f"saved to {args.output}")
    if args.visualize:
        import cv2

        from openglue_tpu.data.io import aspect_preserving_resize
        from openglue_tpu.visualization import draw_matches

        img0 = aspect_preserving_resize(
            cv2.cvtColor(cv2.imread(str(args.image0)), cv2.COLOR_BGR2GRAY),
            matcher.target_size,
        )
        img1 = aspect_preserving_resize(
            cv2.cvtColor(cv2.imread(str(args.image1)), cv2.COLOR_BGR2GRAY),
            matcher.target_size,
        )
        draw_matches(
            img0, img1,
            result["keypoints0"], result["keypoints1"], result["confidence"],
            lafs0=result["lafs0"], lafs1=result["lafs1"],
            output_path=args.visualize,
        )
        print(f"visualization saved to {args.visualize}")


if __name__ == "__main__":
    main()
