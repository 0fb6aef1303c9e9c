from openglue_tpu.geometry.transforms import (
    normalize_with_intrinsics,
    pairwise_cosine_dist,
    perspective_transform,
    reproject_3d,
    reproject_keypoints,
)
from openglue_tpu.geometry.gt_matches import (
    IGNORE_INDEX,
    UNMATCHED_INDEX,
    generate_gt_matches,
)

__all__ = [
    "normalize_with_intrinsics",
    "pairwise_cosine_dist",
    "perspective_transform",
    "reproject_3d",
    "reproject_keypoints",
    "generate_gt_matches",
    "UNMATCHED_INDEX",
    "IGNORE_INDEX",
]
