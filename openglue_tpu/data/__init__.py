from openglue_tpu.data.collate import stack_keypoints_batch
from openglue_tpu.data.homography import HomographyPairsDataset
from openglue_tpu.data.loader import DataLoader
from openglue_tpu.data.megadepth import (
    MegaDepthPairsDataset,
    MegaDepthPairsDatasetFeatures,
    MegaDepthPairsIndex,
    parse_pairs_line,
)
from openglue_tpu.data.sampler import BalancedSceneSampler, ShardedSequentialSampler
from openglue_tpu.data.synthetic import SyntheticHomographyPairs, random_pair_batch

__all__ = [
    "stack_keypoints_batch",
    "HomographyPairsDataset",
    "DataLoader",
    "MegaDepthPairsDataset",
    "MegaDepthPairsDatasetFeatures",
    "MegaDepthPairsIndex",
    "parse_pairs_line",
    "BalancedSceneSampler",
    "ShardedSequentialSampler",
    "SyntheticHomographyPairs",
    "random_pair_batch",
]
