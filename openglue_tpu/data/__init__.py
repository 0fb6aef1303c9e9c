from openglue_tpu.data.synthetic import SyntheticHomographyPairs, random_pair_batch

__all__ = ["SyntheticHomographyPairs", "random_pair_batch"]
