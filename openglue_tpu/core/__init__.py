from openglue_tpu.core.config import Config, load_config, merge_configs
from openglue_tpu.core.types import KeypointSet, PairBatch

__all__ = ["Config", "load_config", "merge_configs", "KeypointSet", "PairBatch"]
