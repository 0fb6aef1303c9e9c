from openglue_tpu.features.lafs import (
    LAFConverter,
    get_laf_to_sideinfo_converter,
    laf_center,
    laf_scale,
)
from openglue_tpu.features.prepare import prepare_features_output

__all__ = [
    "LAFConverter",
    "get_laf_to_sideinfo_converter",
    "laf_center",
    "laf_scale",
    "prepare_features_output",
]
