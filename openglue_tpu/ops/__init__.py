from openglue_tpu.ops.attention import (
    favor_features_relu,
    favor_features_softmax,
    linear_attention,
    linear_attention_elu,
    sample_orthogonal_random_matrix,
    softmax_attention,
)
from openglue_tpu.ops.sinkhorn import log_optimal_transport, log_sinkhorn

__all__ = [
    "softmax_attention",
    "linear_attention",
    "linear_attention_elu",
    "favor_features_relu",
    "favor_features_softmax",
    "sample_orthogonal_random_matrix",
    "log_sinkhorn",
    "log_optimal_transport",
]
