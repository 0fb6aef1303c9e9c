from openglue_tpu.compat.torch_weights import superglue_params_from_torch

__all__ = ["superglue_params_from_torch"]
