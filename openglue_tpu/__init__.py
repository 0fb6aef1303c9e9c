"""openglue_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for SuperGlue-style
sparse keypoint-graph matching.

A ground-up redesign of the capabilities of ucuapps/OpenGlue (reference:
/root/reference) for TPU hardware:

* static shapes everywhere — keypoint sets are padded to a fixed size and carry
  validity masks instead of ragged min-stacking;
* channels-last ``[B, N, D]`` tensor layout (the reference uses conv1d-style
  ``[B, D, N]``) so matmuls map directly onto the MXU;
* the attentional GNN, Sinkhorn OT head and positional encoder are pure JAX with
  optional fused Pallas kernels for the hot paths;
* scaling is expressed through ``jax.sharding.Mesh`` + ``shard_map``/pjit —
  data-parallel pair batching plus keypoint-axis context parallelism — instead
  of torch DDP/NCCL.

Layer map mirrors SURVEY.md §1: cli/ (L0), train/ (L1), models/ (L2),
features/ (L3), geometry/ + losses (L4), data/ (L5), core.config (L6).
"""

__version__ = "0.1.0"

# Public API (lazy — importing the package stays light; jax is only pulled in
# when a symbol is touched).
_PUBLIC = {
    "SuperGlue": "openglue_tpu.models.superglue",
    "SuperGlueConfig": "openglue_tpu.models.superglue",
    "MatchingModule": "openglue_tpu.models.matching_module",
    "MatchingModuleConfig": "openglue_tpu.models.matching_module",
    "decode_matches": "openglue_tpu.models.matching",
    "KeypointSet": "openglue_tpu.core.types",
    "PairBatch": "openglue_tpu.core.types",
    "Transformation": "openglue_tpu.core.types",
    "Features": "openglue_tpu.core.types",
    "generate_gt_matches": "openglue_tpu.geometry.gt_matches",
    "criterion": "openglue_tpu.losses",
    "get_feature_extractor": "openglue_tpu.features.registry",
    "get_laf_to_sideinfo_converter": "openglue_tpu.features.lafs",
}


def __getattr__(name):
    if name in _PUBLIC:
        import importlib

        module = importlib.import_module(_PUBLIC[name])
        return getattr(module, name)
    raise AttributeError(f"module 'openglue_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_PUBLIC))
