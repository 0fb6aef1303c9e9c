from openglue_tpu.models.superglue import SuperGlue, SuperGlueConfig

__all__ = ["SuperGlue", "SuperGlueConfig"]
