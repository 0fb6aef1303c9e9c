"""MLP positional encoding of keypoint coordinates + geometric side info
(reference models/superglue/positional_encoding.py:7-19)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from openglue_tpu.models.layers import ENCODERS


class MLPPositionalEncoding(nn.Module):
    """Encode concat[xy, side_info] -> descriptor_dim with an MLP.

    output_size: descriptor dimension.
    hidden_layers_sizes: e.g. (32, 64, 128) (reference config/config.yaml:45).
    encoder_name: 'FeedForwardNet' (conv-relu-batchnorm) or 'FeedForwardNetSiren'.
    """

    output_size: int
    hidden_layers_sizes: Sequence[int] = ()
    encoder_name: str = "FeedForwardNet"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        kpts: jnp.ndarray,
        side_info: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if self.encoder_name not in ENCODERS:
            raise NameError(
                f"{self.encoder_name} was not found among positional encoders. "
                f"Choose one of: {', '.join(ENCODERS)}"
            )
        x = jnp.concatenate([kpts, side_info], axis=-1)
        encoder = ENCODERS[self.encoder_name](
            (*self.hidden_layers_sizes, self.output_size), dtype=self.dtype, name="encoder"
        )
        return encoder(x, mask=mask, train=train)
