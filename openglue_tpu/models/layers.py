"""Building-block layers.

The reference builds everything from ``nn.Conv1d(k=1)`` stacks over ``[B, D, N]``
tensors (reference models/utils.py:6-58). A 1x1 conv over the keypoint axis is
just a per-keypoint dense layer, so here everything is ``nn.Dense`` over
channels-last ``[B, N, D]`` — the layout XLA tiles straight onto the MXU.

``MaskedBatchNorm`` reproduces torch ``BatchNorm1d`` semantics (normalize with
biased batch variance, update running stats with unbiased variance, momentum
0.1) and additionally supports a keypoint validity mask so padded positions do
not pollute the statistics. With ``mask=None`` and fully-valid inputs it is
bit-comparable to the reference.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all axes but the last, with torch semantics and masking.

    Mirrors torch.nn.BatchNorm1d applied to ``[B, C, N]`` in the reference
    (models/utils.py:55): statistics are computed per-channel over batch AND
    keypoint axes.
    """

    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if train:
            x32 = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                count = math.prod(x.shape[:-1])
                mean = jnp.mean(x32, axis=reduce_axes)
                var = jnp.mean(jnp.square(x32 - mean), axis=reduce_axes)
                count = jnp.asarray(count, jnp.float32)
            else:
                m = mask.astype(jnp.float32)[..., None]
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x32 * m, axis=reduce_axes) / count
                var = jnp.sum(jnp.square(x32 - mean) * m, axis=reduce_axes) / count

            if not self.is_initializing():
                # torch updates running var with the unbiased estimator.
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


def torch_dense(
    features: int,
    in_features: int,
    dtype: Optional[jnp.dtype] = None,
    name: Optional[str] = None,
) -> nn.Dense:
    """``nn.Dense`` with torch's ``Conv1d``/``Linear`` default initialization.

    torch's reset_parameters is kaiming_uniform(a=√5) on the weight and
    U(−1/√fan_in, 1/√fan_in) on the bias — both reduce to the same
    U(−1/√fan_in, 1/√fan_in). The flax default (lecun_normal kernel, zero
    bias) has 3× the weight variance; compounding over the 9-stage GNN's 18
    residual layers that makes init activations ~40× hotter than the
    reference's (torch context-descriptor rms 0.05 at init vs 2.6 with flax
    defaults) and training from scratch stalls on the uniform-assignment
    saddle. Training parity requires the torch init (reference layers are all
    Conv1d(k=1): models/utils.py:48-58, attention_gnn.py:16-20,
    superglue.py:22)."""
    bound = in_features**-0.5

    def uniform_init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return nn.Dense(
        features, kernel_init=uniform_init, bias_init=uniform_init,
        dtype=dtype, name=name,
    )


class FeedForwardNet(nn.Module):
    """[Dense -> ReLU -> BatchNorm] x k -> Dense (reference models/utils.py:48-58).

    ``sizes`` lists hidden sizes then the output size, mirroring the reference's
    ``FeedForwardNet(in, *hidden, out)`` (input size is inferred from x).
    """

    sizes: Sequence[int]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        skip_to_hidden: bool = False,
    ) -> jnp.ndarray:
        """``skip_to_hidden``: ``x`` is already the first hidden layer's
        post-ReLU activation (computed by a fused kernel, e.g.
        ops.pallas.gnn_layer_kernel.fused_train_layer_half) — start at bn_0.
        dense_0's params still exist in the tree (created at init by the
        composed path); they are consumed by the kernel, not here."""
        *hidden, out = self.sizes
        fan_in = x.shape[-1]
        for i, size in enumerate(hidden):
            if not (skip_to_hidden and i == 0):
                x = torch_dense(size, fan_in, dtype=self.dtype, name=f"dense_{i}")(x)
                x = jax.nn.relu(x)
            x = MaskedBatchNorm(dtype=self.dtype, name=f"bn_{i}")(x, mask=mask, train=train)
            fan_in = size
        return torch_dense(out, fan_in, dtype=self.dtype, name=f"dense_{len(hidden)}")(x)


def _siren_first_layer_init(key, shape, dtype=jnp.float32):
    # flax Dense kernels are [in, out]; torch uniform_(-1/in, 1/in).
    fan_in = shape[0]
    return jax.random.uniform(key, shape, dtype, -1.0 / fan_in, 1.0 / fan_in)


def _siren_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = math.sqrt(6.0 / fan_in) / 30.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class FeedForwardNetSiren(nn.Module):
    """[Dense -> sin(30x)] x k -> Dense with SIREN init (reference models/utils.py:23-45).

    Note: the reference applies ``sine_init`` to every layer and then
    ``first_layer_sine_init`` on top for layer 0 — it also initializes the
    final dense with sine_init. We reproduce that: all layers sine_init except
    layer 0, which uses the first-layer rule. The reference's init acts only on
    weights (``hasattr(m,'weight')``); biases keep the torch conv1d default —
    we use zeros for biases (documented deviation; bias init does not affect
    the parity tests which load converted torch weights).
    """

    sizes: Sequence[int]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        *hidden, out = self.sizes
        for i, size in enumerate(hidden):
            init = _siren_first_layer_init if i == 0 else _siren_init
            x = nn.Dense(size, kernel_init=init, dtype=self.dtype, name=f"dense_{i}")(x)
            x = jnp.sin(30.0 * x)
        final_init = _siren_init if hidden else _siren_first_layer_init
        return nn.Dense(out, kernel_init=final_init, dtype=self.dtype, name=f"dense_{len(hidden)}")(x)


ENCODERS = {
    "FeedForwardNet": FeedForwardNet,
    "FeedForwardNetSiren": FeedForwardNetSiren,
}
