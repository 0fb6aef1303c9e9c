"""Profiling utility tests (CPU): device_timeit returns sane positive
per-call times and rejects output-free functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglue_tpu.profiling import device_timeit, trace


def test_device_timeit_positive_and_scales():
    x = jnp.ones((256, 256))
    t_small = device_timeit(lambda a: a @ a, x)
    assert t_small > 0

    big = jnp.ones((1024, 1024))
    t_big = device_timeit(lambda a: a @ a, big)
    assert t_big > t_small  # 64x the FLOPs must not be faster


def test_device_timeit_integer_outputs_anchor():
    x = jnp.ones((64, 64))
    t = device_timeit(lambda a: jnp.argmax(a @ a, axis=1), x)
    assert t > 0


def test_device_timeit_rejects_no_outputs():
    with pytest.raises(ValueError, match="no numeric outputs"):
        device_timeit(lambda a: (), jnp.ones((8, 8)))


def test_trace_writes_profile(tmp_path):
    with trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones((32, 32)) @ jnp.ones((32, 32)))
    # a plugins/profile directory appears
    produced = list(tmp_path.rglob("*"))
    assert produced, "profiler trace produced no files"
