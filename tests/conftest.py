"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding/parallelism tests need multiple devices; parity tests need exact f32
matmuls — both point at the CPU backend (SURVEY.md §4: multi-host tests
runnable on CPU via a forced host-platform device count). jax may already be
imported by pytest plugins (jaxtyping), so use jax.config.update, which works
any time before backend initialization, in addition to the env vars.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# jax 0.9 DEFAULT matmul precision is bf16-class even on CPU; parity tests
# need exact f32 contractions.
jax.config.update("jax_default_matmul_precision", "highest")
