"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the standard JAX pattern for
validating sharding/collectives without a TPU pod) and with x64 enabled so
that oracle comparisons against scipy are tight. The framework itself is
dtype-polymorphic; TPU runs use f32/bf16.

Note: the environment's sitecustomize imports jax and registers the TPU
("axon") backend before conftest runs, so env vars alone are too late —
but backend *initialization* is lazy, so `jax.config.update` still wins.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
