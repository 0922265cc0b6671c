"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise real multi-device code paths without TPU hardware.

Note: this environment's sitecustomize force-registers the axon TPU PJRT
plugin and overrides ``JAX_PLATFORMS``; the programmatic config update below
is what actually pins tests to CPU (verified: ``jax.default_backend()``
stays 'tpu' with the env var alone).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
