"""Test configuration: force a virtual 8-device CPU platform so sharding
tests run without TPU hardware.

Note: this environment pre-imports jax via sitecustomize and pins the
platform list, so setting JAX_PLATFORMS in the environment is not enough —
we update the live jax config before any backend is initialized."""

import os

# must be set before the CPU backend initializes (backends init lazily)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# run the test suite in float64 parity mode (CPU); TPU deployments use f32
os.environ.setdefault("PAULE_TPU_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
