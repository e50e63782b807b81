"""Test configuration: force a virtual 8-device CPU platform so sharding
tests run without TPU hardware, and jit-compiled tests stay fast."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if axon/TPU is present
# run the test suite in float64 parity mode (CPU); TPU deployments use f32
os.environ.setdefault("PAULE_TPU_X64", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
