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

import pytest  # noqa: E402

# Standalone-install mode (PAULE_TPU_HIDE_REFERENCE=1): every reference-
# gated test skips via reference_available()/vtl_available(), and an audit
# hook turns any un-gated READ of the reference tree into a hard error —
# proving the package runs green without an upstream checkout
# (docs/quickstart.md "Standalone installs").
if os.environ.get("PAULE_TPU_HIDE_REFERENCE", "0") == "1":
    import sys

    def _block_reference(event, args):
        if event in ("open", "ctypes.dlopen") and args:
            path = os.fspath(args[0]) if isinstance(
                args[0], (str, bytes, os.PathLike)) else ""
            if isinstance(path, bytes):
                path = path.decode(errors="replace")
            if path.startswith("/root/reference"):
                raise RuntimeError(
                    f"standalone mode: blocked {event} of {path!r}")

    sys.addaudithook(_block_reference)

# Two-tier suite (docs/development.md): these modules are end-to-end
# planning/training tests (plan_resynth budgets, GAN training, dp meshes,
# serve stack) and are auto-marked `slow`; the remaining modules are the
# fast unit tier (`pytest -m "not slow"` < 60 s).  Individually slow tests
# inside fast modules carry an explicit @pytest.mark.slow.
_SLOW_MODULES = {
    "test_api", "test_spectral", "test_pretrain", "test_parallel",
    "test_checkpoint", "test_experiments", "test_serve",
    "test_reference_bridge",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
