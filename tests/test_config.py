"""Config defaults (paule_tpu/config.py)."""

import jax

import paule_tpu.config as config


def test_matmul_precision_defaults_to_full_f32():
    # The package default is full-precision MXU matmuls — this is what
    # makes TPU planning losses match the reference's f64 loop to ~0.04%
    # (docs/measurements/dtype_attribution_r04.json).  The conftest does
    # not override PAULE_TPU_MATMUL_PRECISION, so the import-time default
    # must be live in the jax config.
    assert jax.config.jax_default_matmul_precision == "float32"


def test_x64_parity_mode_active_in_tests():
    # conftest sets PAULE_TPU_X64=1: the suite runs the f64 parity mode
    assert config.x64_enabled()
    assert config.DTYPE.__name__ == "float64"
    assert config.HOST_DTYPE == "float64"
