"""Global configuration for paule_tpu.

The reference implementation (quantling/paule) runs everything in float64
(``.double()`` calls throughout ``paule/paule.py``).  float64 is emulated and
slow on TPU, so the TPU-native default is float32 on device; float64 remains
available for CPU parity testing by setting the environment variable
``PAULE_TPU_X64=1`` *before* importing :mod:`paule_tpu` (this flips JAX's
global x64 switch).

Parity with the reference is established at matched loss values, not matched
dtype (see SURVEY.md §7 "Hard parts" item 4).
"""

import os

import jax
import jax.numpy as jnp

_X64 = os.environ.get("PAULE_TPU_X64", "0") == "1"
if _X64:
    jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: planning programs (25-step scans over
# LSTMs) take tens of seconds to compile; caching them on disk makes every
# process after the first start hot.  Opt out with PAULE_TPU_NO_CACHE=1.
# The directory is suffixed with a host-CPU fingerprint: XLA:CPU caches AOT
# machine code and loading an artifact compiled for different CPU features
# can SIGILL (observed as loader warnings when a cache moves between hosts).


def _cpu_fingerprint() -> str:
    # single source of truth: synth/build.py's _cpu_tag (loaded by file path
    # to avoid a circular import through the synth package init)
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), "synth", "build.py")
    spec = importlib.util.spec_from_file_location("_paule_tpu_synth_build",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._cpu_tag()


if os.environ.get("PAULE_TPU_NO_CACHE", "0") != "1":
    _cache_dir = os.environ.get(
        "PAULE_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     f"paule_tpu_xla_{_cpu_fingerprint()}"))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

# Matmul precision on the MXU.  XLA:TPU's default matmul multiplies
# bf16-rounded inputs with f32 accumulation;
# docs/measurements/dtype_attribution_r04.json attributes the headline
# bench's entire ~0.5% loss offset vs the reference to exactly this (our
# XLA:CPU legs match the reference's executed loop to 0.05% in both f32 and
# f64, and a full-precision TPU leg collapses to -0.04%).  The reference
# plans in torch float64, so paule_tpu defaults to full-precision f32
# matmuls ("float32" = multi-pass on the MXU): planning is
# recurrence-latency-bound (docs/performance.md roofline), so the extra MXU
# passes cost ~5-10% wall while tightening loss parity ~10x.  Set
# PAULE_TPU_MATMUL_PRECISION=default (or bfloat16/high) for
# throughput-first work where the bf16-input path is acceptable.
_MATMUL_PRECISION = os.environ.get("PAULE_TPU_MATMUL_PRECISION", "float32")
if _MATMUL_PRECISION and _MATMUL_PRECISION != "default":
    jax.config.update("jax_default_matmul_precision", _MATMUL_PRECISION)

#: dtype used for on-device compute (models, planning, DSP).
DTYPE = jnp.float64 if _X64 else jnp.float32

#: dtype used for host-side numpy buffers exchanged with the C++ synthesizer.
#: The synthesizer C ABI is float64, like the reference's VTL ABI.
HOST_DTYPE = "float64"


def x64_enabled() -> bool:
    return _X64
