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

#: dtype used for on-device compute (models, planning, DSP).
DTYPE = jnp.float64 if _X64 else jnp.float32

#: dtype used for host-side numpy buffers exchanged with the C++ synthesizer.
#: The synthesizer C ABI is float64, like the reference's VTL ABI.
HOST_DTYPE = "float64"


def x64_enabled() -> bool:
    return _X64
