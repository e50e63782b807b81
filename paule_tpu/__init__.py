"""paule_tpu — a TPU-native framework with the capabilities of
quantling/paule: gradient-based planning of vocal-tract control-parameter
trajectories for an articulatory speech synthesizer.

Layer map (TPU-first redesign of the reference architecture, SURVEY.md §7):

* :mod:`paule_tpu.synth` — from-scratch C++ articulatory synthesizer
  (geometric tract -> area function -> Kelly-Lochbaum waveguide) behind a
  ctypes bridge; replaces the prebuilt VocalTractLab binary.
* :mod:`paule_tpu.dsp` — jitted log-mel feature pipeline, Griffin-Lim mel
  inversion, resampling, audio IO.
* :mod:`paule_tpu.ops` — normalization tables, stencil derivatives, losses,
  fused LSTM scan, padding/batching.
* :mod:`paule_tpu.models` — the model zoo (forward/inverse/embedder,
  baselines, GANs, classifiers) as JAX modules.
* :mod:`paule_tpu.planning` — the planning engine: the inner loop compiles
  to a single jitted ``lax.scan`` with an optax Adam on the trajectory;
  synthesis/logging runs on the host at ``log_ii`` cadence.
* :mod:`paule_tpu.parallel` — mesh helpers and multi-utterance data-parallel
  planning via ``jax.sharding``.
* :mod:`paule_tpu.api` — the :class:`~paule_tpu.api.Paule` facade with the
  reference's keyword surface.
"""

import multiprocessing as mp
import platform
import sys

__version__ = "0.1.0"

from . import config  # noqa: E402,F401  (applies PAULE_TPU_X64 before any jax use)


def sysinfo():
    """Print system and dependency information (reference
    /root/reference/paule/__init__.py:41-85)."""
    import jax

    header = "paule_tpu Information\n=====================\n\n"
    general = (
        "General Information\n-------------------\n"
        f"Python version: {sys.version.split()[0]}\n"
        f"paule_tpu version: {__version__}\n\n"
    )
    uname = platform.uname()
    osinfo = (
        "Operating System\n----------------\n"
        f"OS: {uname.system} {uname.machine}\n"
        f"Kernel: {uname.release}\n"
        f"CPU: {mp.cpu_count()}\n\n"
    )
    deps = "Dependencies\n------------\n"
    for name in ("jax", "flax", "optax", "numpy", "scipy"):
        try:
            mod = __import__(name)
            deps += f"{name}: {getattr(mod, '__version__', '?')}\n"
        except ImportError:
            deps += f"{name}: <not installed>\n"
    deps += f"jax backend: {jax.default_backend()}\n"
    deps += f"jax devices: {jax.devices()}\n"
    print(header + general + osinfo + deps)
