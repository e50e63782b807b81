"""Compatibility facade mirroring the reference's ``paule.util`` module
surface (/root/reference/paule/util.py) so code written against the
reference ports by changing one import.

Everything here is a re-export from the structured modules; new code should
import from :mod:`paule_tpu.dsp`, :mod:`paule_tpu.ops` and
:mod:`paule_tpu.synth` directly.
"""

import io
import os
import shutil
import zipfile

import numpy as np
import jax.numpy as jnp

# --- normalization tables + functions ------------------------------------
from .ops.normalize import (  # noqa: F401
    cp_means, cp_stds, cp_theoretical_means, cp_theoretical_stds,
    tube_mins, tube_maxs, tube_theoretical_means, tube_theoretical_stds,
    mel_mean, mel_std, mel_mean_librosa, mel_std_librosa,
    normalize_cp, inv_normalize_cp, normalize_tube, inv_normalize_tube,
    normalize_mel, inv_normalize_mel,
    normalize_mel_librosa, inv_normalize_mel_librosa,
)

# --- DSP -------------------------------------------------------------------
from .dsp.mel import librosa_melspec  # noqa: F401
from .dsp.griffinlim import mel_to_sig  # noqa: F401
from .dsp.audio import stereo_to_mono  # noqa: F401

# --- padding / batching ------------------------------------------------------
from .ops.padding import (  # noqa: F401
    add_and_pad, audio_padding, half_seq_by_average_pooling, pad_batch,
    pad_batch_online, pad_same_to_even_seq_length,
)

# --- synthesizer -------------------------------------------------------------
from .synth import (  # noqa: F401
    ARTICULATOR, cps_to_ema, cps_to_ema_and_mesh, export_svgs,
    get_area_info_within_oral_cavity, ges_to_cps, read_cp, seg_to_cps,
    speak, speak_and_extract_tube_information,
)

# --- plotting ---------------------------------------------------------------
from .visualize import plot_cp, plot_mel  # noqa: F401

# --- losses / derivatives ----------------------------------------------------
from .ops.losses import (  # noqa: F401
    cp_trajectory_loss, velocity_jerk_loss,
)


class RMSELoss:
    """sqrt(MSE + eps), callable like the reference's torch module
    (/root/reference/paule/util.py:564-574)."""

    def __init__(self, eps=1e-6):
        self.eps = eps

    def __call__(self, y_hat, y):
        import jax.numpy as jnp

        return jnp.sqrt(jnp.mean((jnp.asarray(y_hat) - jnp.asarray(y)) ** 2)
                        + self.eps)


rmse_loss = RMSELoss(eps=0)

# tube-feature bounds (reference /root/reference/paule/util.py:92-105)
from .ops.normalize import (  # noqa: F401,E402
    MIN_AREA as min_area, MAX_AREA as max_area,
    MIN_LENGTH as min_length, MAX_LENGTH as max_length,
    MIN_INCISOR as min_incisor, MAX_INCISOR as max_incisor,
    MIN_TONGUE as min_tongue, MAX_TONGUE as max_tongue,
    MIN_VELUM as min_velum, MAX_VELUM as max_velum,
)
from .ops.derivatives import (  # noqa: F401
    five_point_stencil as calculate_five_point_stencil_without_padding,
    local_linear, vel_acc_jerk as get_vel_acc_jerk,
)


def numeric_derivative(xx, *, delta_t=1.0):
    return calculate_five_point_stencil_without_padding(xx, delta_t=delta_t)


def array_to_tensor(array):
    """Add a leading batch dim and return a jnp array (the reference returns
    a torch tensor, /root/reference/paule/util.py:300-315)."""
    return jnp.asarray(np.asarray(array))[None]


DIR = os.path.dirname(__file__)

#: where converted pretrained weights live
PRETRAINED_DIR = os.path.join(DIR, "pretrained_models")

#: the reference's pretrained-weights distribution (torch state_dicts)
REFERENCE_WEIGHTS_URL = (
    "https://nc.mlcloud.uni-tuebingen.de/index.php/s/N4nik8wgxwQHP83/download")


def download_pretrained_weights(*, skip_if_exists=True, verbose=True,
                                url=REFERENCE_WEIGHTS_URL):
    """Download the reference's ~200 MB pretrained torch weights and unpack
    them under ``paule_tpu/pretrained_models`` for conversion by
    ``Paule(pretrained_dir=...)``.

    In offline environments this explains itself instead of failing hard.
    """
    if os.path.isdir(PRETRAINED_DIR):
        if skip_if_exists:
            if verbose:
                print(f"pretrained_models exist already. Skip download. "
                      f"Path is {PRETRAINED_DIR}")
                print(f'Version of pretrained weights is '
                      f'"{get_pretrained_weights_version()}"')
            return PRETRAINED_DIR
        shutil.rmtree(PRETRAINED_DIR)

    try:
        from urllib.request import urlopen

        if verbose:
            print(f"downloading ~200 MB of pretrained weights from {url}")
        with urlopen(url, timeout=60) as resp:
            payload = resp.read()
        zip_file = zipfile.ZipFile(io.BytesIO(payload))
        zip_file.extractall(DIR)
        if verbose:
            print(f'Version of pretrained weights is '
                  f'"{get_pretrained_weights_version()}"')
        return PRETRAINED_DIR
    except Exception as exc:  # noqa: BLE001
        print(f"could not download pretrained weights ({exc}); "
              f"running with randomly initialized models. Place the "
              f"reference's pretrained_models/ directory at "
              f"{PRETRAINED_DIR} to enable conversion.")
        return None


def get_pretrained_weights_version():
    version_path = os.path.join(PRETRAINED_DIR, "version.txt")
    if not os.path.exists(version_path):
        return f"<No version file found at {version_path}>"
    with open(version_path, "rt") as vfile:
        return vfile.read().strip()


# --- reference module-level artifacts (lazy; the reference initializes its
# --- native library at import time, /root/reference/paule/util.py:17-41)
SPEAKER_FILE_NAME = os.path.join(DIR, "synth", "speaker", "default.speaker")
FAILURE = 0  # init error code of the default instance (0 = success)


def __getattr__(name):
    if name == "VTL":
        from . import synth as _synth

        return _synth._default()
    if name == "VERSION":
        from . import synth as _synth

        return _synth.version()
    raise AttributeError(name)
