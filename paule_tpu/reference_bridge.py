"""Run the upstream PyTorch reference (quantling/paule) in this
environment, for benchmarking paule_tpu against the reference's *actual*
code rather than a reimplementation.

The reference needs three packages this environment lacks — librosa,
soundfile, tqdm's heavy optional deps are fine — so :func:`install_shims`
registers minimal, numerically faithful stand-ins in ``sys.modules``
*before* the reference package is imported:

* ``librosa.resample`` → :mod:`paule_tpu.dsp.resample` (exact resampy
  kaiser_best, pinned to 1e-12 against a scalar transcription of the
  published algorithm — see ``tests/golden/``)
* ``librosa.feature.melspectrogram`` / ``librosa.amplitude_to_db`` →
  ``transformers.audio_utils`` (HuggingFace's numpy port of librosa's
  STFT/mel/dB pipeline, pinned to ≤1e-6 dB in ``tests/test_dsp_golden.py``)
* ``librosa.db_to_amplitude`` → the closed form ``ref * 10^(db/20)``
* ``librosa.feature.inverse.mel_to_audio`` → our Griffin-Lim
  (:mod:`paule_tpu.dsp.griffinlim`) — only exercised on the semvec-only
  planning path
* ``soundfile`` → raise on use (benchmarks pass ``(signal, sr)`` tuples)

Everything else the reference needs is real: its own torch models
(``paule.models``), its own planning loop (``paule.paule.plan_resynth``,
/root/reference/paule/paule.py:391), and its own **native VocalTractLab
synthesizer** (the vendored ``libVocalTractLabApi.so``, loaded by
``paule.util`` at import time).
"""

import os
import sys
import types

import numpy as np

# the one source of truth for the mel front-end contract — the shim MUST
# compute on exactly the pipeline the golden tests pin
from .dsp.mel import FMAX, FMIN, HOP, N_FFT, N_MELS, SR


def _make_librosa_module():
    from transformers import audio_utils

    from .dsp.resample import resample as _kaiser_best_resample

    window = audio_utils.window_function(N_FFT, "hann", periodic=True)
    mel_filters = audio_utils.mel_filter_bank(
        num_frequency_bins=1 + N_FFT // 2, num_mel_filters=N_MELS,
        min_frequency=FMIN, max_frequency=FMAX, sampling_rate=SR,
        norm="slaney", mel_scale="slaney")

    librosa = types.ModuleType("librosa")
    feature = types.ModuleType("librosa.feature")
    inverse = types.ModuleType("librosa.feature.inverse")
    display = types.ModuleType("librosa.display")

    def resample(y, *, orig_sr, target_sr, res_type="kaiser_best",
                 fix=True, scale=False, **_):
        if res_type != "kaiser_best" or not fix or scale:
            raise NotImplementedError(
                "shim supports res_type='kaiser_best', fix=True, scale=False"
                " (the reference's only usage, paule/util.py:116)")
        return _kaiser_best_resample(np.asarray(y, np.float64),
                                     orig_sr, target_sr)

    def melspectrogram(*, y, sr, n_fft, hop_length, n_mels, power,
                       fmin, fmax, **_):
        assert (sr, n_fft, hop_length, n_mels, power, fmin, fmax) == \
            (SR, N_FFT, HOP, N_MELS, 1.0, FMIN, FMAX), "shim is fixed-config"
        return audio_utils.spectrogram(
            np.asarray(y, np.float64), window=window, frame_length=N_FFT,
            hop_length=HOP, power=1.0, center=True, pad_mode="constant",
            mel_filters=mel_filters, mel_floor=0.0)

    def amplitude_to_db(S, ref=1.0, amin=1e-5, top_db=80.0):
        return audio_utils.amplitude_to_db(
            np.asarray(S, np.float64), reference=float(ref),
            min_value=float(amin), db_range=float(top_db))

    def db_to_amplitude(S_db, ref=1.0):
        return float(ref) * np.power(10.0, np.asarray(S_db, np.float64) / 20.0)

    def mel_to_audio(M, *, sr, n_fft, hop_length, win_length=None,
                     power=1.0, fmin=0.0, fmax=None, **_):
        from .dsp.griffinlim import mel_to_audio_44100
        return np.asarray(mel_to_audio_44100(np.asarray(M, np.float64).T))

    def specshow(*_a, **_k):
        raise NotImplementedError("librosa.display shim: plotting only")

    librosa.resample = resample
    librosa.amplitude_to_db = amplitude_to_db
    librosa.db_to_amplitude = db_to_amplitude
    feature.melspectrogram = melspectrogram
    inverse.mel_to_audio = mel_to_audio
    feature.inverse = inverse
    librosa.feature = feature
    display.specshow = specshow
    librosa.display = display
    librosa.__version__ = "0.0-paule_tpu-shim"
    return librosa, feature, inverse, display


def _make_soundfile_module():
    sf = types.ModuleType("soundfile")

    def _unavailable(*_a, **_k):
        raise NotImplementedError(
            "soundfile shim: pass (signal, sr) tuples instead of paths")

    sf.read = _unavailable
    sf.write = _unavailable
    return sf


def _missing(name):
    """True when ``name`` is neither imported nor installed — only then may
    the shim register (never shadow a real installation, even one not yet
    imported)."""
    import importlib.util

    if name in sys.modules:
        return False
    try:
        return importlib.util.find_spec(name) is None
    except (ImportError, ValueError):
        return True


def install_shims():
    """Register librosa/soundfile shims in ``sys.modules`` (idempotent;
    refuses to shadow a real installation, imported or not)."""
    if _missing("librosa"):
        librosa, feature, inverse, display = _make_librosa_module()
        sys.modules["librosa"] = librosa
        sys.modules["librosa.feature"] = feature
        sys.modules["librosa.feature.inverse"] = inverse
        sys.modules["librosa.display"] = display
    if _missing("soundfile"):
        sys.modules["soundfile"] = _make_soundfile_module()
    if "toml" not in sys.modules:
        # the reference's __init__ reads its version from pyproject.toml via
        # `toml` when not pip-installed; tomllib (stdlib) is equivalent here
        import tomllib

        toml = types.ModuleType("toml")

        def _load(path):
            with open(path, "rb") as fh:
                return tomllib.load(fh)

        toml.load = _load
        sys.modules["toml"] = toml


def import_reference(reference_root="/root/reference"):
    """Import the upstream ``paule`` package (with shims installed) and
    return it.  ``reference_root`` is the checkout containing ``paule/``."""
    if not os.path.isdir(os.path.join(reference_root, "paule")):
        raise FileNotFoundError(
            f"no reference checkout at {reference_root}")
    install_shims()
    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)
    import paule.paule  # noqa: F401  (loads VTL at import time)
    import paule.models  # noqa: F401
    return sys.modules["paule"]


def reference_hidden():
    """True when ``PAULE_TPU_HIDE_REFERENCE=1``: every reference-checkout
    feature reports unavailable, exercising the standalone install path
    (the package must degrade cleanly when no upstream checkout exists)."""
    return os.environ.get("PAULE_TPU_HIDE_REFERENCE", "0") == "1"


def reference_available(reference_root="/root/reference"):
    if reference_hidden():
        return False
    return os.path.isdir(os.path.join(reference_root, "paule"))
