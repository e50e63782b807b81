"""Generate golden DSP parity fixtures for ``tests/test_dsp_golden.py``.

Two independent oracles pin ``paule_tpu.dsp`` against the reference's
librosa front-end (/root/reference/paule/util.py:115-120):

* **Mel pipeline** — ``transformers.audio_utils`` (spectrogram,
  mel_filter_bank, amplitude_to_db): HuggingFace's numpy port of librosa's
  STFT/mel/dB path, maintained and numerically verified against librosa
  upstream.  It shares no code with ``paule_tpu.dsp.mel``.
* **kaiser_best resampling** — a direct scalar transcription of resampy's
  published band-limited sinc interpolation (resampy ``core.py`` /
  ``interpn.py``, filter ``kaiser_best``: 64 zero crossings, precision 9,
  Kaiser beta 14.769656459379492, rolloff 0.9475937167399596), written as
  the plain per-output-sample double loop.  The production implementation
  (``paule_tpu.dsp.resample``) is an independent block-vectorized rewrite;
  matching outputs guard the vectorization.  Caveat: the transcription
  necessarily shares ONE floating-point expression with production — the
  output-sample time register (``t / ratio``) — the single expression
  resampy generations themselves disagree on.  That aspect is therefore
  pinned separately by measuring the spread across all three published
  register semantics
  (``tests/test_dsp_golden.py::test_time_register_ambiguity_band``).

Run from the repo root::

    python tests/golden/generate_golden.py

Deterministic: fixed seeds, no timestamps.  Output:
``tests/golden/dsp_golden.npz``.
"""

import os
import sys

import numpy as np
from scipy import special
from transformers import audio_utils

SR = 44100
N_FFT = 1024
HOP = 220
N_MELS = 60
FMIN = 10.0
FMAX = 12000.0


# ---------------------------------------------------------------------------
# Oracle 1: librosa-equivalent mel pipeline via transformers.audio_utils
# ---------------------------------------------------------------------------

def golden_melspec(wav):
    """``librosa.amplitude_to_db(melspectrogram(...), ref=0.15).T`` on a
    44.1 kHz signal, computed with transformers.audio_utils."""
    window = audio_utils.window_function(N_FFT, "hann", periodic=True)
    mel_filters = audio_utils.mel_filter_bank(
        num_frequency_bins=1 + N_FFT // 2,
        num_mel_filters=N_MELS,
        min_frequency=FMIN,
        max_frequency=FMAX,
        sampling_rate=SR,
        norm="slaney",
        mel_scale="slaney",
    )
    mel = audio_utils.spectrogram(
        np.asarray(wav, dtype=np.float64),
        window=window,
        frame_length=N_FFT,
        hop_length=HOP,
        power=1.0,
        center=True,
        pad_mode="constant",
        mel_filters=mel_filters,
        mel_floor=0.0,
    )  # (n_mels, frames)
    db = audio_utils.amplitude_to_db(
        mel, reference=0.15, min_value=1e-5, db_range=80.0)
    return np.asarray(db.T, dtype=np.float64, order="C")


# ---------------------------------------------------------------------------
# Oracle 2: scalar transcription of resampy's kaiser_best resampler
# ---------------------------------------------------------------------------

def _kaiser_best_half_window():
    num_bits = 512
    n = num_bits * 64
    rolloff = 0.9475937167399596
    beta = 14.769656459379492
    x = np.arange(n + 1, dtype=np.float64) / num_bits
    sinc_part = rolloff * np.sinc(rolloff * x)
    frac = np.arange(n + 1, dtype=np.float64) / n
    taper = special.i0(beta * np.sqrt(1.0 - frac ** 2)) / special.i0(beta)
    return sinc_part * taper


def golden_resample(x, sr_orig, sr_new):
    """librosa.resample(res_type='kaiser_best', fix=True, scale=False):
    resampy two-wing interpolation as the plain scalar loop, then
    fix_length to ceil(n*ratio)."""
    x = np.asarray(x, dtype=np.float64)
    ratio = float(sr_new) / float(sr_orig)
    n_orig = len(x)
    n_out = int(n_orig * ratio)

    interp_win = _kaiser_best_half_window()
    if ratio < 1.0:
        interp_win = ratio * interp_win
    interp_delta = np.zeros_like(interp_win)
    interp_delta[:-1] = np.diff(interp_win)

    num_table = 512
    scale = min(1.0, ratio)
    index_step = int(scale * num_table)
    nwin = len(interp_win)

    y = np.zeros(n_out, dtype=np.float64)
    for t in range(n_out):
        time_register = t / ratio
        n = int(time_register)
        # left wing
        frac = scale * (time_register - n)
        index_frac = frac * num_table
        offset = int(index_frac)
        eta = index_frac - offset
        i_max = min(n + 1, (nwin - offset) // index_step)
        acc = 0.0
        for i in range(i_max):
            j = offset + i * index_step
            acc += (interp_win[j] + eta * interp_delta[j]) * x[n - i]
        # right wing
        frac = scale - frac
        index_frac = frac * num_table
        offset = int(index_frac)
        eta = index_frac - offset
        k_max = min(n_orig - n - 1, (nwin - offset) // index_step)
        for k in range(k_max):
            j = offset + k * index_step
            acc += (interp_win[j] + eta * interp_delta[j]) * x[n + k + 1]
        y[t] = acc

    n_fixed = int(np.ceil(n_orig * ratio))
    if len(y) > n_fixed:
        y = y[:n_fixed]
    elif len(y) < n_fixed:
        y = np.pad(y, (0, n_fixed - len(y)))
    return y


# ---------------------------------------------------------------------------
# Test signals (deterministic)
# ---------------------------------------------------------------------------

def _signals_44100():
    rng = np.random.default_rng(12345)
    n = SR // 4  # 0.25 s
    t = np.arange(n) / SR
    sigs = {
        "silence5000": np.zeros(5000),
        "impulse": np.eye(1, n, n // 2)[0] * 0.9,
        "tone1k": 0.5 * np.sin(2 * np.pi * 1000.0 * t),
        "chirp": 0.4 * np.sin(2 * np.pi * (200.0 + 8000.0 * t) * t),
        "noise": 0.3 * rng.standard_normal(n),
        "harmonics": sum(
            (0.5 / k) * np.sin(2 * np.pi * 120.0 * k * t) for k in range(1, 9)
        ) * np.hanning(n),
    }
    return {k: np.asarray(v, dtype=np.float64) for k, v in sigs.items()}


def _signals_resample():
    rng = np.random.default_rng(678)
    out = {}
    for name, sr in [("noise_16k", 16000), ("tone_22k05", 22050),
                     ("chirp_48k", 48000)]:
        n = sr // 4
        t = np.arange(n) / sr
        if name.startswith("noise"):
            sig = 0.3 * rng.standard_normal(n)
        elif name.startswith("tone"):
            sig = 0.5 * np.sin(2 * np.pi * 440.0 * t)
        else:
            sig = 0.4 * np.sin(2 * np.pi * (300.0 + 6000.0 * t) * t)
        out[name] = (np.asarray(sig, dtype=np.float64), sr)
    return out


def main():
    arrays = {}
    for name, sig in _signals_44100().items():
        arrays[f"sig44k_{name}"] = sig
        arrays[f"mel_{name}"] = golden_melspec(sig)
    for name, (sig, sr) in _signals_resample().items():
        arrays[f"sig_{name}"] = sig
        arrays[f"sr_{name}"] = np.int64(sr)
        res = golden_resample(sig, sr, SR)
        arrays[f"res_{name}"] = res
        arrays[f"melres_{name}"] = golden_melspec(res)
    arrays["mel_silence_anchor"] = np.float64(
        golden_melspec(np.zeros(5000))[0, 0])

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "dsp_golden.npz")
    np.savez_compressed(out, **arrays)
    print(f"wrote {out} ({os.path.getsize(out)} bytes, "
          f"{len(arrays)} arrays)")
    print("silence anchor:", arrays["mel_silence_anchor"])


if __name__ == "__main__":
    sys.exit(main())
