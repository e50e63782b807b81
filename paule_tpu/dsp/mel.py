"""On-device log-mel spectrogram pipeline.

Numerically matches the reference's feature extraction
(``librosa_melspec``, /root/reference/paule/util.py:115-120):

* 44.1 kHz mono input (resample first via :mod:`paule_tpu.dsp.resample`)
* STFT: ``n_fft=1024``, ``hop=220``, periodic Hann window, centered with
  zero ("constant") padding
* amplitude (power 1.0) mel spectrogram with 60 Slaney-scale,
  Slaney-normalized filters between 10 Hz and 12 kHz
* ``amplitude_to_db`` with ``ref=0.15``, ``amin=1e-5``, ``top_db=80``
* transposed to ``(frames, 60)``

The whole pipeline is a single jitted XLA program: the STFT is expressed as a
framed matmul against the RFFT basis fused with the mel filterbank, so one
``(frames, n_fft) @ (n_fft, 2*n_bins)`` MXU matmul plus a
``(frames, n_bins) @ (n_bins, n_mels)`` matmul produce the mel energies.
"""

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

SR = 44100
N_FFT = 1024
HOP = 220
N_MELS = 60
FMIN = 10.0
FMAX = 12000.0
AMIN = 1e-5
DB_REF = 0.15
TOP_DB = 80.0


# ---------------------------------------------------------------------------
# filterbank / window construction (host, numpy, cached)
# ---------------------------------------------------------------------------

def hz_to_mel(freq):
    """Slaney mel scale (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(
        freq >= min_log_hz,
        min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
        mels,
    )


def mel_to_hz(mels):
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(
        mels >= min_log_mel,
        min_log_hz * np.exp(logstep * (mels - min_log_mel)),
        freqs,
    )


@functools.lru_cache(maxsize=8)
def mel_filterbank(sr=SR, n_fft=N_FFT, n_mels=N_MELS, fmin=FMIN, fmax=FMAX):
    """Triangular Slaney-normalized mel filterbank, shape (n_bins, n_mels)."""
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts.reshape(-1, 1) - fft_freqs.reshape(1, -1)

    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalization: each filter integrates to ~constant energy
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm.reshape(-1, 1)
    return np.ascontiguousarray(weights.T)  # (n_bins, n_mels)


@functools.lru_cache(maxsize=4)
def _hann_periodic(n=N_FFT):
    k = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(np.float64)


@functools.lru_cache(maxsize=4)
def _rfft_basis(n_fft=N_FFT):
    """Windowed real-DFT basis: (n_fft, 2*n_bins) [cos | -sin] columns."""
    n_bins = 1 + n_fft // 2
    t = np.arange(n_fft).reshape(-1, 1)
    k = np.arange(n_bins).reshape(1, -1)
    ang = 2.0 * np.pi * t * k / n_fft
    win = _hann_periodic(n_fft).reshape(-1, 1)
    cos_b = np.cos(ang) * win
    sin_b = -np.sin(ang) * win
    return np.concatenate([cos_b, sin_b], axis=1)  # (n_fft, 2*n_bins)


# ---------------------------------------------------------------------------
# jitted pipeline
# ---------------------------------------------------------------------------

def n_frames(n_samples):
    """Number of centered STFT frames for a signal of given length."""
    return 1 + n_samples // HOP


def frame_signal(y, n_fft=N_FFT, hop=HOP):
    """Center-pad and frame a 1-D signal into (frames, n_fft)."""
    pad = n_fft // 2
    frames = 1 + y.shape[0] // hop
    y = jnp.pad(y, (pad, pad), mode="constant")
    idx = jnp.arange(frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return y[idx]


def amplitude_to_db(mel, dtype=jnp.float32):
    """librosa-matched ``amplitude_to_db(..., ref=DB_REF)`` with top-db
    clipping; shared by the STFT pipeline and the spectral-domain model."""
    ref = jnp.asarray(DB_REF, dtype)
    db = 20.0 * jnp.log10(jnp.maximum(mel, AMIN)) - 20.0 * jnp.log10(
        jnp.maximum(ref, AMIN))
    keep = tuple(range(db.ndim - 2, db.ndim))
    return jnp.maximum(db, jnp.max(db, axis=keep, keepdims=True) - TOP_DB)


@functools.partial(jax.jit, static_argnames=("dtype",))
def melspec_44100(y, *, dtype=jnp.float32):
    """Normalized-input pipeline: 44.1 kHz signal -> (frames, 60) log-mel dB.

    Equivalent to ``librosa.amplitude_to_db(melspectrogram(...), ref=0.15).T``.
    """
    y = jnp.asarray(y, dtype=dtype)
    frames = frame_signal(y)  # (F, n_fft)

    basis = jnp.asarray(_rfft_basis(), dtype=dtype)  # (n_fft, 2*n_bins)
    spec = frames @ basis  # (F, 2*n_bins)
    n_bins = 1 + N_FFT // 2
    re, im = spec[:, :n_bins], spec[:, n_bins:]
    mag = jnp.sqrt(re * re + im * im)  # amplitude (power=1.0)

    fb = jnp.asarray(mel_filterbank(), dtype=dtype)  # (n_bins, n_mels)
    mel = mag @ fb  # (F, n_mels)
    return amplitude_to_db(mel, dtype)


def librosa_melspec(wav, sample_rate):
    """Drop-in equivalent of the reference's ``librosa_melspec`` — resamples
    to 44.1 kHz on the host, featurizes on device, returns float64 numpy
    ``(frames, 60)`` (reference /root/reference/paule/util.py:115-120).
    """
    from .resample import resample as _resample
    from ..config import DTYPE

    wav = np.asarray(wav, dtype=np.float64)
    if sample_rate != SR:
        wav = _resample(wav, sample_rate, SR)
    mel = melspec_44100(jnp.asarray(wav), dtype=DTYPE)
    return np.asarray(jax.device_get(mel), dtype=np.float64)
