"""Mel-spectrogram inversion (mel -> audio) on device.

Replaces the reference's ``mel_to_sig`` (librosa Griffin-Lim path,
/root/reference/paule/util.py:272-298):

1. invert the mel filterbank to a linear amplitude spectrogram (regularized
   least squares, clipped to >= 0 — librosa uses NNLS; behavioral contract is
   a faithful non-negative approximate inverse),
2. Griffin-Lim phase reconstruction (32 iterations, momentum 0.99),
3. pad 55 zeros on each side so the output length matches what the
   synthesizer produces for the corresponding cp length:
   ``220*frames - 110 == (2*frames - 1) * 110``.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .mel import (
    N_FFT, HOP, SR, DB_REF, mel_filterbank, _hann_periodic,
)
from ..ops.normalize import inv_normalize_mel

N_ITER = 32
MOMENTUM = 0.99


@functools.lru_cache(maxsize=2)
def _mel_pinv():
    """Regularized pseudo-inverse of the mel filterbank, (n_mels, n_bins)."""
    fb = mel_filterbank()  # (n_bins, n_mels)
    gram = fb.T @ fb
    gram += 1e-8 * np.eye(gram.shape[0])
    return np.linalg.solve(gram, fb.T)  # (n_mels, n_bins)


def _stft_mag_phase_update(y, dtype):
    win = jnp.asarray(_hann_periodic(), dtype=dtype)
    pad = N_FFT // 2
    frames = 1 + y.shape[0] // HOP
    yp = jnp.pad(y, (pad, pad))
    idx = jnp.arange(frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    return jnp.fft.rfft(yp[idx] * win, axis=-1)  # (F, n_bins)


def _istft(spec, length, dtype):
    """Inverse STFT with hann window and overlap-add normalization."""
    win = jnp.asarray(_hann_periodic(), dtype=dtype)
    frames = spec.shape[0]
    pad = N_FFT // 2
    total = HOP * (frames - 1) + N_FFT

    time_frames = jnp.fft.irfft(spec, N_FFT, axis=-1).astype(dtype) * win
    idx = jnp.arange(frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    y = jnp.zeros(total, dtype=dtype).at[idx.reshape(-1)].add(
        time_frames.reshape(-1)
    )

    wss = np.zeros(total)
    np.add.at(
        wss,
        (np.arange(frames)[:, None] * HOP + np.arange(N_FFT)[None, :]).reshape(-1),
        np.tile(_hann_periodic() ** 2, frames),
    )
    wss = jnp.asarray(np.where(wss > 1e-10, wss, 1.0), dtype=dtype)
    y = y / wss
    return y[pad : pad + length]


@functools.partial(jax.jit, static_argnames=("n_iter", "length", "dtype"))
def griffin_lim(mag, *, n_iter=N_ITER, length=None, dtype=jnp.float32):
    """Reconstruct a signal from an amplitude spectrogram (frames, n_bins)."""
    mag = jnp.asarray(mag, dtype=dtype)
    frames = mag.shape[0]
    if length is None:
        length = HOP * (frames - 1)

    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    angles = jnp.ones_like(mag, dtype=cdtype)
    rebuilt = jnp.zeros_like(mag, dtype=cdtype)

    def body(carry, _):
        angles, prev_rebuilt = carry
        y = _istft(mag.astype(cdtype) * angles, length, dtype)
        new_rebuilt = _stft_mag_phase_update(y, dtype).astype(cdtype)
        upd = new_rebuilt - (MOMENTUM / (1.0 + MOMENTUM)) * prev_rebuilt
        new_angles = upd / jnp.maximum(jnp.abs(upd), 1e-16)
        return (new_angles.astype(cdtype), new_rebuilt), None

    (angles, _), _ = jax.lax.scan(body, (angles, rebuilt), length=n_iter)
    return _istft(mag.astype(cdtype) * angles, length, dtype)


def mel_to_sig(mel, mel_min=0.0):
    """Normalized log-mel ``(frames, 60)`` -> ``(signal, 44100)``.

    Mirrors the reference's ``mel_to_sig`` contract including the 55-sample
    zero padding on each side (/root/reference/paule/util.py:272-298).
    """
    from ..config import DTYPE

    mel = np.asarray(mel, dtype=np.float64) + mel_min
    mel_db = inv_normalize_mel(mel)
    amplitude = 10.0 ** (mel_db / 20.0) * DB_REF  # db_to_amplitude(ref=0.15)

    pinv = _mel_pinv()  # (n_mels, n_bins)
    lin = np.maximum(amplitude @ pinv, 0.0)  # (frames, n_bins)

    frames = lin.shape[0]
    length = HOP * (frames - 1)
    sig = griffin_lim(jnp.asarray(lin), length=length, dtype=DTYPE)
    sig = np.asarray(sig, dtype=np.float64)
    sig = np.concatenate([np.zeros(55), sig, np.zeros(55)])
    return sig, SR
