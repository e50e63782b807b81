"""Differentiable spectral-domain articulatory model (pure JAX).

A capability the reference cannot offer: planning **through the physics**
instead of through a learned proxy.  The time-domain C++ synthesizer
(synth/csrc) is a host resource with no gradients; this module re-expresses
its *stationary* acoustics on device, end to end differentiable:

    cp (T, 30) ──tract_to_tube_jax──▶ areas (T, 40)
              ──chain-matrix tube acoustics──▶ |H(f)| (T, K)
              ──glottal source magnitude × radiation──▶ |P(f)| (T, K)
              ──mel filterbank + dB + normalization──▶ mel (T/2, 60)

* ``tract_to_tube_jax`` mirrors our own C++ geometric model
  (synth/csrc/model.cpp ``make_geometry``/``tract_to_tube``) exactly — the
  per-section areas match the native ``pts_tract_to_tube`` to float
  precision (tested), so gradients point in directions the real synthesizer
  agrees with.
* the tube's frequency response uses lossy cylindrical-segment chain
  matrices (transmission-line acoustics) with a piston-in-baffle radiation
  load and the nasal side branch as a velum-scaled shunt admittance at the
  velar junction — a frequency-domain approximation of the C++
  Kelly-Lochbaum waveguide (same tube, same topology minus frication).
* the glottal source is a magnitude-only rolloff model (−12 dB/oct above
  the voice band, amplitude ∝ √pressure) — phase and jitter don't survive a
  mel magnitude representation anyway.

``SpectralForwardModel`` packages this as a drop-in predictive model
(``apply(params, cp_norm) -> normalized mel``, ``params = {}``): pass
``Paule(physical_forward=True)`` and the planner optimizes trajectories
through the physical model with *no pretrained weights at all*.

Everything is static-shape, elementwise/matmul math — the whole pipeline
jits into a handful of fused XLA kernels.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .dsp.mel import N_FFT, SR, amplitude_to_db, mel_filterbank
from .ops.derivatives import half_sequence
from .ops.normalize import (cp_theoretical_means, cp_theoretical_stds,
                            normalize_mel)

N_TUBE = 40
SPEED_OF_SOUND = 35000.0  # cm/s
AIR_DENSITY = 1.14e-3     # g/cm^3

#: the time-domain waveguide delays one sample per section at 44.1 kHz and
#: quantizes the geometric tract length to an effective section count in
#: [8, 40] (synth/csrc/model.cpp Waveguide::step); the spectral model uses
#: the smooth (unquantized) equivalent so gradients flow through the length
CM_PER_WAVEGUIDE_SECTION = SPEED_OF_SOUND / 44100.0
MIN_TOTAL_LEN_CM = 8 * CM_PER_WAVEGUIDE_SECTION
MAX_TOTAL_LEN_CM = N_TUBE * CM_PER_WAVEGUIDE_SECTION

# ---------------------------------------------------------------------------
# geometry constants (synth/csrc/model.cpp:253-260 — our own design)
# ---------------------------------------------------------------------------

_PX = np.array([0.00, 0.06, 0.12, 0.25, 0.40, 0.50, 0.62, 0.75, 0.85, 0.92,
                1.00])
_PD = np.array([0.40, 0.90, 1.30, 1.50, 1.40, 1.30, 1.20, 1.10, 0.90, 0.80,
                0.70])
_WX = np.array([0.00, 0.12, 0.45, 0.75, 0.92, 1.00])
_WW = np.array([1.20, 2.00, 3.20, 2.80, 2.00, 1.40])

#: section midpoints x_i = (i + 0.5) / 40 and their static profile values
_X = (np.arange(N_TUBE) + 0.5) / N_TUBE
_D0 = np.interp(_X, _PX, _PD)   # resting sagittal distance profile
_W0 = np.interp(_X, _WX, _WW)   # lateral width profile
_LS = np.clip((_X - 0.90) / 0.07, 0.0, 1.0)      # lip blend factor
_TAPER = np.clip((_X - 0.55) / 0.35, 0.0, 1.0)   # jaw taper

BASE_LENGTH_CM = 16.0  # default speaker anatomy

#: fixed nasal-branch area profile (synth/csrc/model.cpp Waveguide::step)
_NASAL_AREAS = np.array([1.5, 2.2, 3.0, 3.6, 4.0, 4.0, 3.6, 3.0, 2.4, 2.0,
                         1.6, 1.3, 1.1, 1.0])
_VELAR_JUNCTION = int(0.48 * N_TUBE)  # section index of the nasal port


def _gauss(x, c, s):
    return jnp.exp(-0.5 * ((x - c) / s) ** 2)


@functools.lru_cache(maxsize=1)
def _bounds_cached():
    """Tract parameter (min, max) bounds of the default speaker."""
    from . import synth

    info = synth.get_param_info("tract")
    return np.asarray(info["mins"]), np.asarray(info["maxs"])


def velum_opening_jax(tract):
    """Velum opening (cm², clipped like the C++ model) from tract params."""
    mins, maxs = _bounds_cached()
    vo = jnp.clip(tract[..., 7], mins[7], maxs[7])
    return jnp.clip(jnp.maximum(vo, 0.0), 0.0, 1.0)


def tract_to_tube_jax(tract):
    """Vectorized, differentiable mirror of the C++ ``tract_to_tube``
    (synth/csrc/model.cpp:274-365): denormalized tract params ``(..., 19)``
    -> ``(areas_cm2 (..., 40), section_length_cm (...,))``."""
    mins, maxs = _bounds_cached()
    q = jnp.clip(tract, jnp.asarray(mins, tract.dtype),
                 jnp.asarray(maxs, tract.dtype))
    HX, HY, JX, JA, LP, LD, VS, VO = (q[..., i] for i in range(8))
    TCX, TCY, TTX, TTY, TBX, TBY, TRX, TRY = (q[..., i]
                                              for i in range(8, 16))
    TS1, TS2, TS3 = q[..., 16], q[..., 17], q[..., 18]

    length_cm = (BASE_LENGTH_CM + 0.5 * HX - 0.6 * (HY + 4.75)
                 + 0.8 * jnp.maximum(LP, 0.0) + 0.2 * jnp.minimum(LP, 0.0))
    jaw_open = (-JA) / 7.0
    # (the C++ model also derives velum_open from VO for the nasal branch;
    # the spectral model omits the nasal tract)

    c_body = 0.60 + 0.030 * TCX + 0.008 * JX
    p_body = jnp.clip((TCY + 3.0) / 4.0, 0.0, 1.1)
    c_blade = 0.72 + 0.020 * TBX + 0.008 * JX
    p_blade = jnp.clip((TBY + 3.0) / 8.0, 0.0, 1.1)
    c_tip = 0.82 + 0.018 * TTX + 0.010 * JX
    p_tip = jnp.clip((TTY + 3.0) / 5.5, 0.0, 1.1)
    c_root = 0.30
    p_root = jnp.clip((2.0 - TRX) / 6.0, 0.0, 1.1)
    try_narrow = jnp.maximum(0.0, -(TRY + 3.0) / 3.0)
    ts1 = jnp.clip(TS1, 0.0, 1.0)
    ts2 = jnp.clip(TS2, 0.0, 1.0)
    ts3 = jnp.clip(TS3, -1.0, 1.0)

    x = jnp.asarray(_X, tract.dtype)                       # (40,)
    e = lambda a: a[..., None]                             # noqa: E731

    dist = jnp.asarray(_D0, tract.dtype)
    body = 1.60 * e(p_body) ** 3.0 * _gauss(x, e(c_body), 0.12)
    blade = 1.50 * e(p_blade) ** 2.0 * _gauss(x, e(c_blade), 0.08)
    tip = 1.30 * e(p_tip) ** 2.0 * _gauss(x, e(c_tip), 0.05)
    root = (0.70 * e(p_root) ** 2 + 0.25 * e(try_narrow)) * \
        _gauss(x, c_root, 0.10)
    dist = dist - jnp.maximum(jnp.maximum(body, blade),
                              jnp.maximum(tip, root))
    dist = dist - 0.30 * e(VS) * _gauss(x, 0.50, 0.05)
    dist = dist + 0.9 * (e(jaw_open) - 2.0 / 7.0) * \
        jnp.asarray(_TAPER, tract.dtype)
    ls = jnp.asarray(_LS, tract.dtype)
    dist = dist * (1.0 - ls) + 0.8 * e(LD) * ls

    dist = jnp.maximum(dist, 0.0)
    area = jnp.asarray(_W0, tract.dtype) * dist ** 1.3
    area = area * (1.0 - 0.45 * e(ts1) * _gauss(x, 0.58, 0.10))
    area = area * (1.0 - 0.45 * e(ts2) * _gauss(x, 0.72, 0.08))
    pos = jnp.maximum(ts3, 0.0)
    neg = jnp.maximum(-ts3, 0.0)
    area = area * (1.0 - 0.45 * e(pos) * _gauss(x, 0.83, 0.06)) \
        + 0.35 * e(neg) * _gauss(x, 0.83, 0.06)
    area = jnp.clip(area, 0.0, 15.0)
    return area, length_cm / N_TUBE


# ---------------------------------------------------------------------------
# tube acoustics: lossy cylindrical chain matrices + radiation load
# ---------------------------------------------------------------------------

def _radiation_impedance(area, freqs):
    """Piston-in-baffle radiation impedance (low-ka form), numpy/jnp."""
    r = (area / np.pi) ** 0.5
    k = 2.0 * np.pi * freqs / SPEED_OF_SOUND
    ka = k * r
    return (AIR_DENSITY * SPEED_OF_SOUND / area) * \
        (0.25 * ka ** 2 + 1j * 0.61 * ka)


@functools.lru_cache(maxsize=4)
def nasal_input_admittance(n_freqs, f_max):
    """Input admittance Y(f) of the fixed nasal tract (chain matrix of the
    14 waveguide nasal sections, nostril radiation load); host numpy,
    computed once per frequency grid."""
    freqs = np.linspace(0.0, f_max, n_freqs)
    k = 2.0 * np.pi * freqs / SPEED_OF_SOUND
    sec = CM_PER_WAVEGUIDE_SECTION
    A = np.ones(n_freqs, complex)
    B = np.zeros(n_freqs, complex)
    C = np.zeros(n_freqs, complex)
    D = np.ones(n_freqs, complex)
    for a in _NASAL_AREAS:
        radius = (a / np.pi) ** 0.5
        alpha = 3.0e-5 * np.sqrt(np.maximum(freqs, 1.0)) / radius
        kl = (k - 1j * alpha) * sec
        z = AIR_DENSITY * SPEED_OF_SOUND / a
        c_, s_ = np.cos(kl), np.sin(kl)
        A, B, C, D = (A * c_ + B * (1j * s_ / z),
                      A * (1j * z * s_) + B * c_,
                      C * c_ + D * (1j * s_ / z),
                      C * (1j * z * s_) + D * c_)
    z_rad = _radiation_impedance(_NASAL_AREAS[-1], freqs)
    y = (C * z_rad + D) / (A * z_rad + B)
    return y.astype(np.complex64)


def tube_transfer_magnitude(areas, sec_len, freqs, *, velum_open=None,
                            f_max=SR / 2.0, min_area=1e-3):
    """|U_lips / U_glottis| of the 40-section tube at ``freqs`` (Hz).

    ``areas (..., 40)``, ``sec_len (...,)`` in cm.  Transmission-line chain:
    per segment ``[[cos(kl), j Z sin(kl)], [j sin(kl)/Z, cos(kl)]]`` with
    ``Z = ρc/A`` and viscothermal damping folded into a complex wavenumber;
    terminated by a piston-in-baffle radiation impedance.  With
    ``velum_open (...,)`` (cm²) the nasal tract couples in as a shunt
    admittance at the velar junction, scaled by the port area."""
    dtype = jnp.complex64 if areas.dtype == jnp.float32 else jnp.complex128
    a = jnp.maximum(areas, min_area)                    # (..., 40)
    w = 2.0 * jnp.pi * freqs                            # (K,)
    k = w / SPEED_OF_SOUND                              # (K,)

    # broadcast to (..., K, 40)
    a_b = a[..., None, :]
    l_b = sec_len[..., None, None]
    k_b = k[:, None]
    # viscothermal loss: alpha ~ sqrt(f) / radius
    radius = jnp.sqrt(a_b / jnp.pi)
    alpha = 3.0e-5 * jnp.sqrt(jnp.maximum(freqs[:, None], 1.0)) / radius
    kl = (k_b - 1j * alpha).astype(dtype) * l_b
    z = (AIR_DENSITY * SPEED_OF_SOUND / a_b).astype(dtype)

    if velum_open is not None:
        # the admittance table is keyed by the static grid spec (jit-safe)
        y_n = jnp.asarray(
            nasal_input_admittance(int(freqs.shape[0]), float(f_max)),
            dtype)
        y_shunt = y_n * (jnp.maximum(velum_open, 0.0)
                         / _NASAL_AREAS[0])[..., None].astype(dtype)
    else:
        y_shunt = None

    # chain product over the 40 sections, glottis -> lips; cos/sin are taken
    # per section inside the scan so peak memory is (..., K), not (..., K, 40)
    def section(carry, i):
        A, B, C, D = carry
        kl_i = kl[..., i]
        c_ = jnp.cos(kl_i)
        s_ = jnp.sin(kl_i)
        z_ = z[..., i]
        A2 = A * c_ + B * (1j * s_ / z_)
        B2 = A * (1j * z_ * s_) + B * c_
        C2 = C * c_ + D * (1j * s_ / z_)
        D2 = C * (1j * z_ * s_) + D * c_
        if y_shunt is not None:
            # nasal shunt between the velar section and the next one:
            # M <- M @ [[1, 0], [Y, 1]]
            at = (i == _VELAR_JUNCTION).astype(dtype)
            A2 = A2 + at * B2 * y_shunt
            C2 = C2 + at * D2 * y_shunt
        return (A2, B2, C2, D2), None

    ones = jnp.ones(kl.shape[:-1], dtype)
    zeros = jnp.zeros(kl.shape[:-1], dtype)
    (A, B, C, D), _ = jax.lax.scan(section, (ones, zeros, zeros, ones),
                                   jnp.arange(N_TUBE))

    # radiation load at the lips (piston in infinite baffle, low-ka form)
    a_lip = jnp.maximum(areas[..., -1], min_area)[..., None]
    z_rad = _radiation_impedance(a_lip, freqs).astype(dtype)

    # [p_g, U_g] = M [p_l, U_l], p_l = Z_rad U_l =>
    # U_g = (C Z_rad + D) U_l  =>  |H| = 1 / |C Z_rad + D|
    denom = C * z_rad + D
    return 1.0 / jnp.maximum(jnp.abs(denom), 1e-6)


def glottal_source_magnitude(glottis, freqs):
    """Magnitude spectrum of the glottal volume-velocity source.

    ``glottis (..., 11)`` denormalized (F0 Hz, pressure, ...).  A smooth
    −12 dB/oct rolloff above the voice band, amplitude ∝ √pressure, plus an
    aspiration-scaled broadband floor."""
    f0 = jnp.clip(glottis[..., 0], 40.0, 600.0)[..., None]
    pressure = jnp.maximum(glottis[..., 1], 0.0)[..., None]
    amp = jnp.sqrt(pressure + 1e-6)
    roll = 1.0 / (1.0 + (freqs / (3.0 * f0)) ** 2)
    floor = 1e-3
    return amp * (roll + floor)


# ---------------------------------------------------------------------------
# the drop-in forward model
# ---------------------------------------------------------------------------

#: overall gain calibrating the spectral model's dB range to the time-domain
#: synthesizer's mel output (fitted once over random babbling trajectories:
#: residual mean offset < 0.01 normalized-mel units, spread ~0.15)
CALIBRATION_GAIN = 0.645


class SpectralForwardModel:
    """Drop-in predictive model: cp (B, T, 30) -> normalized mel
    (B, T/2, 60) through the differentiable physical model.  ``init``
    returns an empty pytree — there is nothing to train."""

    def __init__(self, n_freqs=1 + N_FFT // 2):
        self.n_freqs = n_freqs
        self._freqs = np.linspace(0.0, SR / 2.0, n_freqs)
        self._fb = mel_filterbank()

    def init(self, rng, dtype=jnp.float32):
        del rng, dtype
        return {}

    def apply(self, params, cp_norm, lens=None, **_):
        del params, lens
        dtype = cp_norm.dtype
        means = jnp.asarray(cp_theoretical_means, dtype)
        stds = jnp.asarray(cp_theoretical_stds, dtype)
        cp = cp_norm * stds + means                       # denormalize
        tract = cp[..., :19]
        glottis = cp[..., 19:]

        freqs = jnp.asarray(self._freqs, dtype)
        areas, geom_sec_len = tract_to_tube_jax(tract)
        sec_len = jnp.clip(geom_sec_len * N_TUBE, MIN_TOTAL_LEN_CM,
                           MAX_TOTAL_LEN_CM) / N_TUBE
        h = tube_transfer_magnitude(
            areas, sec_len, freqs,
            velum_open=velum_opening_jax(tract))             # (B, T, K)
        s = glottal_source_magnitude(glottis, freqs)         # (B, T, K)
        # lip radiation differentiates the flow: |P| ~ f * |U|
        rad = jnp.asarray(self._freqs / SR, dtype)
        p = CALIBRATION_GAIN * s * h * rad                   # (B, T, K)

        fb = jnp.asarray(self._fb, dtype)                    # (K, 60)
        mel = jnp.maximum(p, 0.0) @ fb                       # (B, T, 60)
        out = normalize_mel(amplitude_to_db(mel, dtype))
        t = out.shape[-2]
        return half_sequence(out[..., : (t // 2) * 2, :])

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)
