"""Normalization constants and functions for control parameters, tube
features and log-mel spectrograms.

Data contracts (shared with the reference implementation, see
``/root/reference/paule/util.py:55-146``):

* **cp trajectory** ``(seq, 30)`` — 19 vocal-tract + 11 glottis parameters,
  one frame per 110/44100 s.  Normalized to roughly ±1 using the *theoretical*
  parameter ranges of the speaker: ``norm = (cp - mid) / halfrange``.
* **tube features** ``(seq, 10)`` — 7 oral-cavity area sections (cm²),
  incisor position (cm), tongue-tip side elevation, velum opening (cm²).
* **log-mel** — anchored to the dB value a silent signal produces, which for
  ``amplitude_to_db(0.0, ref=0.15, amin=1e-5)`` is
  ``20*log10(1e-5) - 20*log10(0.15) ≈ -83.5218``.

All functions accept numpy or jax arrays and preserve the input namespace.
"""

import math

import numpy as np

# ---------------------------------------------------------------------------
# Control-parameter ranges (the speaker's theoretical parameter domain).
# 19 vocal-tract parameters followed by 11 geometric-glottis parameters.
# Order: HX HY JX JA LP LD VS VO TCX TCY TTX TTY TBX TBY TRX TRY TS1 TS2 TS3 |
#        F0 PR XB XT CA LAG RA DP PS FL AS
# (reference parameter table: /root/reference/paule/util.py:50-52)
# ---------------------------------------------------------------------------

TRACT_PARAM_NAMES = (
    "HX", "HY", "JX", "JA", "LP", "LD", "VS", "VO",
    "TCX", "TCY", "TTX", "TTY", "TBX", "TBY", "TRX", "TRY",
    "TS1", "TS2", "TS3",
)
GLOTTIS_PARAM_NAMES = (
    "F0", "PR", "XB", "XT", "CA", "LAG", "RA", "DP", "PS", "FL", "AS",
)
CP_PARAM_NAMES = TRACT_PARAM_NAMES + GLOTTIS_PARAM_NAMES

N_TRACT = 19
N_GLOTTIS = 11
N_CP = N_TRACT + N_GLOTTIS

#: (min, max) per parameter — the speaker's theoretical domain.  The
#: reference encodes the same information as mean/std pairs
#: (/root/reference/paule/util.py:68-82); here we keep the primal ranges and
#: derive mid/halfrange from them.
CP_RANGES = np.array([
    # --- vocal tract ---
    (0.0, 1.0),        # HX  hyoid horizontal (cm)
    (-6.0, -3.5),      # HY  hyoid vertical (cm)
    (-0.5, 0.0),       # JX  jaw horizontal (cm)
    (-7.0, 0.0),       # JA  jaw angle (deg)
    (-1.0, 1.0),       # LP  lip protrusion (cm)
    (-2.0, 4.0),       # LD  lip distance (cm)
    (0.0, 1.0),        # VS  velum shape
    (-0.1, 1.0),       # VO  velum opening (cm^2)
    (-3.0, 4.0),       # TCX tongue body horizontal (cm)
    (-3.0, 1.0),       # TCY tongue body vertical (cm)
    (1.5, 5.5),        # TTX tongue tip horizontal (cm)
    (-3.0, 2.5),       # TTY tongue tip vertical (cm)
    (-3.0, 4.0),       # TBX tongue blade horizontal (cm)
    (-3.0, 5.0),       # TBY tongue blade vertical (cm)
    (-4.0, 2.0),       # TRX tongue root horizontal (cm)
    (-6.0, 0.0),       # TRY tongue root vertical (cm)
    (0.0, 1.0),        # TS1 tongue side elevation 1
    (0.0, 1.0),        # TS2 tongue side elevation 2
    (-1.0, 1.0),       # TS3 tongue side elevation 3
    # --- geometric glottis ---
    (40.0, 600.0),     # F0  fundamental frequency (Hz)
    (0.0, 20000.0),    # PR  subglottal pressure (dPa)
    (-0.05, 0.30),     # XB  lower fold rest displacement (cm)
    (-0.05, 0.30),     # XT  upper fold rest displacement (cm)
    (-0.25, 0.25),     # CA  chink area (cm^2)
    (0.0, 3.1415),     # LAG phase lag between fold edges (rad)
    (-1.0, 1.0),       # RA  relative amplitude
    (0.0, 1.0),        # DP  double pulsing
    (-0.5, 0.5),       # PS  pulse skewness
    (0.0, 100.0),      # FL  flutter (%)
    (-40.0, 0.0),      # AS  aspiration strength (dB)
], dtype=np.float64)

cp_theoretical_means = (CP_RANGES[:, 0] + CP_RANGES[:, 1]) / 2.0
cp_theoretical_stds = (CP_RANGES[:, 1] - CP_RANGES[:, 0]) / 2.0

#: Empirical corpus statistics kept for API completeness (the planning code
#: normalizes with the theoretical values above; the empirical values mirror
#: /root/reference/paule/util.py:55-66 and describe the training corpus).
cp_means = np.array([
    0.53, -5.08, -0.03, -3.73, 0.07, 0.73, 0.48, -0.05, 0.96, -1.58,
    4.46, -0.93, 2.99, -0.05, -1.46, -2.29, 0.23, 0.12, 0.12, 107.2,
    4192.9, 0.03, 0.03, 0.06, 1.22, 0.84, 0.05, 0.0, 25.0, -10.0,
], dtype=np.float64)
cp_stds = np.array([
    0.17, 0.40, 0.04, 0.63, 0.12, 0.22, 0.22, 0.09, 0.49, 0.31,
    0.38, 0.37, 0.35, 0.35, 0.46, 0.38, 0.06, 0.10, 0.18, 9.86,
    3290.25, 0.02, 0.02, 0.01, 0.001, 0.20, 0.001, 0.001, 0.001, 0.001,
], dtype=np.float64)

# ---------------------------------------------------------------------------
# Tube (somatosensory) feature ranges: 7 oral-cavity areas + incisor position
# + tongue-tip side elevation + velum opening (reference
# /root/reference/paule/util.py:92-112).
# ---------------------------------------------------------------------------

MIN_AREA, MAX_AREA = 0.0, 15.0
MIN_LENGTH, MAX_LENGTH = 0.23962031463970312, 0.6217119410833707
MIN_INCISOR, MAX_INCISOR = 14.0, 18.0
MIN_TONGUE, MAX_TONGUE = -1.0, 1.0
MIN_VELUM, MAX_VELUM = 0.0, 1.0

tube_mins = np.concatenate([
    np.repeat(MIN_AREA, 7), [MIN_INCISOR], [MIN_TONGUE], [MIN_VELUM]])
tube_maxs = np.concatenate([
    np.repeat(MAX_AREA, 7), [MAX_INCISOR], [MAX_TONGUE], [MAX_VELUM]])

tube_theoretical_means = (tube_mins + tube_maxs) / 2.0
tube_theoretical_stds = (tube_maxs - tube_mins) / 2.0

# ---------------------------------------------------------------------------
# Mel anchoring: the dB value of silence under our mel pipeline
# (amplitude_to_db with amin=1e-5, ref=0.15), cf.
# /root/reference/paule/util.py:136-146.
# ---------------------------------------------------------------------------

MEL_AMIN = 1e-5
MEL_DB_REF = 0.15

mel_mean = 20.0 * math.log10(MEL_AMIN) - 20.0 * math.log10(MEL_DB_REF)
mel_std = abs(mel_mean)

# aliases matching the reference naming for drop-in compatibility
mel_mean_librosa = mel_mean
mel_std_librosa = mel_std


def normalize_cp(cp):
    means = _like(cp, cp_theoretical_means)
    stds = _like(cp, cp_theoretical_stds)
    return (cp - means) / stds


def inv_normalize_cp(norm_cp):
    means = _like(norm_cp, cp_theoretical_means)
    stds = _like(norm_cp, cp_theoretical_stds)
    return stds * norm_cp + means


def normalize_tube(tube):
    means = _like(tube, tube_theoretical_means)
    stds = _like(tube, tube_theoretical_stds)
    return (tube - means) / stds


def inv_normalize_tube(norm_tube):
    means = _like(norm_tube, tube_theoretical_means)
    stds = _like(norm_tube, tube_theoretical_stds)
    return norm_tube * stds + means


def normalize_mel(mel):
    return (mel - mel_mean) / mel_std


def inv_normalize_mel(norm_mel):
    return mel_std * norm_mel + mel_mean


# reference-compatible aliases (util.normalize_mel_librosa etc.)
normalize_mel_librosa = normalize_mel
inv_normalize_mel_librosa = inv_normalize_mel


def _like(x, table):
    """Return `table` as an array in the same namespace/dtype as `x`."""
    if hasattr(x, "device") and type(x).__module__.startswith("jax"):
        import jax.numpy as jnp
        return jnp.asarray(table, dtype=x.dtype)
    return np.asarray(table, dtype=getattr(x, "dtype", np.float64))
