"""Sample-rate conversion matching librosa's ``kaiser_best`` path.

The reference resamples every target signal with
``librosa.resample(..., res_type='kaiser_best', fix=True, scale=False)``
(/root/reference/paule/util.py:115-116), which delegates to resampy's
band-limited sinc interpolation with the precomputed *kaiser_best* filter:

* 64 zero crossings, 512 filter samples per zero crossing (precision 9)
* Kaiser window, ``beta = 14.769656459379492``
* rolloff ``0.9475937167399596``
* linear interpolation between filter-table samples
* output length ``int(n * ratio)`` then librosa ``fix_length`` pads/trims
  to ``ceil(n * ratio)``

This module re-implements that algorithm faithfully (filter construction
and the two-wing interpolation loop with its integer truncations), but
vectorized over blocks of output samples instead of a numba scalar loop.
``tests/test_dsp_golden.py`` pins the output against a direct scalar
transcription of the published algorithm.
"""

import functools
import math

import numpy as np
from scipy import special as _special

KAISER_BEST_BETA = 14.769656459379492
KAISER_BEST_ROLLOFF = 0.9475937167399596
NUM_ZEROS = 64
PRECISION_BITS = 9  # 2**9 = 512 table samples per zero crossing

_BLOCK = 65536  # output samples per vectorized block (bounds temporaries)


@functools.lru_cache(maxsize=1)
def kaiser_best_window():
    """Right half of the kaiser_best interpolation filter, length
    ``512 * 64 + 1`` — ``rolloff * sinc(rolloff * x) * kaiser(beta)``."""
    num_bits = 2 ** PRECISION_BITS
    n = num_bits * NUM_ZEROS
    x = np.arange(n + 1, dtype=np.float64) / num_bits  # 0 .. NUM_ZEROS
    sinc_part = KAISER_BEST_ROLLOFF * np.sinc(KAISER_BEST_ROLLOFF * x)
    # right half of a symmetric Kaiser window of length 2n+1
    arg = 1.0 - (np.arange(n + 1, dtype=np.float64) / n) ** 2
    taper = _special.i0(KAISER_BEST_BETA * np.sqrt(np.maximum(arg, 0.0)))
    taper /= _special.i0(KAISER_BEST_BETA)
    return sinc_part * taper


def _resample_kaiser_best(x, sr_orig, sr_new, time_semantics="div"):
    """resampy ``resample(x, sr_orig, sr_new, filter='kaiser_best')`` —
    vectorized two-wing sinc interpolation with table linear interpolation.

    ``time_semantics`` selects the floating-point expression for the output
    sample's time register, the ONE place resampy generations differ:

    * ``"div"`` — ``t / ratio`` (ours; also what an exact rational register
      rounds to per-sample),
    * ``"mul"`` — ``t * (1.0 / ratio)`` (resampy 0.4.x precomputes
      ``arange(n) * time_increment``),
    * ``"accum"`` — running ``time_register += 1.0 / ratio`` (resampy
      0.2.x's scalar loop).

    The variants differ by last-ulp rounding, which can flip the
    ``int(time_register)`` truncation at rational-ratio integer boundaries;
    the interpolation formula is continuous across that flip, so the output
    ambiguity is tiny — measured and pinned in
    ``tests/test_dsp_golden.py::test_time_register_ambiguity_band``."""
    x = np.asarray(x, dtype=np.float64)
    ratio = float(sr_new) / float(sr_orig)
    n_orig = x.shape[0]
    n_out = int(n_orig * ratio)

    interp_win = kaiser_best_window()
    if ratio < 1.0:
        interp_win = ratio * interp_win
    interp_delta = np.zeros_like(interp_win)
    interp_delta[:-1] = np.diff(interp_win)

    num_table = 2 ** PRECISION_BITS
    scale = min(1.0, ratio)
    index_step = int(scale * num_table)
    nwin = interp_win.shape[0]
    max_wing = nwin // max(index_step, 1) + 1

    y = np.zeros(n_out, dtype=np.float64)
    taps = np.arange(max_wing)

    def _wing(off, eta, bound, x_idx):
        """Sum one filter wing for a block: weights from the table at
        ``off + i*index_step`` (linearly interpolated by ``eta``) times
        source samples at ``x_idx[:, i]``, masked to ``i < bound``."""
        win_idx = off[:, None] + taps[None, :] * index_step
        valid = taps[None, :] < bound[:, None]
        win_idx = np.where(valid, win_idx, 0)
        w = interp_win[win_idx] + eta[:, None] * interp_delta[win_idx]
        xs = x[np.clip(x_idx, 0, n_orig - 1)]
        return np.where(valid, w * xs, 0.0).sum(axis=1)

    if time_semantics == "mul":
        all_regs = np.arange(n_out, dtype=np.float64) * (1.0 / ratio)
    elif time_semantics == "accum":
        # the scalar loop's running sum: cumsum of a constant increment
        # reproduces repeated ``+=`` exactly only sample by sample, so do it
        # the slow exact way (this path exists for the ambiguity test)
        all_regs = np.empty(n_out, dtype=np.float64)
        reg, inc = 0.0, 1.0 / ratio
        for i in range(n_out):
            all_regs[i] = reg
            reg += inc
    else:
        all_regs = None  # "div": computed per block below

    for start in range(0, n_out, _BLOCK):
        t = np.arange(start, min(start + _BLOCK, n_out))
        time_register = t / ratio if all_regs is None else all_regs[t]
        n = time_register.astype(np.int64)

        frac = scale * (time_register - n)
        index_frac = frac * num_table
        off = index_frac.astype(np.int64)
        eta = index_frac - off
        i_max = np.minimum(n + 1, (nwin - off) // index_step)
        y[t] = _wing(off, eta, i_max, n[:, None] - taps[None, :])

        frac = scale - frac
        index_frac = frac * num_table
        off = index_frac.astype(np.int64)
        eta = index_frac - off
        k_max = np.minimum(n_orig - n - 1, (nwin - off) // index_step)
        y[t] += _wing(off, eta, k_max, n[:, None] + 1 + taps[None, :])
    return y


def resample(wav, orig_sr, target_sr):
    """Resample a 1-D float signal from ``orig_sr`` to ``target_sr``
    exactly as ``librosa.resample(res_type='kaiser_best', fix=True,
    scale=False)`` does (reference /root/reference/paule/util.py:115-116)."""
    if orig_sr == target_sr:
        return np.asarray(wav, dtype=np.float64)
    out = _resample_kaiser_best(wav, orig_sr, target_sr)
    # librosa fix_length to ceil(n * ratio)
    n_fixed = int(math.ceil(len(wav) * float(target_sr) / float(orig_sr)))
    if len(out) > n_fixed:
        out = out[:n_fixed]
    elif len(out) < n_fixed:
        out = np.pad(out, (0, n_fixed - len(out)))
    return out
