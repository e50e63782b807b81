"""High-quality sample-rate conversion on the host.

The reference resamples with librosa's ``kaiser_best`` (a 64-zero-crossing
Kaiser-windowed sinc).  We use scipy's polyphase resampler with an equivalent
Kaiser window (beta ≈ 14.77, the ``kaiser_best`` design beta), which gives a
comparably steep, low-ripple filter.  Exact filter parity with resampy is not
a behavioral contract — the contract is "resample to 44.1 kHz with a
high-quality anti-aliased filter" (reference /root/reference/paule/util.py:116).
"""

import math

import numpy as np
from scipy import signal as _signal

KAISER_BEST_BETA = 14.769656459379492


def resample(wav, orig_sr, target_sr):
    """Resample a 1-D float signal from ``orig_sr`` to ``target_sr``."""
    if orig_sr == target_sr:
        return np.asarray(wav, dtype=np.float64)
    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = int(target_sr) // g, int(orig_sr) // g
    out = _signal.resample_poly(
        np.asarray(wav, dtype=np.float64), up, down,
        window=("kaiser", KAISER_BEST_BETA),
    )
    # match librosa's fix=True output-length convention: ceil(n * ratio)
    n_out = int(math.ceil(len(wav) * target_sr / orig_sr))
    if len(out) > n_out:
        out = out[:n_out]
    elif len(out) < n_out:
        out = np.pad(out, (0, n_out - len(out)))
    return out
