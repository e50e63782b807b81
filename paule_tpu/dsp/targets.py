"""Target-acoustics preparation shared by every planning entry point.

The min-shift convention is load-bearing for loss parity with the reference
(/root/reference/paule/paule.py:523-529): the TARGET mel is shifted so its
minimum is 0, while produced mels stay unshifted.  plan_resynth,
plan_iterative and plan_corpus_batched all go through these helpers so the
convention cannot silently diverge between entry points.
"""

import numpy as np

from .audio import read as audio_read, stereo_to_mono
from .mel import librosa_melspec
from ..ops.normalize import normalize_mel


def normalized_target_mel(sig, sr):
    """Audio signal -> normalized log-mel with the target min-shift."""
    mel = np.asarray(normalize_mel(librosa_melspec(sig, sr)))
    return mel - mel.min()


def audio_target_to_mel(target):
    """Audio file path or ``(sig, sr)`` -> ``(sig, sr, target_mel)``."""
    if isinstance(target, str):
        sig, sr = audio_read(target)
    else:
        sig, sr = target
    if getattr(sig, "ndim", 1) == 2:
        sig = stereo_to_mono(sig)
    return sig, sr, normalized_target_mel(sig, sr)
