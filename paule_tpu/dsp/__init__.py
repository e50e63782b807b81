"""On-device DSP: log-mel features, mel inversion (Griffin-Lim), resampling
and minimal audio file IO."""

from . import audio, griffinlim, mel, resample  # noqa: F401
from .mel import librosa_melspec, melspec_44100  # noqa: F401
from .griffinlim import mel_to_sig  # noqa: F401
