"""Minimal audio file IO without external audio libraries.

Supports WAV natively (PCM 16/24/32-bit and IEEE float, mono/stereo) in pure
numpy.  FLAC/OGG/MP3 are decoded through ``ffmpeg`` if present on the system;
otherwise a clear error tells the user to provide WAV or raw ``(sig, sr)``.

The reference uses ``soundfile`` (libsndfile) for this; soundfile is not part
of this environment, and audio IO is not a performance path.
"""

import os
import shutil
import struct
import subprocess
import wave

import numpy as np


def read(path):
    """Read an audio file -> (float64 signal in [-1, 1], sample_rate).

    Stereo files keep their channel dimension ``(n, 2)`` like soundfile does;
    use :func:`stereo_to_mono` to collapse.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        return _read_wav(path)
    return _read_via_ffmpeg(path)


def write(path, sig, samplerate):
    """Write a float signal to a 16-bit PCM WAV (FLAC via ffmpeg if asked).

    Returns the path actually written: without an ffmpeg encoder a non-WAV
    request falls back to the same name with a ``.wav`` extension."""
    ext = os.path.splitext(path)[1].lower()
    sig = np.asarray(sig, dtype=np.float64)
    if ext == ".wav":
        _write_wav(path, sig, samplerate)
        return path
    if shutil.which("ffmpeg"):
        tmp = path + ".tmp.wav"
        _write_wav(tmp, sig, samplerate)
        try:
            subprocess.run(
                ["ffmpeg", "-hide_banner", "-loglevel", "error", "-y",
                 "-i", tmp, path],
                check=True,
            )
        finally:
            os.unlink(tmp)
        return path
    # no encoder available: fall back to WAV under the same stem
    fallback = os.path.splitext(path)[0] + ".wav"
    _write_wav(fallback, sig, samplerate)
    return fallback


def stereo_to_mono(wave_data, which="both"):
    """Collapse a stereo signal (reference /root/reference/paule/util.py:483)."""
    if which == "left":
        return wave_data[:, 0]
    if which == "right":
        return wave_data[:, 1]
    return (wave_data[:, 0] + wave_data[:, 1]) / 2


def _read_wav(path):
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path} is not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_fmt, channels, sr, _, _, bits = fmt
    if audio_fmt == 0xFFFE and len(data) >= 2:  # WAVE_FORMAT_EXTENSIBLE
        audio_fmt = 1 if bits in (16, 24, 32) else 3
    if audio_fmt == 3:  # IEEE float
        dtype = np.float32 if bits == 32 else np.float64
        sig = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    elif audio_fmt == 1:
        if bits == 16:
            sig = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            sig = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            vals = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            sig = vals.astype(np.float64) / float(1 << 23)
        elif bits == 8:
            sig = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format tag {audio_fmt}")
    if channels > 1:
        sig = sig.reshape(-1, channels)
    return sig, sr


def _write_wav(path, sig, samplerate):
    sig = np.clip(sig, -1.0, 1.0)
    pcm = (sig * 32767.0).astype("<i2")
    channels = 1 if pcm.ndim == 1 else pcm.shape[1]
    with wave.open(path, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(int(samplerate))
        wf.writeframes(pcm.tobytes())


def _read_via_ffmpeg(path):
    if not shutil.which("ffmpeg"):
        raise RuntimeError(
            f"cannot decode {path!r}: only WAV is supported natively and "
            "ffmpeg is not installed; pass (signal, samplerate) instead"
        )
    out = subprocess.run(
        ["ffmpeg", "-hide_banner", "-loglevel", "error", "-i", path,
         "-f", "f64le", "-acodec", "pcm_f64le", "-"],
        check=True, capture_output=True,
    ).stdout
    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-show_entries",
         "stream=sample_rate,channels", "-of", "csv=p=0", path],
        check=True, capture_output=True, text=True,
    ).stdout.strip().split(",")
    sr, channels = int(probe[0]), int(probe[1])
    sig = np.frombuffer(out, dtype="<f8")
    if channels > 1:
        sig = sig.reshape(-1, channels)
    return sig, sr
