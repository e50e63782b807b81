"""DSP tests: mel pipeline semantics, Griffin-Lim inversion, resampling,
audio IO.  librosa is not available in this environment, so the tests verify
the *mathematical contracts* of the pipeline (frame counts, silence anchor,
dB linearity, filterbank normalization, tone localization) rather than
diffing against librosa output."""

import numpy as np
import jax.numpy as jnp
import pytest

from paule_tpu.dsp import mel as M
from paule_tpu.dsp import resample as R
from paule_tpu.dsp import audio as A
from paule_tpu.dsp import griffinlim as G
from paule_tpu.ops import normalize as N


def test_frame_count_contract():
    # mel frames must be exactly half the cp sequence length:
    # speak() produces (seq-1)*110 samples; frames = 1 + n//220 = seq/2
    for seq in (10, 100, 402):
        n = (seq - 1) * 110
        assert M.n_frames(n) == seq // 2


def test_silence_gives_anchor_value():
    mel = np.asarray(M.librosa_melspec(np.zeros(5000), 44100))
    assert mel.shape == (M.n_frames(5000), 60)
    np.testing.assert_allclose(mel, -83.52182518111363, atol=1e-6)


def test_db_scaling_linearity():
    rng = np.random.default_rng(0)
    sig = rng.normal(size=22050) * 0.1
    m1 = M.librosa_melspec(sig, 44100)
    m2 = M.librosa_melspec(10.0 * sig, 44100)
    # amplitude x10 => +20 dB wherever not clipped by amin/top_db
    mask = (m1 > m1.min() + 1) & (m2 < m2.max() - 1) & (m2 > m2.max() - 79)
    assert mask.sum() > 100
    np.testing.assert_allclose((m2 - m1)[mask], 20.0, atol=1e-3)


def test_tone_localizes_in_mel():
    t = np.arange(44100) / 44100
    sig = 0.3 * np.sin(2 * np.pi * 1000.0 * t)
    mel = M.librosa_melspec(sig, 44100)
    fb = M.mel_filterbank()
    centers = M.mel_to_hz(
        np.linspace(M.hz_to_mel(10.0), M.hz_to_mel(12000.0), 62))[1:-1]
    peak_band = int(np.argmax(mel.mean(axis=0)))
    assert abs(centers[peak_band] - 1000.0) < 150.0


def test_filterbank_shape_and_coverage():
    fb = M.mel_filterbank()
    assert fb.shape == (513, 60)
    assert (fb >= 0).all()
    # every filter has support
    assert (fb.sum(axis=0) > 0).all()


def test_top_db_clipping():
    t = np.arange(44100) / 44100
    sig = 1e-2 * np.sin(2 * np.pi * 500.0 * t)
    mel = M.librosa_melspec(sig, 44100)
    assert mel.max() - mel.min() <= 80.0 + 1e-6


def test_resample_preserves_tone():
    sr_in = 16000
    t = np.arange(sr_in) / sr_in
    sig = np.sin(2 * np.pi * 440.0 * t)
    out = R.resample(sig, sr_in, 44100)
    assert len(out) == 44100
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    freq = np.fft.rfftfreq(len(out), 1 / 44100)
    assert abs(freq[np.argmax(spec)] - 440.0) < 2.0


def test_audio_wav_roundtrip(tmp_path):
    sr = 44100
    sig = 0.5 * np.sin(2 * np.pi * 220 * np.arange(sr // 4) / sr)
    path = str(tmp_path / "x.wav")
    A.write(path, sig, sr)
    got, got_sr = A.read(path)
    assert got_sr == sr
    assert len(got) == len(sig)
    np.testing.assert_allclose(got, sig, atol=1e-4)


def test_stereo_to_mono():
    x = np.stack([np.ones(5), 3 * np.ones(5)], axis=1)
    np.testing.assert_allclose(A.stereo_to_mono(x), 2.0)
    np.testing.assert_allclose(A.stereo_to_mono(x, "left"), 1.0)
    np.testing.assert_allclose(A.stereo_to_mono(x, "right"), 3.0)


def test_mel_to_sig_length_contract():
    # mel (frames, 60) -> signal of length 220*frames - 110, i.e. the same
    # length speak() produces for a 2*frames cp trajectory
    frames = 20
    mel = np.zeros((frames, 60))
    sig, sr = G.mel_to_sig(mel)
    assert sr == 44100
    assert len(sig) == 220 * frames - 110


def test_griffin_lim_reconstructs_tone_mel():
    # synthesize a tone, featurize, invert, featurize again: the mel of the
    # reconstruction must correlate strongly with the original mel
    t = np.arange(22050) / 44100
    sig = 0.3 * np.sin(2 * np.pi * 800.0 * t) * np.hanning(len(t))
    mel = M.librosa_melspec(sig, 44100)
    norm = N.normalize_mel(mel)
    rec, sr = G.mel_to_sig(norm)
    mel2 = M.librosa_melspec(rec, sr)
    n = min(mel.shape[0], mel2.shape[0])
    a, b = mel[:n].ravel(), mel2[:n].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.85
