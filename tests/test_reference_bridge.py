"""The reference_bridge runs the UPSTREAM package in this environment:
shims for librosa/soundfile/toml, the reference's own native VTL library,
and numerical agreement between the shimmed DSP and ours.  This is the
foundation of bench.py's baseline leg (the reference's actual plan_resynth
code)."""

import pathlib

import numpy as np
import pytest

from paule_tpu.reference_bridge import import_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_pkg():
    return import_reference()


def test_reference_imports_with_real_vtl(ref_pkg):
    import ctypes

    import paule.util as U

    # the vendored native VocalTractLab library answers the version call
    # (util deletes its VERSION after printing, so query the lib directly)
    buf = ctypes.c_char_p(b" " * 64)
    U.VTL.vtlGetVersion(buf)
    assert buf.value.startswith(b"API")
    # the reference's module-level silence anchor, computed through OUR
    # librosa shim, equals its documented value (paule/util.py:135)
    assert U.mel_mean_librosa == pytest.approx(-83.52182518111363,
                                               abs=1e-10)


def test_reference_speak_contract(ref_pkg):
    import paule.util as U

    sig, sr = U.speak(U.inv_normalize_cp(np.zeros((41, 30))))
    assert sr == 44100
    assert sig.shape == (40 * 110,)


def test_shim_melspec_equals_ours(ref_pkg):
    """The reference leg's feature extraction (librosa shim) and our jitted
    pipeline agree — both legs of the benchmark measure loss on the same
    mel scale."""
    import paule.util as U

    from paule_tpu.dsp.mel import librosa_melspec as ours

    rng = np.random.default_rng(5)
    sig = 0.2 * rng.standard_normal(11025)
    np.testing.assert_allclose(U.librosa_melspec(sig, 44100),
                               ours(sig, 44100), atol=1e-6, rtol=0)
    # and at a non-native rate (shim resample == our exact kaiser_best)
    sig16 = 0.2 * rng.standard_normal(4000)
    np.testing.assert_allclose(U.librosa_melspec(sig16, 16000),
                               ours(sig16, 16000), atol=1e-6, rtol=0)


def test_reference_models_construct(ref_pkg):
    """The model classes bench.py instantiates for the baseline leg."""
    import paule.models as M

    m = M.ForwardModel(num_lstm_layers=1, hidden_size=32).double()
    import torch

    with torch.no_grad():
        out = m(torch.zeros(1, 8, 30, dtype=torch.float64))
    assert out.shape == (1, 4, 60)
