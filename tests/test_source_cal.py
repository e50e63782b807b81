"""Per-speaker glottal-source calibration (``[source]`` speaker section,
model.cpp ``Speaker::SourceCal``; fitted by
``speaker_import.fit_source`` — the audio-level analogue of the
``[tract_affine]`` tube fit).

No reference checkout needed: INI speakers layer overrides on the builtin
default speaker, so a ``[source]``-only file isolates the calibration.
"""

import os

import numpy as np
import pytest

from paule_tpu import synth
from paule_tpu.synth import speaker_import


@pytest.fixture(autouse=True)
def restore_default_speaker():
    yield
    synth.initialize()


def _sustained_cp(n=180):
    """A voiced sustained neutral-vowel trajectory (denormalized)."""
    synth.initialize()
    tract = synth.get_param_info("tract")
    glottis = synth.get_param_info("glottis")
    row = np.concatenate([tract["neutrals"], glottis["neutrals"]])
    # ensure voicing: F0 120 Hz, lung pressure 8000
    row[19] = 120.0
    row[20] = 8000.0
    return np.tile(row, (n, 1))


def _spectral_centroid(sig, sr):
    spec = np.abs(np.fft.rfft(sig * np.hanning(len(sig))))
    freqs = np.fft.rfftfreq(len(sig), 1.0 / sr)
    return float((spec * freqs).sum() / max(spec.sum(), 1e-12))


def test_source_absent_is_bit_identical(tmp_path):
    cp = _sustained_cp()
    synth.initialize()
    ref, sr = synth.speak(cp)

    ini = tmp_path / "plain.ini"
    ini.write_text("[meta]\nname = plain\n")
    synth.initialize(str(ini))
    got, _ = synth.speak(cp)
    np.testing.assert_array_equal(got, ref)


def test_deriv_mix_brightens_spectrum(tmp_path):
    cp = _sustained_cp()
    synth.initialize()
    base, sr = synth.speak(cp)

    ini = tmp_path / "bright.ini"
    ini.write_text("[meta]\nname = bright\n[source]\nderiv_mix = 2.0\n")
    synth.initialize(str(ini))
    bright, _ = synth.speak(cp)

    assert not np.array_equal(bright, base)
    assert np.isfinite(bright).all()
    c_base = _spectral_centroid(base[4410:], sr)
    c_bright = _spectral_centroid(bright[4410:], sr)
    assert c_bright > c_base * 1.05, (c_base, c_bright)


def test_skew_offset_changes_waveform(tmp_path):
    cp = _sustained_cp()
    synth.initialize()
    base, _sr = synth.speak(cp)

    ini = tmp_path / "skew.ini"
    ini.write_text("[meta]\nname = skew\n[source]\nskew_offset = 0.8\n")
    synth.initialize(str(ini))
    skewed, _ = synth.speak(cp)
    assert not np.array_equal(skewed, base)
    assert np.isfinite(skewed).all()


def test_save_speaker_round_trips_source(tmp_path):
    cp = _sustained_cp()  # note: resets to the default speaker

    src_ini = tmp_path / "cal.ini"
    src_ini.write_text("[meta]\nname = cal\n[source]\nderiv_mix = 1.25\n"
                       "skew_offset = 0.4\naspiration_db = -3\n")
    synth.initialize(str(src_ini))
    a, _ = synth.speak(cp)
    out_ini = tmp_path / "saved.ini"
    synth.save_speaker(str(out_ini))
    text = out_ini.read_text()
    assert "[source]" in text
    assert "deriv_mix = 1.25" in text
    assert "skew_offset = 0.4" in text
    assert "aspiration_db = -3" in text

    synth.initialize(str(out_ini))
    b, _ = synth.speak(cp)
    np.testing.assert_array_equal(a, b)


def test_source_ini_lines_renderer():
    lines = speaker_import.source_ini_lines(
        {"deriv_mix": 1.5, "skew_offset": 0.0, "aspiration_db": 0.0})
    assert lines[1] == "[source]"
    assert lines[2] == "deriv_mix = 1.5"
    assert speaker_import.source_ini_lines(
        {"deriv_mix": 0.0, "skew_offset": 0.0}) == []


def test_fit_source_converges_on_synthetic_objective():
    """fit_source's search machinery: a quadratic-bowl measure_fn whose
    optimum sits off-grid must be approached by the refinement rounds."""
    target = {"a": (660.0, 1120.0), "i": (240.0, 2200.0)}
    opt_d, opt_s = 1.3, 0.55

    def measure(source):
        d, s = source["deriv_mix"], source["skew_offset"]
        off = abs(d - opt_d) + abs(s - opt_s)
        return {ph: (f1 * np.exp(0.3 * off), f2)
                for ph, (f1, f2) in target.items()}

    fit = speaker_import.fit_source(measure, target)
    assert abs(fit["deriv_mix"] - opt_d) <= 0.5
    assert abs(fit["skew_offset"] - opt_s) <= 0.3
    assert fit["diagnostics"]["objective"] < 0.15
    assert fit["diagnostics"]["n_evaluations"] >= 15


@pytest.mark.skipif(
    not os.path.exists("paule_tpu/synth/speaker/jd3_calibrated.ini"),
    reason="committed calibrated JD3 speaker not present")
def test_calibrated_jd3_f1_ordering():
    """The committed source-calibrated JD3 speaker preserves the open-to-
    close F1 ordering of the cardinal vowels (a > o > u, a > e > i)."""
    from paule_tpu.dsp.formants import lpc_formants

    ini = "paule_tpu/synth/speaker/jd3_calibrated.ini"
    with open(ini) as fh:
        text = fh.read()
    if "[source]" not in text:
        pytest.skip("jd3_calibrated.ini predates the source calibration")
    synth.initialize(ini)

    import tempfile

    f1 = {}
    for phone in ("a", "e", "i", "o", "u"):
        # build from the speaker's phone table via seg_to_cps
        with tempfile.NamedTemporaryFile(
                "w", suffix=".seg", delete=False) as fh:
            fh.write(f"name = {phone}; duration_s = 0.55;\n")
            seg = fh.name
        cps = synth.seg_to_cps(seg)
        os.unlink(seg)
        sig, sr = synth.speak(cps)
        f1[phone], _ = lpc_formants(sig, sr, n_formants=2,
                                    max_bandwidth_hz=500.0)
    assert f1["a"] > f1["o"] > f1["u"], f1
    assert f1["a"] > f1["e"] > f1["i"], f1
