"""VTL XML speaker import (synth/speaker_import.py).

The upstream reference ships its speaker as the JD3 XML consumed by the
closed VTL binary (/root/reference/paule/vocaltractlab_api/JD3.speaker);
these tests import that actual file into our INI format and verify the
result loads into the synthesizer with JD3's parameter semantics.
"""

import os

import numpy as np
import pytest

from paule_tpu import synth
from paule_tpu.synth import speaker_import

from paule_tpu.reference_bridge import reference_available

JD3 = "/root/reference/paule/vocaltractlab_api/JD3.speaker"

pytestmark = pytest.mark.skipif(
    not (reference_available() and os.path.exists(JD3)),
    reason="reference JD3.speaker not available")


@pytest.fixture(scope="module")
def parsed():
    return speaker_import.parse_vtl_speaker(JD3)


def test_parse_param_tables(parsed):
    names = [r[1] for r in parsed["tract_params"]]
    assert names == ["HX", "HY", "JX", "JA", "LP", "LD", "VS", "VO",
                     "TCX", "TCY", "TTX", "TTY", "TBX", "TBY", "TRX",
                     "TRY", "TS1", "TS2", "TS3"]
    gnames = [r[1] for r in parsed["glottis_params"]]
    assert gnames == ["F0", "PR", "XB", "XT", "CA", "PL", "RA", "DP",
                      "PS", "FL", "AS"]
    # spot-check exact XML values (JD3.speaker:45-46,1527)
    hx = parsed["tract_params"][0]
    assert hx[2:] == (0.0, 1.0, 1.0)
    f0 = parsed["glottis_params"][0]
    assert f0[2:] == (40.0, 600.0, 120.0)
    assert parsed["glottis_model"] == "Geometric glottis"


def test_parse_shapes_and_anatomy(parsed):
    assert len(parsed["tract_shapes"]) >= 60  # 68 tract shapes in JD3
    assert "a" in parsed["tract_shapes"]
    assert parsed["tract_shapes"]["a"]["TCX"] == pytest.approx(0.1524)
    assert "modal" in parsed["glottis_shapes"]
    assert parsed["anatomy"]["nasal_length_cm"] == pytest.approx(11.4)
    assert parsed["glottis_static"]["RL"] == pytest.approx(1.6)


def test_base_length_estimate(parsed):
    # JD3 is the adult male ~16-17 cm speaker
    est = speaker_import.estimate_base_length_cm(parsed)
    assert 15.0 <= est <= 17.5


def test_ini_loads_with_jd3_semantics(tmp_path, parsed):
    out = tmp_path / "jd3.speaker"
    speaker_import.import_speaker(JD3, out, name="jd3")
    synth.initialize(str(out))
    try:
        info = synth.get_param_info("tract")
        assert info["names"] == [r[1] for r in parsed["tract_params"]]
        np.testing.assert_allclose(
            info["mins"], [r[2] for r in parsed["tract_params"]])
        np.testing.assert_allclose(
            info["maxs"], [r[3] for r in parsed["tract_params"]])
        np.testing.assert_allclose(
            info["neutrals"], [r[4] for r in parsed["tract_params"]])
        ginfo = synth.get_param_info("glottis")
        assert ginfo["names"] == [r[1] for r in parsed["glottis_params"]]
        np.testing.assert_allclose(
            ginfo["neutrals"], [r[4] for r in parsed["glottis_params"]])

        # the imported speaker actually phonates
        neutral = np.concatenate([info["neutrals"], ginfo["neutrals"]])
        cp = np.tile(neutral, (41, 1))
        sig, sr = synth.speak(cp)
        assert sr == 44100 and len(sig) == 40 * 110
        assert np.isfinite(sig).all()
        assert np.abs(sig).max() > 1e-5
    finally:
        synth.initialize()  # restore the default speaker


def test_phone_targets_from_shapes(tmp_path, parsed):
    out = tmp_path / "jd3.speaker"
    speaker_import.import_speaker(JD3, out, voiceless=["voiceless-demo"])
    text = out.read_text()
    assert "[phones]" in text
    # the /a/ row carries JD3's own shape values in param-table order
    a_row = next(line for line in text.splitlines()
                 if line.startswith("a "))
    vals = a_row.split()
    assert vals[1] == "1"  # voiced by default
    tract_vals = [float(v) for v in vals[3:22]]
    expected = [parsed["tract_shapes"]["a"].get(r[1], r[4])
                for r in parsed["tract_params"]]
    np.testing.assert_allclose(tract_vals, expected, rtol=1e-5)
    # glottis columns come from the modal glottis shape
    gvals = [float(v) for v in vals[22:33]]
    gneutral = {r[1]: r[4] for r in parsed["glottis_params"]}
    modal = dict(gneutral)
    modal.update(parsed["glottis_shapes"]["modal"])
    np.testing.assert_allclose(
        gvals, [modal[r[1]] for r in parsed["glottis_params"]], rtol=1e-5)


def test_imported_phones_drive_seg_to_cps(tmp_path):
    out = tmp_path / "jd3.speaker"
    speaker_import.import_speaker(JD3, out)
    synth.initialize(str(out))
    try:
        seg = tmp_path / "demo.seg"
        seg.write_text("name = a; duration_s = 0.20;\n"
                       "name = i; duration_s = 0.20;\n")
        cps = synth.seg_to_cps(str(seg))
        assert cps.shape[1] == 30
        assert np.isfinite(cps).all()
        sig, sr = synth.speak(cps)
        assert np.abs(sig).max() > 1e-5
    finally:
        synth.initialize()


def test_malformed_xml_reports_missing_element(tmp_path):
    """Structurally broken speaker XMLs raise ValueError naming the missing
    element instead of an AttributeError traceback (CLI-facing path)."""
    cases = {
        "no_anatomy.speaker": (
            "<speaker><vocal_tract_model></vocal_tract_model>"
            "<glottis_models><glottis_model type='g'>"
            "<control_params/><static_params/></glottis_model>"
            "</glottis_models></speaker>",
            "anatomy"),
        "empty_glottis.speaker": (
            "<speaker><vocal_tract_model><anatomy/></vocal_tract_model>"
            "<glottis_models></glottis_models></speaker>",
            "glottis_models"),
        "no_control.speaker": (
            "<speaker><vocal_tract_model><anatomy/></vocal_tract_model>"
            "<glottis_models><glottis_model type='Geometric glottis'>"
            "<static_params/></glottis_model></glottis_models></speaker>",
            "control_params"),
        "no_static.speaker": (
            "<speaker><vocal_tract_model><anatomy/></vocal_tract_model>"
            "<glottis_models><glottis_model type='Geometric glottis'>"
            "<control_params/></glottis_model></glottis_models></speaker>",
            "static_params"),
    }
    for fname, (xml, needle) in cases.items():
        f = tmp_path / fname
        f.write_text(xml)
        with pytest.raises(ValueError, match=needle):
            speaker_import.parse_vtl_speaker(f)


def test_calibrated_jd3_formant_orderings():
    """The committed calibrated JD3 import (tools/calibrate_jd3.py,
    docs/speakers.md measured table) preserves the vowel-space formant
    structure: F1 ordering a > e > i and a > o/u, front vowels' F2 above
    back vowels', and all formants in plausible speech ranges."""
    import os

    from paule_tpu import synth
    from paule_tpu.dsp.formants import lpc_formants
    from paule_tpu.synth.speaker_import import parse_vtl_speaker

    ini = os.path.join(os.path.dirname(synth.__file__), "speaker",
                       "jd3_calibrated.ini")
    assert os.path.exists(ini), "committed calibrated speaker missing"

    jd3 = "/root/reference/paule/vocaltractlab_api/JD3.speaker"
    if not os.path.exists(jd3):
        pytest.skip("JD3 source speaker not available for shape targets")
    parsed = parse_vtl_speaker(jd3)

    def sustained(phone, t=265):
        tract = [parsed["tract_shapes"][phone].get(pname, ne)
                 for _, pname, _, _, ne in parsed["tract_params"]]
        gneutral = {r[1]: r[4] for r in parsed["glottis_params"]}
        modal = dict(gneutral)
        modal.update(parsed["glottis_shapes"].get(
            "modal", parsed["glottis_shapes"].get("default", {})))
        glottis = [modal[r[1]] for r in parsed["glottis_params"]]
        return np.tile(np.asarray(tract + glottis), (t, 1))

    synth.initialize(ini)
    try:
        f = {}
        for ph in ("a", "e", "i", "o", "u"):
            sig, sr = synth.speak(sustained(ph))
            # 500 Hz bandwidth gate like tools/calibrate_jd3.py: our
            # waveguide's mid resonances are broader than VTL's and the
            # default 300 Hz gate would drop a present formant
            f[ph] = lpc_formants(sig, sr, n_formants=2,
                                 max_bandwidth_hz=500.0)
    finally:
        synth.initialize()  # restore the default speaker

    # F1: open 'a' above mid 'e' above close 'i'; 'a' above back vowels
    assert f["a"][0] > f["e"][0] > f["i"][0]
    assert f["a"][0] > f["o"][0]
    assert f["a"][0] > f["u"][0]
    # F2: front vowels above back vowels
    assert f["i"][1] > f["o"][1]
    assert f["i"][1] > f["u"][1]
    # the [tract_affine] fitted tube map gives back vowels genuinely LOW
    # F2 (VTL: o 621, u 777); the geometric map compressed them to 1300+
    assert f["o"][1] < 1200.0
    assert f["u"][1] < 1200.0
    assert f["e"][1] > f["o"][1]
    # plausible speech ranges
    for ph, (f1, f2) in f.items():
        assert 150 < f1 < 1200, (ph, f1)
        assert 500 < f2 < 3500, (ph, f2)


def test_tract_map_override(tmp_path):
    """[tract_map] tunes the geometric proximity->constriction gains; an
    absent section leaves the builtin geometry bit-identical."""
    t = np.zeros((6, 30))
    t[:, 9] = -0.5  # mid tongue-body raising
    synth.initialize()
    _a, _sr, info0 = synth.speak_and_extract_tube_information(t)
    area_default = np.asarray(info0["tube_area_cm2"])[3]

    plain = tmp_path / "plain.ini"
    plain.write_text("[meta]\nname = plain\n")
    synth.initialize(str(plain))
    _a, _sr, info1 = synth.speak_and_extract_tube_information(t)
    np.testing.assert_array_equal(
        np.asarray(info1["tube_area_cm2"])[3], area_default)

    mapped = tmp_path / "mapped.ini"
    mapped.write_text(
        "[meta]\nname = mapped\n[tract_map]\n"
        "gain_body = 4.0\nexp_body = 1.5\nlip_factor = 0.5\n")
    synth.initialize(str(mapped))
    _a, _sr, info2 = synth.speak_and_extract_tube_information(t)
    area_mapped = np.asarray(info2["tube_area_cm2"])[3]
    synth.initialize()
    assert not np.allclose(area_mapped, area_default)
    # stronger dorsal gain at mid proximity -> smaller velar-region area
    assert area_mapped[18:26].min() < area_default[18:26].min()


def test_fit_tract_affine_recovers_synthetic_map(tmp_path):
    """fit_tract_affine recovers a quadratic ground-truth tube map, and the
    emitted [tract_affine] INI drives the C++ tube path to the fitted
    values (full python-fit -> INI -> C++ round trip)."""
    jd3 = "/root/reference/paule/vocaltractlab_api/JD3.speaker"
    if not os.path.exists(jd3):
        pytest.skip("JD3 source speaker not available")
    parsed = speaker_import.parse_vtl_speaker(jd3)

    rng = np.random.default_rng(5)
    B = rng.normal(0.5, 0.3, 40)
    W = rng.normal(0, 0.05, (40, 19))
    V = rng.normal(0, 0.01, (40, 19))

    def synthetic(q):
        q = np.asarray(q)
        log_area = B + W @ q + V @ (q * q)
        area = np.exp(np.clip(log_area, -4.0, 2.0))
        return {"tube_length_cm": np.full(40, 16.0 / 40),
                "tube_area_cm2": area,
                "incisor_pos_cm": 15.0 + 0.1 * q[2],
                "tongue_tip_side_elevation": q[18],
                "velum_opening_cm2": max(0.0, q[7])}

    fit = speaker_import.fit_tract_affine(parsed, synthetic, n_samples=600,
                                          seed=1, ridge=1e-7)
    assert fit["diagnostics"]["logarea_rmse"] < 0.05

    ini = tmp_path / "affine.ini"
    speaker_import.import_speaker(jd3, str(ini), name="affine-test",
                                  tube_fit=fit)
    synth.initialize(str(ini))
    try:
        tract = np.asarray([parsed["tract_shapes"]["a"].get(pname, ne)
                            for _, pname, _, _, ne in
                            parsed["tract_params"]])
        t30 = np.concatenate([tract, np.zeros(11)])[None].repeat(4, 0)
        _a, _sr, info = synth.speak_and_extract_tube_information(t30)
        ours = np.asarray(info["tube_area_cm2"])[2]
        want = synthetic(tract)["tube_area_cm2"]
        # C++ [tract_affine] evaluation reproduces the fitted map at a
        # shape point (fit error is tiny at ridge 1e-7; fast_exp ~1e-9)
        assert np.max(np.abs(np.log(ours) - np.log(want))) < 0.15
        lens = np.asarray(info["tube_length_cm"])[2]
        assert abs(lens.sum() - 16.0) < 0.2
    finally:
        synth.initialize()


def test_tract_affine_save_speaker_roundtrip(tmp_path):
    """pts_save_speaker emits [tract_affine]; reloading the saved file
    reproduces the fitted tube bit-for-bit."""
    src = os.path.join(os.path.dirname(synth.__file__), "speaker",
                       "jd3_calibrated.ini")
    if not os.path.exists(src):
        pytest.skip("calibrated JD3 speaker not committed")
    t = np.zeros((6, 30))
    t[:, 9] = -0.9
    synth.initialize(src)
    try:
        _a, _sr, i1 = synth.speak_and_extract_tube_information(t)
        saved = tmp_path / "roundtrip.ini"
        synth.save_speaker(str(saved))
        synth.initialize(str(saved))
        _a, _sr, i2 = synth.speak_and_extract_tube_information(t)
        np.testing.assert_array_equal(
            np.asarray(i1["tube_area_cm2"]), np.asarray(i2["tube_area_cm2"]))
        np.testing.assert_array_equal(
            np.asarray(i1["tube_length_cm"]),
            np.asarray(i2["tube_length_cm"]))
    finally:
        synth.initialize()


def test_malformed_tract_affine_row_fails_load(tmp_path):
    """A [tract_affine] area row whose coefficient count mismatches the
    first row's must FAIL the load (silently skipping it would leave that
    section's log-area coefficients zero -> area 1 cm^2 with present()
    true — quietly wrong tube areas from a truncated speaker file)."""
    bad = tmp_path / "bad_affine.ini"
    bad.write_text(
        "[meta]\nname = bad-affine\n"
        "[tract_affine]\n"
        "area 0 0.5 0.1 0.2\n"
        "area 1 0.5 0.1\n")  # 2 coefs where row 0 had 3
    with pytest.raises(ValueError):
        synth.initialize(str(bad))
    synth.initialize()  # restore the default for later tests

    # control: consistent rows load fine
    good = tmp_path / "good_affine.ini"
    good.write_text(
        "[meta]\nname = good-affine\n"
        "[tract_affine]\n"
        "area 0 0.5 0.1 0.2\n"
        "area 1 0.5 0.1 0.3\n")
    try:
        synth.initialize(str(good))
    finally:
        synth.initialize()
