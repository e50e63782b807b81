"""Tests for the C++ articulatory synthesizer and its ctypes bridge.

Parity with the reference backend is behavioral (shapes, rates, error codes,
monotone articulatory response, determinism) — see SURVEY.md §7 "Hard parts"
item 1."""

import os

import numpy as np
import pytest

from paule_tpu import synth
from paule_tpu.ops.normalize import inv_normalize_cp


@pytest.fixture(scope="module", autouse=True)
def _init():
    synth.initialize()


@pytest.fixture(scope="module")
def neutral_cp():
    info_t = synth.get_param_info("tract")
    info_g = synth.get_param_info("glottis")
    return np.concatenate([info_t["neutrals"], info_g["neutrals"]])


def _tile(cp, n):
    return np.tile(cp, (n, 1))


def test_constants_contract():
    c = synth.get_constants()
    assert c["audio_sampling_rate"] == 44100
    assert c["n_tube_sections"] == 40
    assert c["n_tract_params"] == 19
    assert c["n_glottis_params"] == 11
    assert c["n_samples_per_state"] == 110


def test_speak_length_contract(neutral_cp):
    for seq in (2, 11, 100):
        audio, sr = synth.speak(_tile(neutral_cp, seq))
        assert sr == 44100
        assert len(audio) == (seq - 1) * 110
        assert np.isfinite(audio).all()


def test_speak_produces_bounded_voiced_audio(neutral_cp):
    audio, _ = synth.speak(_tile(neutral_cp, 401))  # 1 second
    rms = float(np.sqrt((audio**2).mean()))
    assert 0.005 < rms < 0.5
    assert np.abs(audio).max() < 2.0


def test_zero_pressure_is_silent(neutral_cp):
    cp = neutral_cp.copy()
    cp[20] = 0.0  # subglottal pressure
    audio, _ = synth.speak(_tile(cp, 101))
    assert np.abs(audio).max() < 1e-3


def test_f0_controls_pitch(neutral_cp):
    def f0_of(audio):
        seg = audio[11025:44100 - 11025]
        ac = np.correlate(seg, seg, "full")[len(seg) - 1 :]
        lo, hi = 44100 // 400, 44100 // 60
        return 44100.0 / (lo + int(np.argmax(ac[lo:hi])))

    for target in (100.0, 200.0):
        cp = neutral_cp.copy()
        cp[19] = target
        audio, _ = synth.speak(_tile(cp, 401))
        assert abs(f0_of(audio) - target) / target < 0.1


def test_lip_closure_is_monotone(neutral_cp):
    """closing the lips (LD down) must monotonically shrink the minimum
    supraglottal area — the monotone articulatory response contract."""
    mins = []
    for ld in (2.0, 1.0, 0.5, 0.1, -0.5):
        tract = neutral_cp[:19].copy()
        tract[5] = ld
        _tl, ta, *_ = synth.tract_to_tube(tract)
        mins.append(ta[20:].min())
    assert all(a >= b - 1e-12 for a, b in zip(mins, mins[1:]))
    assert mins[-1] == 0.0  # full closure reachable


def test_vowel_articulation_changes_spectrum(neutral_cp):
    def centroid(audio):
        seg = audio[8000:40000]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg)))) ** 2
        freq = np.fft.rfftfreq(len(seg), 1 / 44100)
        return float((spec * freq).sum() / max(spec.sum(), 1e-12))

    names = synth.get_param_info("tract")["names"]
    a_cp = neutral_cp.copy()
    for k, v in {"JA": -5.0, "TCX": 1.0, "TCY": -2.2, "LD": 1.4}.items():
        a_cp[names.index(k)] = v
    i_cp = neutral_cp.copy()
    for k, v in {"JA": -1.5, "TCX": 2.2, "TCY": 0.5, "LD": 0.8}.items():
        i_cp[names.index(k)] = v
    c_a = centroid(synth.speak(_tile(a_cp, 401))[0])
    c_i = centroid(synth.speak(_tile(i_cp, 401))[0])
    assert c_i > 2.0 * c_a  # front-high vowel has far higher spectral centroid


def test_determinism(neutral_cp):
    a1, _ = synth.speak(_tile(neutral_cp, 101))
    a2, _ = synth.speak(_tile(neutral_cp, 101))
    np.testing.assert_array_equal(a1, a2)


def test_incremental_matches_block(neutral_cp):
    cps = _tile(neutral_cp, 41)
    cps[:, 19] = np.linspace(100, 150, 41)  # vary f0 over time
    block, _ = synth.speak(cps)
    incr, _, _tube = synth.speak_and_extract_tube_information(cps)
    np.testing.assert_allclose(incr, block, atol=1e-12)


def test_tube_info_contract(neutral_cp):
    audio, sr, tube = synth.speak_and_extract_tube_information(
        _tile(neutral_cp, 21))
    assert audio.shape == (20 * 110,)
    assert tube["tube_length_cm"].shape == (21, 40)
    assert tube["tube_area_cm2"].shape == (21, 40)
    assert tube["tube_articulator"].shape == (21, 40)
    assert tube["incisor_pos_cm"].shape == (21,)
    assert 14.0 <= tube["incisor_pos_cm"][0] <= 18.0
    assert (tube["tube_area_cm2"] >= 0).all()
    assert (tube["tube_area_cm2"] <= 15.0).all()
    # per-section lengths within the normalization table's range
    from paule_tpu.ops.normalize import MIN_LENGTH, MAX_LENGTH
    assert (tube["tube_length_cm"] >= MIN_LENGTH - 1e-9).all()
    assert (tube["tube_length_cm"] <= MAX_LENGTH + 1e-9).all()
    labels = set(np.unique(tube["tube_articulator"]))
    assert "tongue" in labels and "vocal folds" in labels


def test_extracted_tubes_match_direct_queries(neutral_cp):
    """speak_and_extract reuses the synthesis ramp's tract->tube cache; the
    extracted per-frame tubes must equal independent tract_to_tube queries
    (a stale or mis-keyed cache would silently skew somatosensory data)."""
    n = 9
    cps = _tile(neutral_cp, n)
    cps[:, 3] = np.linspace(-5.0, -2.0, n)   # JA: move the jaw over time
    cps[:, 8] = np.linspace(-1.0, 1.5, n)    # TCX: move the tongue body
    _a, _sr, tube = synth.speak_and_extract_tube_information(cps)
    for f in range(n):
        length, area, _art, incisor, _tts, velum = synth.tract_to_tube(
            cps[f, :19])
        np.testing.assert_allclose(tube["tube_length_cm"][f], length,
                                   rtol=0, atol=0)
        np.testing.assert_allclose(tube["tube_area_cm2"][f], area,
                                   rtol=0, atol=0)
        assert tube["incisor_pos_cm"][f] == incisor
        assert tube["velum_opening_cm2"][f] == velum


def test_area_info_within_oral_cavity(neutral_cp):
    _a, _sr, tube = synth.speak_and_extract_tube_information(
        _tile(neutral_cp, 5))
    feats = synth.get_area_info_within_oral_cavity(
        tube["tube_length_cm"], tube["tube_area_cm2"])
    assert feats.shape == (5, 7)
    assert np.isfinite(feats).all()
    means = synth.get_area_info_within_oral_cavity(
        tube["tube_length_cm"], tube["tube_area_cm2"], calculate="mean")
    assert (means >= feats - 1e-9).all()  # mean >= min on same sets


def test_velum_opening_feature(neutral_cp):
    tract = neutral_cp[:19].copy()
    tract[7] = 0.7  # VO
    *_rest, vel = synth.tract_to_tube(tract)
    assert vel == pytest.approx(0.7)
    tract[7] = -0.1
    *_rest, vel = synth.tract_to_tube(tract)
    assert vel == 0.0


def test_normalized_cp_roundtrip_synthesis():
    """planning-space check: a normalized neutral trajectory denormalizes and
    synthesizes without error (the planning loop's host boundary)."""
    norm_cp = np.zeros((21, 30))
    audio, sr = synth.speak(inv_normalize_cp(norm_cp))
    assert len(audio) == 20 * 110
    assert np.isfinite(audio).all()


def test_export_svgs(tmp_path, neutral_cp):
    path = str(tmp_path / "svgs") + "/"
    synth.export_svgs(_tile(neutral_cp, 10), path=path, hop_length=5)
    files = sorted(os.listdir(path))
    assert files == ["tract00000.svg", "tract00001.svg"]
    content = open(os.path.join(path, files[0])).read()
    assert content.startswith("<svg") and "polyline" in content


def test_cps_to_ema(neutral_cp):
    emas = synth.cps_to_ema(_tile(neutral_cp, 8))
    assert len(emas) == 8
    assert "time" in emas.columns
    assert sum(c.endswith("_x") for c in emas.columns) == 3
    assert np.isfinite(emas.values).all()


def test_seg_to_cps_pipeline(tmp_path, neutral_cp):
    seg = tmp_path / "word.seg"
    seg.write_text(
        "name = a; duration_s = 0.10;\n"
        "name = t; duration_s = 0.05;\n"
        "name = a; duration_s = 0.10;\n")
    cps = synth.seg_to_cps(str(seg))
    assert cps.shape[1] == 30
    assert cps.shape[0] >= int(0.25 / (110 / 44100))
    # trajectories stay within the speaker's parameter ranges
    info_t = synth.get_param_info("tract")
    assert (cps[:, :19] >= info_t["mins"] - 1e-6).all()
    assert (cps[:, :19] <= info_t["maxs"] + 1e-6).all()
    # and synthesize
    audio, _ = synth.speak(cps)
    assert np.isfinite(audio).all()


def test_seg_simple_format(tmp_path):
    seg = tmp_path / "word.seg"
    seg.write_text("a 0.1\ni 0.1\n")
    cps = synth.seg_to_cps(str(seg))
    assert cps.shape[0] > 50


def test_read_cp_rejects_wrong_glottis(tmp_path):
    f = tmp_path / "bad.txt"
    f.write_text("#\n#\n#\n#\n#\n#\nTriangular glottis\n1\n")
    with pytest.raises(ValueError):
        synth.read_cp(str(f))


def test_synth_pool_matches_serial(neutral_cp):
    import concurrent.futures as cf

    pool = synth.SynthPool(size=2)
    cps = [_tile(neutral_cp, 21 + 2 * i) for i in range(4)]
    want = [synth.speak(c)[0] for c in cps]
    with cf.ThreadPoolExecutor(4) as ex:
        got = list(ex.map(lambda c: pool.speak(c)[0], cps))
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, atol=1e-12)
    pool.close()


def test_speak_and_extract_empty_trajectory():
    audio, sr, tube = synth.speak_and_extract_tube_information(
        np.zeros((0, 30)))
    assert audio.shape == (0,)
    assert tube["tube_area_cm2"].shape == (0, synth.N_TUBE_SECTIONS)
    assert tube["incisor_pos_cm"].shape == (0,)


def test_synthesis_add_tube(neutral_cp):
    """Direct tube-area synthesis (bypassing the tract model) produces
    bounded audio for an open tube with voiced glottis."""
    synth.initialize()
    from paule_tpu.synth import _default
    _default().pts_synthesis_reset()
    areas = np.full(40, 3.0)
    glottis = np.asarray(neutral_cp[19:], dtype=np.float64)
    first = synth.synthesis_add_tube(0, areas, glottis)
    assert first.shape == (0,)
    out = synth.synthesis_add_tube(220, areas, glottis)
    assert out.shape == (220,)
    assert np.isfinite(out).all()
    assert np.abs(out).max() < 10.0


def test_input_tract_to_limited_tract():
    wild = np.full(19, 100.0)
    limited = synth.input_tract_to_limited_tract(wild)
    info = synth.get_param_info("tract")
    assert (limited <= info["maxs"] + 1e-9).all()
    assert (limited >= info["mins"] - 1e-9).all()


def test_calc_tongue_root_automatically(neutral_cp):
    tract = np.asarray(neutral_cp[:19], dtype=np.float64).copy()
    tract[8] = 1.0   # TCX
    tract[9] = 0.5   # TCY
    out = synth.calc_tongue_root_automatically(tract)
    info = synth.get_param_info("tract")
    # TRX/TRY re-coupled to the tongue body, within bounds
    assert info["mins"][14] - 1e-9 <= out[14] <= info["maxs"][14] + 1e-9
    assert info["mins"][15] - 1e-9 <= out[15] <= info["maxs"][15] + 1e-9


def test_save_speaker_roundtrip(tmp_path):
    path = str(tmp_path / "saved.speaker")
    synth.save_speaker(path)
    text = open(path).read()
    assert "base_length_cm" in text
    # a fresh pool can initialize from the saved speaker
    pool = synth.SynthPool(size=1, speaker_path=path)
    pool.close()


def test_ges_to_audio_and_ema(tmp_path, neutral_cp):
    seg = tmp_path / "w.seg"
    seg.write_text("name = a; duration_s = 0.08;\n"
                   "name = i; duration_s = 0.08;\n")
    ges = tmp_path / "w.ges"
    synth.seg_to_ges(str(seg), str(ges)) if hasattr(synth, "seg_to_ges") \
        else synth._default().pts_segment_sequence_to_gestural_score(
            str(seg).encode(), str(ges).encode())
    audio, sr = synth.ges_to_audio(str(ges))
    assert sr == 44100 and len(audio) > 1000
    assert np.isfinite(audio).all()
    synth.ges_to_ema_and_mesh(str(ges), "w", path=str(tmp_path))
    import os
    assert any("ema" in f for f in os.listdir(tmp_path))


def test_child_speaker_raises_formants():
    """Speaker anatomy is acoustically real: the shipped child speaker's
    shorter tract raises the first formant."""
    import os
    from paule_tpu.ops.normalize import cp_theoretical_means

    neutral = np.asarray(cp_theoretical_means, float)
    f_axis = np.linspace(0.0, 22050.0, 513)

    def f1(mag):
        v = mag / mag.max()
        for i in range(2, 120):
            if v[i] > v[i - 1] and v[i] > v[i + 1] and v[i] > 0.05:
                return f_axis[i]

    synth.initialize()
    adult = f1(np.asarray(synth.get_transfer_function(neutral[:19], 513)[0]))
    child_path = os.path.join(os.path.dirname(synth.__file__), "speaker",
                              "child.speaker")
    synth.initialize(child_path)
    try:
        child = f1(np.asarray(
            synth.get_transfer_function(neutral[:19], 513)[0]))
    finally:
        synth.initialize()  # restore the default speaker
    assert child > adult * 1.05, (adult, child)


def test_length_params_shift_formants():
    """HX/HY tract-length parameters move the resonances (the waveguide
    quantizes geometric length to its effective section count)."""
    from paule_tpu.ops.normalize import cp_theoretical_means

    neutral = np.asarray(cp_theoretical_means, float)
    f_axis = np.linspace(0.0, 22050.0, 513)

    def f1(mag):
        v = mag / mag.max()
        for i in range(2, 120):
            if v[i] > v[i - 1] and v[i] > v[i + 1] and v[i] > 0.05:
                return f_axis[i]

    longer = neutral[:19].copy()
    longer[0], longer[1] = 1.0, -6.0   # HX up, HY down -> longer tract
    shorter = neutral[:19].copy()
    shorter[0], shorter[1] = 0.0, -3.5
    fl = f1(np.asarray(synth.get_transfer_function(longer, 513)[0]))
    fs = f1(np.asarray(synth.get_transfer_function(shorter, 513)[0]))
    assert fs > fl, (fl, fs)


def test_nasal_energy_decays_after_velum_closes(neutral_cp):
    """Residual nasal-branch energy must drain after the velar port closes
    (it used to freeze in the branch input and re-drive the nasal tract
    forever, leaving a constant coloration instead of decay)."""
    n = 241  # ~0.6 s
    cp = _tile(neutral_cp, n)
    cp[:80, 7] = 0.8       # VO: velum open (nasal)
    cp[80:, 7] = -0.1      # velum closed
    cp[120:, 20] = 0.0     # PR: pressure off -> no source at all
    sig, sr = synth.speak(cp)
    # well after source-off + closure, the tail must be essentially silent
    tail = sig[-int(0.1 * sr):]
    body = sig[: 80 * 110]
    assert np.sqrt((tail**2).mean()) < 1e-6 * max(
        np.sqrt((body**2).mean()), 1e-12)


def test_wide_range_speaker_stays_finite(tmp_path):
    """User speaker files can widen parameter ranges arbitrarily; extreme
    articulator/glottis values must degrade gracefully (gaussians -> 0,
    oscillation -> 0), not wrap the branch-free exp2 bit-cast into
    sign/exponent garbage (fastmath.h fast_gauss_nc / the skew-exponent
    floor in GlottisState::step_block)."""
    sp = tmp_path / "wide.speaker"
    sp.write_text(
        "[tract_params]\n"
        "5 LD -1e250 1e250 0.95\n"
        "10 TTX -100000 100000 3.5\n"
        "[glottis_params]\n"
        "8 PS -2000 2000 0.0\n")
    pool = synth.SynthPool(size=1, speaker_path=str(sp))
    try:
        n = 41
        cp = np.tile(np.concatenate([
            np.asarray([0.5, -4.75, 0.0, -2.0, -0.07, 0.95, 0.0, -0.1,
                        -0.4, -1.46, 90000.0, -1.0, 2.0, 0.5, 0.0, 0.0,
                        0.0, 0.0, 0.0]),
            np.asarray([120.0, 8000.0, 0.02, 0.02, 0.02, 1.5708, 1.0,
                        0.05, 1500.0, 25.0, -40.0])]), (n, 1))
        # negative PS (skew < 0): skew * log2(p) is large POSITIVE -- the
        # exponent must be clamped above at 0, not only floored at -1000
        cp_neg = cp.copy()
        cp_neg[:, 19 + 8] = -1500.0
        # absurd lip distance: dist ~ 1e240 so the dist^1.3 exponent
        # (~1036) exceeds the bit-cast exp2 range without an upper clamp
        cp_huge = cp.copy()
        cp_huge[:, 5] = 1e240
        for traj in (cp, cp_neg, cp_huge):
            sig, sr = pool.speak(traj)
            assert np.isfinite(sig).all()
            assert np.abs(sig).max() < 1e3
            tube = pool.speak_and_extract_tube_information(traj)[2]
            areas = np.asarray(tube["tube_area_cm2"])
            assert np.isfinite(areas).all()
            assert (areas >= 0).all() and (areas <= 15).all()
    finally:
        pool.close()


def test_non_finite_cp_rejected():
    """The FFI boundary rejects non-finite trajectories: the C core's
    branch-free fast-math assumes finite inputs (a NaN would reach a
    float->int64 cast and surface as NaN audio)."""
    cp = np.zeros((5, 30))
    cp[2, 8] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        synth.speak(cp)
    cp[2, 8] = np.inf
    with pytest.raises(ValueError, match="non-finite"):
        synth.speak_and_extract_tube_information(cp)
    with pytest.raises(ValueError, match="non-finite"):
        synth.get_transfer_function(np.full(19, np.nan), 16)


def test_speak_batch_bit_identical_to_serial():
    """pts_synth_block_batch: one native crossing for B trajectories ==
    B serial speak calls, bit for bit (incl. tube extraction); per-item
    error codes flag non-finite inputs without aborting the batch."""
    synth.initialize()
    pool = synth.SynthPool(size=2)
    rng = np.random.default_rng(3)
    cps = np.stack([
        inv_normalize_cp(np.clip(
            rng.normal(0, 0.05, (21, 30)).cumsum(0) * 0.2, -1, 1))
        for _ in range(4)])

    sigs, sr, errs = pool.speak_batch(cps)
    assert sr == 44100 and sigs.shape == (4, 20 * 110)
    assert (errs == 0).all()
    for i in range(4):
        ref, _ = pool.speak(cps[i])
        np.testing.assert_array_equal(sigs[i], ref)

    audio, _, errs2, tubes = pool.speak_and_extract_batch(cps)
    assert (errs2 == 0).all()
    ref_a, _, ref_t = pool.speak_and_extract_tube_information(cps[1])
    np.testing.assert_array_equal(audio[1], ref_a)
    np.testing.assert_array_equal(tubes[1]["tube_area_cm2"],
                                  ref_t["tube_area_cm2"])
    np.testing.assert_array_equal(tubes[1]["tube_articulator"],
                                  ref_t["tube_articulator"])
    np.testing.assert_array_equal(tubes[1]["incisor_pos_cm"],
                                  ref_t["incisor_pos_cm"])

    bad = cps.copy()
    bad[2, 5, 7] = np.nan
    sigs3, _, errs3 = pool.speak_batch(bad)
    assert errs3[2] == -1 and (np.delete(errs3, 2) == 0).all()
    np.testing.assert_array_equal(sigs3[0], sigs[0])
    pool.close()
