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


def test_reference_plan_resynth_micro(ref_pkg):
    """bench.py's baseline leg end to end at a micro budget: the reference's
    ACTUAL plan_resynth (/root/reference/paule/paule.py:391) with our C++
    synthesizer injected as its plant (the exact monkeypatch bench.py
    applies), tiny models, 1 outer x 2 inner, continue-learning on."""
    import torch

    import paule.models as M
    import paule.paule as P

    from paule_tpu import synth
    from paule_tpu.ops.normalize import inv_normalize_cp

    synth.initialize()

    def speak_ours(cp_denorm):
        return synth.speak(np.asarray(cp_denorm, dtype=np.float64))

    torch.manual_seed(0)
    fwd = M.ForwardModel(num_lstm_layers=1, hidden_size=32).double()
    emb = M.EmbeddingModel(num_lstm_layers=1, hidden_size=32).double()
    inv = M.InverseModelMelTimeSmoothResidual(
        num_lstm_layers=1, hidden_size=32).double()
    cp_gen = M.Generator().double()
    mel_gen = M.Generator(output_size=60).double()

    old_speak = P.speak
    P.speak = speak_ours
    try:
        model = P.Paule(pred_model=fwd, inv_model=inv, embedder=emb,
                        cp_gen_model=cp_gen, mel_gen_model=mel_gen,
                        device=torch.device("cpu"))
        rng = np.random.default_rng(0)
        cp_true = np.clip(
            rng.normal(0, 0.05, (41, 30)).cumsum(0) * 0.2, -1, 1)
        sig, sr = speak_ours(inv_normalize_cp(cp_true))
        from paule_tpu.dsp.mel import librosa_melspec

        n_mel = np.asarray(librosa_melspec(sig, sr)).shape[0]
        r = model.plan_resynth(
            target_acoustic=(sig, float(sr)), objective="acoustic_semvec",
            initial_cp=np.zeros((2 * n_mel, 30)), initialize_from=None,
            log_ii=1,
            log_semantics=True, n_outer=1, n_inner=2, n_batches=1,
            batch_size=2, n_epochs=1, continue_learning=True,
            verbose=False, plot=False)
        assert np.asarray(r.planned_cp).shape == (2 * n_mel, 30)
        assert np.isfinite(float(r.prod_loss_steps[-1]))
        assert len(r.prod_loss_steps) == 2
    finally:
        P.speak = old_speak


def test_vtl_plant_contract(ref_pkg):
    """VTLPlant exposes the reference's native VocalTractLab synthesizer
    behind our plant surface (contract of paule/util.py:175-249,317-433)."""
    from paule_tpu.synth.vtl_plant import VTLPlant, vtl_available

    if not vtl_available():
        pytest.skip("VTL shared library not present")
    plant = VTLPlant()
    import paule.util as U

    cps = U.inv_normalize_cp(np.zeros((41, 30)))
    sig, sr = plant.speak(cps)
    assert sr == 44100
    assert sig.shape == (40 * 110,)
    # bit-identical to the reference's own speak on the same trajectory
    ref_sig, ref_sr = U.speak(cps)
    np.testing.assert_array_equal(sig, ref_sig)

    audio, sr2, ti = plant.speak_and_extract_tube_information(
        U.inv_normalize_cp(np.zeros((11, 30))))
    assert sr2 == 44100
    assert audio.shape == (10 * 110,)
    assert ti["tube_area_cm2"].shape == (11, plant.n_tube_sections)
    assert ti["tube_length_cm"].shape == (11, plant.n_tube_sections)
    assert ti["incisor_pos_cm"].shape == (11,)
    assert np.isfinite(ti["tube_area_cm2"]).all()
    from paule_tpu.synth import ARTICULATOR

    assert set(np.unique(ti["tube_articulator"])) <= set(ARTICULATOR.values())

    # direct vtlTractToTube probe (the [tract_affine] fit's ground truth,
    # speaker_import.fit_tract_affine): bit-identical to the per-frame
    # extraction of speak_and_extract_tube_information on the same state
    row = U.inv_normalize_cp(np.zeros((1, 30)))[0, :19]
    tube = plant.tract_to_tube(row)
    np.testing.assert_array_equal(tube["tube_area_cm2"],
                                  ti["tube_area_cm2"][0])
    np.testing.assert_array_equal(tube["tube_length_cm"],
                                  ti["tube_length_cm"][0])
    assert tube["incisor_pos_cm"] == ti["incisor_pos_cm"][0]
    assert tube["velum_opening_cm2"] == ti["velum_opening_cm2"][0]

    # transfer-function probe returns a finite magnitude spectrum
    mag, phase = plant.get_transfer_function(row, n_points=512)
    assert mag.shape == (512,) and phase.shape == (512,)
    assert np.isfinite(mag).all() and (mag >= 0).all()


def test_our_planner_drives_vtl_plant(ref_pkg):
    """OUR planner plans through the reference's authentic VTL binary:
    tiny end-to-end plan_resynth with plant=VTLPlant on a VTL
    copy-synthesis target (the round-4 plant-injection seam)."""
    from paule_tpu.api import Paule
    from paule_tpu.ops.normalize import inv_normalize_cp
    from paule_tpu.synth.vtl_plant import VTLPlant, vtl_available

    if not vtl_available():
        pytest.skip("VTL shared library not present")
    plant = VTLPlant()
    rng = np.random.default_rng(0)
    cp_true = np.clip(rng.normal(0, 0.05, (41, 30)).cumsum(0) * 0.2, -1, 1)
    sig, sr = plant.speak(inv_normalize_cp(cp_true))
    from paule_tpu.dsp.mel import librosa_melspec

    n_mel = np.asarray(librosa_melspec(sig, sr)).shape[0]
    p = Paule(seed=1, plant=plant)
    r = p.plan_resynth(
        target_acoustic=(sig, float(sr)), objective="acoustic",
        initial_cp=np.zeros((2 * n_mel, 30)), initialize_from=None,
        n_outer=1, n_inner=2, log_ii=1, n_batches=1, batch_size=2,
        n_epochs=1, continue_learning=True, verbose=False)
    assert np.asarray(r.planned_cp).shape == (2 * n_mel, 30)
    assert np.isfinite(float(r.prod_loss_steps[-1]))


def test_executed_loop_curve_parity_f64(ref_pkg):
    """Full-loop numerical equivalence in float64: our plan_resynth
    reproduces the produced-loss curve of the reference's ACTUAL
    plan_resynth (/root/reference/paule/paule.py:391) step for step.

    Shared seeded torch weights (converted), our C++ plant injected on
    both legs, same copy-synthesis target, continue_learning=False — the
    planning steps are RNG-free on both sides, so in f64 the curves must
    agree to accumulation noise.  This pins at micro scale what
    docs/measurements/dtype_attribution_r04.json measures at the bench
    scale: the engine math is equivalent (our CPU legs land within
    0.05% of the reference in BOTH f32 and f64), so the headline's
    ~0.5% offset is TPU matmul numerics, not engine behavior.
    """
    import jax

    if not jax.config.jax_enable_x64:
        pytest.skip("x64 parity mode required")
    import torch

    import paule.models as M
    import paule.paule as P

    from paule_tpu import synth
    from paule_tpu.api import Paule
    from paule_tpu.dsp.mel import librosa_melspec
    from paule_tpu.models import torch_convert as TC
    from paule_tpu.ops.normalize import inv_normalize_cp

    synth.initialize()

    def speak_ours(cp_denorm):
        return synth.speak(np.asarray(cp_denorm, dtype=np.float64))

    torch.manual_seed(0)
    fwd = M.ForwardModel(num_lstm_layers=1, hidden_size=32).double()
    emb = M.EmbeddingModel(num_lstm_layers=1, hidden_size=32).double()
    inv = M.InverseModelMelTimeSmoothResidual(
        num_lstm_layers=1, hidden_size=32).double()
    cp_gen = M.Generator().double()
    mel_gen = M.Generator(output_size=60).double()
    params_fwd = TC.convert("forward", fwd.state_dict())
    params_emb = TC.convert("embedder", emb.state_dict())

    rng = np.random.default_rng(0)
    cp_true = np.clip(rng.normal(0, 0.05, (41, 30)).cumsum(0) * 0.2, -1, 1)
    sig, sr = speak_ours(inv_normalize_cp(cp_true))
    n_mel = np.asarray(librosa_melspec(sig, sr)).shape[0]
    init_cp = np.zeros((2 * n_mel, 30))
    plan = dict(target_acoustic=(sig, float(sr)),
                objective="acoustic_semvec", initialize_from=None,
                log_ii=1, log_semantics=True, n_outer=1, n_inner=4,
                continue_learning=False, verbose=False)

    old_speak = P.speak
    P.speak = speak_ours
    try:
        model = P.Paule(pred_model=fwd, inv_model=inv, embedder=emb,
                        cp_gen_model=cp_gen, mel_gen_model=mel_gen,
                        device=torch.device("cpu"))
        r_ref = model.plan_resynth(initial_cp=init_cp.copy(), plot=False,
                                   **plan)
    finally:
        P.speak = old_speak

    p = Paule(seed=1, pred_model=params_fwd, embedder=params_emb)
    r_ours = p.plan_resynth(initial_cp=init_cp.copy(), **plan)

    curve_ref = np.asarray([float(x) for x in r_ref.prod_loss_steps])
    curve_ours = np.asarray([float(x) for x in r_ours.prod_loss_steps])
    assert curve_ref.shape == curve_ours.shape == (4,)
    np.testing.assert_allclose(curve_ours, curve_ref, rtol=5e-4)


def test_vtl_ensure_initialized_no_wrong_speaker_masking(monkeypatch):
    """_ensure_initialized must not mask a failed speaker change: when a
    DIFFERENT speaker is live and vtlInitialize fails, it raises instead
    of silently synthesizing with the old speaker, and it never caches
    the requested path unless vtlInitialize returned 0."""
    import ctypes

    from paule_tpu.synth import vtl_plant

    class FakeLib:
        def __init__(self, init_rc, probe_rc=0, probe_sr=44100):
            self.init_rc = init_rc
            self.probe_rc = probe_rc
            self.probe_sr = probe_sr

        def vtlInitialize(self, path):
            return self.init_rc

        def vtlGetConstants(self, sr_ref, *rest):
            sr_ref._obj.value = self.probe_sr
            return self.probe_rc

    # success path caches the requested speaker
    monkeypatch.setattr(vtl_plant, "_INITIALIZED_SPEAKER", None)
    vtl_plant._ensure_initialized(FakeLib(0), "/tmp/a.speaker")
    assert vtl_plant._INITIALIZED_SPEAKER == "/tmp/a.speaker"

    # failed change away from a live speaker raises (no silent wrong-
    # speaker synthesis) and keeps the TRUE live speaker cached
    with pytest.raises(ValueError):
        vtl_plant._ensure_initialized(FakeLib(1), "/tmp/b.speaker")
    assert vtl_plant._INITIALIZED_SPEAKER == "/tmp/a.speaker"

    # externally-initialized library (we never initialized): a failure
    # with a live probe is tolerated but the requested path is NOT cached
    monkeypatch.setattr(vtl_plant, "_INITIALIZED_SPEAKER", None)
    vtl_plant._ensure_initialized(FakeLib(1), "/tmp/c.speaker")
    assert vtl_plant._INITIALIZED_SPEAKER is None

    # failure with a dead probe raises
    monkeypatch.setattr(vtl_plant, "_INITIALIZED_SPEAKER", None)
    with pytest.raises(ValueError):
        vtl_plant._ensure_initialized(FakeLib(1, probe_sr=0),
                                      "/tmp/d.speaker")
