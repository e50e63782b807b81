"""Differentiable spectral-domain articulatory model: geometry parity with
the native synthesizer, acoustic sanity, gradient flow, and — the point —
planning through the physics reduces the REAL produced-audio loss without
any trained models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paule_tpu import spectral, synth
from paule_tpu.ops.normalize import (cp_theoretical_means, inv_normalize_cp)


@pytest.fixture(scope="module", autouse=True)
def _init():
    synth.initialize()


def test_tube_geometry_matches_native():
    """tract_to_tube_jax mirrors the C++ tract_to_tube to float precision."""
    rng = np.random.default_rng(0)
    for _ in range(8):
        cp = np.clip(rng.normal(0, 0.4, (30,)), -1, 1)
        dn = inv_normalize_cp(cp[None])[0]
        _tl, ta, _ai, *_ = synth.tract_to_tube(dn[:19])
        a_jax, sec_len = spectral.tract_to_tube_jax(jnp.asarray(dn[:19]))
        np.testing.assert_allclose(np.asarray(a_jax), ta, atol=1e-5)


def test_transfer_function_formants_match_waveguide():
    """Resonance peaks of the chain-matrix tube line up with the
    time-domain waveguide's transfer function for the neutral tract."""
    neutral = np.asarray(cp_theoretical_means, float)
    freqs = jnp.linspace(0.0, 22050.0, 513)
    areas, geom_sec_len = spectral.tract_to_tube_jax(
        jnp.asarray(neutral[:19]))
    sl = jnp.clip(geom_sec_len * spectral.N_TUBE,
                  spectral.MIN_TOTAL_LEN_CM,
                  spectral.MAX_TOTAL_LEN_CM) / spectral.N_TUBE
    vo = spectral.velum_opening_jax(jnp.asarray(neutral[:19]))
    h = np.asarray(spectral.tube_transfer_magnitude(areas, sl, freqs,
                                                    velum_open=vo))
    mag = np.asarray(synth.get_transfer_function(neutral[:19], 513)[0])
    assert np.isfinite(h).all() and (h > 0).all()

    f_axis = np.linspace(0.0, 22050.0, 513)

    def peaks(v):
        v = v / v.max()
        return [f_axis[i] for i in range(2, 90)
                if v[i] > v[i - 1] and v[i] > v[i + 1] and v[i] > 0.05][:4]

    pj, pw = peaks(h), peaks(mag)
    assert len(pj) >= 3 and len(pw) >= 3
    # each of the first three formants within 20% of the waveguide's
    for a, b in zip(pj[:3], pw[:3]):
        assert abs(a - b) / b < 0.20, (pj, pw)


def test_forward_model_contract_and_gradients():
    model = spectral.SpectralForwardModel()
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.clip(rng.normal(0, 0.2, (2, 20, 30)), -1, 1))
    mel = model.apply({}, x)
    assert mel.shape == (2, 10, 60)
    assert bool(jnp.isfinite(mel).all())

    g = jax.grad(lambda xx: jnp.sum(model.apply({}, xx) ** 2))(x)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_spectral_mel_close_to_synthesized_mel():
    """The calibrated spectral model tracks the real synthesizer's mel
    output within a fraction of typical planning losses."""
    from paule_tpu import pretrain

    df = pretrain.babble_corpus(3, seq_len=(32, 32), seed=3, n_workers=2)
    model = spectral.SpectralForwardModel()
    for cp, mel_real in zip(df["cp_norm"],
                            df["melspec_norm_synthesized"]):
        mel_spec = np.asarray(model.apply({}, jnp.asarray(cp[None]))[0])
        m_real = np.asarray(mel_real)[: mel_spec.shape[0]]
        rmse = float(np.sqrt(((mel_spec - m_real) ** 2).mean()))
        assert rmse < 0.35, rmse


def test_physical_planning_reduces_real_loss():
    """Planning through the physical model (no trained weights anywhere)
    reduces the produced-audio loss measured on the real synthesizer."""
    from paule_tpu.api import Paule

    rng = np.random.default_rng(4)
    cp_true = np.clip(rng.normal(0, 0.1, (40, 30)).cumsum(0) * 0.1, -1, 1)
    sig, sr = synth.speak(inv_normalize_cp(cp_true))

    p = Paule(seed=6, physical_forward=True)
    r = p.plan_resynth(target_acoustic=(sig, sr), objective="acoustic",
                       initialize_from="acoustic", n_outer=2, n_inner=20,
                       log_ii=20, n_batches=1, batch_size=2, n_epochs=1,
                       continue_learning=True, verbose=False)
    # planned (device) loss must drop substantially...
    assert r.planned_loss_steps[-1] < 0.7 * r.planned_loss_steps[0]
    # ...and the REAL produced loss must improve on the random-inverse init
    initial_prod = 5.0 * np.sqrt(
        ((r.initial_prod_mel[: r.target_mel.shape[0]]
          - r.target_mel[: r.initial_prod_mel.shape[0]]) ** 2).mean())
    assert r.prod_loss_steps[-1] < initial_prod
