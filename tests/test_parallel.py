"""Multi-device tests on the virtual 8-device CPU mesh: batched planning
with dp sharding, tensor-parallel LSTM sharding, and the driver's
dryrun_multichip path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paule_tpu.parallel import batched, mesh as mesh_mod
from paule_tpu.planning import engine
from paule_tpu.models import EmbeddingModel, ForwardModel

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")

F64 = jnp.float64


def _bundle(hidden=32):
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    pred = ForwardModel(num_lstm_layers=1, hidden_size=hidden)
    emb = EmbeddingModel(num_lstm_layers=1, hidden_size=hidden)
    return engine.ModelBundle(
        pred_model=pred, pred_params=pred.init(k1, F64),
        embedder=emb, embedder_params=emb.init(k2, F64))


def test_make_mesh_shapes():
    mesh = mesh_mod.make_mesh(8)
    assert mesh.shape == {"dp": 8, "tp": 1}
    mesh = mesh_mod.make_mesh(8, dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(8, dp=3, tp=2)


def test_batched_planning_matches_unbatched():
    """dp-sharded batched planning must agree with per-utterance planning."""
    bundle = _bundle()
    params_dynamic, models_static = engine.split_bundle(bundle)
    mesh = mesh_mod.make_mesh(8, dp=8, tp=1)

    B, T = 8, 12
    rng = np.random.default_rng(0)
    xx = jnp.asarray(rng.normal(0, 0.1, (B, T, 30)))
    tmel = jnp.asarray(rng.normal(0, 0.5, (B, T // 2, 60)))
    tsem = jnp.asarray(rng.normal(0, 0.5, (B, 300)))

    xxs = mesh_mod.shard_batch(mesh, xx)
    opt_state = batched.init_batched_opt_state(xxs, 0.01)
    key = jax.random.PRNGKey(3)
    xx_out, _opt, logs = batched.plan_segment_batched(
        params_dynamic, models_static, xxs, opt_state,
        mesh_mod.shard_batch(mesh, tmel), mesh_mod.shard_batch(mesh, tsem),
        key, n_steps=3, objective="acoustic_semvec",
        use_speech_classifier=False, use_somatosensory=False,
        log_semantics=False, constraints=engine.Constraints(), lr=0.01)

    # unbatched reference for utterance 0 and 5 (same per-step rngs as the
    # batched path uses per-utterance splits; rebuild them identically)
    step_keys = jax.random.split(key, 3)
    for b in (0, 5):
        x = xx[b : b + 1]
        state = engine.init_opt_state(x[0], 0.01)
        import optax

        opt = optax.adam(0.01)
        for sk in step_keys:
            per_utt = jax.random.split(sk, B)[b]

            def loss_fn(xi):
                total, aux = engine.criterion(
                    bundle, xi[None], tmel[b : b + 1], tsem[b : b + 1],
                    objective="acoustic_semvec", use_speech_classifier=False,
                    use_somatosensory=False, log_semantics=False, rng=per_utt)
                return total

            g = jax.grad(loss_fn)(x[0])
            updates, state = opt.update(g, state)
            x = engine.apply_constraints(
                optax.apply_updates(x[0], updates)[None],
                xx[b : b + 1], engine.Constraints())
        np.testing.assert_allclose(
            np.asarray(xx_out[b]), np.asarray(x[0]), atol=1e-8)


def test_tp_sharded_forward_matches_replicated():
    """gate-dim tensor parallelism must not change the numerics."""
    mesh = mesh_mod.make_mesh(8, dp=4, tp=2)
    bundle = _bundle(hidden=64)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 0.3, (4, 10, 30)))

    want = bundle.pred_model.apply(bundle.pred_params, x)

    sharded = dict(bundle.pred_params)
    sharded["lstm"] = mesh_mod.shard_lstm_params(mesh, sharded["lstm"])
    sharded["post_linear"] = mesh_mod.replicate(mesh, sharded["post_linear"])
    xs = mesh_mod.shard_batch(mesh, x)
    got = jax.jit(bundle.pred_model.apply)(sharded, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_graft_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_plan_batch_resynth_dp():
    """Full batched planning loop on the 8-device mesh: planning losses
    drop, produced metrics are finite, continue-learning trains the shared
    model on dp-sharded batches."""
    import numpy as np
    from paule_tpu.api import Paule
    from paule_tpu import synth
    from paule_tpu.dsp.mel import librosa_melspec
    from paule_tpu.ops.normalize import inv_normalize_cp, normalize_mel

    synth.initialize()
    p = Paule(seed=11)
    rng = np.random.default_rng(3)
    tmels = []
    for _ in range(8):
        cp = np.clip(rng.normal(0, 0.1, (24, 30)).cumsum(0) * 0.1, -1, 1)
        sig, sr = synth.speak(inv_normalize_cp(cp))
        tmels.append(normalize_mel(librosa_melspec(sig, sr)))
    tmels = np.stack(tmels)

    mesh = mesh_mod.make_mesh(8, dp=8, tp=1)
    out = batched.plan_batch_resynth(
        p, tmels, mesh=mesh, n_outer=2, n_inner=3,
        objective="acoustic", continue_learning=True, n_epochs=1,
        batch_size=8)
    assert out["planned_cp"].shape == (8, 24, 30)
    assert out["prod_loss_curve"].shape == (2, 8)
    assert np.isfinite(out["prod_loss_curve"]).all()
    assert len(out["pred_model_loss"]) >= 2
    # planned total loss decreases over the scan for every utterance
    first = out["sub_losses"][0].total[0]
    last = out["sub_losses"][-1].total[-1]
    assert (last < first).all()
    assert len(out["prod_sigs"]) == 8


def test_plan_batch_resynth_somatosensory_metrics():
    """The batched planner logs the full somatosensory metric set (produced
    tube/tube-mel/tube-semvec losses) and can train the tube models — parity
    with the per-variant metrics of Paule.plan_resynth."""
    import numpy as np
    from paule_tpu.api import Paule
    from paule_tpu import synth
    from paule_tpu.dsp.mel import librosa_melspec
    from paule_tpu.ops.normalize import inv_normalize_cp, normalize_mel

    synth.initialize()
    p = Paule(seed=12, use_somatosensory_feedback=True)
    rng = np.random.default_rng(4)
    tmels = []
    for _ in range(2):
        cp = np.clip(rng.normal(0, 0.1, (24, 30)).cumsum(0) * 0.1, -1, 1)
        sig, sr = synth.speak(inv_normalize_cp(cp))
        tmels.append(normalize_mel(librosa_melspec(sig, sr)))
    tmels = np.stack(tmels)

    out = batched.plan_batch_resynth(
        p, tmels, n_outer=1, n_inner=2, objective="acoustic_semvec",
        continue_learning=True, continue_learning_tube=True, n_epochs=1,
        batch_size=2)
    assert out["prod_loss_curve"].shape == (1, 2)
    for key in ("prod_semvec_loss_curve", "prod_tube_loss_curve",
                "prod_tube_mel_loss_curve", "prod_tube_semvec_loss_curve"):
        assert key in out, key
        assert out[key].shape == (1, 2)
        assert np.isfinite(out[key]).all()
    assert out["prod_tubes"].shape == (2, 24, 10)
    assert len(out["tube_model_loss"]) >= 1
    assert len(out["tube_mel_model_loss"]) >= 1
    assert all(np.isfinite(out["tube_model_loss"]))


def test_plan_batch_resynth_speech_classifier_metrics():
    """Speech-classifier produced metrics are logged in the batched path."""
    import numpy as np
    from paule_tpu.api import Paule
    from paule_tpu import synth
    from paule_tpu.dsp.mel import librosa_melspec
    from paule_tpu.ops.normalize import inv_normalize_cp, normalize_mel

    synth.initialize()
    p = Paule(seed=13, use_speech_classifier=True)
    rng = np.random.default_rng(5)
    tmels = []
    for _ in range(2):
        cp = np.clip(rng.normal(0, 0.1, (24, 30)).cumsum(0) * 0.1, -1, 1)
        sig, sr = synth.speak(inv_normalize_cp(cp))
        tmels.append(normalize_mel(librosa_melspec(sig, sr)))
    tmels = np.stack(tmels)

    out = batched.plan_batch_resynth(
        p, tmels, n_outer=1, n_inner=2, objective="acoustic",
        continue_learning=False)
    assert "prod_sc_loss_curve" in out
    assert out["prod_sc_loss_curve"].shape == (1, 2)
    assert np.isfinite(out["prod_sc_loss_curve"]).all()


def test_criterion_batched_equals_per_utterance():
    """engine.criterion_batched's per-utterance totals/sub-losses and the
    gradient of their sum equal B independent engine.criterion calls
    (the r4 natively-batched formulation that replaced the vmapped one)."""
    bundle = _bundle()
    B, T = 4, 12
    rng = np.random.default_rng(7)
    xx = jnp.asarray(rng.normal(0, 0.1, (B, T, 30)))
    tmel = jnp.asarray(rng.normal(0, 0.5, (B, T // 2, 60)))
    tsem = jnp.asarray(rng.normal(0, 0.5, (B, 300)))
    key = jax.random.PRNGKey(11)
    kw = dict(objective="acoustic_semvec", use_speech_classifier=False,
              use_somatosensory=False, log_semantics=True, rng=key)

    total_b, (subs_b, pred_mel_b, pred_semvec_b, _) = \
        engine.criterion_batched(bundle, xx, tmel, tsem, **kw)
    grad_b = jax.grad(
        lambda x: jnp.sum(engine.criterion_batched(
            bundle, x, tmel, tsem, **kw)[0]))(xx)

    for b in range(B):
        total_1, (subs_1, pm_1, ps_1, _) = engine.criterion(
            bundle, xx[b:b + 1], tmel[b:b + 1], tsem[b:b + 1], **kw)
        np.testing.assert_allclose(total_b[b], total_1, rtol=1e-10)
        for name in subs_1._fields:
            np.testing.assert_allclose(
                getattr(subs_b, name)[b], getattr(subs_1, name),
                rtol=1e-10, err_msg=name)
        np.testing.assert_allclose(pred_mel_b[b], pm_1[0], rtol=1e-10)
        np.testing.assert_allclose(pred_semvec_b[b], ps_1[0], rtol=1e-10)
        grad_1 = jax.grad(lambda x: engine.criterion(
            bundle, x[None], tmel[b:b + 1], tsem[b:b + 1], **kw)[0])(xx[b])
        np.testing.assert_allclose(grad_b[b], grad_1,
                                   rtol=1e-8, atol=1e-12)


def test_criterion_batched_equals_per_utterance_variants():
    """Same equivalence for the speech-classifier and somatosensory
    branches of criterion_batched."""
    from paule_tpu.models import LinearClassifier

    rng0 = jax.random.PRNGKey(2)
    ks = jax.random.split(rng0, 6)
    pred = ForwardModel(num_lstm_layers=1, hidden_size=32)
    emb = EmbeddingModel(num_lstm_layers=1, hidden_size=32)
    sc = LinearClassifier(input_dim=60, output_dim=1)
    cp_tube = ForwardModel(num_lstm_layers=1, hidden_size=16,
                           output_size=10, input_size=30,
                           apply_half_sequence=False)
    tube_mel = ForwardModel(num_lstm_layers=1, hidden_size=16,
                            output_size=60, input_size=10,
                            apply_half_sequence=True)
    # dropout=0 so the one-rng-vs-per-utterance-rng difference is inert
    tube_emb = EmbeddingModel(input_size=10, num_lstm_layers=1,
                              hidden_size=16, dropout=0.0,
                              post_upsampling_size=0)
    bundle = engine.ModelBundle(
        pred_model=pred, pred_params=pred.init(ks[0], F64),
        embedder=emb, embedder_params=emb.init(ks[1], F64),
        speech_classifier=sc, speech_classifier_params=sc.init(ks[2], F64),
        cp_tube_model=cp_tube, cp_tube_params=cp_tube.init(ks[3], F64),
        tube_mel_model=tube_mel, tube_mel_params=tube_mel.init(ks[4], F64),
        tube_embedder=tube_emb, tube_embedder_params=tube_emb.init(
            ks[5], F64))

    B, T = 3, 12
    rng = np.random.default_rng(8)
    xx = jnp.asarray(rng.normal(0, 0.1, (B, T, 30)))
    tmel = jnp.asarray(rng.normal(0, 0.5, (B, T // 2, 60)))
    tsem = jnp.asarray(rng.normal(0, 0.5, (B, 300)))
    key = jax.random.PRNGKey(13)

    for variant in ({"use_speech_classifier": True,
                     "use_somatosensory": False},
                    {"use_speech_classifier": False,
                     "use_somatosensory": True}):
        kw = dict(objective="acoustic_semvec", log_semantics=True,
                  rng=key, **variant)
        total_b, (subs_b, _pm, _ps, _pt) = engine.criterion_batched(
            bundle, xx, tmel, tsem, **kw)
        for b in range(B):
            total_1, (subs_1, _, _, _) = engine.criterion(
                bundle, xx[b:b + 1], tmel[b:b + 1], tsem[b:b + 1], **kw)
            np.testing.assert_allclose(total_b[b], total_1, rtol=1e-10)
            for name in subs_1._fields:
                np.testing.assert_allclose(
                    getattr(subs_b, name)[b], getattr(subs_1, name),
                    rtol=1e-10, err_msg=f"{variant} {name}")


def test_plan_batch_honors_injected_plant():
    """plan_batch's synthesis must drive the injected plant (not the
    default pool) and honor the synthesis_error policy per utterance:
    one failing trajectory yields silence in 'skip' mode instead of
    aborting (or silently bypassing) the batch."""
    import numpy as np
    from paule_tpu.api import Paule
    from paule_tpu import synth
    from paule_tpu.dsp.mel import librosa_melspec
    from paule_tpu.ops.normalize import inv_normalize_cp, normalize_mel

    synth.initialize()

    class CountingPlant:
        def __init__(self, fail_on=None):
            self.n_speak = 0
            self.fail_on = fail_on

        def speak(self, cp_denorm):
            self.n_speak += 1
            if self.fail_on is not None and self.n_speak == self.fail_on:
                raise ValueError("injected failure")
            return synth.speak(cp_denorm)

        def close(self):
            pass

    rng = np.random.default_rng(7)
    tmels = []
    for _ in range(3):
        cp = np.clip(rng.normal(0, 0.1, (24, 30)).cumsum(0) * 0.1, -1, 1)
        sig, sr = synth.speak(inv_normalize_cp(cp))
        tmels.append(normalize_mel(librosa_melspec(sig, sr)))
    tmels = np.stack(tmels)

    plant = CountingPlant()
    p = Paule(seed=17, plant=plant)
    out = batched.plan_batch(p, tmels, n_steps=2)
    assert plant.n_speak == 3
    assert len(out["prod_sigs"]) == 3
    assert all(np.isfinite(s).all() for s in out["prod_sigs"])

    failing = CountingPlant(fail_on=2)
    p2 = Paule(seed=17, plant=failing, synthesis_error="skip")
    out2 = batched.plan_batch(p2, tmels, n_steps=2)
    assert len(out2["prod_sigs"]) == 3
    silent = [bool(np.all(s == 0)) for s in out2["prod_sigs"]]
    assert sum(silent) == 1

    failing_raise = CountingPlant(fail_on=2)
    p3 = Paule(seed=17, plant=failing_raise, synthesis_error="raise")
    with pytest.raises(ValueError):
        batched.plan_batch(p3, tmels, n_steps=2)


def test_plant_has_batch_guards_on_needed_method():
    """The batch-synthesis dispatch guards on the method the batch path
    will actually call: with somatosensory feedback that is
    speak_and_extract_batch, not speak_batch."""
    from paule_tpu.api import Paule
    from paule_tpu import synth

    synth.initialize()

    class BatchOnlyPlant:
        def speak(self, cp):
            return synth.speak(cp)

        def speak_batch(self, cps):
            return synth.speak_batch(cps)

        def speak_and_extract_tube_information(self, cp):
            return synth.speak_and_extract_tube_information(cp)

        def close(self):
            pass

    plant = BatchOnlyPlant()
    assert Paule(seed=2, plant=plant)._plant_has_batch is True
    p_somato = Paule(seed=2, use_somatosensory_feedback=True, plant=plant)
    assert p_somato._plant_has_batch is False
