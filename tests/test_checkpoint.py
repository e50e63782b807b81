"""Checkpoint / resume: save_state + load_state round-trip the full
trainable state (params, optimizer moments, RNG, replay buffer), so a
restored instance continues planning exactly where the saved one stopped."""

import numpy as np
import pandas as pd
import pytest

import jax

from paule_tpu import synth
from paule_tpu.api import Paule
from paule_tpu import checkpoint as CK
from paule_tpu.ops.normalize import inv_normalize_cp

TINY = dict(n_outer=1, n_inner=2, n_batches=1, batch_size=2, n_epochs=1,
            log_ii=1, verbose=False)


@pytest.fixture(scope="module")
def target():
    synth.initialize()
    rng = np.random.default_rng(0)
    cp_true = np.clip(rng.normal(0, 0.1, (40, 30)).cumsum(0) * 0.1, -1, 1)
    sig, sr = synth.speak(inv_normalize_cp(cp_true))
    return sig, sr


def _tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    return all(np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_state_roundtrip(tmp_path, target):
    p = Paule(seed=5)
    p.plan_resynth(target_acoustic=target, objective="acoustic",
                   initialize_from="acoustic", continue_learning=True, **TINY)
    path = tmp_path / "ckpt.pkl"
    p.save_state(path)

    q = Paule(seed=999)  # different init
    assert not _tree_equal(p.pred_trainer.params, q.pred_trainer.params)
    q.load_state(path)
    assert _tree_equal(p.pred_trainer.params, q.pred_trainer.params)
    assert _tree_equal(p.pred_trainer.opt_state, q.pred_trainer.opt_state)
    assert _tree_equal(p.inv_trainer.params, q.inv_trainer.params)
    assert _tree_equal(p.embedder_params, q.embedder_params)
    assert np.array_equal(np.asarray(p._jax_rng), np.asarray(q._jax_rng))


def test_resumed_planning_matches(tmp_path, target):
    """A restored model plans identically to the one that kept running."""
    p = Paule(seed=5)
    r1 = p.plan_resynth(target_acoustic=target, objective="acoustic",
                        initialize_from="acoustic", continue_learning=True,
                        **TINY)
    path = tmp_path / "ckpt.pkl"
    p.save_state(path)

    ra = p.plan_resynth(target_acoustic=target, objective="acoustic",
                        initial_cp=r1.planned_cp, initialize_from=None,
                        continue_learning=False, **TINY)

    q = Paule(seed=5).load_state(path)
    rb = q.plan_resynth(target_acoustic=target, objective="acoustic",
                        initial_cp=r1.planned_cp, initialize_from=None,
                        continue_learning=False, **TINY)
    assert np.allclose(ra.planned_cp, rb.planned_cp)
    assert np.allclose(ra.planned_loss_steps, rb.planned_loss_steps)


def test_replay_buffer_saved(tmp_path, target):
    df = pd.DataFrame({
        "vector": [np.zeros(300)] * 3,
        "cp_norm": [np.zeros((40, 30))] * 3,
        "melspec_norm_synthesized": [np.zeros((20, 60))] * 3,
        "tube_norm": [None] * 3,
        "segment_data": [False] * 3,
    })
    p = Paule(seed=5, continue_data=df)
    path = tmp_path / "ckpt.pkl"
    p.save_state(path)
    q = Paule(seed=6)
    q.load_state(path)
    assert len(q.continue_data) == 3
    state = CK.load_pytree(path)
    assert state["use_speech_classifier"] is False


def test_legacy_opt_state_migrates():
    """Checkpoints written before the inject_hyperparams switch stored plain
    adam chain states; restore_opt_state wraps them and training proceeds."""
    import jax
    import numpy as np
    import optax
    from paule_tpu.config import DTYPE
    from paule_tpu.models import ForwardModel
    from paule_tpu.planning.trainer import ModelTrainer

    model = ForwardModel(num_lstm_layers=1, hidden_size=16)
    params = model.init(jax.random.PRNGKey(0), DTYPE)
    legacy_state = optax.adam(0.001).init(params)  # pre-migration format

    trainer = ModelTrainer(model, params, loss="rmse", learning_rate=0.001)
    trainer.restore_opt_state(legacy_state)
    assert float(trainer.opt_state.hyperparams["learning_rate"]) == 0.001

    rng = np.random.default_rng(0)
    loss = trainer.train_batch(rng.normal(0, 0.3, (2, 12, 30)).astype(DTYPE),
                               rng.normal(0, 0.3, (2, 6, 60)).astype(DTYPE))
    assert np.isfinite(float(loss))

    # restoring a new-format state re-syncs the cached lr so a later
    # set_learning_rate with the session's value is honored
    trainer2 = ModelTrainer(model, params, loss="rmse", learning_rate=0.005)
    trainer2.restore_opt_state(trainer.opt_state)
    trainer2.set_learning_rate(0.002)
    assert float(trainer2.opt_state.hyperparams["learning_rate"]) == 0.002
