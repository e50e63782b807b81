"""Unit tests for ops: derivatives, losses, normalization, padding, LSTM.

Torch is used as an independent oracle for the LSTM cell and for the
derivative/loss numerics (the reference implements these in torch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from paule_tpu.ops import derivatives as D
from paule_tpu.ops import losses as L
from paule_tpu.ops import normalize as N
from paule_tpu.ops import padding as P
from paule_tpu.ops import lstm as LS


def test_five_point_stencil_matches_formula():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 20, 3))
    got = np.asarray(D.five_point_stencil(jnp.asarray(x)))
    want = (-x[:, 4:, :] + 8 * x[:, 3:-1, :] - 8 * x[:, 1:-3, :] + x[:, :-4, :]) / 12.0
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.shape == (2, 16, 3)


def test_stencil_exact_on_polynomials():
    # the five-point stencil is exact for polynomials up to degree 4
    t = np.arange(30, dtype=np.float64)
    x = (0.5 * t**3 - 2 * t**2 + t)[None, :, None]
    got = np.asarray(D.five_point_stencil(jnp.asarray(x)))[0, :, 0]
    want = (1.5 * t**2 - 4 * t + 1)[2:-2]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_local_linear_zero_on_lines():
    t = np.arange(30, dtype=np.float64)
    x = (3.0 * t + 7.0)[None, :, None]
    got = np.asarray(D.local_linear(jnp.asarray(x)))
    np.testing.assert_allclose(got, 0.0, atol=1e-12)


def test_vel_acc_jerk_shapes():
    x = jnp.zeros((1, 40, 30))
    v, a, j = D.vel_acc_jerk(x)
    assert v.shape == (1, 36, 30)
    assert a.shape == (1, 32, 30)
    assert j.shape == (1, 28, 30)


def test_double_and_half_sequence_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 10, 4))
    doubled = np.asarray(D.double_sequence(jnp.asarray(x)))
    assert doubled.shape == (2, 20, 4)
    np.testing.assert_allclose(doubled[:, ::2], x)
    np.testing.assert_allclose(
        doubled[:, 1:-1:2], (x[:, :-1] + x[:, 1:]) / 2)
    np.testing.assert_allclose(doubled[:, -1], x[:, -1])

    halved = np.asarray(D.half_sequence(jnp.asarray(doubled)))
    assert halved.shape == (2, 10, 4)


def test_add_vel_and_acc_info_matches_torch_reference_semantics():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 12, 5))
    got = np.asarray(D.add_vel_and_acc_info(jnp.asarray(x)))
    assert got.shape == (2, 12, 15)
    vel = x[:, 1:, :] - x[:, :-1, :]
    acc = vel[:, 1:, :] - vel[:, :-1, :]
    np.testing.assert_allclose(got[:, :, :5], x)
    np.testing.assert_allclose(got[:, :-1, 5:10], vel)
    np.testing.assert_allclose(got[:, -1, 5:10], 0.0)
    np.testing.assert_allclose(got[:, 1:-1, 10:], acc)


def test_rmse_and_cp_trajectory_loss_vs_torch():
    rng = np.random.default_rng(3)
    yhat = rng.normal(size=(2, 30, 6))
    y = rng.normal(size=(2, 30, 6))

    got = float(L.rmse(jnp.asarray(yhat), jnp.asarray(y)))
    want = float(torch.sqrt(torch.nn.MSELoss()(torch.tensor(yhat), torch.tensor(y))))
    assert got == pytest.approx(want, rel=1e-6)

    loss, pos, vel, acc, jerk = L.cp_trajectory_loss(jnp.asarray(yhat), jnp.asarray(y))
    assert float(loss) == pytest.approx(
        float(pos) + float(vel) + float(acc) + float(jerk), rel=1e-6)
    # vel term carries the reference's 3x multiplicity
    v_t = D.five_point_stencil(jnp.asarray(y))
    v_p = D.five_point_stencil(jnp.asarray(yhat))
    assert float(vel) == pytest.approx(3 * float(L.rmse(v_p, v_t)), rel=1e-6)


def test_velocity_jerk_loss_guiding_factor():
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 30, 3)))
    v0, j0 = L.velocity_jerk_loss(x)
    vg, jg = L.velocity_jerk_loss(x, guiding_factor=0.9)
    # guiding at 0.9 leaves 10% of the discrepancy
    assert float(vg) == pytest.approx(0.1 * float(v0), rel=1e-5)
    assert float(jg) == pytest.approx(0.1 * float(j0), rel=1e-5)


def test_bce_with_logits_vs_torch():
    rng = np.random.default_rng(5)
    logits = rng.normal(size=(7,))
    got = float(L.bce_with_logits(jnp.asarray(logits), jnp.zeros(7)))
    want = float(torch.nn.BCEWithLogitsLoss()(
        torch.tensor(logits), torch.zeros(7, dtype=torch.float64)))
    assert got == pytest.approx(want, rel=1e-6)


def test_normalize_roundtrips():
    rng = np.random.default_rng(6)
    cp = rng.normal(size=(11, 30))
    np.testing.assert_allclose(
        N.inv_normalize_cp(N.normalize_cp(cp)), cp, rtol=1e-10)
    tube = rng.normal(size=(11, 10))
    np.testing.assert_allclose(
        N.inv_normalize_tube(N.normalize_tube(tube)), tube, rtol=1e-10)
    mel = rng.normal(size=(5, 60))
    np.testing.assert_allclose(
        N.inv_normalize_mel(N.normalize_mel(mel)), mel, rtol=1e-10)


def test_mel_silence_anchor_value():
    # the silence dB value that anchors mel normalization
    assert N.mel_mean == pytest.approx(-83.52182518111363, abs=1e-9)


def test_cp_normalization_against_reference_tables():
    # theoretical means/stds must match the reference normalization tables
    want_means = np.array([
        0.5, -4.75, -0.25, -3.5, 0.0, 1.0, 0.5, 0.45, 0.5, -1.0, 3.5,
        -0.25, 0.5, 1.0, -1.0, -3.0, 0.5, 0.5, 0.0, 320.0, 1e4, 0.125,
        0.125, 0.0, 1.57075, 0.0, 0.5, 0.0, 50.0, -20.0])
    want_stds = np.array([
        0.5, 1.25, 0.25, 3.5, 1.0, 3.0, 0.5, 0.55, 3.5, 2.0, 2.0, 2.75,
        3.5, 4.0, 3.0, 3.0, 0.5, 0.5, 1.0, 280.0, 1e4, 0.175, 0.175,
        0.25, 1.57075, 1.0, 0.5, 0.5, 50.0, 20.0])
    np.testing.assert_allclose(N.cp_theoretical_means, want_means, atol=1e-9)
    np.testing.assert_allclose(N.cp_theoretical_stds, want_stds, atol=1e-9)


def test_add_and_pad_repeats_last_row_and_onset():
    x = np.arange(6, dtype=np.float64).reshape(3, 2)
    out = P.add_and_pad(x, 5)
    assert out.shape == (5, 2)
    np.testing.assert_allclose(out[3], x[-1])
    np.testing.assert_allclose(out[4], x[-1])
    out = P.add_and_pad(x, 4, with_onset_dim=True)
    assert out.shape == (4, 3)
    assert out[0, 2] == 1 and out[1:, 2].sum() == 0


def test_pad_batch():
    seqs = [np.ones((3, 2)), 2 * np.ones((5, 2))]
    out = P.pad_batch([3, 5], seqs)
    assert out.shape == (2, 5, 2)
    np.testing.assert_allclose(out[0, 3:], 1.0)


def test_lstm_matches_torch():
    torch.manual_seed(0)
    b, t, i, h = 2, 9, 5, 7
    ref = torch.nn.LSTM(i, h, num_layers=2, batch_first=True).double()
    x = torch.randn(b, t, i, dtype=torch.float64)
    with torch.no_grad():
        want, (h_n, c_n) = ref(x)

    layers = []
    for li in range(2):
        layers.append({
            "w_ih": jnp.asarray(getattr(ref, f"weight_ih_l{li}").detach().numpy().T),
            "w_hh": jnp.asarray(getattr(ref, f"weight_hh_l{li}").detach().numpy().T),
            "b": jnp.asarray(
                (getattr(ref, f"bias_ih_l{li}") + getattr(ref, f"bias_hh_l{li}"))
                .detach().numpy()),
        })
    got, (gh, gc) = LS.lstm(layers, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gh), h_n.numpy(), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gc), c_n.numpy(), atol=1e-10)


def test_lstm_jit_and_grad():
    rng = jax.random.PRNGKey(0)
    layers = [LS.lstm_layer_params(rng, 4, 8)]

    @jax.jit
    def f(x):
        out, _ = LS.lstm(layers, x)
        return jnp.sum(out**2)

    x = jnp.ones((1, 6, 4))
    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


def test_train_epochs_leftover_batches():
    """Same-length fast path with N not divisible by batch_size: leftover
    batches still train and per-epoch losses aggregate over all steps."""
    import jax
    import jax.numpy as jnp
    from paule_tpu.config import DTYPE
    from paule_tpu.models import ForwardModel
    from paule_tpu.planning.trainer import ModelTrainer, train_epochs
    import numpy as np
    import random

    model = ForwardModel(num_lstm_layers=1, hidden_size=16)
    params = model.init(jax.random.PRNGKey(0), DTYPE)
    trainer = ModelTrainer(model, params, loss="rmse")
    n = 9  # batch_size 4 -> batches [4, 4, 1] per epoch
    rng = np.random.default_rng(0)
    inps = [rng.normal(0, 0.3, (12, 30)) for _ in range(n)]
    tgts = [rng.normal(0, 0.3, (6, 60)) for _ in range(n)]
    losses = train_epochs(trainer, inps, tgts, [12] * n, batch_size=4,
                          n_epochs=3, rng=random.Random(1),
                          dtype=np.dtype(DTYPE))
    assert len(losses) == 3
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_train_epochs_device_matches_host():
    """train_epochs_device (device-resident continue-learning data, no
    re-upload) must consume the rng stream and produce losses/params
    IDENTICALLY to train_epochs on the same equal-length host data."""
    import jax
    import jax.numpy as jnp
    from paule_tpu.config import DTYPE
    from paule_tpu.models import ForwardModel
    from paule_tpu.planning.trainer import (
        ModelTrainer, train_epochs, train_epochs_device)
    import numpy as np
    import random

    model = ForwardModel(num_lstm_layers=1, hidden_size=16)
    params = model.init(jax.random.PRNGKey(0), DTYPE)
    n = 9  # exercises leftover batches too (4, 4, 1)
    rng = np.random.default_rng(0)
    inps = [rng.normal(0, 0.3, (12, 30)) for _ in range(n)]
    tgts = [rng.normal(0, 0.3, (6, 60)) for _ in range(n)]

    t_host = ModelTrainer(model, params, loss="rmse")
    host_losses = train_epochs(t_host, inps, tgts, [12] * n, batch_size=4,
                               n_epochs=3, rng=random.Random(7),
                               dtype=np.dtype(DTYPE))

    t_dev = ModelTrainer(model, params, loss="rmse")
    all_in = jnp.asarray(np.stack(inps).astype(np.dtype(DTYPE)))
    all_out = jnp.asarray(np.stack(tgts).astype(np.dtype(DTYPE)))
    dev_losses = train_epochs_device(t_dev, all_in, all_out, batch_size=4,
                                     n_epochs=3, rng=random.Random(7))

    np.testing.assert_allclose(dev_losses, host_losses, rtol=0, atol=0)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        t_dev.params, t_host.params)


def test_set_learning_rate_keeps_adam_moments():
    """Changing the learning rate mid-session must keep the Adam first/second
    moments (reference mutates param_groups['lr'], paule.py:472-478)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from paule_tpu.config import DTYPE
    from paule_tpu.models import ForwardModel
    from paule_tpu.planning.trainer import ModelTrainer

    model = ForwardModel(num_lstm_layers=1, hidden_size=16)
    params = model.init(jax.random.PRNGKey(0), DTYPE)
    trainer = ModelTrainer(model, params, loss="rmse")
    rng = np.random.default_rng(0)
    b_in = rng.normal(0, 0.3, (2, 12, 30)).astype(DTYPE)
    b_out = rng.normal(0, 0.3, (2, 6, 60)).astype(DTYPE)
    trainer.train_batch(b_in, b_out)

    def moments(state):
        # inject_hyperparams wraps the chain; find the ScaleByAdamState
        for leaf in jax.tree_util.tree_leaves(
                state, is_leaf=lambda x: hasattr(x, "mu")):
            if hasattr(leaf, "mu"):
                return leaf
        raise AssertionError("no adam state found")

    before = moments(trainer.opt_state)
    mu_before = jax.device_get(before.mu)
    assert int(before.count) == 1
    assert any(np.abs(x).max() > 0 for x in jax.tree_util.tree_leaves(mu_before))

    trainer.set_learning_rate(0.01)
    after = moments(trainer.opt_state)
    assert int(after.count) == 1  # step counter survives too
    for x, y in zip(jax.tree_util.tree_leaves(mu_before),
                    jax.tree_util.tree_leaves(jax.device_get(after.mu))):
        np.testing.assert_array_equal(x, y)
    assert float(trainer.opt_state.hyperparams["learning_rate"]) == 0.01

    # and training continues without error / re-jit explosion
    loss = trainer.train_batch(b_in, b_out)
    assert np.isfinite(float(loss))
    assert int(moments(trainer.opt_state).count) == 2
