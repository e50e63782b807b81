"""Pretraining pipeline: babbling data generation through the synthesizer,
supervised forward/inverse/embedder training, and conditional WGAN-GP
training of the semvec->trajectory generators.  Tiny models/corpora —
asserts losses go down, shapes hold, params change."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paule_tpu import pretrain
from paule_tpu.models import (
    Critic, EmbeddingModel, ForwardModel, Generator,
    InverseModelMelTimeSmoothResidual)
from paule_tpu.config import DTYPE


@pytest.fixture(scope="module")
def corpus():
    df = pretrain.babble_corpus(10, seq_len=(20, 28), seed=1, n_workers=2)
    rng = np.random.default_rng(2)
    df["vector"] = [rng.normal(0, 0.3, 300) for _ in range(len(df))]
    return df


def test_babble_corpus_contracts(corpus):
    assert len(corpus) == 10
    for cp, mel in zip(corpus["cp_norm"],
                       corpus["melspec_norm_synthesized"]):
        assert cp.shape[1] == 30
        assert mel.shape[1] == 60
        assert np.abs(cp).max() <= 1.0
        # 2:1 cp <-> mel frame contract
        assert cp.shape[0] == 2 * mel.shape[0]


def test_train_forward_learns(corpus):
    model = ForwardModel(num_lstm_layers=1, hidden_size=24)
    params = model.init(jax.random.PRNGKey(0), DTYPE)
    new_params, losses = pretrain.train_forward(
        model, params, corpus, batch_size=4, n_epochs=4)
    assert len(losses) == 4
    assert losses[-1] < losses[0]
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(params),
                               jax.tree.leaves(new_params)))


def test_train_inverse_learns(corpus):
    model = InverseModelMelTimeSmoothResidual(num_lstm_layers=1,
                                              hidden_size=24)
    params = model.init(jax.random.PRNGKey(0), DTYPE)
    _, losses = pretrain.train_inverse(
        model, params, corpus, batch_size=4, n_epochs=4)
    assert losses[-1] < losses[0]


def test_train_embedder_learns(corpus):
    model = EmbeddingModel(num_lstm_layers=1, hidden_size=24)
    params = model.init(jax.random.PRNGKey(0), DTYPE)
    _, losses = pretrain.train_embedder(
        model, params, corpus, batch_size=4, n_epochs=6)
    assert losses[-1] < losses[0]


def test_train_gan_runs(corpus):
    gen = Generator(fc_size=64, hidden_size=8, num_res_blocks=2)
    cri = Critic(hidden_size=8)
    gp = gen.init(jax.random.PRNGKey(0), DTYPE)
    cp = cri.init(jax.random.PRNGKey(1), DTYPE)
    gp2, cp2, losses = pretrain.train_gan(
        gen, gp, cri, cp, corpus, batch_size=4, n_epochs=2, n_critic=2)
    assert len(losses) == 2
    assert all(np.isfinite(c) for c, _g in losses)
    # both networks actually updated
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gp2)))
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(cp), jax.tree.leaves(cp2)))
    # batch-norm running stats were adopted from the train-mode forwards
    # (torch semantics: in-place update every train forward) — a
    # from-scratch-trained generator must carry valid inference statistics
    for bp, bp2 in zip(gp["blocks"], gp2["blocks"]):
        assert not np.allclose(np.asarray(bp2["bn"]["mean"]),
                               np.asarray(bp["bn"]["mean"]))
        assert not np.allclose(np.asarray(bp2["bn"]["var"]),
                               np.asarray(bp["bn"]["var"]))
        assert np.isfinite(np.asarray(bp2["bn"]["mean"])).all()
        assert np.isfinite(np.asarray(bp2["bn"]["var"])).all()


def test_batchnorm_new_stats_matches_torch():
    """blocks.batchnorm_new_stats reproduces torch BatchNorm1d's train-mode
    running-stat update exactly (momentum 0.1, UNBIASED batch variance)."""
    import torch
    from paule_tpu.models import blocks as B

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1.5, (4, 7, 5))
    mean0 = rng.normal(0, 1, 5)
    var0 = rng.uniform(0.5, 2, 5)
    bn = torch.nn.BatchNorm1d(5).double()
    with torch.no_grad():
        bn.running_mean.copy_(torch.tensor(mean0))
        bn.running_var.copy_(torch.tensor(var0))
    # build params from independent copies: torch updates its buffers IN
    # PLACE on the train forward, and np.asarray(tensor) aliases them
    params = {"scale": jnp.ones(5), "bias": jnp.zeros(5),
              "mean": jnp.asarray(mean0.copy()),
              "var": jnp.asarray(var0.copy())}
    bn.train()
    bn(torch.tensor(x).transpose(1, 2))  # torch wants (B, C, T)
    new = B.batchnorm_new_stats(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(new["mean"]),
                               np.asarray(bn.running_mean), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(new["var"]),
                               np.asarray(bn.running_var), rtol=1e-10)

