"""Model zoo tests.

Every model is checked for output shape, jit-ability and gradient flow; the
torch-conversion path is verified against small inline torch oracles
(torch.nn primitives composed functionally — LSTM/Linear/Conv1d/AvgPool1d/
Upsample) so converted reference checkpoints are guaranteed to reproduce the
reference's numerics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import paule_tpu  # noqa: F401  (enables x64 via conftest env)
from paule_tpu.models import (
    ForwardModel, ForwardModelMelTimeSmoothResidual,
    InverseModelMelTimeSmoothResidual, EmbeddingModel,
    MelEmbeddingModelMelSmoothResidualUpsampling, LinearModel, NonLinearModel,
    Generator, Critic, SemVecToCpModel, SemVecToMelModel, LSTMGenerator,
    LSTMCritic, LinearClassifier, SpeechNonSpeechTransformer,
)
from paule_tpu.models import blocks as B
from paule_tpu.models import torch_convert as TC

RNG = jax.random.PRNGKey(0)
F64 = jnp.float64


@pytest.mark.slow
def test_forward_model_shapes_jit_grad():
    model = ForwardModel(num_lstm_layers=1, hidden_size=32)
    params = model.init(RNG, dtype=F64)
    x = jnp.zeros((2, 20, 30), dtype=F64)
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (2, 10, 60)

    def loss(p):
        return jnp.sum(model.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["post_linear"]["w"])).all()


def test_forward_model_no_half_sequence():
    model = ForwardModel(input_size=30, output_size=10, hidden_size=16,
                         num_lstm_layers=1, apply_half_sequence=False)
    params = model.init(RNG, dtype=F64)
    out = model.apply(params, jnp.zeros((1, 14, 30), dtype=F64))
    assert out.shape == (1, 14, 10)


def test_forward_model_matches_torch_oracle():
    """converted torch weights reproduce torch LSTM+Linear+AvgPool1d."""
    torch.manual_seed(1)
    lstm = torch.nn.LSTM(30, 24, num_layers=1, batch_first=True).double()
    lin = torch.nn.Linear(24, 60).double()
    pool = torch.nn.AvgPool1d(2, stride=2)
    x = torch.randn(2, 16, 30, dtype=torch.float64)
    with torch.no_grad():
        h, _ = lstm(x)
        y = lin(h).permute(0, 2, 1)
        want = pool(y).permute(0, 2, 1).numpy()

    sd = {f"lstm.{k}": v for k, v in lstm.state_dict().items()}
    sd.update({f"post_linear.{k}": v for k, v in lin.state_dict().items()})
    params = TC.convert_forward_model(sd)
    model = ForwardModel(num_lstm_layers=1, hidden_size=24)
    got = np.asarray(model.apply(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_embedding_model_last_step_gather_matches_torch():
    torch.manual_seed(2)
    lstm = torch.nn.LSTM(60, 16, num_layers=2, batch_first=True).double()
    lin = torch.nn.Linear(16, 300).double()
    x = torch.randn(3, 12, 60, dtype=torch.float64)
    lens = torch.tensor([12, 7, 3])
    with torch.no_grad():
        out, _ = lstm(x)
        out = torch.stack([out[i, (l - 1).long(), :] for i, l in enumerate(lens)])
        want = lin(out).numpy()

    sd = {f"lstm.{k}": v for k, v in lstm.state_dict().items()}
    sd.update({f"linear_mapping.{k}": v for k, v in lin.state_dict().items()})
    params = TC.convert_embedding_model(sd)
    model = EmbeddingModel(hidden_size=16, num_lstm_layers=2)
    got = np.asarray(model.apply(params, jnp.asarray(x.numpy()),
                                 jnp.asarray(lens.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_grouped_conv_conversion_matches_torch():
    torch.manual_seed(3)
    conv = torch.nn.Conv1d(30, 30, 5, padding=2, groups=30).double()
    x = torch.randn(2, 30, 11, dtype=torch.float64)  # (B, C, T)
    with torch.no_grad():
        want = conv(x).permute(0, 2, 1).numpy()
    params = TC.t_conv1d({"c.weight": conv.weight, "c.bias": conv.bias}, "c")
    got = np.asarray(B.conv1d(
        {k: jnp.asarray(v) for k, v in params.items()},
        jnp.asarray(x.permute(0, 2, 1).numpy()), groups=30))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_mel_channel_conv_matches_torch_oracle():
    """our mel-channel conv must equal the reference's channel-shift +
    grouped-conv + interleave computation (functional torch oracle)."""
    torch.manual_seed(4)
    c, fsc = 12, 3
    out_units = c // fsc
    convs = [torch.nn.Conv1d(c, out_units, 5, padding=2, groups=out_units).double()
             for _ in range(fsc)]
    x = torch.randn(2, c, 9, dtype=torch.float64)  # (B, C, T)

    with torch.no_grad():
        xs = []
        for i in range(fsc - 2):
            xs.append(torch.cat(
                (torch.zeros(2, i + 1, 9, dtype=torch.float64), x[:, :-(i + 1), :]), dim=1))
        xs.append(x)
        xs.append(torch.cat(
            (x[:, 1:, :], torch.zeros(2, 1, 9, dtype=torch.float64)), dim=1))
        outs = [conv(xi) for conv, xi in zip(convs, xs)]
        cols = [torch.stack([r[:, j, :] for r in outs], dim=1)
                for j in range(out_units)]
        want = torch.cat(cols, dim=1).permute(0, 2, 1).numpy()

    params = {"convs": [
        {k: jnp.asarray(v) for k, v in
         TC.t_conv1d({"c.weight": cv.weight, "c.bias": cv.bias}, "c").items()}
        for cv in convs
    ]}
    got = np.asarray(B.mel_channel_conv(
        params, jnp.asarray(x.permute(0, 2, 1).numpy()), filter_size_channel=fsc))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_upsample_linear_matches_torch():
    torch.manual_seed(5)
    x = torch.randn(2, 7, 13, dtype=torch.float64)  # (B, C, T)
    for size in (4, 13, 29):
        up = torch.nn.Upsample(size=size, mode="linear", align_corners=False)
        with torch.no_grad():
            want = up(x).permute(0, 2, 1).numpy()
        got = np.asarray(B.upsample_linear(
            jnp.asarray(x.permute(0, 2, 1).numpy()), size))
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_inverse_model_shapes():
    model = InverseModelMelTimeSmoothResidual(
        num_lstm_layers=1, hidden_size=32)
    params = model.init(RNG, dtype=F64)
    x = jnp.zeros((2, 10, 60), dtype=F64)
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (2, 20, 30)


def test_forward_full_variant_shapes():
    model = ForwardModelMelTimeSmoothResidual(num_lstm_layers=1, hidden_size=32)
    params = model.init(RNG, dtype=F64)
    out = model.apply(params, jnp.zeros((1, 12, 30), dtype=F64))
    assert out.shape == (1, 6, 60)


@pytest.mark.slow
def test_mel_embedding_full_variant_shapes():
    model = MelEmbeddingModelMelSmoothResidualUpsampling(
        num_lstm_layers=1, hidden_size=16, post_upsampling_size=64)
    params = model.init(RNG, dtype=F64)
    out = model.apply(params, jnp.zeros((2, 9, 60), dtype=F64), jnp.array([9, 4]))
    assert out.shape == (2, 300)


@pytest.mark.slow
def test_embedder_dropout_modes():
    model = EmbeddingModel(input_size=10, hidden_size=8, num_lstm_layers=2,
                           dropout=0.7)
    params = model.init(RNG, dtype=F64)
    x = jnp.ones((1, 6, 10), dtype=F64)
    lens = jnp.array([6])
    det = model.apply(params, x, lens)
    det2 = model.apply(params, x, lens, deterministic=True)
    np.testing.assert_allclose(np.asarray(det), np.asarray(det2))
    stoch = model.apply(params, x, lens, deterministic=False,
                        rng=jax.random.PRNGKey(7))
    assert not np.allclose(np.asarray(det), np.asarray(stoch))


@pytest.mark.slow
def test_generator_dynamic_length_and_range():
    model = Generator(output_size=30)
    params = model.init(RNG, dtype=F64)
    noise = jnp.zeros((1, 1, 100), dtype=F64)
    semvec = jnp.zeros((1, 300), dtype=F64)
    for length in (20, 34):
        out = model.apply(params, noise, length, semvec)
        assert out.shape == (1, length, 30)
        assert (np.abs(np.asarray(out)) <= 1.0).all()  # tanh output


@pytest.mark.slow
def test_mel_generator_output_size():
    model = Generator(output_size=60)
    params = model.init(RNG, dtype=F64)
    out = model.apply(params, jnp.zeros((1, 1, 100), dtype=F64), 10,
                      jnp.zeros((1, 300), dtype=F64))
    assert out.shape == (1, 10, 60)


def test_critic_scalar_output():
    model = Critic()
    params = model.init(RNG, dtype=F64)
    out = model.apply(params, jnp.zeros((3, 20, 30), dtype=F64), 20,
                      jnp.zeros((3, 300), dtype=F64))
    assert out.shape == (3,)


@pytest.mark.slow
def test_semvec_to_trajectory_models():
    cp_model = SemVecToCpModel(num_lstm_layers=1, hidden_size=16)
    out = cp_model.apply(cp_model.init(RNG, dtype=F64),
                         jnp.zeros((1, 8, 300), dtype=F64))
    assert out.shape == (1, 8, 30)
    mel_model = SemVecToMelModel(num_lstm_layers=1, hidden_size=16)
    out = mel_model.apply(mel_model.init(RNG, dtype=F64),
                          jnp.zeros((1, 8, 300), dtype=F64))
    assert out.shape == (1, 8, 60)


@pytest.mark.slow
def test_lstm_gan_pair():
    gen = LSTMGenerator()
    params = gen.init(RNG, dtype=F64)
    out = gen.apply(params, jnp.zeros((2, 15, 60), dtype=F64),
                    jnp.array([15, 15]), jnp.zeros((2, 300), dtype=F64))
    assert out.shape == (2, 15, 30)
    critic = LSTMCritic()
    params = critic.init(RNG, dtype=F64)
    score = critic.apply(params, out, jnp.array([15, 15]),
                         jnp.zeros((2, 300), dtype=F64))
    assert score.shape == (2, 1)


def test_linear_classifier_masking_matches_torch_semantics():
    model = LinearClassifier(input_dim=60, output_dim=1)
    params = model.init(RNG, dtype=F64)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 60)))
    got_masked = model.apply(params, x, src_lens=[10, 4])
    assert got_masked.shape == (2,)
    got_full = model.apply(params, x)
    # full-length mask equals unmasked mean
    np.testing.assert_allclose(
        float(got_full[0]), float(got_masked[0]), rtol=1e-10)


@pytest.mark.slow
def test_speech_transformer_shapes():
    model = SpeechNonSpeechTransformer(input_dim=60, num_layers=2, nhead=6)
    params = model.init(RNG, dtype=F64)
    out = model.apply(params, jnp.zeros((2, 12, 60), dtype=F64),
                      src_lens=[12, 5])
    assert out.shape == (2,)


@pytest.mark.slow
def test_baseline_models():
    lin = LinearModel(input_channel=30, output_channel=60, mode="pred",
                      on_full_sequence=True)
    out = lin.apply(lin.init(RNG, dtype=F64), jnp.zeros((1, 10, 30), dtype=F64))
    assert out.shape == (1, 5, 60)
    lin_inv = LinearModel(input_channel=60, output_channel=30, mode="inv",
                          on_full_sequence=True)
    out = lin_inv.apply(lin_inv.init(RNG, dtype=F64), jnp.zeros((1, 5, 60), dtype=F64))
    assert out.shape == (1, 10, 30)
    nl = NonLinearModel(input_channel=60, output_channel=300, mode="embed",
                        on_full_sequence=True, hidden_units=32)
    out = nl.apply(nl.init(RNG, dtype=F64), jnp.zeros((2, 5, 60), dtype=F64))
    assert out.shape == (2, 300)


@pytest.mark.slow
def test_gradients_flow_through_inverse_and_generator():
    inv = InverseModelMelTimeSmoothResidual(num_lstm_layers=1, hidden_size=16)
    p = inv.init(RNG, dtype=F64)
    x = jnp.ones((1, 6, 60), dtype=F64)

    def loss(xx):
        return jnp.sum(inv.apply(p, xx) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
