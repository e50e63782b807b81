"""Generative models: conditional GAN generator/critic pairs that map a
semantic vector (+noise) to cp or mel trajectories of a requested length,
plus the direct semvec->trajectory LSTMs.

Shape contracts (reference /root/reference/paule/models.py:559-800):

* ``Generator(noise (B,1,100), length, semvec (B,300)) -> (B, length, 30|60)``
  — note the *dynamic output length*: each conv block is preceded by linear
  upsampling to ``length // (n_blocks - i)``.  Under jit the length is a
  static (trace-time) argument, which matches how planning uses it (one
  utterance length per compilation).
* ``Critic(x (B,T,C), length, semvec) -> (B,)`` — Wasserstein critic score.
"""

import jax
import jax.numpy as jnp

from ..ops import lstm as LS
from . import blocks as B


class Generator:

    def __init__(self, channel_noise=100, embed_size=300, fc_size=1024,
                 inital_seq_length=4, hidden_size=256, num_res_blocks=5,
                 output_size=30):
        self.channel_noise = channel_noise
        self.embed_size = embed_size
        self.fc_size = fc_size
        self.inital_seq_length = inital_seq_length
        self.hidden_size = hidden_size
        self.num_res_blocks = num_res_blocks
        self.output_size = output_size
        self.fc_reshaped_size = fc_size // inital_seq_length

    def init(self, rng, dtype=jnp.float32):
        keys = iter(jax.random.split(rng, self.num_res_blocks + 3))
        params = {
            "fully_connected": B.linear_init(
                next(keys), self.channel_noise + self.embed_size, self.fc_size, dtype),
            "blocks": [],
        }
        in_ch = self.fc_reshaped_size
        for _ in range(self.num_res_blocks):
            params["blocks"].append({
                "conv": B.conv1d_init(next(keys), in_ch, self.hidden_size, 5, dtype=dtype),
                "bn": B.batchnorm_init(self.hidden_size, dtype),
            })
            in_ch = self.hidden_size
        params["post_linear"] = B.linear_init(
            next(keys), self.hidden_size, self.output_size, dtype)
        params["final_smoothing"] = B.conv1d_init(
            next(keys), self.output_size, self.output_size, 5,
            groups=self.output_size, dtype=dtype)
        return params

    def apply(self, params, x, length, vector, *, use_running_average=True,
              collect_stats=False, **_):
        """x: noise (B, 1, channel_noise); length: static int; vector (B, 300).

        ``collect_stats=True`` (train-mode forwards only) additionally
        returns the params with each block's batch-norm running stats
        updated from this batch — the functional equivalent of torch's
        in-place train-mode update (torch BatchNorm1d, momentum 0.1);
        training steps adopt them so a from-scratch-trained generator has
        valid inference statistics."""
        length = int(length)
        new_blocks = [] if collect_stats else None
        x = jnp.concatenate([x, vector[:, None, :]], axis=2)
        out = B.linear(params["fully_connected"], x)  # (B, 1, fc_size)
        b = out.shape[0]
        # (B, fc_reshaped, init_seq) channel-major in the reference; in our
        # (B, T, C) layout: seq=init_seq, channels=fc_reshaped
        out = out.reshape(b, self.fc_reshaped_size, -1)  # (B, C, L)
        out = jnp.swapaxes(out, 1, 2)  # (B, L, C)

        n = self.num_res_blocks
        for i, bp in enumerate(params["blocks"]):
            size_i = int(length / (n - i))
            out = B.upsample_linear(out, size_i)
            resid = out
            h = B.conv1d(bp["conv"], out)
            if collect_stats:
                new_blocks.append(dict(
                    bp, bn=B.batchnorm_new_stats(bp["bn"], h)))
            h = B.batchnorm(bp["bn"], h, use_running_average=use_running_average)
            h = B.leaky_relu(h, 0.2)
            if i == 0:
                if self.fc_reshaped_size == self.hidden_size:
                    h = h + resid
            else:
                h = h + resid
            out = h

        out = B.linear(params["post_linear"], out)
        resid = out
        out = B.conv1d(params["final_smoothing"], out, groups=self.output_size)
        out = out + resid
        out = jnp.tanh(out)
        if collect_stats:
            return out, dict(params, blocks=new_blocks)
        return out

    def __call__(self, params, x, length, vector, **kw):
        return self.apply(params, x, length, vector, **kw)


class Critic:

    def __init__(self, input_size=30, embed_size=300, hidden_size=180,
                 num_res_blocks=5):
        self.input_size = input_size
        self.embed_size = embed_size
        self.hidden_size = hidden_size
        self.num_res_blocks = num_res_blocks

    def init(self, rng, dtype=jnp.float32):
        keys = iter(jax.random.split(rng, self.num_res_blocks + 1))
        params = {
            "inital_linear": B.linear_init(
                next(keys), self.input_size + self.embed_size, self.hidden_size, dtype),
            "blocks": [
                {
                    "conv": B.conv1d_init(next(keys), self.hidden_size,
                                          self.hidden_size, 5, dtype=dtype),
                    "in_norm": B.instancenorm_init(self.hidden_size, dtype),
                }
                for _ in range(self.num_res_blocks)
            ],
        }
        return params

    def apply(self, params, x, length, vector, **_):
        cond = jnp.broadcast_to(
            vector[:, None, :], (x.shape[0], x.shape[1], vector.shape[-1]))
        x = jnp.concatenate([x, cond], axis=2)
        out = B.linear(params["inital_linear"], x)
        for bp in params["blocks"]:
            resid = out
            h = B.conv1d(bp["conv"], out)
            h = B.instancenorm(bp["in_norm"], h)
            h = B.leaky_relu(h, 0.2)
            out = h + resid
        return out.mean(axis=(1, 2))

    def __call__(self, params, x, length, vector, **kw):
        return self.apply(params, x, length, vector, **kw)


class SemVecToCpModel:
    """semvec sequence -> cp trajectory (reference
    /root/reference/paule/models.py:655-698)."""

    def __init__(self, input_size=300, output_size=30, hidden_size=180,
                 num_lstm_layers=4, resid_blocks=5, time_filter_size=5,
                 lstm_resid=True):
        self.input_size = input_size
        self.output_size = output_size
        self.hidden_size = hidden_size
        self.num_lstm_layers = num_lstm_layers
        self.resid_blocks = resid_blocks
        self.time_filter_size = time_filter_size
        self.lstm_resid = lstm_resid

    def init(self, rng, dtype=jnp.float32):
        keys = iter(jax.random.split(rng, self.num_lstm_layers + self.resid_blocks + 2))
        layers = []
        in_size = self.input_size
        for _ in range(self.num_lstm_layers):
            layers.append(LS.lstm_layer_params(next(keys), in_size, self.hidden_size, dtype))
            in_size = self.hidden_size
        params = {
            "lstm": layers,
            "post_linear": B.linear_init(next(keys), self.hidden_size, self.output_size, dtype),
            "resid_blocks": [
                B.time_conv_res_block_init(next(keys), self.output_size,
                                           self.time_filter_size, dtype=dtype)
                for _ in range(self.resid_blocks)
            ],
        }
        if self.lstm_resid and self.resid_blocks > 0:
            params["resid_weighting"] = B.conv1d_init(
                next(keys), 2 * self.output_size, self.output_size,
                self.time_filter_size, groups=self.output_size, dtype=dtype)
        return params

    def apply(self, params, x, *_, **__):
        out, _state = LS.lstm(params["lstm"], x)
        out = B.linear(params["post_linear"], out)
        lstm_out = out
        for bp in params["resid_blocks"]:
            out = B.time_conv_res_block(bp, out, channels=self.output_size)
        if self.lstm_resid and self.resid_blocks > 0:
            inter = B.interleave_channels(out, lstm_out)
            out = B.conv1d(params["resid_weighting"], inter, groups=self.output_size)
        return out

    def __call__(self, params, x, *a, **kw):
        return self.apply(params, x, *a, **kw)


class SemVecToMelModel:
    """semvec sequence -> mel (reference /root/reference/paule/models.py:702-747)."""

    def __init__(self, input_size=300, output_size=60, hidden_size=180,
                 num_lstm_layers=4, mel_smooth_layers=3,
                 mel_smooth_filter_size=3, time_filter_size=5, lstm_resid=True):
        self.input_size = input_size
        self.output_size = output_size
        self.hidden_size = hidden_size
        self.num_lstm_layers = num_lstm_layers
        self.mel_smooth_layers = mel_smooth_layers
        self.mel_smooth_filter_size = mel_smooth_filter_size
        self.time_filter_size = time_filter_size
        self.lstm_resid = lstm_resid

    def init(self, rng, dtype=jnp.float32):
        keys = iter(jax.random.split(
            rng, self.num_lstm_layers + self.mel_smooth_layers + 2))
        layers = []
        in_size = self.input_size
        for _ in range(self.num_lstm_layers):
            layers.append(LS.lstm_layer_params(next(keys), in_size, self.hidden_size, dtype))
            in_size = self.hidden_size
        params = {
            "lstm": layers,
            "post_linear": B.linear_init(next(keys), self.hidden_size, self.output_size, dtype),
            "mel_blocks": [
                B.mel_channel_conv_init(next(keys), self.output_size,
                                        self.mel_smooth_filter_size, dtype)
                for _ in range(self.mel_smooth_layers)
            ],
        }
        if self.lstm_resid and self.mel_smooth_layers > 0:
            params["resid_weighting"] = B.conv1d_init(
                next(keys), 2 * self.output_size, self.output_size,
                self.time_filter_size, groups=self.output_size, dtype=dtype)
        return params

    def apply(self, params, x, *_, **__):
        out, _state = LS.lstm(params["lstm"], x)
        out = B.linear(params["post_linear"], out)
        lstm_out = out
        for mp in params["mel_blocks"]:
            shortcut = out
            out = B.mel_channel_conv(mp, out, filter_size_channel=self.mel_smooth_filter_size)
            out = out + shortcut
        if self.lstm_resid and self.mel_smooth_layers > 0:
            inter = B.interleave_channels(lstm_out, out)
            out = B.conv1d(params["resid_weighting"], inter, groups=self.output_size)
        return out

    def __call__(self, params, x, *a, **kw):
        return self.apply(params, x, *a, **kw)


class LSTMCritic:
    """Recurrent critic (reference /root/reference/paule/models.py:750-770)."""

    def __init__(self, input_size=30, embed_size=300, output_size=1,
                 hidden_size=200, num_lstm_layers=2, dropout=0.5):
        self.input_size = input_size
        self.embed_size = embed_size
        self.output_size = output_size
        self.hidden_size = hidden_size
        self.num_lstm_layers = num_lstm_layers
        self.dropout = dropout

    def init(self, rng, dtype=jnp.float32):
        keys = iter(jax.random.split(rng, self.num_lstm_layers + 1))
        layers = []
        in_size = self.input_size + self.embed_size
        for _ in range(self.num_lstm_layers):
            layers.append(LS.lstm_layer_params(next(keys), in_size, self.hidden_size, dtype))
            in_size = self.hidden_size
        return {
            "lstm": layers,
            "fully_connected": B.linear_init(
                next(keys), self.hidden_size, self.output_size, dtype),
        }

    def apply(self, params, x, lens, vector, *, deterministic=True, rng=None, **_):
        cond = jnp.broadcast_to(
            vector[:, None, :], (x.shape[0], x.shape[1], vector.shape[-1]))
        x = jnp.concatenate([x, cond], axis=2)
        out, _state = LS.lstm(params["lstm"], x, dropout=self.dropout,
                              deterministic=deterministic, rng=rng)
        out = B.gather_last_step(out, lens)
        return B.linear(params["fully_connected"], out)

    def __call__(self, params, x, lens, vector, **kw):
        return self.apply(params, x, lens, vector, **kw)


class LSTMGenerator:
    """Recurrent generator (reference /root/reference/paule/models.py:773-800)."""

    def __init__(self, channel_noise=60, embed_size=300, output_size=30,
                 hidden_size=200, num_lstm_layers=2, dropout=0.5):
        self.channel_noise = channel_noise
        self.embed_size = embed_size
        self.output_size = output_size
        self.hidden_size = hidden_size
        self.num_lstm_layers = num_lstm_layers
        self.dropout = dropout

    def init(self, rng, dtype=jnp.float32):
        keys = iter(jax.random.split(rng, self.num_lstm_layers + 2))
        params = {
            "fully_connected": B.linear_init(
                next(keys), self.channel_noise + self.embed_size, self.hidden_size, dtype),
        }
        layers = []
        in_size = self.hidden_size
        for _ in range(self.num_lstm_layers):
            layers.append(LS.lstm_layer_params(next(keys), in_size, self.hidden_size, dtype))
            in_size = self.hidden_size
        params["lstm"] = layers
        params["post_linear"] = B.linear_init(
            next(keys), self.hidden_size, self.output_size, dtype)
        return params

    def apply(self, params, x, lens, vector, *, deterministic=True, rng=None, **_):
        cond = jnp.broadcast_to(
            vector[:, None, :], (x.shape[0], x.shape[1], vector.shape[-1]))
        x = jnp.concatenate([x, cond], axis=2)
        out = B.leaky_relu(B.linear(params["fully_connected"], x), 0.2)
        out, _state = LS.lstm(params["lstm"], out, dropout=self.dropout,
                              deterministic=deterministic, rng=rng)
        out = B.linear(params["post_linear"], out)
        return jnp.tanh(out)

    def __call__(self, params, x, lens, vector, **kw):
        return self.apply(params, x, lens, vector, **kw)
