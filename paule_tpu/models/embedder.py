"""Embedder models: sequence (mel or tube) -> fixed 300-dim semantic vector.

The shipped default is a stacked LSTM whose *last valid* hidden state is
mapped linearly to the embedding (reference ``EmbeddingModel``,
/root/reference/paule/models.py:413-448); the richer variant adds mel-channel
smoothing and a wide (8192) hidden projection (reference
``MelEmbeddingModelMelSmoothResidualUpsampling``,
/root/reference/paule/models.py:362-409).

Inter-layer LSTM dropout (used by the tube embedder with p=0.7 and toggled
train/eval *inside* the reference planning loop,
/root/reference/paule/paule.py:929/1144) is reproduced through the
``deterministic``/``rng`` arguments.
"""

import jax
import jax.numpy as jnp

from ..ops import lstm as LS
from . import blocks as B


class EmbeddingModel:

    def __init__(self, input_size=60, output_size=300, hidden_size=720,
                 num_lstm_layers=1, post_upsampling_size=0, dropout=0.0):
        self.input_size = input_size
        self.output_size = output_size
        self.hidden_size = hidden_size
        self.num_lstm_layers = num_lstm_layers
        self.post_upsampling_size = post_upsampling_size
        self.dropout = dropout

    def init(self, rng, dtype=jnp.float32):
        keys = iter(jax.random.split(rng, self.num_lstm_layers + 2))
        layers = []
        in_size = self.input_size
        for _ in range(self.num_lstm_layers):
            layers.append(LS.lstm_layer_params(next(keys), in_size, self.hidden_size, dtype))
            in_size = self.hidden_size
        params = {"lstm": layers}
        if self.post_upsampling_size > 0:
            params["post_linear"] = B.linear_init(
                next(keys), self.hidden_size, self.post_upsampling_size, dtype)
            params["linear_mapping"] = B.linear_init(
                next(keys), self.post_upsampling_size, self.output_size, dtype)
        else:
            params["linear_mapping"] = B.linear_init(
                next(keys), self.hidden_size, self.output_size, dtype)
        return params

    def apply(self, params, x, lens, *, deterministic=True, rng=None, **_):
        out, _state = LS.lstm(
            params["lstm"], x, dropout=self.dropout,
            deterministic=deterministic, rng=rng)
        out = B.gather_last_step(out, lens)
        if self.post_upsampling_size > 0:
            out = B.linear(params["post_linear"], out)
            out = B.leaky_relu(out)
        out = B.linear(params["linear_mapping"], out)
        return out

    def __call__(self, params, x, lens, **kw):
        return self.apply(params, x, lens, **kw)


class MelEmbeddingModelMelSmoothResidualUpsampling:

    def __init__(self, input_size=60, output_size=300, hidden_size=180,
                 num_lstm_layers=4, mel_smooth_layers=3,
                 mel_smooth_filter_size=3, post_upsampling_size=8192):
        self.input_size = input_size
        self.output_size = output_size
        self.hidden_size = hidden_size
        self.num_lstm_layers = num_lstm_layers
        self.mel_smooth_layers = mel_smooth_layers
        self.mel_smooth_filter_size = mel_smooth_filter_size
        self.post_upsampling_size = post_upsampling_size

    def init(self, rng, dtype=jnp.float32):
        keys = iter(jax.random.split(
            rng, self.mel_smooth_layers + self.num_lstm_layers + 2))
        params = {
            "mel_blocks": [
                B.mel_channel_conv_init(
                    next(keys), self.input_size, self.mel_smooth_filter_size, dtype)
                for _ in range(self.mel_smooth_layers)
            ],
        }
        layers = []
        in_size = self.input_size
        for _ in range(self.num_lstm_layers):
            layers.append(LS.lstm_layer_params(next(keys), in_size, self.hidden_size, dtype))
            in_size = self.hidden_size
        params["lstm"] = layers
        params["post_linear"] = B.linear_init(
            next(keys), self.hidden_size, self.post_upsampling_size, dtype)
        params["upsampling"] = B.linear_init(
            next(keys), self.post_upsampling_size, self.output_size, dtype)
        return params

    def apply(self, params, x, lens, **_):
        for mp in params["mel_blocks"]:
            shortcut = x
            x = B.mel_channel_conv(mp, x, filter_size_channel=self.mel_smooth_filter_size)
            x = x + shortcut
        out, _state = LS.lstm(params["lstm"], x)
        out = B.gather_last_step(out, lens)
        out = B.linear(params["post_linear"], out)
        out = B.leaky_relu(out)
        out = B.linear(params["upsampling"], out)
        return out

    def __call__(self, params, x, lens, **kw):
        return self.apply(params, x, lens, **kw)
