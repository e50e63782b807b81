"""Forward (predictive) models: cp -> mel, and the somatosensory variants
cp -> tube and tube -> mel.

The shipped default is a plain stacked LSTM + linear + optional half-sequence
average pooling (reference ``ForwardModel``,
/root/reference/paule/models.py:326-356); the richer variant adds time-conv
residual pre-smoothing, velocity/acceleration features and mel-channel
post-smoothing (reference ``ForwardModelMelTimeSmoothResidual``,
/root/reference/paule/models.py:256-324).
"""

import jax
import jax.numpy as jnp

from ..ops import lstm as LS
from ..ops.derivatives import add_vel_and_acc_info, half_sequence
from . import blocks as B


class ForwardModel:
    """cp (B, T, in) -> mel (B, T/2, out) [or (B, T, out) without pooling]."""

    def __init__(self, input_size=30, output_size=60, hidden_size=180,
                 num_lstm_layers=4, apply_half_sequence=True):
        self.input_size = input_size
        self.output_size = output_size
        self.hidden_size = hidden_size
        self.num_lstm_layers = num_lstm_layers
        self.apply_half_sequence = apply_half_sequence

    def init(self, rng, dtype=jnp.float32):
        keys = jax.random.split(rng, self.num_lstm_layers + 1)
        layers = []
        in_size = self.input_size
        for li in range(self.num_lstm_layers):
            layers.append(
                LS.lstm_layer_params(keys[li], in_size, self.hidden_size, dtype))
            in_size = self.hidden_size
        return {
            "lstm": layers,
            "post_linear": B.linear_init(
                keys[-1], self.hidden_size, self.output_size, dtype),
        }

    def apply(self, params, x, lens=None, **_):
        out, _state = LS.lstm(params["lstm"], x)
        out = B.linear(params["post_linear"], out)
        if self.apply_half_sequence:
            t = out.shape[-2]
            out = half_sequence(out[..., : (t // 2) * 2, :])
        return out

    def __call__(self, params, x, lens=None, **kw):
        return self.apply(params, x, lens, **kw)


class ForwardModelMelTimeSmoothResidual:
    """Full forward variant with residual time smoothing and mel-channel
    smoothing around the LSTM core."""

    def __init__(self, input_size=30, output_size=60, hidden_size=180,
                 num_lstm_layers=4, mel_smooth_layers=3,
                 mel_smooth_filter_size=3, resid_blocks=5, time_filter_size=5,
                 lstm_resid=True):
        self.input_size = input_size
        self.output_size = output_size
        self.hidden_size = hidden_size
        self.num_lstm_layers = num_lstm_layers
        self.mel_smooth_layers = mel_smooth_layers
        self.mel_smooth_filter_size = mel_smooth_filter_size
        self.resid_blocks = resid_blocks
        self.time_filter_size = time_filter_size
        self.lstm_resid = lstm_resid

    def init(self, rng, dtype=jnp.float32):
        n_keys = self.resid_blocks + self.num_lstm_layers + 1 + self.mel_smooth_layers + 1
        keys = iter(jax.random.split(rng, n_keys))
        params = {
            "resid_blocks": [
                B.time_conv_res_block_init(
                    next(keys), self.input_size, self.time_filter_size, dtype=dtype)
                for _ in range(self.resid_blocks)
            ],
        }
        layers = []
        in_size = 3 * self.input_size
        for _ in range(self.num_lstm_layers):
            layers.append(LS.lstm_layer_params(next(keys), in_size, self.hidden_size, dtype))
            in_size = self.hidden_size
        params["lstm"] = layers
        params["post_linear"] = B.linear_init(
            next(keys), self.hidden_size, self.output_size, dtype)
        params["mel_blocks"] = [
            B.mel_channel_conv_init(
                next(keys), self.output_size, self.mel_smooth_filter_size, dtype)
            for _ in range(self.mel_smooth_layers)
        ]
        if self.lstm_resid and self.mel_smooth_layers > 0:
            params["resid_weighting"] = B.conv1d_init(
                next(keys), 2 * self.output_size, self.output_size,
                self.time_filter_size, groups=self.output_size, dtype=dtype)
        return params

    def apply(self, params, x, lens=None, **_):
        for bp in params["resid_blocks"]:
            x = B.time_conv_res_block(bp, x, channels=self.input_size)
        x = add_vel_and_acc_info(x)
        out, _state = LS.lstm(params["lstm"], x)
        out = B.linear(params["post_linear"], out)
        t = out.shape[-2]
        out = half_sequence(out[..., : (t // 2) * 2, :])
        lstm_out = out
        for mp in params["mel_blocks"]:
            shortcut = out
            out = B.mel_channel_conv(mp, out, filter_size_channel=self.mel_smooth_filter_size)
            out = out + shortcut
        if self.lstm_resid and self.mel_smooth_layers > 0:
            inter = B.interleave_channels(lstm_out, out)
            out = B.conv1d(params["resid_weighting"], inter, groups=self.output_size)
        return out

    def __call__(self, params, x, lens=None, **kw):
        return self.apply(params, x, lens, **kw)
