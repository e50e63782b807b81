"""Inverse model: mel (B, T, 60) -> cp (B, 2T, 30).

Architecture (reference ``InverseModelMelTimeSmoothResidual``,
/root/reference/paule/models.py:177-247):

  mel-channel smoothing conv blocks (residual) -> +vel/acc features ->
  stacked LSTM -> linear -> double_sequence (midpoint upsampling x2) ->
  time-conv residual stack -> grouped conv weighting of (smoothed, lstm)
"""

import jax
import jax.numpy as jnp

from ..ops import lstm as LS
from ..ops.derivatives import add_vel_and_acc_info, double_sequence
from . import blocks as B


class InverseModelMelTimeSmoothResidual:

    def __init__(self, input_size=60, output_size=30, hidden_size=180,
                 num_lstm_layers=4, mel_smooth_layers=3,
                 mel_smooth_filter_size=3, resid_blocks=5,
                 time_filter_size=5, lstm_resid=True):
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
        n_keys = (self.mel_smooth_layers + self.num_lstm_layers + 1
                  + self.resid_blocks + 1)
        keys = iter(jax.random.split(rng, n_keys))
        params = {
            "mel_blocks": [
                B.mel_channel_conv_init(
                    next(keys), self.input_size, self.mel_smooth_filter_size, dtype)
                for _ in range(self.mel_smooth_layers)
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
        params["resid_blocks"] = [
            B.time_conv_res_block_init(
                next(keys), self.output_size, self.time_filter_size, dtype=dtype)
            for _ in range(self.resid_blocks)
        ]
        if self.lstm_resid and self.resid_blocks > 0:
            params["resid_weighting"] = B.conv1d_init(
                next(keys), 2 * self.output_size, self.output_size,
                self.time_filter_size, groups=self.output_size, dtype=dtype)
        return params

    def apply(self, params, x, lens=None, **_):
        for mp in params["mel_blocks"]:
            shortcut = x
            x = B.mel_channel_conv(mp, x, filter_size_channel=self.mel_smooth_filter_size)
            x = x + shortcut
        x = add_vel_and_acc_info(x)
        out, _state = LS.lstm(params["lstm"], x)
        out = B.linear(params["post_linear"], out)
        out = double_sequence(out)
        lstm_out = out
        for bp in params["resid_blocks"]:
            out = B.time_conv_res_block(bp, out, channels=self.output_size)
        if self.lstm_resid and self.resid_blocks > 0:
            # channel order [smoothed_i, lstm_i] per group, matching the
            # reference's stack((output, lstm_output)) interleave
            inter = B.interleave_channels(out, lstm_out)
            out = B.conv1d(params["resid_weighting"], inter, groups=self.output_size)
        return out

    def __call__(self, params, x, lens=None, **kw):
        return self.apply(params, x, lens, **kw)
