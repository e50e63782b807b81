"""Baseline models: single linear layer and two-layer perceptron, each usable
as predictive (cp->mel, with half-sequence pooling), inverse (mel->cp, with
double-sequence upsampling) or embedder (sum over time) — reference
/root/reference/paule/models.py:455-553."""

import jax
import jax.numpy as jnp

from ..ops.derivatives import add_vel_and_acc_info, double_sequence, half_sequence
from . import blocks as B

_MODES = ("pred", "inv", "embed")


class LinearModel:

    def __init__(self, input_channel=30, output_channel=60, mode="inv",
                 on_full_sequence=False, add_vel_and_acc=True):
        if mode not in _MODES:
            raise ValueError(f"mode must be one of {_MODES}")
        self.mode = mode
        self.on_full_sequence = on_full_sequence
        self.add_vel_and_acc = add_vel_and_acc
        if on_full_sequence:
            self.input_channel = 3 * input_channel if add_vel_and_acc else input_channel
        else:
            self.input_channel = 2 * input_channel
        self.output_channel = output_channel

    def init(self, rng, dtype=jnp.float32):
        return {"linear": B.linear_init(rng, self.input_channel,
                                        self.output_channel, dtype)}

    def apply(self, params, x, *args, **_):
        if self.on_full_sequence:
            if self.add_vel_and_acc:
                x = add_vel_and_acc_info(x)
        else:
            x = x.reshape((x.shape[0], 1, -1))
        out = B.linear(params["linear"], x)
        if self.on_full_sequence:
            if self.mode == "pred":
                t = out.shape[-2]
                out = half_sequence(out[..., : (t // 2) * 2, :])
            elif self.mode == "inv":
                out = double_sequence(out)
        return out

    def __call__(self, params, x, *a, **kw):
        return self.apply(params, x, *a, **kw)


class NonLinearModel:

    def __init__(self, input_channel=30, output_channel=60, hidden_units=8192,
                 mode="pred", on_full_sequence=False, add_vel_and_acc=True):
        if mode not in _MODES:
            raise ValueError(f"mode must be one of {_MODES}")
        self.mode = mode
        self.on_full_sequence = on_full_sequence
        self.add_vel_and_acc = add_vel_and_acc
        if on_full_sequence:
            self.input_channel = 3 * input_channel if add_vel_and_acc else input_channel
        else:
            self.input_channel = 2 * input_channel
        self.output_channel = output_channel
        self.hidden_units = hidden_units

    def init(self, rng, dtype=jnp.float32):
        k1, k2 = jax.random.split(rng)
        return {
            "non_linear": B.linear_init(k1, self.input_channel,
                                        self.hidden_units, dtype),
            "linear": B.linear_init(k2, self.hidden_units,
                                    self.output_channel, dtype),
        }

    def apply(self, params, x, *args, **_):
        if self.on_full_sequence:
            if self.add_vel_and_acc:
                x = add_vel_and_acc_info(x)
            if self.mode == "embed":
                x = x.sum(axis=1)
        else:
            x = x.reshape((x.shape[0], 1, -1))
        out = B.linear(params["non_linear"], x)
        out = B.leaky_relu(out)
        out = B.linear(params["linear"], out)
        if self.on_full_sequence:
            if self.mode == "pred":
                t = out.shape[-2]
                out = half_sequence(out[..., : (t // 2) * 2, :])
            elif self.mode == "inv":
                out = double_sequence(out)
        return out

    def __call__(self, params, x, *a, **kw):
        return self.apply(params, x, *a, **kw)
