"""Shared neural building blocks (functional, param-pytree style).

All modules follow the convention:

* activations/data flow in ``(batch, time, channels)`` layout — the natural
  layout for MXU matmuls over the channel axis (no permutes needed around
  LSTMs and linears, unlike the reference's torch code which flips between
  (B,T,C) and (B,C,T)).
* parameters are plain dicts of jnp arrays; weight layouts are chosen so
  torch checkpoints convert by simple transposition
  (:mod:`paule_tpu.models.torch_convert`).
"""

import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# initializers (torch-equivalent defaults so randomly-initialized models have
# the same statistics as the reference's)
# ---------------------------------------------------------------------------

def _kaiming_uniform_fan_in(rng, shape, fan_in, dtype):
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def linear_init(rng, in_features, out_features, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    w = _kaiming_uniform_fan_in(k1, (in_features, out_features), in_features, dtype)
    bound = 1.0 / math.sqrt(in_features)
    b = jax.random.uniform(k2, (out_features,), dtype, -bound, bound)
    return {"w": w, "b": b}


def linear(params, x):
    return x @ params["w"] + params["b"]


def conv1d_init(rng, in_channels, out_channels, kernel_size, *, groups=1,
                dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    fan_in = (in_channels // groups) * kernel_size
    w = _kaiming_uniform_fan_in(
        k1, (kernel_size, in_channels // groups, out_channels), fan_in, dtype)
    bound = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(k2, (out_channels,), dtype, -bound, bound)
    return {"w": w, "b": b}


def conv1d(params, x, *, groups=1, padding="SAME"):
    """1-D convolution over time on (B, T, C) data.

    Kernel layout ``(k, in/groups, out)`` — torch's ``(out, in/groups, k)``
    transposed, see torch_convert.
    """
    k = params["w"].shape[0]
    if padding == "SAME":
        pad = [( (k - 1) // 2, k // 2 )]
    else:
        pad = padding
    out = jax.lax.conv_general_dilated(
        x, params["w"],
        window_strides=(1,),
        padding=pad,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return out + params["b"]


def leaky_relu(x, negative_slope=0.01):
    return jnp.where(x >= 0, x, negative_slope * x)


# ---------------------------------------------------------------------------
# normalization layers
# ---------------------------------------------------------------------------

def batchnorm_init(channels, dtype=jnp.float32):
    return {
        "scale": jnp.ones((channels,), dtype),
        "bias": jnp.zeros((channels,), dtype),
        "mean": jnp.zeros((channels,), dtype),
        "var": jnp.ones((channels,), dtype),
    }


def batchnorm(params, x, *, use_running_average=True, eps=1e-5):
    """BatchNorm over (B, T, C): normalizes per channel across batch+time."""
    if use_running_average:
        mean, var = params["mean"], params["var"]
    else:
        mean = x.mean(axis=(0, 1))
        var = x.var(axis=(0, 1))
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * params["scale"] + params["bias"]


def batchnorm_new_stats(params, x, *, momentum=0.1, ):
    """Running-stat update from a training batch, torch ``BatchNorm1d``
    semantics: ``running = (1-m)*running + m*batch_stat`` with momentum 0.1
    and the UNBIASED batch variance (normalization itself uses the biased
    variance — torch does the same split).  Functional counterpart of the
    in-place update torch performs on every train-mode forward; training
    steps adopt the returned stats into the parameter pytree
    (pretrain.train_gan)."""
    n = x.shape[0] * x.shape[1]
    mean = x.mean(axis=(0, 1))
    var = x.var(axis=(0, 1))
    unbiased = var * (n / max(n - 1, 1))
    new = dict(params)
    new["mean"] = (1.0 - momentum) * params["mean"] + momentum * mean
    new["var"] = (1.0 - momentum) * params["var"] + momentum * unbiased
    return new


def instancenorm_init(channels, dtype=jnp.float32):
    return {"scale": jnp.ones((channels,), dtype),
            "bias": jnp.zeros((channels,), dtype)}


def instancenorm(params, x, *, eps=1e-5):
    """InstanceNorm over (B, T, C): per-sample, per-channel over time."""
    mean = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * params["scale"] + params["bias"]


def layernorm_init(features, dtype=jnp.float32):
    return {"scale": jnp.ones((features,), dtype),
            "bias": jnp.zeros((features,), dtype)}


def layernorm(params, x, *, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]


# ---------------------------------------------------------------------------
# composite blocks of the reference model zoo
# ---------------------------------------------------------------------------

def time_conv_res_block_init(rng, channels, filter_size, *, depth="channelwise",
                             dtype=jnp.float32):
    """Two stacked channelwise time convolutions with a residual connection
    (reference TimeConvResBlock, /root/reference/paule/models.py:114-139)."""
    groups = channels if depth == "channelwise" else 1
    k1, k2 = jax.random.split(rng)
    return {
        "conv1": conv1d_init(k1, channels, channels, filter_size, groups=groups, dtype=dtype),
        "conv2": conv1d_init(k2, channels, channels, filter_size, groups=groups, dtype=dtype),
    }


def time_conv_res_block(params, x, *, channels, depth="channelwise",
                        pre_activation=None, post_activation=None,
                        add_resid=True):
    groups = channels if depth == "channelwise" else 1
    resid = x
    out = x if pre_activation is None else pre_activation(x)
    out = conv1d(params["conv1"], out, groups=groups)
    out = conv1d(params["conv2"], out, groups=groups)
    if post_activation is not None:
        out = post_activation(out)
    if add_resid:
        out = out + resid
    return out


def time_conv_inception_block_init(rng, channels, dtype=jnp.float32):
    """Parallel 1/3/5 time convolutions with per-channel combine (reference
    TimeConvIncpetionBlock, /root/reference/paule/models.py:83-110 — unused
    by the shipped defaults, kept for zoo completeness)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "conv1": conv1d_init(k1, channels, channels, 1, dtype=dtype),
        "conv3": conv1d_init(k2, channels, channels, 3, groups=channels, dtype=dtype),
        "conv5": conv1d_init(k3, channels, channels, 5, groups=channels, dtype=dtype),
        "combine": conv1d_init(k4, 3 * channels, channels, 1, groups=channels, dtype=dtype),
    }


def time_conv_inception_block(params, x, *, channels, activation=None,
                              add_resid=True):
    resid = x
    out = x if activation is None else activation(x)
    o1 = conv1d(params["conv1"], out)
    o3 = conv1d(params["conv3"], out, groups=channels)
    o5 = conv1d(params["conv5"], out, groups=channels)
    b, t, c = o1.shape
    # interleave per source channel: [o1_i, o3_i, o5_i] groups
    stacked = jnp.stack([o1, o3, o5], axis=-1).reshape(b, t, 3 * c)
    out = conv1d(params["combine"], stacked, groups=channels)
    if add_resid:
        out = out + resid
    return out


def mel_channel_conv_init(rng, input_units, filter_size_channel, dtype=jnp.float32):
    """Convolution across neighbouring mel channels (reference
    MelChannelConv1D, /root/reference/paule/models.py:142-169)."""
    if input_units % filter_size_channel != 0:
        raise ValueError("input_units must be divisible by filter_size_channel")
    output_units = input_units // filter_size_channel
    keys = jax.random.split(rng, filter_size_channel)
    return {
        "convs": [
            conv1d_init(k, input_units, output_units, 5, groups=output_units, dtype=dtype)
            for k in keys
        ],
    }


def mel_channel_conv(params, x, *, filter_size_channel):
    """x: (B, T, C).  Produces (B, T, C) by running `fsc` grouped time-convs
    on channel-shifted copies of the input and interleaving their outputs
    (output channel ``j*fsc + i`` comes from conv ``i``, group ``j``)."""
    fsc = filter_size_channel
    b, t, c = x.shape
    out_units = c // fsc

    xs = []
    for i in range(fsc - 2):
        # shift channels down by (i+1): channel axis front-padded with zeros
        shifted = jnp.pad(x, ((0, 0), (0, 0), (i + 1, 0)))[:, :, :c]
        xs.append(shifted)
    xs.append(x)
    # shift channels up by 1
    xs.append(jnp.pad(x, ((0, 0), (0, 0), (0, 1)))[:, :, 1:])

    outs = [
        conv1d(p, xi, groups=out_units)
        for p, xi in zip(params["convs"], xs)
    ]  # each (B, T, out_units)
    stacked = jnp.stack(outs, axis=-1)  # (B, T, out_units, fsc)
    return stacked.reshape(b, t, c)


def interleave_channels(a, b):
    """Interleave two (B, T, C) tensors into (B, T, 2C) with channel order
    [a0, b0, a1, b1, ...] (the reference's stack/cat residual-weighting
    pattern, e.g. /root/reference/paule/models.py:242-244)."""
    bsz, t, c = a.shape
    return jnp.stack([a, b], axis=-1).reshape(bsz, t, 2 * c)


def upsample_linear(x, size):
    """torch nn.Upsample(mode='linear', align_corners=False) on (B, T, C)."""
    b, t, c = x.shape
    if t == size:
        return x
    pos = (jnp.arange(size) + 0.5) * (t / size) - 0.5
    pos = jnp.clip(pos, 0.0, t - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    frac = (pos - lo)[None, :, None]
    return x[:, lo, :] * (1.0 - frac) + x[:, hi, :] * frac


def gather_last_step(output, lens):
    """Select per-sample the hidden state at index ``lens-1``: (B, T, H), (B,)
    -> (B, H).  ``lens=None`` means "the final step" (static slice).

    Expressed as a one-hot contraction, not ``take_along_axis``: the gather's
    transpose is a scatter-add, which XLA serializes on TPU (it cost ~4 ms
    per planning step in the embedder backward); a one-hot matmul keeps both
    directions on the MXU."""
    if lens is None:
        return output[:, -1, :]
    lens = jnp.asarray(lens)
    # clamp into range: out-of-range lens must select a real step (the old
    # gather's wrapping picked SOME step; all-zero one-hot rows would
    # silently return zero embeddings)
    idx = jnp.clip(lens - 1, 0, output.shape[1] - 1).astype(jnp.int32)
    onehot = jax.nn.one_hot(idx, output.shape[1], dtype=output.dtype)  # (B,T)
    return jnp.einsum("bth,bt->bh", output, onehot)
