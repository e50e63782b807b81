"""Speech/non-speech classifiers over mel sequences.

* ``LinearClassifier`` — the shipped default: a per-frame linear logit,
  length-masked mean over time (reference
  /root/reference/paule/models.py:887-910).
* ``SpeechNonSpeechTransformer`` — positional encoding + 3 pre-norm-free
  transformer encoder layers + mean pool + MLP head (reference
  /root/reference/paule/models.py:804-884).
"""

import math

import jax
import jax.numpy as jnp

from . import blocks as B


class LinearClassifier:

    def __init__(self, input_dim=60, output_dim=1):
        self.input_dim = input_dim
        self.output_dim = output_dim

    def init(self, rng, dtype=jnp.float32):
        return {"linear": B.linear_init(rng, self.input_dim, self.output_dim, dtype)}

    def apply(self, params, x, *, src_lens=None, **_):
        out = B.linear(params["linear"], x)[..., 0]  # (B, T)
        if src_lens is not None:
            lens = jnp.asarray(src_lens)
            mask = jnp.arange(out.shape[1])[None, :] < lens[:, None]
            out = jnp.where(mask, out, 0.0)
            return out.sum(axis=1) / lens.astype(out.dtype)
        return out.mean(axis=1)

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)


def positional_encoding(d_model, max_len=5000, dtype=jnp.float32):
    position = jnp.arange(max_len)[:, None].astype(dtype)
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2).astype(dtype) * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model), dtype)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


def _mha_init(rng, d_model, dtype):
    k = jax.random.split(rng, 4)
    return {
        "q": B.linear_init(k[0], d_model, d_model, dtype),
        "k": B.linear_init(k[1], d_model, d_model, dtype),
        "v": B.linear_init(k[2], d_model, d_model, dtype),
        "o": B.linear_init(k[3], d_model, d_model, dtype),
    }


def _mha(params, x, nhead, key_padding_mask=None):
    b, t, d = x.shape
    hd = d // nhead
    q = B.linear(params["q"], x).reshape(b, t, nhead, hd).transpose(0, 2, 1, 3)
    k = B.linear(params["k"], x).reshape(b, t, nhead, hd).transpose(0, 2, 1, 3)
    v = B.linear(params["v"], x).reshape(b, t, nhead, hd).transpose(0, 2, 1, 3)
    scores = q @ jnp.swapaxes(k, -1, -2) / math.sqrt(hd)  # (B, H, T, T)
    if key_padding_mask is not None:
        scores = scores + key_padding_mask[:, None, None, :]
    attn = jax.nn.softmax(scores, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, t, d)
    return B.linear(params["o"], out)


def transformer_encoder_layer_init(rng, d_model, dim_feedforward,
                                   dtype=jnp.float32):
    """One pre-built encoder layer: batch-first MHA + GELU FFN + post-norms
    (the reference's CustomTransformerEncoderLayer,
    /root/reference/paule/models.py:824-854)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "attn": _mha_init(k1, d_model, dtype),
        "linear1": B.linear_init(k2, d_model, dim_feedforward, dtype),
        "linear2": B.linear_init(k3, dim_feedforward, d_model, dtype),
        "norm1": B.layernorm_init(d_model, dtype),
        "norm2": B.layernorm_init(d_model, dtype),
    }


def transformer_encoder_layer(params, x, *, nhead, key_padding_mask=None):
    attn = _mha(params["attn"], x, nhead, key_padding_mask=key_padding_mask)
    out = B.layernorm(params["norm1"], x + attn)
    ff = B.linear(params["linear2"],
                  jax.nn.gelu(B.linear(params["linear1"], out)))
    return B.layernorm(params["norm2"], out + ff)


class SpeechNonSpeechTransformer:

    def __init__(self, input_dim=60, num_layers=3, nhead=6, output_dim=1,
                 dim_feedforward=1024, max_len=5000):
        self.input_dim = input_dim
        self.num_layers = num_layers
        self.nhead = nhead
        self.output_dim = output_dim
        self.dim_feedforward = dim_feedforward
        self.max_len = max_len

    def init(self, rng, dtype=jnp.float32):
        keys = iter(jax.random.split(rng, self.num_layers + 2))
        layers = [
            transformer_encoder_layer_init(
                next(keys), self.input_dim, self.dim_feedforward, dtype)
            for _ in range(self.num_layers)
        ]
        head = {
            "linear1": B.linear_init(next(keys), self.input_dim, 20, dtype),
            "linear2": B.linear_init(next(keys), 20, self.output_dim, dtype),
        }
        return {"layers": layers, "head": head,
                "pe": positional_encoding(self.input_dim, self.max_len, dtype)}

    def apply(self, params, x, *, src_lens=None, **_):
        b, t, _ = x.shape
        mask = None
        if src_lens is not None:
            lens = jnp.asarray(src_lens)
            mask = jnp.where(
                jnp.arange(t)[None, :] < lens[:, None], 0.0, -jnp.inf
            ).astype(x.dtype)
        out = x + params["pe"][None, :t, :]
        for lp in params["layers"]:
            out = transformer_encoder_layer(lp, out, nhead=self.nhead,
                                            key_padding_mask=mask)
        out = out.mean(axis=1)
        out = B.linear(params["head"]["linear1"], out)
        out = jax.nn.gelu(out)
        out = B.linear(params["head"]["linear2"], out)
        return out[..., 0]

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)
