"""Pallas fused-LSTM kernel vs the `lax.scan` reference implementation,
run in the Pallas interpreter so the suite needs no TPU.  Shapes are tiny —
the interpreter is slow — but cover chunk padding and multi-chunk grids.
On-device parity at real sizes (B=1, T=402, H=720): fwd max|Δ| ~7e-5,
grad relative error ~1e-3 = the TPU matmul precision noise floor."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paule_tpu.ops import lstm as LS
from paule_tpu.ops import pallas_lstm as PL


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(PL, "INTERPRET", True)
    # force multi-chunk grids + padding even at tiny sizes
    monkeypatch.setattr(PL, "_pick_chunk",
                        lambda seq, batch, hidden, **kw: min(4, seq))


def _params(hidden=8, inp=5, seed=0):
    return LS.lstm_layer_params(jax.random.PRNGKey(seed), inp, hidden,
                                jnp.float32)


@pytest.mark.parametrize("batch,seq", [(1, 4), (2, 6), (1, 9)])
def test_forward_parity(batch, seq):
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, seq, 5),
                          jnp.float32) * 0.4
    y_ref, (hn_r, cn_r) = LS.lstm_layer(p, x)
    y_pal, (hn_p, cn_p) = PL.lstm_layer_pallas(p, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pal),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn_r), np.asarray(hn_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn_r), np.asarray(cn_p), atol=1e-5)


def test_gradient_parity():
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 5),
                          jnp.float32) * 0.4

    def loss_ref(pp, xx):
        return jnp.sum(jnp.sin(LS.lstm_layer(pp, xx)[0]))

    def loss_pal(pp, xx):
        return jnp.sum(jnp.sin(PL.lstm_layer_pallas(pp, xx)[0]))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_initial_state_passthrough():
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 5),
                          jnp.float32) * 0.4
    h0 = jnp.full((1, 8), 0.3, jnp.float32)
    c0 = jnp.full((1, 8), -0.2, jnp.float32)
    y_ref, _ = LS.lstm_layer(p, x, h0, c0)
    y_pal, _ = PL.lstm_layer_pallas(p, x, h0, c0)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pal),
                               atol=1e-5)
