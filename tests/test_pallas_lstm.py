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

# captured before the autouse fixture monkeypatches it per-test
_REAL_VMEM_PLAN = PL._vmem_plan


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(PL, "INTERPRET", True)
    # force multi-chunk grids + padding even at tiny sizes
    monkeypatch.setattr(PL, "_vmem_plan",
                        lambda seq, batch, hidden, words: (min(4, seq),
                                                           None))


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


@pytest.mark.slow
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


def test_vmem_plan_residency_model():
    """_vmem_plan sizes chunks from the actual scoped-VMEM residency:
    validated on the real chip across (B,H) in {(1,720),(8,720),(25,720),
    (9,180),(1,1440),(4,1440)} (tools/pallas_on_device.py r03); this pins
    the model's shape so a regression to per-shape special cases shows."""
    plan = _REAL_VMEM_PLAN
    # planning shape: full streaming chunk, default scoped budget
    c, lim = plan(402, 1, 720, PL.FWD_WORDS)
    assert c == 128 and lim is None
    # the historically-OOMing shape gets a small chunk, still default limit
    c, lim = plan(402, 25, 720, PL.FWD_WORDS)
    assert 1 <= c <= 5 and lim is None
    # backward streams more words per step -> smaller chunk than forward
    assert (plan(402, 8, 720, PL.BWD_WORDS)[0]
            < plan(402, 8, 720, PL.FWD_WORDS)[0])
    # small hidden is NOT throttled by a batch>8 special case
    assert plan(402, 9, 180, PL.FWD_WORDS)[0] == 128
    # W_hh beyond the default scoped budget -> raised vmem_limit_bytes
    c, lim = plan(402, 1, 1440, PL.FWD_WORDS)
    assert c >= 4 and lim is not None and lim > PL._DEFAULT_SCOPED
    assert lim <= PL._MAX_SCOPED
    # absurd residency -> infeasible, callers fall back to the scan path
    assert _REAL_VMEM_PLAN(402, 64, 4096, PL.BWD_WORDS)[0] is None
    # the stricter backward streaming still fits the historic OOM shape
    assert _REAL_VMEM_PLAN(402, 25, 720, PL.BWD_WORDS)[0] >= 1
