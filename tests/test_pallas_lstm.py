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


# ---------------------------------------------------------------------------
# fused 2-layer stack (r5: one pallas_call per direction for the embedder)
# ---------------------------------------------------------------------------

@pytest.fixture
def interpret_stack2(monkeypatch):
    monkeypatch.setattr(PL, "INTERPRET", True)
    monkeypatch.setattr(PL, "_vmem_plan2",
                        lambda seq, batch, hidden, words: (min(4, seq),
                                                           None))


def _stack_params(hidden=8, inp=5):
    p1 = LS.lstm_layer_params(jax.random.PRNGKey(10), inp, hidden,
                              jnp.float32)
    p2 = LS.lstm_layer_params(jax.random.PRNGKey(11), hidden, hidden,
                              jnp.float32)
    return p1, p2


def _scan_stack_ref(p1, p2, x):
    """Pure lax.scan 2-layer stack (pallas forced off via monkeypatch in
    the callers)."""
    out1, s1 = LS.lstm_layer(p1, x)
    out2, s2 = LS.lstm_layer(p2, out1)
    return out2, [s1, s2]


@pytest.mark.parametrize("batch,seq", [(1, 4), (2, 6), (1, 9)])
def test_stack2_forward_parity(interpret_stack2, monkeypatch, batch, seq):
    p1, p2 = _stack_params()
    x = jax.random.normal(jax.random.PRNGKey(12), (batch, seq, 5),
                          jnp.float32) * 0.4
    # reference: scan path (pallas off)
    monkeypatch.setattr(LS, "_PALLAS", False)
    y_ref, states_ref = _scan_stack_ref(p1, p2, x)
    y_pal, states_pal = PL.lstm_stack2_pallas(p1, p2, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pal),
                               atol=1e-5)
    for (h_r, c_r), (h_p, c_p) in zip(states_ref, states_pal):
        np.testing.assert_allclose(np.asarray(h_r), np.asarray(h_p),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_r), np.asarray(c_p),
                                   atol=1e-5)


def test_stack2_gradient_parity(interpret_stack2, monkeypatch):
    """Grads wrt both layers' params and the input match the scan stack
    when the loss consumes the top layer's output sequence (the only
    cotangent path the fused kernel propagates — and the only one any
    model in the framework uses)."""
    p1, p2 = _stack_params()
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 7, 5),
                          jnp.float32) * 0.4

    def loss_pal(p1, p2, xx):
        return jnp.sum(jnp.sin(PL.lstm_stack2_pallas(p1, p2, xx)[0]))

    def loss_ref(p1, p2, xx):
        return jnp.sum(jnp.sin(_scan_stack_ref(p1, p2, xx)[0]))

    monkeypatch.setattr(LS, "_PALLAS", False)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(p1, p2, x)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(p1, p2, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_stack2_lstm_dispatch(interpret_stack2, monkeypatch):
    """ops.lstm.lstm() routes an eligible 2-layer stack through the fused
    kernel (pallas enabled) and produces the scan stack's values."""
    p1, p2 = _stack_params()
    x = jax.random.normal(jax.random.PRNGKey(14), (1, 6, 5),
                          jnp.float32) * 0.4
    monkeypatch.setattr(LS, "_PALLAS", False)
    y_ref, (hn_ref, cn_ref) = LS.lstm([p1, p2], x)

    called = {}
    real = PL.lstm_stack2_pallas

    def spy(a, b, xx):
        called["hit"] = True
        return real(a, b, xx)

    monkeypatch.setattr(LS, "_PALLAS", True)
    monkeypatch.setattr(PL, "lstm_stack2_pallas", spy)
    y_fused, (hn_f, cn_f) = LS.lstm([p1, p2], x)
    assert called.get("hit")
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fused),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn_ref), np.asarray(hn_f),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn_ref), np.asarray(cn_f),
                               atol=1e-5)


def test_stack2_vmem_plan():
    """The stack-2 planner fits the planning shapes (B=1 and B<=32 at
    H=720) and refuses absurd residency."""
    assert PL._vmem_plan2(201, 1, 720, PL.FWD2_WORDS)[0] >= 16
    assert PL._vmem_plan2(201, 1, 720, PL.BWD2_WORDS)[0] >= 8
    assert PL._vmem_plan2(201, 32, 720, PL.BWD2_WORDS)[0] >= 1
    assert PL._vmem_plan2(201, 64, 4096, PL.BWD2_WORDS)[0] is None


def test_stack_deep_pairwise_fusion(interpret_stack2, monkeypatch):
    """A 4-layer equal-H stack fuses as two stack-2 kernels and matches
    the scan stack; a 3-layer stack fuses its first pair."""
    hidden = 8
    ps = [LS.lstm_layer_params(jax.random.PRNGKey(20 + i),
                               5 if i == 0 else hidden, hidden,
                               jnp.float32)
          for i in range(4)]
    x = jax.random.normal(jax.random.PRNGKey(25), (2, 6, 5),
                          jnp.float32) * 0.4

    monkeypatch.setattr(LS, "_PALLAS", False)
    y_ref, (hn_ref, _) = LS.lstm(ps, x)
    y3_ref, (hn3_ref, _) = LS.lstm(ps[:3], x)

    calls = []
    real = PL.lstm_stack2_pallas
    monkeypatch.setattr(PL, "lstm_stack2_pallas",
                        lambda a, b, xx: calls.append(1) or real(a, b, xx))
    monkeypatch.setattr(LS, "_PALLAS", True)
    y_fused, (hn_f, _) = LS.lstm(ps, x)
    assert len(calls) == 2
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fused),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn_ref), np.asarray(hn_f),
                               atol=1e-5)

    calls.clear()
    y3_fused, (hn3_f, _) = LS.lstm(ps[:3], x)
    assert len(calls) == 1  # pair + single tail layer
    np.testing.assert_allclose(np.asarray(y3_ref), np.asarray(y3_fused),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn3_ref), np.asarray(hn3_f),
                               atol=1e-5)
