"""Fused multi-layer LSTM as a `lax.scan`, designed for the TPU MXU.

Design notes (TPU-first, not a torch translation):

* The input projection ``x @ W_ih`` for *all* time steps is computed as one
  large ``(B*T, in) @ (in, 4H)`` matmul before the scan — only the recurrent
  ``h @ W_hh`` matmul stays inside the sequential loop.  This moves ~50% of
  the FLOPs out of the serial dependency chain and onto big MXU-friendly
  matmuls.
* Gate order is (i, f, g, o) — the torch layout — so converted reference
  checkpoints load without permutation (reference models use
  ``torch.nn.LSTM``, /root/reference/paule/models.py:345 etc.).
* Weight layout: ``w_ih (in, 4H)``, ``w_hh (H, 4H)``, ``b (4H,)`` (sum of
  torch's ``b_ih + b_hh``).  The 4H gate axis is the natural tensor-parallel
  sharding axis.
"""

import os

import jax
import jax.numpy as jnp


def _use_pallas():
    """Static (import-time) choice of the fused Pallas kernel.

    'auto' (default): on for the TPU backend in float32 mode; the f64 CPU
    parity mode and CPU tests use the `lax.scan` path.  Override with
    PAULE_TPU_PALLAS=0/1."""
    flag = os.environ.get("PAULE_TPU_PALLAS", "auto")
    if flag == "0":
        return False
    if flag in ("1", "interpret"):
        # "interpret" also sets pallas_lstm.INTERPRET so the kernels run in
        # the Pallas interpreter (CPU-testable)
        return True
    try:
        if jax.config.jax_enable_x64:
            return False
        # the kernels use TPU block specs; 'axon' is the tunneled TPU plugin
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


_PALLAS = None


def pallas_enabled():
    global _PALLAS
    if _PALLAS is None:
        _PALLAS = _use_pallas()
    return _PALLAS


def lstm_layer_params(rng, input_size, hidden_size, dtype=jnp.float32):
    """Initialize one LSTM layer (uniform(-1/sqrt(H), 1/sqrt(H)), like torch)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    bound = 1.0 / jnp.sqrt(hidden_size)
    return {
        "w_ih": jax.random.uniform(
            k1, (input_size, 4 * hidden_size), dtype, -bound, bound),
        "w_hh": jax.random.uniform(
            k2, (hidden_size, 4 * hidden_size), dtype, -bound, bound),
        "b": jax.random.uniform(
            k3, (4 * hidden_size,), dtype, -2 * bound, 2 * bound),
    }


def lstm_layer(params, x, h0=None, c0=None):
    """One LSTM layer over (B, T, in) -> (output (B, T, H), (h_T, c_T))."""
    if pallas_enabled():
        from .pallas_lstm import feasible, lstm_layer_pallas
        if feasible(x.shape[1], x.shape[0], params["w_hh"].shape[0]):
            return lstm_layer_pallas(params, x, h0, c0)
        # shape too large for the fused kernels' scoped VMEM: scan path
    w_ih, w_hh, b = params["w_ih"], params["w_hh"], params["b"]
    batch, _seq, _ = x.shape
    hidden = w_hh.shape[0]

    if h0 is None:
        h0 = jnp.zeros((batch, hidden), dtype=x.dtype)
    if c0 is None:
        c0 = jnp.zeros((batch, hidden), dtype=x.dtype)

    # all-timestep input projection in one MXU matmul
    gates_x = x @ w_ih + b  # (B, T, 4H)
    gates_x = jnp.swapaxes(gates_x, 0, 1)  # (T, B, 4H) time-major for scan

    def step(carry, gx):
        h, c = carry
        gates = gx + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (h_n, c_n), hs = jax.lax.scan(step, (h0, c0), gates_x)
    return jnp.swapaxes(hs, 0, 1), (h_n, c_n)


def lstm(layers, x, *, dropout=0.0, deterministic=True, rng=None):
    """Stacked LSTM.  ``layers`` is a list/tuple of per-layer param dicts.

    ``dropout`` applies between layers (not after the last one), matching
    torch's ``nn.LSTM(dropout=...)`` semantics; it requires ``rng`` when
    ``deterministic=False``.
    """
    n = len(layers)
    dropout_active = dropout > 0.0 and not deterministic

    def _fusable_pair(li):
        # adjacent layers run as ONE fused kernel per direction (removes
        # two pallas launches + the inter-layer HBM round-trip per
        # step-chain; see pallas_lstm.lstm_stack2_pallas) when the shapes
        # allow it: equal hidden sizes, upper layer's input == hidden
        from .pallas_lstm import feasible2
        h1 = layers[li]["w_hh"].shape[0]
        return (layers[li + 1]["w_hh"].shape[0] == h1
                and layers[li + 1]["w_ih"].shape[0] == h1
                and feasible2(x.shape[1], x.shape[0], h1))

    h_ns, c_ns = [], []
    out = x
    li = 0
    while li < n:
        if (li + 1 < n and not dropout_active and pallas_enabled()
                and _fusable_pair(li)):
            from .pallas_lstm import lstm_stack2_pallas
            out, states = lstm_stack2_pallas(layers[li], layers[li + 1],
                                             out)
            for h_n, c_n in states:
                h_ns.append(h_n)
                c_ns.append(c_n)
            li += 2
            continue
        params = layers[li]
        out, (h_n, c_n) = lstm_layer(params, out)
        if dropout > 0.0 and not deterministic and li < n - 1:
            if rng is None:
                raise ValueError("dropout requires an rng key")
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout), 0.0)
        h_ns.append(h_n)
        c_ns.append(c_n)
        li += 1
    return out, (jnp.stack(h_ns), jnp.stack(c_ns))
