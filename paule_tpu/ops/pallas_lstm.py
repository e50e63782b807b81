"""Fused LSTM scan as a Pallas TPU kernel.

The hot op of the whole framework is a stacked LSTM over a few hundred time
steps (planning forward/backward, continue-learning training, embedder —
reference models are all ``torch.nn.LSTM``, /root/reference/paule/models.py).
XLA compiles the `lax.scan` version to a loop with per-step overhead
(dynamic-update-slice of outputs, loop bookkeeping); this kernel fuses the
whole recurrence:

* the input projection ``x @ W_ih + b`` for all steps stays OUTSIDE the
  kernel as one large MXU matmul (it has no sequential dependency);
* the kernel streams the projected gates time-chunk by time-chunk from HBM
  through VMEM (Pallas double-buffers the grid blocks automatically), keeps
  ``W_hh`` and the (h, c) carry resident in VMEM, and runs the recurrence
  ``gates_t += h @ W_hh; c = f*c + i*g; h = o*tanh(c)`` on MXU+VPU;
* the backward pass recomputes the gate activations with ONE big XLA matmul
  (``gates_x + h_prev @ W_hh``), then a reverse-time Pallas kernel carries
  (dh, dc) and emits per-step ``dgates``; the weight gradients reduce to two
  large XLA matmuls outside the kernel
  (``dW_hh = h_prevᵀ @ dgates``, and ``dW_ih/dx/db`` flow through the input
  projection automatically via autodiff).

Numerical note: grads with respect to the final cell state ``c_T`` are not
propagated (no model in this framework consumes ``c_T``); grads w.r.t. the
hidden outputs ``hs`` (including ``h_T = hs[-1]``) are exact.

float32 only (TPU path); the f64 CPU parity mode uses the `lax.scan`
implementation in :mod:`paule_tpu.ops.lstm`.
"""

import functools

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: run the kernels in the Pallas interpreter (CPU-testable); flipped by
#: tests or PAULE_TPU_PALLAS=interpret
INTERPRET = os.environ.get("PAULE_TPU_PALLAS", "") == "interpret"


#: Mosaic's default scoped-VMEM budget; chunk-7 at B=25/H=720 overflowed it
#: by ~1 MiB (compile-time stack OOM), which calibrates ``_TEMP_GATE_ROWS``
#: + ``_SLACK`` below.
_DEFAULT_SCOPED = 16 * 1024 * 1024
#: ceiling when the residency alone needs a raised ``vmem_limit_bytes``
#: (v5e has 128 MiB of VMEM; leave headroom for XLA's own buffers)
_MAX_SCOPED = 96 * 1024 * 1024
#: loop-body staging measured in gate-row (B x 4H f32) units: the B=25
#: failure implies ~11.7 MB of fixed residency beyond the streamed blocks —
#: W_hh (8.3 MB) + carries + about eight gate-row temporaries
_TEMP_GATE_ROWS = 8
_SLACK = 2 * 1024 * 1024

#: f32 words streamed per (batch row, hidden lane, time step):
#: fwd = gates in (4H) + hs/cs out (2H); bwd = acts in (4H) + cs_prev/ghs
#: in (2H) + dgates out (4H)
FWD_WORDS = 6
BWD_WORDS = 10


def _vmem_plan(seq_len, batch, hidden, streamed_words):
    """(time-chunk, vmem_limit_bytes | None) from the kernel's actual
    scoped-VMEM residency, instead of a per-shape special case:

    * resident: W_hh (H x 4H f32) + h0/c0 blocks + (h, c) scratch;
    * temporaries: ~``_TEMP_GATE_ROWS`` gate-row-sized loop-body arrays
      (scales with batch AND hidden — the old ``batch > 8`` halving missed
      the hidden scaling and over-throttled small-hidden batches);
    * streaming: ``chunk * streamed_words * B * H`` f32, double-buffered.

    Returns ``(None, None)`` when even a 1-step chunk cannot fit under
    ``_MAX_SCOPED`` — the caller falls back to the `lax.scan` path."""
    f32 = 4
    resident = 4 * hidden * hidden * f32 + 6 * batch * hidden * f32
    temps = _TEMP_GATE_ROWS * batch * 4 * hidden * f32
    fixed = resident + temps + _SLACK
    per_step = streamed_words * batch * hidden * f32
    limit = None  # Mosaic default
    if fixed + 2 * per_step > _DEFAULT_SCOPED:
        # large hidden/batch: raise the scoped budget to fit the residency
        # plus a useful amount of streaming (>= 4 double-buffered steps)
        limit = min(_MAX_SCOPED,
                    -(-(fixed + 8 * per_step) // (1 << 20)) << 20)
        if fixed + 2 * per_step > limit:
            return None, None
    chunk = max(1, ((limit or _DEFAULT_SCOPED) - fixed) // (2 * per_step))
    return int(min(chunk, seq_len, 128)), limit


def feasible(seq_len, batch, hidden):
    """True when the fused kernels (incl. the wider-streaming backward)
    fit scoped VMEM for this shape; callers use the scan path otherwise."""
    return _vmem_plan(seq_len, batch, hidden, BWD_WORDS)[0] is not None


def _compiler_params(limit):
    if limit is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(limit))


def _fwd_kernel(gates_ref, whh_ref, h0_ref, c0_ref, hs_ref, cs_ref,
                h_scr, c_scr, *, hidden):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    chunk = gates_ref.shape[0]

    def body(i, _):
        h = h_scr[:]
        c = c_scr[:]
        g = gates_ref[i] + jnp.dot(h, whh_ref[:],
                                   preferred_element_type=jnp.float32)
        gi = jax.nn.sigmoid(g[:, :hidden])
        gf = jax.nn.sigmoid(g[:, hidden:2 * hidden])
        gg = jnp.tanh(g[:, 2 * hidden:3 * hidden])
        go = jax.nn.sigmoid(g[:, 3 * hidden:])
        c = gf * c + gi * gg
        h = go * jnp.tanh(c)
        hs_ref[i] = h
        cs_ref[i] = c
        h_scr[:] = h
        c_scr[:] = c
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def _bwd_kernel(acts_ref, cs_prev_ref, ghs_ref, whh_ref,
                dgates_ref, dh0_ref, dc0_ref, dh_scr, dc_scr, *, hidden):
    """Reverse-time chunk: carries (dh_rec, dc); emits dgates per step.

    ``acts`` holds the already-activated gates (i, f, g, o) concatenated on
    the last axis; padded tail steps have zero ghs and therefore produce
    zero dgates (zeros propagate through the carries untouched).
    """
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    chunk = acts_ref.shape[0]

    def body(j, _):
        i = chunk - 1 - j  # reverse order inside the chunk
        a = acts_ref[i]
        gi = a[:, :hidden]
        gf = a[:, hidden:2 * hidden]
        gg = a[:, 2 * hidden:3 * hidden]
        go = a[:, 3 * hidden:]
        c_prev = cs_prev_ref[i]
        c_t = gf * c_prev + gi * gg
        tc = jnp.tanh(c_t)

        dh = ghs_ref[i] + dh_scr[:]
        do = dh * tc
        dc = dc_scr[:] + dh * go * (1.0 - tc * tc)
        di = dc * gg
        df = dc * c_prev
        dg = dc * gi

        dgates = jnp.concatenate(
            [di * gi * (1.0 - gi),
             df * gf * (1.0 - gf),
             dg * (1.0 - gg * gg),
             do * go * (1.0 - go)], axis=-1)
        dgates_ref[i] = dgates

        # recurrent grad into step t-1
        dh_scr[:] = jax.lax.dot_general(
            dgates, whh_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dc_scr[:] = dc * gf
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)

    @pl.when(k == pl.num_programs(0) - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


def _pad_time(x, chunk):
    t = x.shape[0]
    pad = (-t) % chunk
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, t + pad


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lstm_core(gates_x, w_hh, h0, c0):
    """Fused recurrence: time-major ``gates_x (T, B, 4H)`` -> ``(hs, cs)``.

    Gradients flow through ``hs`` exactly; the cotangent of ``cs`` is
    ignored (no model in this framework backpropagates through cell
    states — torch ``nn.LSTM`` callers in the reference use only the
    hidden outputs)."""
    return _lstm_core_fwd_impl(gates_x, w_hh, h0, c0)


def _lstm_core_fwd_impl(gates_x, w_hh, h0, c0):
    seq_len, batch, four_h = gates_x.shape
    hidden = four_h // 4
    chunk, vmem_limit = _vmem_plan(seq_len, batch, hidden, FWD_WORDS)
    if chunk is None:
        raise ValueError(
            f"fused LSTM kernel infeasible at B={batch}, H={hidden} "
            "(scoped-VMEM residency); guard calls with "
            "pallas_lstm.feasible() and use the lax.scan path")
    gates_p, padded = _pad_time(gates_x, chunk)
    grid = padded // chunk

    hs, cs = pl.pallas_call(
        functools.partial(_fwd_kernel, hidden=hidden),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, batch, four_h), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, batch, hidden), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded, batch, hidden), gates_x.dtype),
            jax.ShapeDtypeStruct((padded, batch, hidden), gates_x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        compiler_params=_compiler_params(vmem_limit),
        interpret=INTERPRET,
    )(gates_p, w_hh, h0, c0)
    return hs[:seq_len], cs[:seq_len]


def _lstm_core_fwd(gates_x, w_hh, h0, c0):
    hs, cs = _lstm_core_fwd_impl(gates_x, w_hh, h0, c0)
    return (hs, cs), (gates_x, w_hh, h0, c0, hs, cs)


def _lstm_core_bwd(res, cts):
    ghs, _gcs = cts  # cell-state cotangent ignored (see lstm_core docstring)
    gates_x, w_hh, h0, c0, hs, cs = res
    seq_len, batch, four_h = gates_x.shape
    hidden = four_h // 4

    hs_prev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    cs_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    # recompute pre-activations with one large MXU matmul, activate on VPU
    gates_pre = gates_x + jnp.einsum(
        "tbh,hg->tbg", hs_prev, w_hh, preferred_element_type=jnp.float32)
    acts = jnp.concatenate(
        [jax.nn.sigmoid(gates_pre[..., :hidden]),
         jax.nn.sigmoid(gates_pre[..., hidden:2 * hidden]),
         jnp.tanh(gates_pre[..., 2 * hidden:3 * hidden]),
         jax.nn.sigmoid(gates_pre[..., 3 * hidden:])], axis=-1)

    chunk, vmem_limit = _vmem_plan(seq_len, batch, hidden, BWD_WORDS)
    if chunk is None:  # pragma: no cover — feasible() gates the fwd call
        raise ValueError(
            f"fused LSTM backward infeasible at B={batch}, H={hidden}")
    acts_p, padded = _pad_time(acts, chunk)
    cs_prev_p, _ = _pad_time(cs_prev, chunk)
    ghs_p, _ = _pad_time(ghs, chunk)
    grid = padded // chunk
    rev = grid - 1  # process chunks last -> first

    dgates, dh0, dc0 = pl.pallas_call(
        functools.partial(_bwd_kernel, hidden=hidden),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, batch, four_h), lambda k: (rev - k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), lambda k: (rev - k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), lambda k: (rev - k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, batch, four_h), lambda k: (rev - k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, hidden), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded, batch, four_h), gates_x.dtype),
            jax.ShapeDtypeStruct((batch, hidden), gates_x.dtype),
            jax.ShapeDtypeStruct((batch, hidden), gates_x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        compiler_params=_compiler_params(vmem_limit),
        interpret=INTERPRET,
    )(acts_p, cs_prev_p, ghs_p, w_hh)
    dgates = dgates[:seq_len]

    # weight gradient as one large MXU matmul over the whole sequence
    dw_hh = jnp.einsum("tbh,tbg->hg", hs_prev, dgates,
                       preferred_element_type=jnp.float32)
    return dgates, dw_hh, dh0, dc0


lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


def lstm_layer_pallas(params, x, h0=None, c0=None):
    """One LSTM layer over (B, T, in) via the fused kernel.

    Same contract as :func:`paule_tpu.ops.lstm.lstm_layer`; the final cell
    state ``c_T`` is returned but does not propagate gradients.
    """
    w_ih, w_hh, b = params["w_ih"], params["w_hh"], params["b"]
    batch, _seq, _ = x.shape
    hidden = w_hh.shape[0]
    if h0 is None:
        h0 = jnp.zeros((batch, hidden), dtype=x.dtype)
    if c0 is None:
        c0 = jnp.zeros((batch, hidden), dtype=x.dtype)

    gates_x = x @ w_ih + b                       # (B, T, 4H), one MXU matmul
    gates_x = jnp.swapaxes(gates_x, 0, 1)        # time-major (T, B, 4H)
    hs, cs = lstm_core(gates_x, w_hh, h0, c0)    # (T, B, H) each
    return jnp.swapaxes(hs, 0, 1), (hs[-1], cs[-1])
