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

# ---------------------------------------------------------------------------
# Fused 2-layer stack: both embedder layers in ONE pallas_call per direction.
#
# Motivation (r5 roofline work): the B=1 planning inner step measured 2.86 ms
# against a 1.95 ms recurrence floor; the gap is per-launch fixed cost and
# XLA glue BETWEEN the six kernel launches (pred fwd/bwd + 2 embedder layers
# x fwd/bwd), not in-loop cost (tools/launch_overhead_probe.py).  Fusing the
# embedder's two H=720 layers into one kernel per direction removes two
# launches, the hs1 HBM round-trip between the layers, and layer 2's
# separate input-projection matmul; the in-kernel critical path stays two
# matvec latencies per step (layer 2's combined [h1_new, h2_prev] gate
# matmul issues as ONE dot against the pre-concatenated (2H, 4H) weight).
# ---------------------------------------------------------------------------

#: stack-2 streamed f32 words per (batch row, hidden lane, time step):
#: fwd = gates1 in (4H) + hs1/cs1/hs2/cs2 out (4H);
#: bwd = acts1+acts2 in (8H) + cs1_prev/cs2_prev/ghs2 in (3H) +
#:       dgates1+dgates2 out (8H)
FWD2_WORDS = 8
BWD2_WORDS = 19


def _vmem_plan2(seq_len, batch, hidden, streamed_words):
    """Like :func:`_vmem_plan` but for the stack-2 kernels, whose resident
    set is three H x 4H weight blocks (w_hh1 + the concatenated layer-2
    [w_ih2; w_hh2]) and twice the carry/temporary footprint."""
    f32 = 4
    resident = 12 * hidden * hidden * f32 + 12 * batch * hidden * f32
    temps = 2 * _TEMP_GATE_ROWS * batch * 4 * hidden * f32
    fixed = resident + temps + _SLACK
    per_step = streamed_words * batch * hidden * f32
    limit = None
    if fixed + 2 * per_step > _DEFAULT_SCOPED:
        limit = min(_MAX_SCOPED,
                    -(-(fixed + 8 * per_step) // (1 << 20)) << 20)
        if fixed + 2 * per_step > limit:
            return None, None
    chunk = max(1, ((limit or _DEFAULT_SCOPED) - fixed) // (2 * per_step))
    return int(min(chunk, seq_len, 128)), limit


def feasible2(seq_len, batch, hidden):
    """True when the fused 2-layer-stack kernels fit scoped VMEM."""
    return _vmem_plan2(seq_len, batch, hidden, BWD2_WORDS)[0] is not None


def _fwd2_kernel(gates1_ref, whh1_ref, w2_ref, b2_ref,
                 h01_ref, c01_ref, h02_ref, c02_ref,
                 hs1_ref, cs1_ref, hs2_ref, cs2_ref,
                 h1_scr, c1_scr, h2_scr, c2_scr, *, hidden):
    """One chunk of the fused 2-layer recurrence.

    ``w2_ref`` is the layer-2 weight pair concatenated on the input axis,
    ``[w_ih2; w_hh2] (2H, 4H)``, so layer 2's whole gate pre-activation is
    one dot of ``[h1_new, h2_prev] (B, 2H)`` against it.
    """
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        h1_scr[:] = h01_ref[:]
        c1_scr[:] = c01_ref[:]
        h2_scr[:] = h02_ref[:]
        c2_scr[:] = c02_ref[:]

    chunk = gates1_ref.shape[0]

    def body(i, _):
        h1 = h1_scr[:]
        c1 = c1_scr[:]
        g1 = gates1_ref[i] + jnp.dot(h1, whh1_ref[:],
                                     preferred_element_type=jnp.float32)
        gi = jax.nn.sigmoid(g1[:, :hidden])
        gf = jax.nn.sigmoid(g1[:, hidden:2 * hidden])
        gg = jnp.tanh(g1[:, 2 * hidden:3 * hidden])
        go = jax.nn.sigmoid(g1[:, 3 * hidden:])
        c1 = gf * c1 + gi * gg
        h1 = go * jnp.tanh(c1)
        hs1_ref[i] = h1
        cs1_ref[i] = c1
        h1_scr[:] = h1
        c1_scr[:] = c1

        h2 = h2_scr[:]
        c2 = c2_scr[:]
        cat = jnp.concatenate([h1, h2], axis=-1)  # (B, 2H)
        g2 = b2_ref[:] + jnp.dot(cat, w2_ref[:],
                                 preferred_element_type=jnp.float32)
        qi = jax.nn.sigmoid(g2[:, :hidden])
        qf = jax.nn.sigmoid(g2[:, hidden:2 * hidden])
        qg = jnp.tanh(g2[:, 2 * hidden:3 * hidden])
        qo = jax.nn.sigmoid(g2[:, 3 * hidden:])
        c2 = qf * c2 + qi * qg
        h2 = qo * jnp.tanh(c2)
        hs2_ref[i] = h2
        cs2_ref[i] = c2
        h2_scr[:] = h2
        c2_scr[:] = c2
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def _bwd2_kernel(acts1_ref, acts2_ref, cs1_prev_ref, cs2_prev_ref, ghs2_ref,
                 whh1_ref, w2_ref,
                 dgates1_ref, dgates2_ref,
                 dh1_scr, dc1_scr, dh2_scr, dc2_scr, *, hidden):
    """Reverse-time fused chunk: layer-2 backward feeds layer-1's per-step
    hidden cotangent in the SAME iteration (``dh1_t = dgates2 @ w_ih2^T``,
    taken from the combined dot against ``w2``), so the whole stack runs as
    one reverse recurrence.  Only ``hs2`` carries an incoming cotangent
    (the embedder consumes just the top layer; padded tail steps have zero
    ghs2 and stay zero through the carries)."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        dh1_scr[:] = jnp.zeros_like(dh1_scr)
        dc1_scr[:] = jnp.zeros_like(dc1_scr)
        dh2_scr[:] = jnp.zeros_like(dh2_scr)
        dc2_scr[:] = jnp.zeros_like(dc2_scr)

    chunk = acts1_ref.shape[0]

    def body(j, _):
        i = chunk - 1 - j

        # ---- layer 2 step backward ----
        a2 = acts2_ref[i]
        qi = a2[:, :hidden]
        qf = a2[:, hidden:2 * hidden]
        qg = a2[:, 2 * hidden:3 * hidden]
        qo = a2[:, 3 * hidden:]
        c2_prev = cs2_prev_ref[i]
        c2_t = qf * c2_prev + qi * qg
        tc2 = jnp.tanh(c2_t)

        dh2 = ghs2_ref[i] + dh2_scr[:]
        do2 = dh2 * tc2
        dc2 = dc2_scr[:] + dh2 * qo * (1.0 - tc2 * tc2)
        dgates2 = jnp.concatenate(
            [dc2 * qg * qi * (1.0 - qi),
             dc2 * c2_prev * qf * (1.0 - qf),
             dc2 * qi * (1.0 - qg * qg),
             do2 * qo * (1.0 - qo)], axis=-1)
        dgates2_ref[i] = dgates2
        # one dot against the concatenated (2H, 4H) weight gives BOTH the
        # hidden cotangent into layer 1 at this step and layer 2's own
        # recurrent carry: (B, 4H) . (2H, 4H)^T -> (B, 2H)
        dcat = jax.lax.dot_general(
            dgates2, w2_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh1_from2 = dcat[:, :hidden]
        dh2_scr[:] = dcat[:, hidden:]
        dc2_scr[:] = dc2 * qf

        # ---- layer 1 step backward ----
        a1 = acts1_ref[i]
        gi = a1[:, :hidden]
        gf = a1[:, hidden:2 * hidden]
        gg = a1[:, 2 * hidden:3 * hidden]
        go = a1[:, 3 * hidden:]
        c1_prev = cs1_prev_ref[i]
        c1_t = gf * c1_prev + gi * gg
        tc1 = jnp.tanh(c1_t)

        dh1 = dh1_from2 + dh1_scr[:]
        do1 = dh1 * tc1
        dc1 = dc1_scr[:] + dh1 * go * (1.0 - tc1 * tc1)
        dgates1 = jnp.concatenate(
            [dc1 * gg * gi * (1.0 - gi),
             dc1 * c1_prev * gf * (1.0 - gf),
             dc1 * gi * (1.0 - gg * gg),
             do1 * go * (1.0 - go)], axis=-1)
        dgates1_ref[i] = dgates1
        dh1_scr[:] = jax.lax.dot_general(
            dgates1, whh1_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dc1_scr[:] = dc1 * gf
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lstm_stack2_core(gates1, w_hh1, w2, b2, h01, c01, h02, c02):
    """Fused 2-layer recurrence: ``gates1 (T, B, 4H)`` (layer 1's projected
    inputs) -> ``(hs1, cs1, hs2, cs2)``.

    ``w2 = concatenate([w_ih2, w_hh2], axis=0) (2H, 4H)``.  Gradients flow
    EXACTLY through ``hs2`` (all steps, hence also ``hs2[-1]``); cotangents
    of ``hs1``, the cell states, and the initial carries are ignored — no
    model in this framework consumes them differentiably (the embedder
    reads only the top layer's hiddens; torch callers in the reference
    likewise use only the output sequence)."""
    return _stack2_fwd_impl(gates1, w_hh1, w2, b2, h01, c01, h02, c02)


def _stack2_fwd_impl(gates1, w_hh1, w2, b2, h01, c01, h02, c02):
    seq_len, batch, four_h = gates1.shape
    hidden = four_h // 4
    chunk, vmem_limit = _vmem_plan2(seq_len, batch, hidden, FWD2_WORDS)
    if chunk is None:
        raise ValueError(
            f"fused stack-2 LSTM kernel infeasible at B={batch}, H={hidden}"
            " (scoped-VMEM residency); guard calls with feasible2()")
    gates_p, padded = _pad_time(gates1, chunk)
    grid = padded // chunk
    b2r = b2.reshape(1, four_h)

    carry_spec = pl.BlockSpec((batch, hidden), lambda k: (0, 0),
                              memory_space=pltpu.VMEM)
    seq_spec = pl.BlockSpec((chunk, batch, hidden), lambda k: (k, 0, 0),
                            memory_space=pltpu.VMEM)
    hs1, cs1, hs2, cs2 = pl.pallas_call(
        functools.partial(_fwd2_kernel, hidden=hidden),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, batch, four_h), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hidden, four_h), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, four_h), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            carry_spec, carry_spec, carry_spec, carry_spec,
        ],
        out_specs=[seq_spec, seq_spec, seq_spec, seq_spec],
        out_shape=[jax.ShapeDtypeStruct((padded, batch, hidden),
                                        gates1.dtype)] * 4,
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)] * 4,
        compiler_params=_compiler_params(vmem_limit),
        interpret=INTERPRET,
    )(gates_p, w_hh1, w2, b2r, h01, c01, h02, c02)
    return (hs1[:seq_len], cs1[:seq_len], hs2[:seq_len], cs2[:seq_len])


def _stack2_fwd(gates1, w_hh1, w2, b2, h01, c01, h02, c02):
    out = _stack2_fwd_impl(gates1, w_hh1, w2, b2, h01, c01, h02, c02)
    hs1, cs1, hs2, cs2 = out
    return out, (gates1, w_hh1, w2, b2, hs1, cs1, hs2, cs2,
                 h01, c01, h02, c02)


def _stack2_bwd(res, cts):
    _ghs1, _gcs1, ghs2, _gcs2 = cts  # only the top hiddens carry grads
    (gates1, w_hh1, w2, b2, hs1, cs1, hs2, cs2,
     h01, c01, h02, c02) = res
    seq_len, batch, four_h = gates1.shape
    hidden = four_h // 4

    hs1_prev = jnp.concatenate([h01[None], hs1[:-1]], axis=0)
    cs1_prev = jnp.concatenate([c01[None], cs1[:-1]], axis=0)
    hs2_prev = jnp.concatenate([h02[None], hs2[:-1]], axis=0)
    cs2_prev = jnp.concatenate([c02[None], cs2[:-1]], axis=0)

    # recompute both layers' gate activations with two large MXU matmuls
    g1_pre = gates1 + jnp.einsum("tbh,hg->tbg", hs1_prev, w_hh1,
                                 preferred_element_type=jnp.float32)
    cat2 = jnp.concatenate([hs1, hs2_prev], axis=-1)      # (T, B, 2H)
    g2_pre = b2 + jnp.einsum("tbh,hg->tbg", cat2, w2,
                             preferred_element_type=jnp.float32)

    def acts(g):
        return jnp.concatenate(
            [jax.nn.sigmoid(g[..., :hidden]),
             jax.nn.sigmoid(g[..., hidden:2 * hidden]),
             jnp.tanh(g[..., 2 * hidden:3 * hidden]),
             jax.nn.sigmoid(g[..., 3 * hidden:])], axis=-1)

    acts1, acts2 = acts(g1_pre), acts(g2_pre)

    chunk, vmem_limit = _vmem_plan2(seq_len, batch, hidden, BWD2_WORDS)
    if chunk is None:  # pragma: no cover — feasible2() gates the fwd call
        raise ValueError(
            f"fused stack-2 backward infeasible at B={batch}, H={hidden}")
    acts1_p, padded = _pad_time(acts1, chunk)
    acts2_p, _ = _pad_time(acts2, chunk)
    cs1_prev_p, _ = _pad_time(cs1_prev, chunk)
    cs2_prev_p, _ = _pad_time(cs2_prev, chunk)
    ghs2_p, _ = _pad_time(ghs2, chunk)
    grid = padded // chunk
    rev = grid - 1

    gates_spec = pl.BlockSpec((chunk, batch, four_h),
                              lambda k: (rev - k, 0, 0),
                              memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((chunk, batch, hidden), lambda k: (rev - k, 0, 0),
                          memory_space=pltpu.VMEM)
    dgates1, dgates2 = pl.pallas_call(
        functools.partial(_bwd2_kernel, hidden=hidden),
        grid=(grid,),
        in_specs=[
            gates_spec, gates_spec, h_spec, h_spec, h_spec,
            pl.BlockSpec((hidden, four_h), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hidden, four_h), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[gates_spec, gates_spec],
        out_shape=[jax.ShapeDtypeStruct((padded, batch, four_h),
                                        gates1.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)] * 4,
        compiler_params=_compiler_params(vmem_limit),
        interpret=INTERPRET,
    )(acts1_p, acts2_p, cs1_prev_p, cs2_prev_p, ghs2_p, w_hh1, w2)
    dgates1 = dgates1[:seq_len]
    dgates2 = dgates2[:seq_len]

    # weight gradients as large MXU matmuls over the whole sequence
    dw_hh1 = jnp.einsum("tbh,tbg->hg", hs1_prev, dgates1,
                        preferred_element_type=jnp.float32)
    dw2 = jnp.einsum("tbh,tbg->hg", cat2, dgates2,
                     preferred_element_type=jnp.float32)
    db2 = dgates2.sum(axis=(0, 1))
    zc = jnp.zeros_like(h01)
    # initial-carry grads are not propagated (callers pass fresh zeros)
    return dgates1, dw_hh1, dw2, db2, zc, zc, zc, zc


lstm_stack2_core.defvjp(_stack2_fwd, _stack2_bwd)


def lstm_stack2_pallas(params1, params2, x):
    """Two stacked LSTM layers (equal hidden size, zero initial state) over
    ``x (B, T, in)`` in ONE fused kernel per direction.

    Returns ``(out (B, T, H), [(h1_T, c1_T), (h2_T, c2_T)])`` — the same
    values :func:`paule_tpu.ops.lstm.lstm` produces for a 2-layer stack."""
    w_ih1, w_hh1, b1 = params1["w_ih"], params1["w_hh"], params1["b"]
    batch, _seq, _ = x.shape
    hidden = w_hh1.shape[0]
    zeros = jnp.zeros((batch, hidden), dtype=x.dtype)

    gates1 = x @ w_ih1 + b1                      # (B, T, 4H), one MXU matmul
    gates1 = jnp.swapaxes(gates1, 0, 1)          # time-major (T, B, 4H)
    w2 = jnp.concatenate([params2["w_ih"], params2["w_hh"]], axis=0)
    hs1, cs1, hs2, cs2 = lstm_stack2_core(
        gates1, w_hh1, w2, params2["b"], zeros, zeros, zeros, zeros)
    out = jnp.swapaxes(hs2, 0, 1)
    return out, [(hs1[-1], cs1[-1]), (hs2[-1], cs2[-1])]
