import time
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 720


# ---------- current fwd: one wide matvec ----------
def fwd_kernel_wide(gates_ref, whh_ref, h0_ref, c0_ref, hs_ref, cs_ref,
                    h_scr, c_scr):
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
        gi = jax.nn.sigmoid(g[:, :H])
        gf = jax.nn.sigmoid(g[:, H:2*H])
        gg = jnp.tanh(g[:, 2*H:3*H])
        go = jax.nn.sigmoid(g[:, 3*H:])
        c = gf * c + gi * gg
        h = go * jnp.tanh(c)
        hs_ref[i] = h
        cs_ref[i] = c
        h_scr[:] = h
        c_scr[:] = c
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


# ---------- split fwd: four per-gate matvecs ----------
def fwd_kernel_split(gates_ref, whh_ref, h0_ref, c0_ref, hs_ref, cs_ref,
                     h_scr, c_scr):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    chunk = gates_ref.shape[0]

    def body(i, _):
        h = h_scr[:]
        c = c_scr[:]
        gx = gates_ref[i]
        w = whh_ref[:]
        gi = jax.nn.sigmoid(gx[:, :H] + jnp.dot(
            h, w[:, :H], preferred_element_type=jnp.float32))
        gf = jax.nn.sigmoid(gx[:, H:2*H] + jnp.dot(
            h, w[:, H:2*H], preferred_element_type=jnp.float32))
        gg = jnp.tanh(gx[:, 2*H:3*H] + jnp.dot(
            h, w[:, 2*H:3*H], preferred_element_type=jnp.float32))
        go = jax.nn.sigmoid(gx[:, 3*H:] + jnp.dot(
            h, w[:, 3*H:], preferred_element_type=jnp.float32))
        c = gf * c + gi * gg
        h = go * jnp.tanh(c)
        hs_ref[i] = h
        cs_ref[i] = c
        h_scr[:] = h
        c_scr[:] = c
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def run_fwd(kernel, gates, w_hh, h0, c0, chunk=128):
    T, B, G = gates.shape
    grid = T // chunk
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, B, G), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, B, H), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, H), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, B, H), jnp.float32),
                   jax.ShapeDtypeStruct((T, B, H), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64*1024*1024),
    )(gates, w_hh, h0, c0)


# ---------- current bwd: concat + one wide contraction ----------
def bwd_kernel_wide(acts_ref, cs_prev_ref, ghs_ref, whh_ref,
                    dgates_ref, dh0_ref, dc0_ref, dh_scr, dc_scr):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    chunk = acts_ref.shape[0]

    def body(j, _):
        i = chunk - 1 - j
        a = acts_ref[i]
        gi = a[:, :H]
        gf = a[:, H:2*H]
        gg = a[:, 2*H:3*H]
        go = a[:, 3*H:]
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


# ---------- split bwd: per-gate pieces, 4 partial contractions ----------
def bwd_kernel_split(acts_ref, cs_prev_ref, ghs_ref, whh_ref,
                     dgates_ref, dh0_ref, dc0_ref, dh_scr, dc_scr):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    chunk = acts_ref.shape[0]

    def body(j, _):
        i = chunk - 1 - j
        a = acts_ref[i]
        gi = a[:, :H]
        gf = a[:, H:2*H]
        gg = a[:, 2*H:3*H]
        go = a[:, 3*H:]
        c_prev = cs_prev_ref[i]
        c_t = gf * c_prev + gi * gg
        tc = jnp.tanh(c_t)

        dh = ghs_ref[i] + dh_scr[:]
        do = dh * tc
        dc = dc_scr[:] + dh * go * (1.0 - tc * tc)

        w = whh_ref[:]
        dn = (((1,), (1,)), ((), ()))
        p_i = dc * gg * gi * (1.0 - gi)
        acc = jax.lax.dot_general(p_i, w[:, :H], dimension_numbers=dn,
                                  preferred_element_type=jnp.float32)
        dgates_ref[i, :, :H] = p_i
        p_f = dc * c_prev * gf * (1.0 - gf)
        acc += jax.lax.dot_general(p_f, w[:, H:2*H], dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)
        dgates_ref[i, :, H:2*H] = p_f
        p_g = dc * gi * (1.0 - gg * gg)
        acc += jax.lax.dot_general(p_g, w[:, 2*H:3*H], dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)
        dgates_ref[i, :, 2*H:3*H] = p_g
        p_o = do * go * (1.0 - go)
        acc += jax.lax.dot_general(p_o, w[:, 3*H:], dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)
        dgates_ref[i, :, 3*H:] = p_o

        dh_scr[:] = acc
        dc_scr[:] = dc * gf
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)

    @pl.when(k == pl.num_programs(0) - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


def run_bwd(kernel, acts, cs_prev, ghs, w_hh, chunk=128):
    T, B, G = acts.shape
    grid = T // chunk
    rev = grid - 1
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, B, G), lambda k: (rev - k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, H), lambda k: (rev - k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, H), lambda k: (rev - k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, B, G), lambda k: (rev - k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, B, G), jnp.float32),
                   jax.ShapeDtypeStruct((B, H), jnp.float32),
                   jax.ShapeDtypeStruct((B, H), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64*1024*1024),
    )(acts, cs_prev, ghs, w_hh)


def wall(fn, *a, reps=8):
    def sync(o):
        float(jax.tree.leaves(o)[0].ravel()[0])
    sync(fn(*a))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*a))
        w = time.perf_counter() - t0
        if w >= 5e-3:
            best = min(best, w)
    return best


B, T = 1, 1024
key = jax.random.PRNGKey(0)
w_hh = jax.random.normal(key, (H, 4*H), jnp.float32) * 0.02
gates = jax.random.normal(jax.random.PRNGKey(7), (T, B, 4*H),
                          jnp.float32) * 0.02
h0 = jnp.zeros((B, H), jnp.float32)

# correctness: split fwd == wide fwd
hw = jax.jit(functools.partial(run_fwd, fwd_kernel_wide))(
    gates, w_hh, h0, h0)
hs_ = jax.jit(functools.partial(run_fwd, fwd_kernel_split))(
    gates, w_hh, h0, h0)
err = float(jnp.max(jnp.abs(hw[0] - hs_[0])))
print("fwd split max err:", err, flush=True)

acts = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(3), (T, B, 4*H),
                                        jnp.float32))
cs_prev = jax.random.normal(jax.random.PRNGKey(4), (T, B, H),
                            jnp.float32) * 0.1
ghs = jax.random.normal(jax.random.PRNGKey(5), (T, B, H), jnp.float32)
bw = jax.jit(functools.partial(run_bwd, bwd_kernel_wide))(
    acts, cs_prev, ghs, w_hh)
bs = jax.jit(functools.partial(run_bwd, bwd_kernel_split))(
    acts, cs_prev, ghs, w_hh)
err_dg = float(jnp.max(jnp.abs(bw[0] - bs[0])))
err_dh = float(jnp.max(jnp.abs(bw[1] - bs[1])))
print("bwd split max err dgates:", err_dg, "dh0:", err_dh, flush=True)


def chained_fwd(kernel, K):
    @jax.jit
    def f(h0, c0):
        def step(carry, _):
            h, c = carry
            hs, cs = run_fwd(kernel, gates, w_hh, h, c)
            return (hs[-1], cs[-1]), ()
        (h, c), _ = jax.lax.scan(step, (h0, c0), None, length=K)
        return h
    return lambda: f(h0, h0)


def chained_bwd(kernel, K):
    @jax.jit
    def f(g0):
        def step(g, _):
            dg, dh0, dc0 = run_bwd(kernel, acts, cs_prev, g, w_hh)
            # feed dh0 back so iterations are dependent
            return g + 1e-6 * dh0, ()
        g, _ = jax.lax.scan(step, g0, None, length=K)
        return g
    return lambda: f(ghs)


for name, mk in [("fwd wide", functools.partial(chained_fwd,
                                                fwd_kernel_wide)),
                 ("fwd split", functools.partial(chained_fwd,
                                                 fwd_kernel_split)),
                 ("bwd wide", functools.partial(chained_bwd,
                                                bwd_kernel_wide)),
                 ("bwd split", functools.partial(chained_bwd,
                                                 bwd_kernel_split))]:
    w5 = wall(mk(5))
    w20 = wall(mk(20))
    per = (w20 - w5) / 15 / T
    print(f"{name}: {per*1e6:.3f} us/step", flush=True)
