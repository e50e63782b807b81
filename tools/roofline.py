"""Roofline for the planning scan (VERDICT r3 item 5): make
"recurrence-latency-bound" arithmetic instead of assertion.

The planning inner step's device work is dominated by sequential LSTM
recurrences (pred ForwardModel T=402 fwd+bwd, embedder 2 layers T=201
fwd+bwd).  Each recurrence step at B=1 is a (B,720)x(720,2880) matvec plus
VPU elementwise — far below MXU tile granularity, so the bound is the
carry-chain LATENCY, not FLOPs:

    derived_floor(inner step) = sum over recurrences of
        T_rec * per_step_latency(B, H)

where per_step_latency is MEASURED from the fused Pallas kernel itself by
timing `lstm_core` (and its backward) at several sequence lengths and
fitting wall = a + b*T — the slope b is the irreducible per-step cost of
our kernel on this chip, and the intercept a is dispatch overhead.

The report compares the measured hot per-inner-step wall of the REAL
planning scan (engine.plan_segment, the exact program `plan_resynth` runs)
against the derived floor.  ratio <= ~1.3 means the scan is within
shouting distance of its own recurrence chain: latency-bound, QED.  A
larger ratio quantifies the headroom (criterion/optimizer/log overhead).

Writes docs/measurements/roofline_r05.json.
Run on the real TPU: PYTHONPATH=. python tools/roofline.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HIDDEN = 720
T_CP = 402  # 1 s utterance (the bench shape)
REPS = 12


def _fit_slope(ts, walls):
    """Least-squares slope+intercept of wall(T)."""
    ts = np.asarray(ts, dtype=np.float64)
    walls = np.asarray(walls, dtype=np.float64)
    b, a = np.polyfit(ts, walls, 1)
    return float(b), float(a)


def time_fn(fn, *args, reps=REPS):
    """Min hot wall with a forced scalar fetch per rep: on the tunneled
    backend ``block_until_ready`` sporadically returns before execution,
    so a real value fetch guards every reading, and readings below the
    ~28 ms dispatch floor are discarded as async artifacts."""
    import jax

    def sync(out):
        # fetch ONE scalar (device-side slice first: np.asarray on the full
        # array would drag megabytes through the tunnel and poison the wall)
        leaf = jax.tree.leaves(out)[0]
        float(leaf.ravel()[0])

    sync(fn(*args))  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        w = time.perf_counter() - t0
        if w >= 5e-3:
            best = min(best, w)
    return best


def measure_lstm_chain(batch, hidden, t_lens, *, backward):
    """min wall of the fused LSTM recurrence (optionally + backward) at
    each T; returns (per-step slope, intercept, {T: wall})."""
    import jax
    import jax.numpy as jnp

    from paule_tpu.ops import pallas_lstm as PL

    key = jax.random.PRNGKey(0)
    w_hh = jax.random.normal(key, (hidden, 4 * hidden),
                             dtype=jnp.float32) * 0.02
    h0 = jnp.zeros((batch, hidden), dtype=jnp.float32)
    c0 = jnp.zeros((batch, hidden), dtype=jnp.float32)

    if backward:
        @jax.jit
        def run(gates):
            def loss(g):
                hs, _ = PL.lstm_core(g, w_hh, h0, c0)
                return jnp.sum(hs ** 2)
            return jax.grad(loss)(gates)
    else:
        @jax.jit
        def run(gates):
            return PL.lstm_core(gates, w_hh, h0, c0)[0]

    walls = {}
    for t in t_lens:
        gates = jax.random.normal(
            jax.random.PRNGKey(t), (t, batch, 4 * hidden),
            dtype=jnp.float32) * 0.02
        walls[t] = time_fn(run, gates)
    slope, icept = _fit_slope(list(walls), list(walls.values()))
    return slope, icept, {str(t): round(w * 1e3, 3) for t, w in walls.items()}


def measure_planning_step(batch):
    """Per-inner-step cost of the REAL planning scan at the bench shape
    (acoustic_semvec, log_ii=1), as the SLOPE of wall(n_steps) over
    n_steps in {5, 25, 50} — a naive wall/n_steps would smear the ~28 ms
    tunnel dispatch intercept over the steps (+~1.1 ms/step at n=25),
    which is dispatch latency of this host's relay, not device work."""
    import jax
    import jax.numpy as jnp

    from paule_tpu.config import DTYPE
    from paule_tpu.models import EmbeddingModel, ForwardModel
    from paule_tpu.planning import engine

    rng = jax.random.PRNGKey(0)
    pred_model = ForwardModel(num_lstm_layers=1, hidden_size=HIDDEN)
    embedder = EmbeddingModel(num_lstm_layers=2, hidden_size=HIDDEN)
    k1, k2 = jax.random.split(rng)
    bundle = engine.ModelBundle(
        pred_model=pred_model, pred_params=pred_model.init(k1, DTYPE),
        embedder=embedder, embedder_params=embedder.init(k2, DTYPE))
    params_dynamic, models_static = engine.split_bundle(bundle)

    if batch == 1:
        from paule_tpu.planning.engine import (Constraints, init_opt_state,
                                               plan_segment)

        xx = jnp.zeros((1, T_CP, 30), dtype=DTYPE)
        tmel = jnp.zeros((1, T_CP // 2, 60), dtype=DTYPE)
        tsem = jnp.zeros((1, 300), dtype=DTYPE)
        opt_state = init_opt_state(xx, 0.01)

        def make_run(n):
            def run():
                return plan_segment(
                    params_dynamic, models_static, xx, opt_state, tmel,
                    tsem, jax.random.PRNGKey(1), n_steps=n,
                    objective="acoustic_semvec",
                    use_speech_classifier=False, use_somatosensory=False,
                    log_semantics=True, constraints=Constraints(), lr=0.01,
                    log_every=1)[0]
            return run
    else:
        from paule_tpu.parallel import batched
        from paule_tpu.planning.engine import Constraints

        xx = jnp.zeros((batch, T_CP, 30), dtype=DTYPE)
        tmel = jnp.zeros((batch, T_CP // 2, 60), dtype=DTYPE)
        tsem = jnp.zeros((batch, 300), dtype=DTYPE)
        opt_state = batched.init_batched_opt_state(xx, 0.01)

        def make_run(n):
            def run():
                return batched.plan_segment_batched(
                    params_dynamic, models_static, xx, opt_state, tmel,
                    tsem, jax.random.PRNGKey(1), n_steps=n,
                    objective="acoustic_semvec",
                    use_speech_classifier=False, use_somatosensory=False,
                    log_semantics=True, constraints=Constraints(),
                    lr=0.01)[0]
            return run

    step_counts = (5, 25, 50)
    walls = {n: time_fn(make_run(n), reps=8) for n in step_counts}
    ns = np.array(list(walls), dtype=np.float64)
    ws = np.array(list(walls.values()), dtype=np.float64)
    return float(np.polyfit(ns, ws, 1)[0])


def main():
    import jax

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"SKIP: backend is {backend!r}, need a real TPU")
        return 1

    t_lens = [51, 201, 402, 804]
    out = {"backend": backend, "hidden": HIDDEN, "t_cp": T_CP,
           "per_step_us": {}, "derived_vs_measured": {}}

    for batch in (1, 8):
        # forward-only and forward+backward chains at the model shapes
        bf, af, wf = measure_lstm_chain(batch, HIDDEN, t_lens,
                                        backward=False)
        bb, ab, wb = measure_lstm_chain(batch, HIDDEN, t_lens,
                                        backward=True)
        out["per_step_us"][f"B{batch}"] = {
            "fwd_slope_us": round(bf * 1e6, 3),
            "fwd_intercept_us": round(af * 1e6, 1),
            "fwd_walls_ms": wf,
            "fwdbwd_slope_us": round(bb * 1e6, 3),
            "fwdbwd_intercept_us": round(ab * 1e6, 1),
            "fwdbwd_walls_ms": wb,
        }

        # one planning inner step's recurrence chain:
        #   pred LSTM: T=402 fwd+bwd
        #   embedder: 2 layers x T=201 fwd+bwd (sequential in depth)
        # all at H=720 (per-step slope is W_hh-dominated, input size moot)
        derived = (T_CP * bb) + (2 * (T_CP // 2) * bb)
        # + the non-chain parts amortize into the intercepts: one
        # dispatch per scan, not per step, so exclude them from the floor
        measured = measure_planning_step(batch)
        ratio = measured / derived if derived > 0 else float("inf")
        out["derived_vs_measured"][f"B{batch}"] = {
            "chain_steps_per_inner_step": T_CP + 2 * (T_CP // 2),
            "derived_floor_ms": round(derived * 1e3, 3),
            "measured_ms_per_inner_step": round(measured * 1e3, 3),
            "ratio": round(ratio, 2),
            "verdict": ("latency-bound (measured within ~30% of own "
                        "recurrence chain)" if ratio <= 1.3 else
                        f"headroom: {round((ratio - 1) * 100)}% above the "
                        "recurrence floor"),
        }
        print(f"[roofline] B={batch}: derived {derived * 1e3:.2f} ms, "
              f"measured {measured * 1e3:.2f} ms (x{ratio:.2f})",
              file=sys.stderr, flush=True)

    out["method"] = (
        "per-step cost = slope of wall(T) of the fused Pallas lstm_core "
        "(fwd, and fwd+grad) at H=720, T in {51,201,402,804}, min of "
        f"{REPS} reps each; derived floor per planning inner step = "
        "402*fwdbwd_slope (pred) + 2*201*fwdbwd_slope (embedder depth-2); "
        "measured = slope of wall(n_steps) of the real plan_segment at "
        "n_steps in {5,25,50} (cancels the ~28 ms tunnel dispatch)")
    os.makedirs("docs/measurements", exist_ok=True)
    with open("docs/measurements/roofline_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
