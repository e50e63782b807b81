"""Attribute the planning inner step's cost above the recurrence floor.

Measurement methodology (this host is a tunneled TPU: every BLOCKING call
pays a ~28 ms relay round trip, and `block_until_ready` sporadically
returns early on the first post-warmup call): each variant is timed as a
jitted scan at SEVERAL segment lengths and the per-step cost is the SLOPE
of wall(n_steps) — the tunnel intercept and any per-dispatch overhead
cancel exactly.  Walls are medians of reps with a forced scalar fetch
(`float(...)`) so a lying block_until_ready cannot produce sub-dispatch
readings; readings below the dispatch floor are discarded.

The ladder (each a faithful subset of the real inner step):

    full            real plan_segment (criterion + Adam + constraints + logs)
    vg_criterion    scan of value_and_grad(criterion) + SGD-ish carry update
    vg_models       criterion minus vel/jerk/local-linear stencil losses
    vg_models_sum   models only (sum outputs; no rmse reductions)
    vg_pred_only    single lstm_core fwd+bwd (T=402) + input projection

Consecutive differences attribute the gap; `vg_pred_only` minus
402*fwdbwd_slope isolates residual per-kernel overhead inside a scan.

Writes docs/measurements/step_decomposition_r05.json.
Run on the real TPU with a quiet host: python tools/step_decomposition.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HIDDEN = 720
T_CP = 402
REPS = 9
STEP_COUNTS = (5, 25, 50)
DISPATCH_FLOOR_S = 5e-3  # readings below this are async-artifact lies


def wall(fn, *args, reps=REPS):
    """Median hot wall of fn(*args), forcing a scalar fetch."""
    out = fn(*args)
    float(np.asarray(out).ravel()[0])  # compile + real sync
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        w = time.perf_counter() - t0
        if w >= DISPATCH_FLOOR_S:
            walls.append(w)
    return float(np.median(walls)) if walls else float("nan")


def per_step_slope(make_run):
    """make_run(n_steps) -> zero-arg callable returning an array.
    Returns (slope_s_per_step, {n: wall_s})."""
    walls = {n: wall(make_run(n)) for n in STEP_COUNTS}
    ns = np.array(list(walls), dtype=np.float64)
    ws = np.array(list(walls.values()), dtype=np.float64)
    slope = float(np.polyfit(ns, ws, 1)[0])
    return slope, walls


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"SKIP: backend is {backend!r}, need a real TPU")
        return 1

    from paule_tpu.config import DTYPE
    from paule_tpu.models import EmbeddingModel, ForwardModel
    from paule_tpu.ops import losses as L
    from paule_tpu.ops import pallas_lstm as PL
    from paule_tpu.planning import engine
    from paule_tpu.planning.engine import (Constraints, init_opt_state,
                                           plan_segment)

    rng = jax.random.PRNGKey(0)
    pred_model = ForwardModel(num_lstm_layers=1, hidden_size=HIDDEN)
    embedder = EmbeddingModel(num_lstm_layers=2, hidden_size=HIDDEN)
    k1, k2 = jax.random.split(rng)
    bundle = engine.ModelBundle(
        pred_model=pred_model, pred_params=pred_model.init(k1, DTYPE),
        embedder=embedder, embedder_params=embedder.init(k2, DTYPE))
    params_dynamic, models_static = engine.split_bundle(bundle)
    models = models_static._replace(**params_dynamic)

    xx0 = jnp.zeros((1, T_CP, 30), dtype=DTYPE)
    tmel = jnp.zeros((1, T_CP // 2, 60), dtype=DTYPE)
    tsem = jnp.zeros((1, 300), dtype=DTYPE)
    opt_state = init_opt_state(xx0, 0.01)

    out = {"backend": backend, "hidden": HIDDEN, "t_cp": T_CP,
           "method": ("per-step cost = slope of wall(n_steps) at n_steps in "
                      f"{list(STEP_COUNTS)}; walls are medians of {REPS} reps "
                      "with forced scalar fetch; sub-dispatch readings "
                      "discarded.  Slopes cancel the ~28 ms tunnel dispatch "
                      "that a naive wall/n_steps smears over the steps."),
           "per_inner_step_ms": {}, "walls_ms": {}}

    # --- V0: the real thing -------------------------------------------------
    def make_full(n):
        def run():
            return plan_segment(
                params_dynamic, models_static, xx0, opt_state, tmel, tsem,
                jax.random.PRNGKey(1), n_steps=n,
                objective="acoustic_semvec", use_speech_classifier=False,
                use_somatosensory=False, log_semantics=True,
                constraints=Constraints(), lr=0.01, log_every=1)[0]
        return run

    # --- scan ladder ---------------------------------------------------------
    def make_scan(loss_fn):
        @jax.jit
        def run(x0, keys):
            def step(x, k):
                _, g = jax.value_and_grad(loss_fn)(x, k)
                return x - 1e-4 * g, ()
            x, _ = jax.lax.scan(step, x0, keys)
            return x

        def factory(n):
            keys = jax.random.split(jax.random.PRNGKey(1), n)
            return lambda: run(xx0, keys)
        return factory

    def loss_criterion(x, k):
        total, _aux = engine.criterion(
            models, x, tmel, tsem, objective="acoustic_semvec",
            use_speech_classifier=False, use_somatosensory=False,
            log_semantics=True, rng=k)
        return total

    def loss_models(x, k):
        pm = models.pred_model.apply(models.pred_params, x)
        sv = models.embedder.apply(models.embedder_params, pm, None,
                                   deterministic=False, rng=k)
        return (engine.MEL_WEIGHT * L.rmse(pm, tmel)
                + engine.SEMANTIC_WEIGHT * L.rmse(sv, tsem))

    def loss_models_sum(x, k):
        pm = models.pred_model.apply(models.pred_params, x)
        sv = models.embedder.apply(models.embedder_params, pm, None,
                                   deterministic=False, rng=k)
        return jnp.sum(pm) + jnp.sum(sv)

    pp = params_dynamic["pred_params"]["lstm"][0]
    h0 = jnp.zeros((1, HIDDEN), dtype=DTYPE)

    def loss_pred_only(x, k):
        x_tm = jnp.swapaxes(x, 0, 1)
        gates = x_tm @ pp["w_ih"] + pp["b"]
        hs, _ = PL.lstm_core(gates, pp["w_hh"], h0, h0)
        return jnp.sum(hs)

    ladder = [("full", make_full),
              ("vg_criterion", make_scan(loss_criterion)),
              ("vg_models", make_scan(loss_models)),
              ("vg_models_sum", make_scan(loss_models_sum)),
              ("vg_pred_only", make_scan(loss_pred_only))]
    for name, factory in ladder:
        slope, walls = per_step_slope(factory)
        out["per_inner_step_ms"][name] = round(slope * 1e3, 3)
        out["walls_ms"][name] = {str(n): round(w * 1e3, 2)
                                 for n, w in walls.items()}
        print(f"[decomp] {name}: {slope * 1e3:.3f} ms/step "
              f"(walls {out['walls_ms'][name]})", file=sys.stderr, flush=True)

    os.makedirs("docs/measurements", exist_ok=True)
    with open("docs/measurements/step_decomposition_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
