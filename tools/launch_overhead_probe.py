"""Per-Pallas-launch fixed cost probe (VERDICT r5 #3 groundwork).

The r4 roofline left B=1 planning at 2.86 ms/inner-step vs a 1.95 ms
804-chain-step recurrence floor.  The floor is built from the ISOLATED
kernel's wall(T) slope, which cancels every per-launch fixed cost into
the intercept — but the real inner step launches SIX fused kernels
(pred fwd/bwd + 2 embedder layers x fwd/bwd), and those fixed costs pay
per inner step, i.e. they live in the measured slope, not the dispatch
intercept.  This probe separates per-launch fixed cost from per-step
cost directly:

  wall(K chained lstm_core calls, each length T)
      = dispatch + K * (fixed + T * s)

Two T values give s and fixed independently; K-slopes cancel dispatch.
If 6 * fixed =~ 0.9 ms, kernel-count reduction (fusing the embedder
stack, or the whole criterion chain, into fewer pallas_call programs)
is the attack; if fixed is small, the gap lives in the XLA glue between
kernels instead.

Writes docs/measurements/launch_overhead_r05.json.
Run on a quiet host: PYTHONPATH=. python tools/launch_overhead_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

H = 720
B = 1
REPS = 8


def timed(fn, *args):
    """min wall with a FORCED SCALAR FETCH: on the tunneled-TPU backend
    block_until_ready resolves on enqueue acknowledgement, not device
    completion (observed: 8x256-step chains 'finishing' in 20 us), so the
    only trustworthy wall is a host round-trip of the result value."""
    float(fn(*args))  # compile + warm
    float(fn(*args))
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        walls.append(time.perf_counter() - t0)
    return min(walls)


def chain_fn(k_calls, grad):
    from paule_tpu.ops.pallas_lstm import lstm_core

    def run(gates, w_hh, h0, c0):
        h, c = h0, c0
        out = 0.0
        for _ in range(k_calls):
            hs, cs = lstm_core(gates, w_hh, h, c)
            # dependent chain: next call starts from this call's final
            # state, so XLA cannot overlap the launches
            h = hs[-1]
            c = cs[-1]
            out = out + hs.sum()
        return out

    if grad:
        g = jax.grad(lambda gates, w: run(gates, w,
                                          jnp.zeros((B, H)),
                                          jnp.zeros((B, H))).sum(),
                     argnums=(0, 1))
        # reduce grads to one scalar so timed() can force a host fetch
        return jax.jit(lambda gates, w: sum(x.sum() for x in g(gates, w)))
    return jax.jit(lambda gates, w: run(gates, w, jnp.zeros((B, H)),
                                        jnp.zeros((B, H))))


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    w_hh = jnp.asarray(rng.normal(0, 0.02, (H, 4 * H)), jnp.float32)

    out = {"backend": jax.default_backend(), "hidden": H, "batch": B,
           "reps": REPS, "walls_ms": {}}
    results = {}
    for grad in (False, True):
        tag = "fwdbwd" if grad else "fwd"
        walls = {}
        for T in (64, 256):
            gates = jnp.asarray(rng.normal(0, 0.1, (T, B, 4 * H)),
                                jnp.float32)
            for K in (1, 8):
                fn = chain_fn(K, grad)
                walls[(T, K)] = timed(fn, gates, w_hh)
                print(f"{tag} T={T} K={K}: {walls[(T, K)]*1e3:.3f} ms",
                      file=sys.stderr, flush=True)
        # per-call cost at each T from the K-slope (least squares over K)
        percall = {}
        for T in (64, 256):
            ks = np.array([1, 8], float)
            ws = np.array([walls[(T, k)] for k in (1, 8)])
            slope = np.polyfit(ks, ws, 1)[0]
            percall[T] = slope
        s = (percall[256] - percall[64]) / (256 - 64)
        fixed = percall[64] - 64 * s
        results[tag] = {
            "per_call_cost_ms": {str(t): round(v * 1e3, 4)
                                 for t, v in percall.items()},
            "per_step_us": round(s * 1e6, 4),
            "per_launch_fixed_us": round(fixed * 1e6, 2),
        }
        out["walls_ms"][tag] = {f"T{t}_K{k}": round(v * 1e3, 3)
                                for (t, k), v in walls.items()}

    # the real inner step launches 3 fwd+bwd kernel pairs (pred, emb l1,
    # emb l2); project the fixed-cost bill it pays
    fixed_bill_ms = 3 * results["fwdbwd"]["per_launch_fixed_us"] / 1e3
    out["per_launch"] = results
    out["projection"] = {
        "launch_pairs_per_inner_step": 3,
        "fixed_cost_bill_ms": round(fixed_bill_ms, 4),
        "r4_gap_ms": 0.9,
        "note": "fixed_cost_bill vs the 0.9 ms r4 measured-minus-floor "
                "gap: if comparable, kernel-count reduction is the "
                "attack; the fwdbwd fixed also contains the XLA glue "
                "between the fwd and bwd kernels (einsum recompute, "
                "acts concatenate), which fusing would also remove",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "measurements",
        "launch_overhead_r05.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
