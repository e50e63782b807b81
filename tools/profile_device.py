"""Device profile + MFU estimate for the hot planning loop (VERDICT r2
item 5).

Measures, on the real TPU:

1. the per-phase wall-clock split of a hot ``plan_resynth`` outer iteration
   (planning scan / host synthesis / metrics / continue-learning) from
   ``Paule.last_planning_timings``;
2. analytic FLOP counts of the planning inner step (forward LSTM fwd+bwd +
   embedder fwd+bwd through the criterion) and the resulting device FLOP/s
   + model FLOP utilization (MFU) against the v5e bf16 peak (197 TFLOP/s)
   — at B=1 (the latency story) and batched B=8 (the throughput story);
3. optionally a ``jax.profiler`` trace (often unsupported over the axon
   tunnel; failures are recorded, not fatal).

Writes ``docs/measurements/profile_r04.json``.
Run: PYTHONPATH=. python tools/profile_device.py
"""

import json
import os
import sys
import time

import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


HIDDEN = 720
T_CP = 402  # 1 s utterance
PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s (public spec)


def lstm_flops(t_steps, in_size, hidden, layers=1):
    """2*MACs of one LSTM forward over t_steps (gates only; elementwise
    negligible)."""
    total = 0
    for li in range(layers):
        i = in_size if li == 0 else hidden
        total += t_steps * 2 * (i + hidden) * 4 * hidden
    return total


def planning_step_flops(t_cp, batch=1):
    """One planning inner step: ForwardModel fwd+bwd + Embedder fwd+bwd
    (acoustic_semvec criterion); bwd ~ 2x fwd for LSTMs."""
    t_mel = t_cp // 2
    fwd = lstm_flops(t_cp, 30, HIDDEN) + t_cp * 2 * HIDDEN * 60
    emb = lstm_flops(t_mel, 60, HIDDEN, layers=2) + 2 * HIDDEN * 300
    return batch * 3 * (fwd + emb)  # fwd + ~2x bwd


def main():
    import jax

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"SKIP: backend is {backend!r}, need a real TPU")
        return 1

    from paule_tpu import synth
    from paule_tpu.api import Paule
    from paule_tpu.ops.lstm import pallas_enabled
    from paule_tpu.ops.normalize import inv_normalize_cp

    synth.initialize()
    rng = np.random.default_rng(0)
    cp = np.clip(rng.normal(0, 0.05, (T_CP + 1, 30)).cumsum(0) * 0.2, -1, 1)
    target = synth.speak(inv_normalize_cp(cp))

    p = Paule(seed=1)
    kw = dict(target_acoustic=target, objective="acoustic_semvec",
              initialize_from="acoustic", log_ii=1, log_semantics=True,
              n_inner=25, n_batches=3, batch_size=8, n_epochs=10,
              continue_learning=True, verbose=False)
    print("[profile] warm-up (compiles)...", file=sys.stderr, flush=True)
    p.plan_resynth(n_outer=1, **kw)

    print("[profile] hot run (3 outers)...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    p.plan_resynth(n_outer=3, **kw)
    wall = time.perf_counter() - t0
    split = dict(p.last_planning_timings)

    # device FLOP/s of the planning phase (the pure device part)
    n_steps = 3 * 25
    flops = n_steps * planning_step_flops(T_CP)
    plan_s = split["planning"]
    flops_per_s = flops / plan_s
    mfu = flops_per_s / PEAK_BF16

    # optional profiler trace
    trace_status = "not attempted"
    trace_dir = "/tmp/jax_trace_r03"
    try:
        import jax.profiler

        with jax.profiler.trace(trace_dir):
            p.plan_resynth(n_outer=1, **kw)
        n_files = sum(len(fs) for _, _, fs in os.walk(trace_dir))
        trace_status = f"ok ({n_files} files in {trace_dir})"
    except Exception as exc:  # noqa: BLE001
        trace_status = f"failed: {type(exc).__name__}: {exc}"
    print(f"[profile] profiler trace: {trace_status}", file=sys.stderr)

    # batched throughput story: the same step at B=8 via plan_batch_resynth
    batched = {}
    try:
        from paule_tpu.parallel import batched as B

        from paule_tpu.dsp.mel import librosa_melspec
        from paule_tpu.ops.normalize import normalize_mel

        tmel = np.asarray(normalize_mel(librosa_melspec(*target)))
        tmels = np.stack([tmel] * 8)
        bkw = dict(objective="acoustic", n_outer=1, n_inner=25,
                   continue_learning=False)
        B.plan_batch_resynth(p, tmels, None, **bkw)  # warm
        t0 = time.perf_counter()
        B.plan_batch_resynth(p, tmels, None, **bkw)
        tb = time.perf_counter() - t0
        bflops = 25 * planning_step_flops(T_CP, batch=8)
        batched = {
            "batch": 8, "wall_s_per_outer": round(tb, 3),
            "flops_per_s": f"{bflops / tb:.3e}",
            "mfu_vs_bf16_peak": round(bflops / tb / PEAK_BF16, 4),
        }
    except Exception as exc:  # noqa: BLE001
        batched = {"error": f"{type(exc).__name__}: {exc}"}

    out = {
        "backend": backend, "pallas_lstm_active": bool(pallas_enabled()),
        "budget": "3 outers x 25 inner, log_ii=1, continue-learning on",
        "wall_s": round(wall, 3),
        "phase_split_s": {k: round(v, 3) for k, v in split.items()},
        "phase_split_pct": {
            k: round(100 * v / split["total"], 1)
            for k, v in split.items() if k != "total"},
        "planning_flops_analytic": f"{flops:.3e}",
        "planning_flops_per_s": f"{flops_per_s:.3e}",
        "mfu_vs_bf16_peak_B1": round(mfu, 4),
        "batched_B8": batched,
        "profiler_trace": trace_status,
        "notes": "B=1 LSTM planning is recurrence-latency-bound, not "
                 "FLOP-bound; MFU at B=1 is inherently low. The batched "
                 "row is the throughput-mode number.",
    }
    os.makedirs("docs/measurements", exist_ok=True)
    with open("docs/measurements/profile_r04.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
