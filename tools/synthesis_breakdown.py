"""Per-snapshot host-synthesis cost breakdown (VERDICT r3 item 4).

Quantifies where the synthesis phase's time goes at the default budget and
A/Bs the three host-synthesis strategies hot on the real TPU:

* ``standalone_cpp`` — raw ``pts_synth_block_h`` cost per 1-s snapshot
  (the irreducible C++ floor, ~4-6 ms on this host);
* ``per_snapshot``   — r3's path: 25 executor submits + 5 chunked uploads
  per outer (forced by hiding ``speak_batch`` behind a plant wrapper);
* ``batch``          — r4 default: ONE native crossing + ONE upload;
* ``batch_overlap``  — r4 ``plan_overlap=2``: per-chunk native crossings
  overlapped with the later chunks' device planning.

Each strategy runs REPS hot 2-outer plans interleaved (round-robin), so
host-throttle swing hits all of them equally; medians reported.

Writes docs/measurements/hot_timing_r04.json.
Run on the real TPU (quiet host): PYTHONPATH=. python tools/synthesis_breakdown.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

T_CP = 402
REPS = int(os.environ.get("BREAKDOWN_REPS", "5"))


class _NoBatchPlant:
    """Default plant minus the batch entry: forces the per-snapshot path."""

    def __init__(self, pool):
        self._pool = pool

    def speak(self, cp):
        return self._pool.speak(cp)

    def speak_and_extract_tube_information(self, cp):
        return self._pool.speak_and_extract_tube_information(cp)


def main():
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"SKIP: backend {jax.default_backend()!r}, need a real TPU")
        return 1

    from paule_tpu import synth
    from paule_tpu.api import Paule
    from paule_tpu.ops.normalize import inv_normalize_cp

    synth.initialize()
    rng = np.random.default_rng(0)
    cp = np.clip(rng.normal(0, 0.05, (T_CP + 1, 30)).cumsum(0) * 0.2, -1, 1)
    target = synth.speak(inv_normalize_cp(cp))

    # --- the C++ floor: raw batched native call, 25 snapshots ---
    pool = synth.SynthPool(size=1)
    snaps = np.tile(inv_normalize_cp(
        np.asarray(cp[:-1], dtype=np.float64))[None], (25, 1, 1))
    pool.speak_batch(snaps)  # warm
    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        pool.speak_batch(snaps)
        best = min(best, time.perf_counter() - t0)
    standalone_ms = best / 25 * 1e3
    print(f"[breakdown] C++ floor: {standalone_ms:.2f} ms/snapshot",
          file=sys.stderr, flush=True)

    kw = dict(target_acoustic=target, objective="acoustic_semvec",
              initialize_from="acoustic", log_ii=1, log_semantics=True,
              n_inner=25, n_batches=3, batch_size=8, n_epochs=10,
              continue_learning=True, verbose=False)

    strategies = {}
    p_old = Paule(seed=1)
    p_old.plant = _NoBatchPlant(p_old._synth_pool)
    strategies["per_snapshot"] = p_old
    strategies["batch"] = Paule(seed=1)
    strategies["batch_overlap"] = Paule(seed=1, plan_overlap=2)

    for name, p in strategies.items():
        print(f"[breakdown] warm {name}...", file=sys.stderr, flush=True)
        p.plan_resynth(n_outer=1, **kw)

    walls = {name: [] for name in strategies}
    splits = {name: [] for name in strategies}
    for rep in range(REPS):
        for name, p in strategies.items():
            t0 = time.perf_counter()
            p.plan_resynth(n_outer=2, **kw)
            walls[name].append((time.perf_counter() - t0) / 2)
            splits[name].append({k: v / 2
                                 for k, v in p.last_planning_timings.items()})
        print(f"[breakdown] round {rep + 1}/{REPS}: " +
              " ".join(f"{n}={walls[n][-1]:.2f}s" for n in walls),
              file=sys.stderr, flush=True)

    out = {
        "budget": "per outer: 25 inner steps, log_ii=1, continue-learning "
                  "(3x8x10), T=402",
        "method": f"{REPS} interleaved hot rounds x 2 outers; medians",
        "standalone_cpp_ms_per_snapshot": round(standalone_ms, 2),
    }
    for name in strategies:
        med = float(np.median(walls[name]))
        med_split = {k: round(float(np.median([s[k] for s in splits[name]])),
                              3)
                     for k in splits[name][0]}
        synth_ms_snap = med_split["synthesis"] / 25 * 1e3
        out[name] = {
            "s_per_outer_median": round(med, 3),
            "s_per_outer_all": [round(x, 3) for x in walls[name]],
            "phase_split_s_median": med_split,
            "synthesis_ms_per_snapshot": round(synth_ms_snap, 2),
            "overhead_vs_cpp_floor_ms": round(
                synth_ms_snap - standalone_ms, 2),
        }
    out["notes"] = (
        "synthesis phase includes the host->device upload of the produced "
        "audio (one tunnel RPC in batch mode, ~20 ms, amortized over 25 "
        "snapshots) and the per-batch isfinite/stack bookkeeping; "
        "batch_overlap additionally hides chunk-1 synthesis behind "
        "chunk-2 device planning (its 'synthesis' timing shows only the "
        "non-overlapped tail)")
    os.makedirs("docs/measurements", exist_ok=True)
    with open("docs/measurements/hot_timing_r04.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
