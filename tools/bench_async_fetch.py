"""Paired A/B of the overlap-mode async chunk fetch (api.async_chunk_fetch).

One process, one Paule instance (shared compiles), alternating A/B/A/B...
so host-throttle swings cancel in the per-round ratio.  Reports median
per-round walls + planning-phase split for both arms.

Usage: python tools/bench_async_fetch.py [--rounds 5] [--n-outer 5]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--n-outer", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from paule_tpu import synth
    from paule_tpu.api import Paule
    from paule_tpu.ops.normalize import inv_normalize_cp

    synth.initialize()
    rng = np.random.default_rng(0)
    cp = np.clip(rng.normal(0, 0.05, (403, 30)).cumsum(0) * 0.2, -1, 1)
    sig, sr = synth.speak(inv_normalize_cp(cp))

    kw = dict(target_acoustic=(sig, sr), objective="acoustic_semvec",
              initialize_from="acoustic", n_outer=args.n_outer, n_inner=25,
              log_ii=1, continue_learning=True, n_epochs=10, n_batches=3,
              batch_size=8, verbose=False)

    Paule(seed=7).plan_resynth(**kw)  # pay every compile up front

    walls = {"async": [], "sync": []}
    planning = {"async": [], "sync": []}
    losses = {"async": [], "sync": []}
    for _ in range(args.rounds):
        for arm in ("async", "sync"):
            # fresh same-seed instance per arm: the instance RNG advances
            # across plan_resynth calls, so arms are only comparable from
            # identical starting state (jit caches are process-global, so
            # no recompiles)
            model = Paule(seed=7)
            model.async_chunk_fetch = arm == "async"
            t0 = time.perf_counter()
            r = model.plan_resynth(**kw)
            walls[arm].append(time.perf_counter() - t0)
            planning[arm].append(model.last_planning_timings["planning"])
            losses[arm].append(float(r.prod_loss_steps[-1]))

    ratios = [s / a for a, s in zip(walls["async"], walls["sync"])]
    out = {
        "n_outer": args.n_outer, "rounds": args.rounds,
        "wall_s": {k: [round(w, 3) for w in v] for k, v in walls.items()},
        "planning_s": {k: [round(w, 3) for w in v]
                       for k, v in planning.items()},
        "median_wall_s": {k: round(float(np.median(v)), 3)
                          for k, v in walls.items()},
        "median_planning_s": {k: round(float(np.median(v)), 3)
                              for k, v in planning.items()},
        "paired_ratio_sync_over_async": [round(r, 3) for r in ratios],
        "median_ratio": round(float(np.median(ratios)), 3),
        "loss_identical": bool(np.array_equal(losses["async"],
                                              losses["sync"])),
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
