"""Hot full-budget timing of plan_resynth with the per-phase split.

Runs the reference's full default budget (10 outer x 25 inner, log_ii=1,
continue-learning 10 epochs x 3 batches) twice — the first run pays every
compile, the second is the hot number — and prints
``Paule.last_planning_timings`` plus the final produced loss.

Usage: python tools/hot_timing.py [--n-outer 10] [--t 201]
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
    ap.add_argument("--n-outer", type=int, default=10)
    ap.add_argument("--t", type=int, default=402,
                    help="cp frames of the synthetic target (402 ~ 1 s)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from paule_tpu import synth
    from paule_tpu.api import Paule
    from paule_tpu.ops.normalize import inv_normalize_cp

    synth.initialize()
    rng = np.random.default_rng(0)
    cp = np.clip(rng.normal(0, 0.05, (args.t + 1, 30)).cumsum(0) * 0.2,
                 -1, 1)
    sig, sr = synth.speak(inv_normalize_cp(cp))

    kw = dict(target_acoustic=(sig, sr), objective="acoustic_semvec",
              initialize_from="acoustic", n_outer=args.n_outer, n_inner=25,
              log_ii=1, continue_learning=True, n_epochs=10, n_batches=3,
              batch_size=8, verbose=False)

    model = Paule(seed=7)
    model.plan_resynth(**kw)  # cold: compiles
    t0 = time.perf_counter()
    r = model.plan_resynth(**kw)
    wall = time.perf_counter() - t0

    out = {"hot_wall_s": round(wall, 2),
           "timings": {k: round(v, 2)
                       for k, v in model.last_planning_timings.items()},
           "final_prod_loss": float(r.prod_loss_steps[-1]),
           "n_outer": args.n_outer, "t_frames": args.t}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
