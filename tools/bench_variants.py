"""Wall-clock of the model variants vs the plain acoustic path (VERDICT r2
item 8: the somatosensory variant triples the per-step proxy-model count and
its cost was unmeasured).

Measures one hot outer iteration (25 inner steps, log_ii=1,
continue-learning on) of plan_resynth for:

* acoustic_semvec (the bench configuration)
* acoustic_semvec + use_speech_classifier
* acoustic_semvec + use_somatosensory_feedback (tube objective variants:
  cp→tube, tube→mel, tube→semvec proxies in the criterion AND tube
  extraction during synthesis)

Writes ``docs/measurements/variants_r03.json``.
Run: PYTHONPATH=. python tools/bench_variants.py
"""

import json
import os
import sys
import time

import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


T_CP = 402


def measure(paule_kwargs, objective, label):
    from paule_tpu import synth
    from paule_tpu.api import Paule
    from paule_tpu.ops.normalize import inv_normalize_cp

    synth.initialize()
    rng = np.random.default_rng(0)
    cp = np.clip(rng.normal(0, 0.05, (T_CP + 1, 30)).cumsum(0) * 0.2, -1, 1)
    target = synth.speak(inv_normalize_cp(cp))

    p = Paule(seed=1, **paule_kwargs)
    kw = dict(target_acoustic=target, objective=objective,
              initialize_from="acoustic", log_ii=1, log_semantics=True,
              n_inner=25, n_batches=3, batch_size=8, n_epochs=10,
              continue_learning=True, verbose=False)
    print(f"[variants] {label}: warm-up...", file=sys.stderr, flush=True)
    p.plan_resynth(n_outer=1, **kw)
    t0 = time.perf_counter()
    p.plan_resynth(n_outer=2, **kw)
    dt = (time.perf_counter() - t0) / 2
    split = {k: round(v / 2, 3) for k, v in p.last_planning_timings.items()}
    print(f"[variants] {label}: {dt:.2f} s/outer {split}",
          file=sys.stderr, flush=True)
    return {"s_per_outer": round(dt, 3), "phase_split_s": split}


def main():
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"SKIP: backend {jax.default_backend()!r}, need a real TPU")
        return 1

    out = {
        "budget": "per outer: 25 inner steps, log_ii=1, continue-learning "
                  "(3x8x10)",
        "acoustic_semvec": measure({}, "acoustic_semvec", "acoustic_semvec"),
        "speech_classifier": measure({"use_speech_classifier": True},
                                     "acoustic_semvec", "speech_classifier"),
        "somatosensory": measure({"use_somatosensory_feedback": True},
                                 "acoustic_semvec", "somatosensory"),
    }
    base = out["acoustic_semvec"]["s_per_outer"]
    for k in ("speech_classifier", "somatosensory"):
        out[k]["vs_acoustic_semvec"] = round(
            out[k]["s_per_outer"] / base, 2)
    os.makedirs("docs/measurements", exist_ok=True)
    with open("docs/measurements/variants_r03.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
