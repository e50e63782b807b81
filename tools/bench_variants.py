"""Wall-clock of the model variants vs the plain acoustic_semvec path.

The somatosensory variant triples the per-step proxy-model count (cp→tube,
tube→mel, tube→semvec in the criterion AND tube extraction during
synthesis); the speech-classifier variant adds a per-frame linear.  Their
cost is measured against the bench configuration.

r4 methodology (VERDICT r3 item 7 — the r3 single-shot ratios were
noise-dominated): the three variants are warmed once, then measured in
``REPS`` interleaved rounds (A/B/C per round, one hot 2-outer run each),
so the host/tunnel throttle swing hits all variants of a round roughly
equally.  Ratios are computed WITHIN each round (paired), and the report
gives median + IQR across rounds for both the absolute per-outer wall and
the paired ratios.

Writes ``docs/measurements/variants_r04.json``.
Run on the real TPU (quiet host): PYTHONPATH=. python tools/bench_variants.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

T_CP = 402
REPS = int(os.environ.get("VARIANTS_REPS", "5"))
OUTERS_PER_REP = 2

VARIANTS = [
    ("acoustic_semvec", {}),
    ("speech_classifier", {"use_speech_classifier": True}),
    ("somatosensory", {"use_somatosensory_feedback": True}),
]


def build(paule_kwargs, target):
    from paule_tpu.api import Paule

    p = Paule(seed=1, **paule_kwargs)
    kw = dict(target_acoustic=target, objective="acoustic_semvec",
              initialize_from="acoustic", log_ii=1, log_semantics=True,
              n_inner=25, n_batches=3, batch_size=8, n_epochs=10,
              continue_learning=True, verbose=False)
    return p, kw


def main():
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"SKIP: backend {jax.default_backend()!r}, need a real TPU")
        return 1

    from paule_tpu import synth
    from paule_tpu.ops.normalize import inv_normalize_cp

    synth.initialize()
    rng = np.random.default_rng(0)
    cp = np.clip(rng.normal(0, 0.05, (T_CP + 1, 30)).cumsum(0) * 0.2, -1, 1)
    target = synth.speak(inv_normalize_cp(cp))

    runs = {}
    for name, kwargs in VARIANTS:
        print(f"[variants] warm {name}...", file=sys.stderr, flush=True)
        p, kw = build(kwargs, target)
        p.plan_resynth(n_outer=1, **kw)  # compiles
        runs[name] = (p, kw)

    walls = {name: [] for name, _ in VARIANTS}
    splits = {name: [] for name, _ in VARIANTS}
    for rep in range(REPS):
        for name, _ in VARIANTS:
            p, kw = runs[name]
            t0 = time.perf_counter()
            p.plan_resynth(n_outer=OUTERS_PER_REP, **kw)
            dt = (time.perf_counter() - t0) / OUTERS_PER_REP
            walls[name].append(dt)
            splits[name].append({k: v / OUTERS_PER_REP
                                 for k, v in p.last_planning_timings.items()})
        print(f"[variants] round {rep + 1}/{REPS}: " +
              " ".join(f"{n}={walls[n][-1]:.2f}s" for n in walls),
              file=sys.stderr, flush=True)

    def q(xs, p):
        return float(np.percentile(np.asarray(xs), p))

    out = {
        "budget": "per outer: 25 inner steps, log_ii=1, continue-learning "
                  "(3x8x10)",
        "method": f"{REPS} interleaved rounds x {OUTERS_PER_REP} hot "
                  "outers per variant; paired per-round ratios; "
                  "median [IQR]",
    }
    for name in walls:
        xs = walls[name]
        med_split = {k: round(float(np.median([s[k] for s in splits[name]])),
                              3)
                     for k in splits[name][0]}
        out[name] = {
            "s_per_outer_median": round(float(np.median(xs)), 3),
            "s_per_outer_iqr": [round(q(xs, 25), 3), round(q(xs, 75), 3)],
            "s_per_outer_all": [round(x, 3) for x in xs],
            "phase_split_s_median": med_split,
        }
    for name in ("speech_classifier", "somatosensory"):
        ratios = [walls[name][i] / walls["acoustic_semvec"][i]
                  for i in range(REPS)]
        out[name]["vs_acoustic_semvec_median"] = round(
            float(np.median(ratios)), 3)
        out[name]["vs_acoustic_semvec_iqr"] = [
            round(q(ratios, 25), 3), round(q(ratios, 75), 3)]
        out[name]["vs_acoustic_semvec_all"] = [round(r, 3) for r in ratios]
    os.makedirs("docs/measurements", exist_ok=True)
    with open("docs/measurements/variants_r04.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
