"""Release-weights corpus quality table + max_batch corpus-wall A/B
(VERDICT r5 #1 done-criterion and #5).

Plans the same evaluation corpus (seeded identically to r4's
``corpus_quality_run.py``) under:

* the shipped weight release (``Paule()`` default) at
  ``max_batch in {8, 16, 32}`` — the corpus WALL decides the
  ``plan_corpus_batched`` default (r4 justified max_batch=8 by kernel
  *latency*, but the corpus driver is wall-insensitive per utterance:
  B=32 kernel throughput measured 1.66x B=8 in batch_scaling_r04, and
  only an end-to-end wall says whether host synthesis + padding waste
  eats it);
* seeded random init (``pretrained_dir='random'``) at the winning
  max_batch — the from-nothing comparison row;

and reports median/percentile final produced-mel losses per row next to
r4's babble-bootstrap number (1.71, ``corpus_r04.json``).

Timing-sensitive (corpus walls are committed numbers): run on a QUIET
host.  Artifacts: docs/measurements/corpus_r05.json +
results_loss_r05.txt.

Run (real TPU, ~20-30 min): PYTHONPATH=. python tools/release_quality_run.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_UTT = int(os.environ.get("CORPUS_N", "64"))
N_OUTER = int(os.environ.get("CORPUS_OUTER", "10"))
N_INNER = int(os.environ.get("CORPUS_INNER", "25"))
MAX_BATCHES = tuple(int(x) for x in os.environ.get(
    "CORPUS_MAX_BATCHES", "8,16,32").split(","))
OUT_DIR = "docs/measurements"
LENGTHS = (80, 120, 160, 200)  # same buckets as corpus_quality_run.py


def log(msg):
    print(f"[release-quality] {msg}", file=sys.stderr, flush=True)


def main():
    from paule_tpu import pretrain, synth, release
    from paule_tpu.api import Paule
    from paule_tpu.dsp.mel import librosa_melspec
    from paule_tpu.experiments import plan_corpus_batched
    from paule_tpu.ops.normalize import inv_normalize_cp, normalize_mel

    if not release.release_available():
        log("SKIP: no release artifact "
            "(run tools/train_release_weights.py first)")
        return 1
    synth.initialize()
    t_start = time.perf_counter()

    # ---- evaluation corpus (same generator/seed family as r4) ----
    rng = np.random.default_rng(42)
    pool = synth.SynthPool(size=4)
    targets = []
    for i in range(N_UTT):
        n = LENGTHS[i % len(LENGTHS)]
        cp = pretrain.random_cp_trajectory(rng, n)
        sig, sr = pool.speak(inv_normalize_cp(cp))
        targets.append((sig, sr))
    pool.close()
    log(f"corpus ready: {N_UTT} utterances, lengths {LENGTHS}")

    def prod_loss_of_curve(results):
        return np.array([float(r["prod_loss_curve"][-1]) for r in results])

    plan_kwargs = dict(objective="acoustic", n_outer=N_OUTER,
                       n_inner=N_INNER, continue_learning=True,
                       batch_size=8, n_epochs=5)

    rows = {}
    losses_by_row = {}
    # ---- release weights at each max_batch (the wall A/B) ----
    for mb in MAX_BATCHES:
        model = Paule(seed=2)  # default resolution = the shipped release
        t0 = time.perf_counter()
        results = plan_corpus_batched(model, targets, max_batch=mb,
                                      plan_kwargs=plan_kwargs, verbose=True)
        wall = time.perf_counter() - t0
        final = prod_loss_of_curve(results)
        rows[f"release_mb{mb}"] = {
            "weights": "release", "max_batch": mb,
            "corpus_wall_s": round(wall, 1),
            "utt_per_s": round(N_UTT / wall, 3),
            "median_final_prod_loss": round(float(np.median(final)), 4),
            "p10": round(float(np.percentile(final, 10)), 4),
            "p90": round(float(np.percentile(final, 90)), 4),
        }
        losses_by_row[f"release_mb{mb}"] = final
        log(f"release max_batch={mb}: wall {wall:.0f} s, "
            f"median final loss {np.median(final):.3f}")

    best_mb = min(MAX_BATCHES,
                  key=lambda mb: rows[f"release_mb{mb}"]["corpus_wall_s"])
    log(f"winning max_batch by corpus wall: {best_mb}")

    # ---- random-init comparison at the winning max_batch ----
    model = Paule(seed=2, pretrained_dir="random")
    t0 = time.perf_counter()
    results = plan_corpus_batched(model, targets, max_batch=best_mb,
                                  plan_kwargs=plan_kwargs, verbose=True)
    wall = time.perf_counter() - t0
    final_rand = prod_loss_of_curve(results)
    rows["random_init"] = {
        "weights": "random", "max_batch": best_mb,
        "corpus_wall_s": round(wall, 1),
        "median_final_prod_loss": round(float(np.median(final_rand)), 4),
        "p10": round(float(np.percentile(final_rand, 10)), 4),
        "p90": round(float(np.percentile(final_rand, 90)), 4),
    }
    log(f"random init: median final loss {np.median(final_rand):.3f}")

    # results_loss.txt (reference notebook format), release @ best mb
    os.makedirs(OUT_DIR, exist_ok=True)
    final_rel = losses_by_row[f"release_mb{best_mb}"]
    with open(os.path.join(OUT_DIR, "results_loss_r05.txt"), "w") as fh:
        fh.write("file\tlabel\tprod_loss_release\tprod_loss_random\n")
        for i in range(N_UTT):
            fh.write(f"utt{i:03d}\tbabble\t{final_rel[i]:.6f}\t"
                     f"{final_rand[i]:.6f}\n")

    meta = release.load_release_metadata()
    out = {
        "n_utterances": N_UTT,
        "budget": plan_kwargs,
        "release_version": meta["version"],
        "release_sha256": release.sha256(),
        "rows": rows,
        "winning_max_batch_by_corpus_wall": best_mb,
        "r4_babble_bootstrap_median": 1.7123,  # corpus_r04.json
        "total_wall_s": round(time.perf_counter() - t_start, 1),
    }
    with open(os.path.join(OUT_DIR, "corpus_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
