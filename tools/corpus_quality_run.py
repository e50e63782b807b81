"""Corpus-scale quality run (VERDICT r2 item 6).

Bootstraps the proxy models by motor babbling (pretrain.py), plans a 50+
utterance corpus with ``experiments.plan_corpus_batched``, and reports the
final produced-mel-loss distribution, plus a ``plan_iterative`` vs
single-shot comparison on one long utterance.  Artifacts:

* ``docs/measurements/results_loss_r04.txt`` — per-utterance final losses
  (the reference notebook's ``results_loss.txt`` format, cells 29-37)
* ``docs/measurements/corpus_r04.json`` — summary statistics

Run (real TPU, ~20-40 min): PYTHONPATH=. python tools/corpus_quality_run.py
Tunables: CORPUS_N (default 50), CORPUS_OUTER/INNER (default 10/25 — the
reference's default planning budget).
"""

import json
import os
import sys
import time

import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


N_UTT = int(os.environ.get("CORPUS_N", "50"))
N_OUTER = int(os.environ.get("CORPUS_OUTER", "10"))
N_INNER = int(os.environ.get("CORPUS_INNER", "25"))
BABBLE_N = int(os.environ.get("CORPUS_BABBLE", "120"))
BABBLE_EPOCHS = int(os.environ.get("CORPUS_BABBLE_EPOCHS", "12"))
OUT_DIR = "docs/measurements"
#: cp-frame lengths (even): few distinct values so exact-length buckets
#: batch well (experiments.plan_corpus_batched buckets by exact mel length)
LENGTHS = (80, 120, 160, 200)


def log(msg):
    print(f"[corpus] {msg}", file=sys.stderr, flush=True)


def main():
    from paule_tpu import pretrain, synth
    from paule_tpu.api import Paule
    from paule_tpu.dsp.mel import librosa_melspec
    from paule_tpu.experiments import plan_corpus_batched
    from paule_tpu.ops.normalize import inv_normalize_cp, normalize_mel

    synth.initialize()
    t_start = time.perf_counter()

    # ---- 1. babble-bootstrap the forward proxy ----
    log(f"babbling {BABBLE_N} utterances...")
    corpus_train = pretrain.babble_corpus(BABBLE_N, seq_len=(40, 160),
                                          seed=1, n_workers=4)
    model = Paule(seed=2)
    log(f"training forward proxy ({BABBLE_EPOCHS} epochs)...")
    params, losses = pretrain.train_forward(
        model.pred_model, model.pred_params, corpus_train,
        batch_size=8, n_epochs=BABBLE_EPOCHS)
    model.pred_params = params
    model.pred_trainer.params = params
    log(f"forward train loss: {losses[0]:.4f} -> {losses[-1]:.4f}")
    log(f"training inverse proxy ({BABBLE_EPOCHS} epochs)...")
    inv_params, inv_losses = pretrain.train_inverse(
        model.inv_model, model.inv_params, corpus_train,
        batch_size=8, n_epochs=BABBLE_EPOCHS)
    model.inv_params = inv_params
    model.inv_trainer.params = inv_params
    log(f"inverse train loss: {inv_losses[0]:.4f} -> {inv_losses[-1]:.4f}")

    # ---- 2. the evaluation corpus: 50+ utterances, 4 length buckets ----
    rng = np.random.default_rng(42)
    pool = synth.SynthPool(size=4)
    targets, true_cps = [], []
    for i in range(N_UTT):
        n = LENGTHS[i % len(LENGTHS)]
        cp = pretrain.random_cp_trajectory(rng, n)
        sig, sr = pool.speak(inv_normalize_cp(cp))
        targets.append((sig, sr))
        true_cps.append(cp)
    log(f"corpus ready: {N_UTT} utterances, lengths {LENGTHS}")

    # true pre-planning loss: synthesize the inverse-model init trajectory
    # (what _prepare_batch starts planning from) and measure produced loss
    def prod_loss_of(planned_cp, target):
        # the planner's loss space: target mel min-shifted to 0 (the
        # reference's convention, /root/reference/paule/paule.py:526 —
        # mirrored at api.py and dsp/targets.py), produced mel unshifted
        tmel = np.asarray(normalize_mel(librosa_melspec(*target)))
        tmel = tmel - tmel.min()
        psig, psr = synth.speak(inv_normalize_cp(np.asarray(planned_cp)))
        pmel = np.asarray(normalize_mel(librosa_melspec(psig, psr)))
        n = min(len(tmel), len(pmel))
        return 5.0 * float(np.sqrt(np.mean((pmel[:n] - tmel[:n]) ** 2)))

    log("measuring inverse-init (pre-planning) produced losses...")
    init_losses = []
    for target in targets:
        tmel = np.asarray(normalize_mel(librosa_melspec(*target)))
        cp0 = np.clip(np.asarray(model._j_inv(
            model.inv_trainer.params, tmel[None].astype(model.dtype)))[0],
            -1.0, 1.0)
        init_losses.append(prod_loss_of(cp0, target))
    init_losses = np.array(init_losses)
    log(f"inverse-init median produced loss {np.median(init_losses):.3f}")

    # ---- 3. batched corpus planning ----
    plan_kwargs = dict(objective="acoustic", n_outer=N_OUTER,
                       n_inner=N_INNER, continue_learning=True,
                       batch_size=8, n_epochs=5)
    t0 = time.perf_counter()
    results = plan_corpus_batched(model, targets, max_batch=8,
                                  plan_kwargs=plan_kwargs, verbose=True)
    t_corpus = time.perf_counter() - t0

    final = np.array([float(r["prod_loss_curve"][-1]) for r in results])
    first = np.array([float(r["prod_loss_curve"][0]) for r in results])
    improved = float(np.mean(final < init_losses))
    log(f"corpus planned in {t_corpus:.0f} s; "
        f"median final loss {np.median(final):.3f} "
        f"(pre-planning {np.median(init_losses):.3f}); "
        f"{improved:.0%} better than their inverse-init")

    # results_loss.txt (reference notebook format)
    os.makedirs(OUT_DIR, exist_ok=True)
    txt = os.path.join(OUT_DIR, "results_loss_r04.txt")
    with open(txt, "w") as fh:
        fh.write("file\tlabel\tprod_loss\tprod_loss_outer1"
                 "\tprod_loss_preplan\n")
        for i, r in enumerate(results):
            fh.write(f"utt{i:03d}\tbabble\t{final[i]:.6f}\t"
                     f"{first[i]:.6f}\t{init_losses[i]:.6f}\n")

    # ---- 4. plan_iterative vs single-shot on one long utterance ----
    n_long = 400
    cp_long = pretrain.random_cp_trajectory(rng, n_long)
    long_target = pool.speak(inv_normalize_cp(cp_long))
    pool.close()

    budget = dict(objective="acoustic", n_outer=N_OUTER, n_inner=N_INNER,
                  log_ii=N_INNER, continue_learning=False, verbose=False)
    log("single-shot long utterance...")
    r_single = model.plan_resynth(target_acoustic=long_target,
                                  initialize_from="acoustic", **budget)
    loss_single = prod_loss_of(r_single.planned_cp, long_target)
    log("chunked long utterance (chunk 64 mel frames, overlap 8)...")
    planned_chunked, _ = model.plan_iterative(
        target_acoustic=long_target, chunk_size=64, overlap=8, **budget)
    loss_chunked = prod_loss_of(planned_chunked, long_target)
    log(f"single-shot {loss_single:.3f} vs chunked {loss_chunked:.3f}")

    summary = {
        "n_utterances": N_UTT,
        "budget": plan_kwargs,
        "babble": {"n": BABBLE_N, "epochs": BABBLE_EPOCHS,
                   "train_loss_first": round(float(losses[0]), 4),
                   "train_loss_last": round(float(losses[-1]), 4),
                   "inv_loss_first": round(float(inv_losses[0]), 4),
                   "inv_loss_last": round(float(inv_losses[-1]), 4)},
        "corpus_wall_s": round(t_corpus, 1),
        "final_prod_loss": {
            "median": round(float(np.median(final)), 4),
            "mean": round(float(np.mean(final)), 4),
            "p10": round(float(np.percentile(final, 10)), 4),
            "p90": round(float(np.percentile(final, 90)), 4),
        },
        "outer1_prod_loss_median": round(float(np.median(first)), 4),
        "preplan_prod_loss_median": round(float(np.median(init_losses)), 4),
        "fraction_better_than_preplan": improved,
        "long_utterance": {
            "cp_frames": 2 * (1 + n_long * 110 // 220),
            "single_shot_loss": round(loss_single, 4),
            "chunked_loss": round(loss_chunked, 4),
            "chunked_over_single": round(loss_chunked / loss_single, 3),
        },
        "total_wall_s": round(time.perf_counter() - t_start, 1),
    }
    with open(os.path.join(OUT_DIR, "corpus_r04.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
